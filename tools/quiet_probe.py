"""Quiet-host probe: min-of-3 of the fixed calibration workload
(range sum + shuffle, code-independent). Under ~0.3s means quiet
(bench_baseline.json records calibration 0.306). See the measurement
protocol note in OPTIMIZATION_r09.md / bench.py.

Usage: python tools/quiet_probe.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from classification_pyspark_spark.session import get_spark  # noqa: E402


def main() -> int:
    spark = get_spark("quiet_probe")
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "id % 97 AS k", "id AS v"
        ).groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
        reps.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"calibration_reps": reps, "min": min(reps)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
