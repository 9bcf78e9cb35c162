"""One-shot recorder for the round-9 headline baselines (same protocol
as record_baselines_r7/r8).

Covers:
- NEW headline entry: top_bigrams_capped (the pre-shuffle min_count
  cap twin added this round);
- RE-RECORD: duplicated_spans_cover — its round-8 baseline was the
  one entry recorded under sustained ~1.5x host drift
  (record_calibration 0.452 vs the 0.334 the rest of the round-8 set
  shares); the round-8 verdict asked for one quiet-window re-record
  to remove the largest remaining calibration asymmetry in
  bench_baseline.json.

Protocol (bench_baseline.json source note, round-6 correction): record
each entry isolated min-of-3 at sf0.1, and anchor its
record_calibration in QUERY-domain drift — an isolated min-of-3 anchor
basket of six quiet-baseline headline queries; record_calibration =
0.306 * median(anchor_now / anchor_quiet_baseline). The synthetic
range+shuffle probe exaggerates host drift for query workloads.

Usage: python tools/record_baselines_r9.py [extra_query ...]
(prints JSON to stdout)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from classification_pyspark_spark.operators.caching import release_tracked  # noqa: E402
from classification_pyspark_spark.queries import QUERIES  # noqa: E402
from classification_pyspark_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
NEW = [
    "top_bigrams_capped",
    "duplicated_spans_cover",
]
ANCHORS = {
    "q1_pricing_summary": 0.591,
    "q5_region_nation_revenue": 1.113,
    "dedup_keep_first": 0.282,
    "text_stats": 0.469,
    "top_bigrams": 0.778,
    "sessionize_events": 0.39,
}


def min_of(spark, name, reps=3):
    best = float("inf")
    for _ in range(reps):
        release_tracked()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main():
    names = NEW + [a for a in sys.argv[1:] if a in QUERIES]
    spark = get_spark("record-baselines")
    # warm-up at sf0.001 (compile plan shapes)
    for name in list(ANCHORS) + names:
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    ratios = {}
    for name, quiet in ANCHORS.items():
        now = min_of(spark, name)
        ratios[name] = round(now / quiet, 3)
    med = statistics.median(ratios.values())
    rec_cal = round(0.306 * med, 3)
    out = {"anchor_ratios": ratios, "median": med, "record_calibration": rec_cal}
    out["new"] = {name: min_of(spark, name) for name in names}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
