"""Dump .explain("formatted") for registered queries to files.

Usage:
    python tools/dump_plan.py <outdir> <query> [query ...] [--sf DIR]

Writes <outdir>/<query>.txt plus a one-line JSON summary per query
(Exchange / BroadcastExchange / SortMergeJoin / rangepartitioning
mention counts) so plan claims are checkable without reading megabytes.
NOTE: queries with eager construction-time actions (connected
components) EXECUTE those stages during the dump.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, ".")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    outdir, names = args[0], args[1:]
    os.makedirs(outdir, exist_ok=True)

    from classification_pyspark_spark.operators.caching import release_tracked
    from classification_pyspark_spark.queries import QUERIES
    from classification_pyspark_spark.session import get_spark

    spark = get_spark("dump_plan")
    for name in names:
        df = QUERIES[name](spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(txt)
        counts = {
            k: len(re.findall(p, txt))
            for k, p in [
                ("exchange", r"\bExchange\b"),
                ("broadcast_exchange", r"\bBroadcastExchange\b"),
                ("sort_merge_join", r"\bSortMergeJoin\b"),
                ("broadcast_hash_join", r"\bBroadcastHashJoin\b"),
                ("shuffled_hash_join", r"\bShuffledHashJoin\b"),
                ("cartesian", r"\bCartesianProduct\b"),
                ("rangepartitioning", r"\brangepartitioning\b"),
                ("single_partition", r"\bSinglePartition\b"),
                ("python_eval", r"BatchEvalPython|ArrowEvalPython"),
            ]
        }
        print(json.dumps({"query": name, "file": path, "bytes": len(txt), **counts}), flush=True)
        release_tracked()
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
