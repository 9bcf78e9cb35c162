"""Isolated re-time of one or more registered queries — the repo's
single-query adjudication protocol, as a tool instead of folklore.

bench.py times the whole 58-query headline fleet in one JVM; on a
shared host a single query's delta there can be pure scheduler noise
(round-6 verdict: text_stats 1.84x with no code change). The protocol
for believing or dismissing such a delta:

1. fresh session, warm it up on the SAME query at sf0.001 (JIT,
   codegen, classloader — first-job cost is session cost, not plan
   cost);
2. N timed reps (default 4) at the target sf, report min and median;
3. time a CONTROL query (default q1_pricing_summary) the same way —
   if the control also moved, the host moved, not the code.

Usage:
    python tools/retime.py <query> [query ...] [--sf DIR] [--reps N]
                           [--control NAME|none]

Prints one JSON line per query:
    {"query": ..., "sf": ..., "reps": [..], "min": s, "median": s}
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--control", default="q1_pricing_summary")
    args = ap.parse_args()

    from classification_pyspark_spark.operators.caching import release_tracked
    from classification_pyspark_spark.queries import QUERIES
    from classification_pyspark_spark.session import get_spark

    spark = get_spark()
    names = list(args.queries)
    if args.control and args.control != "none" and args.control not in names:
        names.append(args.control)

    for name in names:
        fn = QUERIES[name]
        # warm-up at the smallest sf: pays JIT/codegen, not the plan
        fn(spark, "/root/testdata/sf0.001").collect()
        release_tracked()
        spark.catalog.clearCache()
        reps = []
        for _ in range(args.reps):
            t0 = time.time()
            fn(spark, args.sf).collect()
            reps.append(round(time.time() - t0, 3))
            release_tracked()
            spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "query": name,
                    "sf": args.sf,
                    "reps": reps,
                    "min": min(reps),
                    "median": round(statistics.median(reps), 3),
                    "control": name == args.control,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
