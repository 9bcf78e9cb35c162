"""One-point scale probe above bench scale (VERDICT r3 §5).

sf0.1 hides constant factors (band-bucket sizes, posting-list skew,
shuffle setup); this probe times the heaviest headline queries at sf0.1
and sf1 over the SAME generator (tools/gen_scale_data.py) and reports
the per-query time ratio for a 10× data increase. Near-linear operators
land well under ~12×; anything super-linear is a scaling bug the sf0.1
bench cannot see.

Writes BENCH_sf1.json at the repo root:
  {"queries": {name: {"sf0.1_sec": s, "sf1_sec": s, "ratio": r}},
   "max_ratio": r, "near_linear": bool}

Usage: python tools/scale_probe.py [--regen]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMALL = os.path.join(REPO, ".localdata", "sf0.1g")
BIG = os.path.join(REPO, ".localdata", "sf1")

# the heaviest headline queries of BENCH_r03 plus one representative of
# each scale-sensitive operator family: keyed-checksum reconciliation
# (lineitem x2), zero-join bigram LM (documents), per-gram doc counts
# (documents), the flagship mart (orders+lineitem joins), the
# broadcast-join profit chain, LSH banding (minhash), distributed
# prefix-sum packing, posting-join retrieval (bm25), window
# sessionization (events), and Arrow-batched brute-force ANN
PROBE = [
    "table_diff_reconciliation",
    "lm_perplexity_filter",
    "duplicated_ngram_spans",
    "flagship_customer_features",
    "q9_product_profit",
    "minhash_dup_pairs",
    "sequence_packing",
    "bm25_keyword_topk",
    "sessionize_events",
    "knn_bruteforce",
]


def _ensure_data(regen: bool) -> None:
    for sf, path in [("0.1", SMALL), ("1", BIG)]:
        if regen or not os.path.isdir(os.path.join(path, "lineitem.parquet")):
            subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "gen_scale_data.py"), sf, path],
                check=True,
            )


def main() -> int:
    regen = "--regen" in sys.argv
    _ensure_data(regen)

    from classification_pyspark_spark.operators.caching import release_tracked
    from classification_pyspark_spark.queries import QUERIES
    from classification_pyspark_spark.session import get_spark

    spark = get_spark("scale-probe")

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):  # min-of-2: steady-state, same policy as bench.py
            release_tracked()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    # warm codegen/broadcast pools once per query shape at the small SF
    for name in PROBE:
        run(name, SMALL)

    out: dict[str, dict] = {}
    for name in PROBE:
        s_small = run(name, SMALL)
        s_big = run(name, BIG)
        ratio = round(s_big / s_small, 2) if s_small > 0 else float("inf")
        out[name] = {
            "sf0.1_sec": round(s_small, 3),
            "sf1_sec": round(s_big, 3),
            "ratio": ratio,
        }
        print(f"{name}: {s_small:.2f}s -> {s_big:.2f}s = {ratio}x")

    max_ratio = max(v["ratio"] for v in out.values())
    result = {
        "probe": "sf0.1 -> sf1 (10x rows, same generator)",
        "queries": out,
        "max_ratio": max_ratio,
        "near_linear": max_ratio <= 12.0,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    path = os.path.join(REPO, "BENCH_sf1.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0 if result["near_linear"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
