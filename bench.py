"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "baseline_delta": {name: sec/baseline_sec, ...},
   "regressions": [names over the 2x gate]}

Each query is executed to completion (results drained via a count-style
action over all columns) but never collected to the driver.

Per-query baselines live in bench_baseline.json (recorded from the
round-2 driver run at sf0.1); any headline query slower than 2x the
FLEET-MEDIAN drift vs its baseline (and by at least +0.5 s absolute)
is reported in "regressions" and fails tools/bench_gate.py — the
BASELINE.md "within 2x" bar as a gate, normalized so that uniform
host-contention drift (which moves every query equally) never reads
as a plan regression. "baseline_drift" records that median.
Deltas are only reported when the run matches the baseline's sf.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from classification_pyspark_spark.operators.caching import release_tracked  # noqa: E402
from classification_pyspark_spark.queries import QUERIES  # noqa: E402
from classification_pyspark_spark.session import get_spark  # noqa: E402

# Headline set: spans scans, multi-way joins, aggregation, window dedup,
# profiling, windows/sessionization, the heaviest TPC-H shapes (q2/q9/
# q21 multi-join + EXISTS plans), and the LLM-pipeline extensions
# (text stats, minhash + n-gram dedup, embedding kNN + LSH).
HEADLINE = [
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q21_suppliers_kept_waiting",
    "ngram_jaccard_pairs",
    "flagship_customer_features",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "dedup_keep_first",
    "describe_numeric_approx",
    "correlation_matrix",
    "outlier_summary",
    "window_topk_per_group",
    "sessionize_events",
    "window_tumbling_hourly",
    "text_stats",
    "tfidf_top_terms",
    "dedup_exact_text",
    "minhash_dup_pairs",
    "knn_bruteforce",
    "knn_ivf",
    "lsh_buckets",
    "q18_large_volume_customers",
    "q10_returned_items",
    "rolling_spend_30d",
    "cdc_merge_upsert",
    "funnel_view_to_purchase",
    "top_bigrams",
    "doc_chunks",
    "sequence_packing",
    "corpus_curation",
    "embedding_centroids",
    "repetition_stats",
    "training_export",
    # round-3 additions: the heaviest new plan shapes.
    # tfidf_cosine_pairs is deliberately NOT here: the synthetic corpus
    # has a 31-token vocabulary, so single-token postings are ~|block|
    # long and the exact posting self-join degenerates to all-pairs
    # (~10 s at sf0.1) — a property of this data, not the plan; the
    # production posture is the max_posting_size cap (tested), and the
    # exact query stays oracle-checked at sf0.01.
    "lm_perplexity_filter",
    "duplicated_ngram_spans",
    "lift_gain_table",
    # retrieval / sketch / stream-twin batch additions
    "bm25_keyword_topk",
    "incremental_distinct_sketch",
    "view_abandonment_daily",
    "table_diff_reconciliation",
    "sliding_distinct_users_sketch",
    # round-4 additions: the plan shapes this round optimized, so future
    # rounds get regression detection on them (segment-blocked simhash,
    # banded levenshtein, single-buffer exact percentile)
    "simhash_hamming_pairs",
    "edit_distance_pairs",
    "boxplot_stats_lineitem",
    # round-4 capability additions: MG two-pass heavy hitters, trailing
    # z-score anomaly days, gaps-and-islands streaks, Arrow UDTF chunking
    "heavy_hitters_tokens",
    "anomaly_rolling_zscore",
    "gaps_islands_activity",
    "udtf_word_windows",
    # round-5 addition: the triangle-split + persisted-base GEMM pair
    # plan, so the degenerate-bucket guard keeps regression coverage
    "embedding_dup_pairs",
    # round-6 additions: the curation-stage plan shapes this round
    # tuned (cluster-bucketed GEMM prune, vocab-bounded LM broadcast,
    # zero-shuffle polynomial winnowing, packed-long char-gram eval)
    "semdedup_prune",
    "dsir_importance_weights",
    "winnowing_fingerprints",
    "chrf_halves_overlap",
    # round-6 wave 5-7 additions: the plan shapes those waves tuned
    # (bounded-broadcast bloom probe with persisted train sets,
    # first-occurrence-aggregate + range-partitioned cumsum Heaps
    # curve, persisted-margin PMI posting shape, value-domain-grid KS)
    "bloom_decontamination",
    "heaps_vocab_growth",
    "pmi_collocations",
    "ks_two_sample_drift",
    "duplicated_spans_maximal",
    "corpus_curation_full",
    # round-8 additions: the wave-11 span queries (previously swept but
    # not gated — a regression in them could not trip bench_gate) and
    # the two round-8 plan shapes (extent-verified exact spans, span
    # surgery + interval-union curation)
    "substring_dedup_apply",
    "contaminated_spans",
    "duplicated_spans_exact",
    "corpus_curation_surgical",
    "substring_dedup_rewrite",
    "duplicated_spans_cover",
    # round-9: the pre-shuffle min_count cap twin (bucket-bounded first
    # exchange; the network-bound-cluster knob for the top_bigrams
    # inherent-cost case)
    "top_bigrams_capped",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    names = [n for n in HEADLINE if n in QUERIES]
    # Warm-up: run every headline plan shape once at the smallest SF
    # (sf0.001) so the timed pass measures steady-state execution, not
    # one-time JVM costs (whole-stage-codegen compilation, Arrow/pandas
    # worker startup, broadcast thread pools). Generated code is keyed
    # by plan shape, so the tiny-SF run compiles exactly the code the
    # timed run reuses. Falls back to the target dir if sf0.001 is
    # absent. Warm-up failures are ignored; the timed run reports them.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    # min of 3 executions per query: steady-state timing (the first
    # run can absorb stray GC / lingering JIT work even after the
    # sf0.001 warm-up pass; round-6 observed back-to-back sessions
    # where min-of-2 still caught a scheduler hiccup on BOTH reps of a
    # different query each run — a third rep collapses that tail, and
    # taking the min can only move readings TOWARD the recorded
    # baselines, never away). The cache is cleared before EVERY timed
    # execution so intra-query persists never leak between reps or
    # queries — each rep pays the query's full cost from the scans up.
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(3):
            release_tracked()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    # Calibration probe: a fixed, code-independent JVM workload (range
    # sum + shuffle) timed min-of-3. Its drift vs its recorded baseline
    # measures the HOST, not this repo's code — the disambiguator for
    # uniform slowdowns: queries drifted but calibration flat => a real
    # everywhere-regression in shared code; both drifted => contention.
    cal = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).selectExpr("id % 97 AS k", "id AS v").groupBy(
            "k"
        ).sum("v").write.format("noop").mode("overwrite").save()
        cal = min(cal, time.perf_counter() - t0)
    calibration = round(cal, 3)
    out = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "calibration_sec": calibration,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        if str(out["sf"]) == str(baseline.get("sf")):
            base_q = baseline.get("queries", {})
            # Baselines were recorded across sessions with different
            # host contention. record_calibration stores the
            # calibration-probe reading AT RECORD TIME for entries
            # recorded under drift; deflating such a baseline by
            # (global quiet-host calibration / its record calibration)
            # puts every entry in ONE calibration regime, so a baseline
            # recorded on a 1.7x-slower host doesn't carry a 1.7x-looser
            # regression gate than its neighbors.
            base_cal_global = baseline.get("calibration_sec") or 1.0
            rec_cal = baseline.get("record_calibration", {})
            eff_base = {
                n: b * (base_cal_global / rec_cal[n]) if rec_cal.get(n) else b
                for n, b in base_q.items()
            }
            deltas = {
                n: round(t / eff_base[n], 2)
                for n, t in timings.items()
                if eff_base.get(n)
            }
            out["baseline_delta"] = deltas
            # Regression detection must separate "this query's PLAN got
            # worse" from "this box is slower today". Raw wall-clock vs
            # a frozen baseline false-positives two ways: sub-second
            # queries see 3-4x "ratios" from a few hundred ms of task-
            # scheduling/GC noise, and host contention shifts the WHOLE
            # fleet 1.3-1.7x uniformly. So: normalize each query's
            # delta by the median delta across all queries (uniform
            # drift cancels), and require both >2x the fleet median and
            # +0.5 s absolute before calling it a regression.
            med = sorted(deltas.values())[len(deltas) // 2] if deltas else 1.0
            out["baseline_drift"] = round(med, 2)
            # Diagnostic (not a gate input): per-size-cohort drift
            # medians. Host contention is not always uniform — observed
            # 2026-08-17: the synthetic probe read QUIET (0.96x) while
            # query-domain anchors ran 1.73x and sub-second queries
            # 3-4x (scheduling/latency-bound, invisible to a
            # throughput probe). When the sub-1s cohort median is far
            # above the over-1s cohort median, a regression list
            # dominated by small queries is that contention profile,
            # not a plan change — adjudicate with isolated min-of-4
            # retimes before believing it.
            sub = sorted(d for n, d in deltas.items() if eff_base.get(n, 9.0) < 1.0)
            over = sorted(d for n, d in deltas.items() if eff_base.get(n, 0.0) >= 1.0)
            out["cohort_drift"] = {
                "sub_1s": round(sub[len(sub) // 2], 2) if sub else None,
                "over_1s": round(over[len(over) // 2], 2) if over else None,
            }
            # Two regression signals:
            # - moderate ratio-over-drift with a solid absolute delta
            #   (>0.5 s) — catches real slowdowns on the bigger queries;
            # - extreme ratio-over-drift (>4x) with a smaller absolute
            #   floor (>0.25 s) — so sub-second queries aren't
            #   permanently ungated, while the worst observed pure-noise
            #   swing (3.5x over drift) still stays under the bar.
            out["regressions"] = sorted(
                n
                for n, d in deltas.items()
                for r in [d / max(med, 0.1)]
                for dt in [timings[n] - eff_base[n]]
                if (r > 2.0 and dt > 0.5) or (r > 4.0 and dt > 0.25)
            )
            # Uniform slowdowns cancel out of the per-query ratios, so a
            # genuine everywhere-regression (shared code/session config)
            # looks exactly like host contention — UNLESS the
            # code-independent calibration probe disambiguates: queries
            # drifted >2x while calibration stayed near its baseline
            # means the CODE regressed everywhere, and that FAILS the
            # gate (the __uniform__ sentinel); calibration drifting
            # along with the fleet means the host, which only WARNs.
            out["fleet_drift_exceeds_2x"] = med > 2.0
            base_cal = baseline.get("calibration_sec")
            if base_cal:
                out["calibration_delta"] = round(calibration / base_cal, 2)
                if med > 2.0 and out["calibration_delta"] < 1.5:
                    out["regressions"] = sorted({*out["regressions"], "__uniform__"})
    # Self-defense (r10, VERDICT r09 item 5): ALSO write the contract
    # object to a file next to the stdout line — round 8's
    # round-over-round comparison was lost to a truncated driver
    # capture of the stdout tail; the file makes the record
    # independently recoverable. The stdout contract line is unchanged.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_last.json"),
            "w",
        ) as f:
            json.dump(out, f)
    except OSError:
        pass  # read-only checkout must not break the contract output
    print(json.dumps(out))


if __name__ == "__main__":
    main()
