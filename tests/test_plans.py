"""Orchestration tests: registry -> plan -> runner -> CLI, driving a
real 2-stage pipeline (clean -> feature mart) over the smoke data,
plus an end-to-end ML train/score/eval pipeline (EP3 shape)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from classification_pyspark_spark.catalog import load_table
from classification_pyspark_spark.plans.planner import create_job_plan
from classification_pyspark_spark.plans.registry import TaskStatus, register_processor
from classification_pyspark_spark.plans.runner import execute_job

SPEC = {
    "name": "feature-mart",
    "stages": [
        {"name": "clean", "tasks": [{"name": "clean-orders", "params": {"out": ""}}]},
        {"name": "features", "tasks": [{"name": "build-mart", "params": {"inp": "", "out": ""}}]},
    ],
}


@register_processor("feature-mart", "clean-orders")
def _clean_orders(spark, params):
    df = load_table(spark, params["sf_dir"], "orders")
    cleaned = df.dropDuplicates(["o_orderkey"]).filter(F.col("o_totalprice") > 0)
    cleaned.write.mode("overwrite").parquet(params["out"])
    return TaskStatus(True, f"{cleaned.count()} rows")


@register_processor("feature-mart", "build-mart")
def _build_mart(spark, params):
    orders = spark.read.parquet(params["inp"])
    mart = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("spend")
    )
    mart.write.mode("overwrite").parquet(params["out"])
    return TaskStatus(True, f"{mart.count()} customers")


@register_processor("feature-mart", "boom")
def _boom(spark, params):
    raise RuntimeError("intentional failure")


def test_job_plan_and_execute(spark, sf_dir, tmp_path):
    clean_out = str(tmp_path / "clean")
    mart_out = str(tmp_path / "mart")
    spec = {
        "name": "feature-mart",
        "stages": [
            {"name": "clean", "tasks": [{"name": "clean-orders", "params": {"sf_dir": sf_dir, "out": clean_out}}]},
            {"name": "features", "tasks": [{"name": "build-mart", "params": {"inp": clean_out, "out": mart_out}}]},
        ],
    }
    plan = create_job_plan(spec)
    assert [s.name for s in plan.stages] == ["clean", "features"]
    results = execute_job(spark, plan)
    assert all(v.success for v in results.values())
    assert spark.read.parquet(mart_out).count() > 0


def test_failed_task_is_captured_not_raised(spark):
    spec = {
        "name": "feature-mart",
        "stages": [{"name": "s", "tasks": [{"name": "boom", "params": {}}]}],
    }
    results = execute_job(spark, create_job_plan(spec))
    st = results["s/boom"]
    assert not st.success and "intentional failure" in st.message


def test_cli_list_and_run(spark, sf_dir, tmp_path, capsys):
    import yaml

    from classification_pyspark_spark.plans.cli import main

    clean_out = str(tmp_path / "clean2")
    mart_out = str(tmp_path / "mart2")
    catalog = {
        "jobs": [
            {
                "name": "feature-mart",
                "stages": [
                    {"name": "clean", "tasks": [{"name": "clean-orders", "params": {"sf_dir": sf_dir, "out": clean_out}}]},
                    {"name": "features", "tasks": [{"name": "build-mart", "params": {"inp": clean_out, "out": mart_out}}]},
                ],
            }
        ]
    }
    cat_path = str(tmp_path / "jobs.yml")
    with open(cat_path, "w") as f:
        yaml.safe_dump(catalog, f)

    assert main(["list", "-c", cat_path]) == 0
    assert "feature-mart" in capsys.readouterr().out
    assert main(["run", "-c", cat_path, "-j", "feature-mart"]) == 0
    assert main(["run", "-c", cat_path, "-j", "nope"]) == 2
    assert os.path.isdir(mart_out)


def test_ml_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """EP3 shape: features -> outlier cap -> impute -> assemble ->
    logistic fit -> score -> metrics + importances (SURVEY §3 EP3)."""
    from classification_pyspark_spark.functions.metrics import (
        auc_roc,
        binary_classification_metrics,
    )
    from classification_pyspark_spark.operators.encode import generate_features_vector
    from classification_pyspark_spark.operators.impute import Imputer
    from classification_pyspark_spark.operators.models import (
        feature_importance,
        prediction_label_expr,
        score,
        train,
    )
    from classification_pyspark_spark.operators.outliers import IQR, OutlierTreatment
    from classification_pyspark_spark.operators.sampling import stratified_split
    from classification_pyspark_spark.queries import QUERIES
    from classification_pyspark_spark.sources.io import load_model, save_model

    mart = QUERIES["flagship_customer_features"](spark, sf_dir)
    feats = ["recency_days", "n_orders", "total_spend", "total_qty", "total_revenue"]
    capped = OutlierTreatment(feats, method=IQR).fit(mart).transform(mart)
    imputed = Imputer(cols=feats).fit(capped).transform(capped)
    assembled = generate_features_vector(imputed, feats).withColumnRenamed("target_var", "y")
    train_df, test_df = stratified_split(assembled, "y", 0.3, seed=42)

    model = train(train_df, "classification", "logistic", label_col="y")
    path = str(tmp_path / "lr_model")
    save_model(model, path)
    from pyspark.ml.classification import LogisticRegressionModel

    loaded = load_model(LogisticRegressionModel, path)
    scored = score(loaded, test_df).withColumn("score", prediction_label_expr())
    from pyspark.ml.functions import vector_to_array

    scored = scored.withColumn("p1", vector_to_array("probability")[1])
    m = binary_classification_metrics(scored, "y", "p1", 0.5).first()
    assert m.tp + m.fp + m.tn + m.fn == test_df.count()
    auc = auc_roc(scored, "y", "p1").first()[0]
    assert 0.0 <= auc <= 1.0

    imp = feature_importance(assembled, "features", "y")
    assert imp.numNonzeros() >= 0 and len(imp.toArray()) == len(feats)


def test_grid_search_cv(spark, sf_dir):
    """CrossValidator over the registry grid: the Spark-first form of
    the reference's sequential grid fits."""
    from classification_pyspark_spark.operators.encode import generate_features_vector
    from classification_pyspark_spark.operators.models import grid_search_cv
    from classification_pyspark_spark.queries import QUERIES

    mart = QUERIES["flagship_customer_features"](spark, sf_dir)
    feats = ["recency_days", "n_orders", "total_spend"]
    assembled = generate_features_vector(mart, feats).withColumnRenamed("target_var", "y")
    best, results = grid_search_cv(
        assembled, "classification", "logistic",
        {"regParam": [0.0, 0.1], "maxIter": 10},
        n_folds=2, parallelism=2,
    )
    assert len(results) == 2
    assert all(0.0 <= m <= 1.0 for _, m in results)
    assert {"regParam", "maxIter"} <= set(results[0][0])
    assert best.summary.totalIterations <= 10


def test_production_pipeline_end_to_end(spark, sf_dir, tmp_path, capsys):
    """The committed 4-job pipeline (production.py + examples/jobs.yml
    shape) chains data-cleaning -> feature-engineering -> training ->
    scoring through the CLI, like the reference's production/ scripts
    (SURVEY §0 item 6)."""
    import yaml

    from classification_pyspark_spark.plans.cli import main

    base = tmp_path / "pipe"
    params = {
        "clean": str(base / "clean"),
        "mart": str(base / "mart"),
        "model": str(base / "model"),
        "holdout": str(base / "holdout"),
        "scores": str(base / "scores"),
        "metrics": str(base / "metrics"),
    }
    catalog = {
        "jobs": [
            {"name": "data-cleaning", "stages": [{"name": "clean", "tasks": [
                {"name": "clean-tables", "params": {"sf_dir": sf_dir, "out": params["clean"]}}]}]},
            {"name": "feature-engineering", "stages": [{"name": "features", "tasks": [
                {"name": "build-mart", "params": {"inp": params["clean"], "out": params["mart"]}}]}]},
            {"name": "training", "stages": [{"name": "fit", "tasks": [
                {"name": "fit-classifier", "params": {"inp": params["mart"],
                 "model_out": params["model"], "holdout_out": params["holdout"]}}]}]},
            {"name": "scoring", "stages": [{"name": "score", "tasks": [
                {"name": "score-and-evaluate", "params": {"model_inp": params["model"],
                 "holdout_inp": params["holdout"], "scores_out": params["scores"],
                 "metrics_out": params["metrics"]}}]}]},
        ]
    }
    cat_path = str(tmp_path / "pipeline.yml")
    with open(cat_path, "w") as f:
        yaml.safe_dump(catalog, f)

    runs_path = str(tmp_path / "runs.jsonl")
    for job in ("data-cleaning", "feature-engineering", "training", "scoring"):
        assert main(["run", "-c", cat_path, "-j", job, "--fail-fast", "--track", runs_path]) == 0, job
        capsys.readouterr()

    # O4 parity: every task of the 4-job pipeline left a tracked run
    # record (params, status, wall time) plus a job summary line
    import json

    with open(runs_path) as f:
        records = [json.loads(line) for line in f]
    task_runs = [r for r in records if r["kind"] == "task_run"]
    job_ends = [r for r in records if r["kind"] == "job_end"]
    assert {r["task"] for r in task_runs} == {
        "clean-tables", "build-mart", "fit-classifier", "score-and-evaluate"
    }
    assert all(r["success"] and r["wall_s"] > 0 and r["params"] for r in task_runs)
    assert [r["job"] for r in job_ends] == [
        "data-cleaning", "feature-engineering", "training", "scoring"
    ]
    assert all(r["success"] and r["n_failed"] == 0 for r in job_ends)

    mart = spark.read.parquet(params["mart"])
    assert mart.count() > 0 and "target_var" in mart.columns
    scores = spark.read.parquet(params["scores"])
    assert scores.count() > 0
    assert set(scores.columns) == {"c_custkey", "y", "pred", "score"}
    metrics = spark.read.parquet(params["metrics"])
    row = metrics.first()
    assert 0.0 <= row["auc_roc"] <= 1.0


def test_examples_catalog_parses_and_lists(capsys):
    """The committed examples/jobs.yml must stay loadable and name all
    four pipeline jobs."""
    import os

    from classification_pyspark_spark.plans.cli import main

    cat = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples", "jobs.yml")
    assert main(["list", "-c", cat]) == 0
    out = capsys.readouterr().out
    for job in ("data-cleaning", "feature-engineering", "training", "scoring"):
        assert job in out


def test_tracker_factory_and_failure_records(spark, tmp_path):
    """create_tracker driver switch + a failing task still produces a
    run record with success=False (safe-runner parity)."""
    import json

    import pytest

    from classification_pyspark_spark.plans.planner import create_job_plan
    from classification_pyspark_spark.plans.registry import register_processor
    from classification_pyspark_spark.plans.runner import execute_job
    from classification_pyspark_spark.plans.tracking import (
        JsonlTracker,
        NullTracker,
        create_tracker,
        mlflow_available,
    )

    assert isinstance(create_tracker(None), NullTracker)
    assert isinstance(create_tracker({"driver": "none"}), NullTracker)
    assert isinstance(create_tracker(str(tmp_path / "r.jsonl")), JsonlTracker)
    with pytest.raises(ValueError, match="unknown tracker driver"):
        create_tracker({"driver": "bogus"})
    if not mlflow_available():
        with pytest.raises(ValueError, match="mlflow"):
            create_tracker({"driver": "mlflow"})

    @register_processor("track-test", "boom")
    def _boom(spark, params):
        raise RuntimeError("kaput")

    plan = create_job_plan(
        {"name": "track-test",
         "stages": [{"name": "s1", "tasks": [{"name": "boom", "params": {"x": 1}}]}]}
    )
    runs = str(tmp_path / "runs.jsonl")
    results = execute_job(spark, plan, tracker=create_tracker(runs))
    assert not results["s1/boom"].success
    records = [json.loads(line) for line in open(runs)]
    (task_run,) = [r for r in records if r["kind"] == "task_run"]
    assert task_run["success"] is False
    assert "RuntimeError" in task_run["message"]
    assert task_run["params"] == {"x": 1}
    (job_end,) = [r for r in records if r["kind"] == "job_end"]
    assert job_end["n_failed"] == 1 and job_end["success"] is False


def test_mlflow_tracker_nested_runs(tmp_path):
    """Live MlflowTracker exercise against a file-store backend
    (reference parity: ``task_runner.run_tracked_task`` opens a parent
    job run + one NESTED run per task, logging params/wall_s/stage/
    status tags — reference tracking.py:52-125 / task_runner.py:92-128).
    Auto-skips where the optional mlflow package is absent (this
    container); runs for real on any env that has it."""
    import pytest

    from classification_pyspark_spark.plans.tracking import (
        MlflowTracker,
        TaskRunRecord,
        create_tracker,
        mlflow_available,
    )

    if not mlflow_available():
        pytest.skip("mlflow not installed in this environment")

    import time

    import mlflow

    uri = "file://" + str(tmp_path / "mlruns")
    mlflow.set_tracking_uri(uri)
    tracker = create_tracker({"driver": "mlflow", "experiment": "t-exp"})
    assert isinstance(tracker, MlflowTracker)
    tracker.start_job("job1")
    now = time.time()
    tracker.log_task(
        TaskRunRecord(
            run_id="r1", job="job1", stage="s1", task="t1",
            params={"x": 1}, success=True, message="ok",
            wall_s=0.5, started_at=now, ended_at=now + 0.5,
        )
    )
    tracker.end_job("job1", n_tasks=1, n_failed=0, wall_s=0.5)

    exp = mlflow.get_experiment_by_name("t-exp")
    runs = mlflow.search_runs([exp.experiment_id], output_format="list")
    parents = [r for r in runs if "mlflow.parentRunId" not in r.data.tags]
    children = [r for r in runs if "mlflow.parentRunId" in r.data.tags]
    assert len(parents) == 1 and len(children) == 1
    assert parents[0].info.status == "FINISHED"
    assert parents[0].data.metrics["n_failed"] == 0
    child = children[0]
    assert child.data.tags["mlflow.parentRunId"] == parents[0].info.run_id
    assert child.data.params == {"x": "1"}
    assert child.data.tags["stage"] == "s1"
    assert child.data.tags["status"] == "Success"
    assert child.data.metrics["wall_s"] == 0.5


def test_corpus_curation_job(spark, sf_dir, tmp_path):
    """The corpus-curation production job runs through the orchestrator
    with the hot-bucket guards on, writing curated docs + drop report."""
    from classification_pyspark_spark import production  # noqa: F401 — registers processors
    from classification_pyspark_spark.plans.planner import create_job_plan
    from classification_pyspark_spark.plans.runner import execute_job

    out = str(tmp_path / "curated")
    report = str(tmp_path / "report")
    plan = create_job_plan(
        {"name": "corpus-curation",
         "stages": [{"name": "curate", "tasks": [
             {"name": "curate-documents",
              "params": {"sf_dir": sf_dir, "out": out, "report_out": report}}]}]}
    )
    results = execute_job(spark, plan)
    assert all(v.success for v in results.values()), results
    curated = spark.read.parquet(out)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert 0 < curated.count() <= docs.count()
    # curated output is exact-dedup clean
    assert curated.groupBy("text").count().filter("count > 1").count() == 0
    rep = spark.read.parquet(report)
    assert rep.count() == docs.select("source").distinct().count()
    assert {"n_docs", "n_dropped_lang", "n_dropped_quality"} <= set(rep.columns)


def test_corpus_curation_job_with_perplexity_gate(spark, sf_dir, tmp_path):
    """max_ppl composes the LM-perplexity filter into the curation
    chain: output shrinks (or stays equal) vs the ungated run and
    every surviving doc scores under the gate."""
    from classification_pyspark_spark import production  # noqa: F401 — registers processors
    from classification_pyspark_spark.operators.text import bigram_lm_perplexity
    from classification_pyspark_spark.plans.planner import create_job_plan
    from classification_pyspark_spark.plans.runner import execute_job

    out = str(tmp_path / "curated_ppl")
    out_ungated = str(tmp_path / "curated_noppl")
    report = str(tmp_path / "report_ppl")

    def run(params_out, extra):
        plan = create_job_plan(
            {"name": "corpus-curation",
             "stages": [{"name": "curate", "tasks": [
                 {"name": "curate-documents",
                  "params": {"sf_dir": sf_dir, "out": params_out, **extra}}]}]}
        )
        results = execute_job(spark, plan)
        assert all(v.success for v in results.values()), results

    run(out, {"max_ppl": 31.0, "report_out": report})
    run(out_ungated, {})
    curated = spark.read.parquet(out)
    ungated = spark.read.parquet(out_ungated)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scores = bigram_lm_perplexity(docs, "text", "doc_id", keep_threshold=31.0)
    over_gate = curated.join(
        scores.filter("keep = 0").select("doc_id"), "doc_id"
    )
    assert over_gate.count() == 0
    # the gate strictly shrinks output vs the same pipeline without it
    assert 0 < curated.count() < ungated.count()
    # and the drop report attributes the gated docs per source
    rep = spark.read.parquet(report)
    assert "n_dropped_ppl" in rep.columns
    from pyspark.sql import functions as SF

    assert rep.agg(SF.sum("n_dropped_ppl")).first()[0] > 0


def test_corpus_ingest_job_is_incremental(spark, sf_dir, tmp_path):
    """The corpus-ingest job drains the landing zone through the
    streaming dedup ingest; re-running it after new files land costs
    only the new files and never re-admits seen texts."""
    from classification_pyspark_spark import production  # noqa: F401 — registers processors
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.plans.planner import create_job_plan
    from classification_pyspark_spark.plans.runner import execute_job

    landing = str(tmp_path / "landing")
    load_table(spark, sf_dir, "documents").repartition(2).write.parquet(landing)
    params = {
        "landing": landing,
        "sink": str(tmp_path / "corpus"),
        "index": str(tmp_path / "index"),
        "checkpoint": str(tmp_path / "ckpt"),
    }
    plan_cfg = {
        "name": "corpus-ingest",
        "stages": [{"name": "ingest", "tasks": [{"name": "ingest-documents", "params": params}]}],
    }
    results = execute_job(spark, create_job_plan(plan_cfg))
    assert all(v.success for v in results.values()), results
    corpus = spark.read.parquet(params["sink"])
    n1 = corpus.count()
    assert n1 == corpus.select(F.md5("text")).distinct().count() > 0

    # second run: nothing new landed -> corpus unchanged
    results2 = execute_job(spark, create_job_plan(plan_cfg))
    assert all(v.success for v in results2.values())
    assert spark.read.parquet(params["sink"]).count() == n1


def test_corpus_ingest_neardup_job(spark, sf_dir, tmp_path):
    """The near-dup twin of the ingest job: orchestrated run drains the
    landing zone through the minhash-band ingest; a rerun admits
    nothing new, and the accepted corpus satisfies the unique-band
    invariant (no two accepted docs share an LSH band bucket)."""
    from classification_pyspark_spark import production  # noqa: F401 — registers processors
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.dedup_fuzzy import minhash_band_long
    from classification_pyspark_spark.plans.planner import create_job_plan
    from classification_pyspark_spark.plans.runner import execute_job

    landing = str(tmp_path / "landing")
    load_table(spark, sf_dir, "documents").limit(80).repartition(2).write.parquet(landing)
    params = {
        "landing": landing,
        "sink": str(tmp_path / "corpus"),
        "index": str(tmp_path / "index"),
        "checkpoint": str(tmp_path / "ckpt"),
    }
    plan_cfg = {
        "name": "corpus-ingest",
        "stages": [
            {"name": "ingest",
             "tasks": [{"name": "ingest-documents-neardup", "params": params}]}
        ],
    }
    results = execute_job(spark, create_job_plan(plan_cfg))
    assert all(v.success for v in results.values()), results
    corpus = spark.read.parquet(params["sink"])
    n1 = corpus.count()
    assert 0 < n1 <= 80
    bands = minhash_band_long(
        corpus.withColumn("__t", F.coalesce("text", F.lit(""))), "__t", "doc_id",
        rows_per_band=8, n_hashes=16, engine="universal",
    )
    assert bands.groupBy("band", "h").count().filter("count > 1").count() == 0

    results2 = execute_job(spark, create_job_plan(plan_cfg))
    assert all(v.success for v in results2.values())
    assert spark.read.parquet(params["sink"]).count() == n1


def test_corpus_ingest_cutspans_job(spark, sf_dir, tmp_path):
    """The surgical twin of the ingest job: the orchestrated run drains
    the landing zone through the span-cut ingest (docs land with their
    duplicated spans removed and a tokens_cut column); a rerun with
    nothing new landed changes nothing — the checkpoint skips the seen
    files, so the write-once sink is stable."""
    from classification_pyspark_spark import production  # noqa: F401 — registers processors
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.plans.planner import create_job_plan
    from classification_pyspark_spark.plans.runner import execute_job

    landing = str(tmp_path / "landing")
    load_table(spark, sf_dir, "documents").limit(80).repartition(2).write.parquet(landing)
    params = {
        "landing": landing,
        "sink": str(tmp_path / "corpus"),
        "index": str(tmp_path / "index"),
        "checkpoint": str(tmp_path / "ckpt"),
    }
    plan_cfg = {
        "name": "corpus-ingest",
        "stages": [
            {"name": "ingest",
             "tasks": [{"name": "ingest-documents-cutspans", "params": params}]}
        ],
    }
    results = execute_job(spark, create_job_plan(plan_cfg))
    assert all(v.success for v in results.values()), results
    corpus = spark.read.parquet(params["sink"])
    n1 = corpus.count()
    assert 0 < n1 <= 80
    assert "tokens_cut" in corpus.columns
    snap = sorted((r["doc_id"], r["tokens_cut"]) for r in corpus.collect())

    results2 = execute_job(spark, create_job_plan(plan_cfg))
    assert all(v.success for v in results2.values())
    again = sorted(
        (r["doc_id"], r["tokens_cut"])
        for r in spark.read.parquet(params["sink"]).collect()
    )
    assert again == snap


def test_curation_keeps_higher_quality_near_dup(spark, tmp_path):
    """Near-dup removal keeps the best-quality copy, not the lowest id."""
    from classification_pyspark_spark import production  # noqa: F401
    from classification_pyspark_spark.operators.text import quality_score_expr
    from classification_pyspark_spark.plans.planner import create_job_plan
    from classification_pyspark_spark.plans.runner import execute_job

    base = (
        "the quick brown fox jumps over the lazy dog and then walks away "
        "to find some food in the quiet forest near the old stone bridge"
    )
    degraded = base + " ..... !!!!! ;;;;; ##### %%%%%"  # same shingles + punct spam
    rows = [(1, degraded, "src0", "en"), (2, base, "src0", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    qs = {
        r["doc_id"]: r["q"]
        for r in df.select("doc_id", quality_score_expr("text").alias("q")).collect()
    }
    assert qs[2] > qs[1]  # the higher id is the better copy
    sf = str(tmp_path / "sf")
    df.withColumn("n_chars", F.length("text")).write.parquet(f"{sf}/documents.parquet")
    out = str(tmp_path / "curated")
    plan = create_job_plan(
        {"name": "corpus-curation", "stages": [{"name": "curate", "tasks": [
            {"name": "curate-documents",
             "params": {"sf_dir": sf, "out": out, "min_quality": 0.0}}]}]}
    )
    results = execute_job(spark, plan)
    assert all(v.success for v in results.values()), results
    kept = [r["doc_id"] for r in spark.read.parquet(out).collect()]
    assert kept == [2]  # quality won over doc_id order


def test_corpus_curation_job_surgical_cut_spans(spark, tmp_path):
    """cut_spans=true: the job rewrites survivor docs with their
    duplicated spans removed. Known-answer fixture: a self-repeating
    doc (prefix + block + block) keeps exactly its prefix and reports
    tokens_cut = 2x block; a clean doc with ORIGINAL casing and
    punctuation passes through byte-identical with tokens_cut 0
    (ADVICE r8: untouched docs must not be lossy-normalized); a doc
    that is nothing but a repeated block is cut to zero — dropped
    from the sink, but its full token count lands in the report's
    tokens_cut and it shows up in the new n_dropped_cut column so the
    per-source funnel ties out."""
    from classification_pyspark_spark import production  # noqa: F401 — registers processors
    from classification_pyspark_spark.operators.text import langid_expr
    from classification_pyspark_spark.plans.planner import create_job_plan
    from classification_pyspark_spark.plans.runner import execute_job

    prefix = "the and of is to " + " ".join("h%d" % i for i in range(10))
    block = " ".join("b%02d" % i for i in range(60))
    clean = (
        "The and of is to "
        + " ".join("u%02d" % i for i in range(40))
        + ", with Casing kept!"
    )
    cblock = " ".join("c%02d" % i for i in range(60))  # disjoint vocab: no
    # shingles shared with doc 1, so the near-dup stage can't collapse it
    all_cut = f"{cblock} {cblock}"
    # lang must equal the heuristic's verdict or the lang filter eats the
    # doc before the span stage — compute it rather than hardcoding
    lang3 = spark.createDataFrame([(all_cut,)], "t string").select(
        langid_expr("t").alias("lg")
    ).first()["lg"]
    sf = str(tmp_path / "data")
    spark.createDataFrame(
        [
            (1, f"{prefix} {block} {block}", "en", "s0", 1),
            (2, clean, "en", "s1", 1),
            (3, all_cut, lang3, "s2", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = str(tmp_path / "curated_cut")
    report = str(tmp_path / "report_cut")
    plan = create_job_plan(
        {"name": "corpus-curation",
         "stages": [{"name": "curate", "tasks": [
             {"name": "curate-documents",
              "params": {"sf_dir": sf, "out": out, "report_out": report,
                         "min_quality": 0.0, "cut_spans": True}}]}]}
    )
    results = execute_job(spark, plan)
    assert all(v.success for v in results.values()), results
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert got[1]["text"] == prefix and got[1]["tokens_cut"] == 120
    assert got[2]["text"] == clean and got[2]["tokens_cut"] == 0
    assert 3 not in got  # cut to nothing -> dropped from the sink
    rep = {r["source"]: r for r in spark.read.parquet(report).collect()}
    assert rep["s0"]["tokens_cut"] == 120 and rep["s1"]["tokens_cut"] == 0
    assert rep["s2"]["tokens_cut"] == 120  # zero-kept doc's FULL token count
    assert rep["s2"]["n_dropped_cut"] == 1
    assert rep["s0"]["n_dropped_cut"] == 0 and rep["s1"]["n_dropped_cut"] == 0


def test_corpus_ingest_three_stage_chain(spark, sf_dir, tmp_path):
    """The three streaming ingest modes COMPOSE in one orchestrated
    pipeline over a single landing zone: exact-digest dedup drains the
    landing, near-dup minhash drains the exact sink, span-cut drains
    the near-dup sink (each stage's epoch-partitioned sink is the next
    stage's file-source landing — same 5-column schema). The final
    corpus has no exact duplicates, no shared LSH band buckets, and no
    >= min_span duplicated token spans left to cut."""
    from classification_pyspark_spark import production  # noqa: F401 — registers processors
    from classification_pyspark_spark.catalog import load_table
    from classification_pyspark_spark.operators.dedup_fuzzy import (
        duplicated_span_extents,
        minhash_band_long,
    )
    from classification_pyspark_spark.plans.planner import create_job_plan
    from classification_pyspark_spark.plans.runner import execute_job

    landing = str(tmp_path / "landing")
    load_table(spark, sf_dir, "documents").limit(120).repartition(2).write.parquet(landing)
    s1, s2, s3 = (str(tmp_path / f"sink{i}") for i in (1, 2, 3))
    plan_cfg = {
        "name": "corpus-ingest",
        "stages": [
            {"name": "exact", "tasks": [{"name": "ingest-documents", "params": {
                "landing": landing, "sink": s1,
                "index": str(tmp_path / "idx1"), "checkpoint": str(tmp_path / "ck1")}}]},
            {"name": "neardup", "tasks": [{"name": "ingest-documents-neardup", "params": {
                "landing": s1, "sink": s2,
                "index": str(tmp_path / "idx2"), "checkpoint": str(tmp_path / "ck2")}}]},
            {"name": "cutspans", "tasks": [{"name": "ingest-documents-cutspans", "params": {
                "landing": s2, "sink": s3,
                "index": str(tmp_path / "idx3"), "checkpoint": str(tmp_path / "ck3")}}]},
        ],
    }
    results = execute_job(spark, create_job_plan(plan_cfg))
    assert all(v.success for v in results.values()), results
    final = spark.read.parquet(s3).drop("epoch")
    n = final.count()
    assert 0 < n <= 120
    # no exact dups survived
    assert final.select(F.md5(F.coalesce("text", F.lit("")))).distinct().count() == n
    # no two docs share an LSH band bucket (near-dup invariant holds
    # through the span stage: cutting spans from docs the band index
    # already accepted cannot introduce a collision among SURVIVORS
    # of the same run; assert on the pre-cut stage-2 sink)
    s2df = spark.read.parquet(s2).drop("epoch")
    bands = minhash_band_long(
        s2df.withColumn("__t", F.coalesce("text", F.lit(""))), "__t", "doc_id",
        rows_per_band=8, n_hashes=16, engine="universal",
    )
    assert bands.groupBy("band", "h").count().filter("count > 1").count() == 0
    # and the final corpus has no remaining >= 50-token duplicated span
    assert duplicated_span_extents(final, "text", "doc_id").count() == 0
