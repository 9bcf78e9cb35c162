"""Structured Streaming tests: file-source events stream -> watermarked
windows / session windows / stateful dedup, drained with the
available-now trigger into memory sinks."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from classification_pyspark_spark.catalog import load_table
from classification_pyspark_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_windows,
    sliding_rates,
    stateful_dedup,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Stage the events table as a parquet landing-zone directory with
    normalized (microsecond) timestamps."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_tumbling_counts_match_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    run_to_memory(tumbling_counts(stream), "t_tumbling", output_mode="append")
    got = spark.table("t_tumbling")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    # the streaming result (watermark-closed windows) must agree with
    # the batch computation on every emitted window
    joined = got.alias("s").join(
        batch.alias("b"), on=["window_start", "event_type"], how="inner"
    )
    assert joined.count() == got.count() > 0
    mismatches = joined.filter(
        (F.col("s.n") != F.col("b.n"))
        | (F.abs(F.col("s.sum_value") - F.col("b.sum_value")) > 1e-6)
    )
    assert mismatches.count() == 0


def test_sliding_and_session_windows_run(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=4)
    run_to_memory(sliding_rates(stream), "t_sliding", output_mode="append")
    sliding = spark.table("t_sliding")
    assert sliding.count() > 0
    # a 10min/5min sliding window must produce ~2x tumbling rows per key
    run_to_memory(session_windows(stream), "t_sessions", output_mode="append")
    sessions = spark.table("t_sessions")
    assert sessions.count() > 0
    assert sessions.filter(F.col("session_end") < F.col("session_start")).count() == 0


def test_stateful_dedup_drops_duplicates(spark, events_dir, tmp_path_factory):
    dup_dir = str(tmp_path_factory.mktemp("events_dup"))
    base = spark.read.parquet(events_dir)
    base.unionByName(base.limit(200)).repartition(3).write.mode("overwrite").parquet(dup_dir)
    stream = read_events_stream(spark, dup_dir, max_files_per_trigger=10)
    run_to_memory(stateful_dedup(stream), "t_dedup", output_mode="append")
    got = spark.table("t_dedup")
    n_unique = base.select("event_id").distinct().count()
    assert got.select("event_id").distinct().count() == n_unique
    assert got.count() == n_unique
    shutil.rmtree(dup_dir, ignore_errors=True)


def test_stream_static_enrichment(spark, sf_dir, events_dir):
    from classification_pyspark_spark.streaming.events import enrich_with_dim

    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=10)
    run_to_memory(
        enrich_with_dim(stream, dim).select("event_id", "user_id", "c_mktsegment"),
        "t_enriched",
        output_mode="append",
    )
    got = spark.table("t_enriched")
    base = spark.read.parquet(events_dir)
    # left join: every event survives exactly once
    assert got.count() == base.count()
    batch_matched = (
        base.join(dim, base.user_id == dim.c_custkey, "left")
        .filter(F.col("c_mktsegment").isNotNull())
        .count()
    )
    assert got.filter(F.col("c_mktsegment").isNotNull()).count() == batch_matched


def test_stream_stream_join_matches_batch(spark, sf_dir, events_dir):
    from classification_pyspark_spark.queries import QUERIES
    from classification_pyspark_spark.streaming.events import view_purchase_conversions

    # single micro-batch drain (all files in one trigger): no watermark
    # eviction can fire mid-stream, so the emitted set must equal batch
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=100)
    run_to_memory(view_purchase_conversions(stream), "t_conversions", output_mode="append")
    got = spark.table("t_conversions").select("view_id", "purchase_id")
    batch = QUERIES["funnel_view_to_purchase"](spark, sf_dir).select("view_id", "purchase_id")
    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_foreachbatch_view_maintenance_matches_batch(spark, sf_dir, events_dir, tmp_path_factory):
    """The foreachBatch-maintained per-user view must equal a batch
    recompute over the full history after the stream drains —
    mergeable-partials correctness under multi-trigger arrival."""
    from classification_pyspark_spark.streaming.events import maintain_user_stats_view

    base = tmp_path_factory.mktemp("view_maint")
    view = str(base / "view")
    ckpt = str(base / "ckpt")
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    maintain_user_stats_view(stream, view, ckpt)

    got = spark.read.parquet(view)
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
    )
    assert got.count() == want.count()
    # counts and max-ts merge exactly; float sums merge to rounding noise
    diff = (
        got.alias("g")
        .join(want.alias("w"), "user_id")
        .filter(
            (F.col("g.n_events") != F.col("w.n_events"))
            | (F.col("g.last_ts") != F.col("w.last_ts"))
            | (F.abs(F.col("g.total_value") - F.col("w.total_value")) > 1e-6)
        )
    )
    assert diff.count() == 0


def test_foreachbatch_merge_skips_replayed_epoch(spark, sf_dir, tmp_path_factory):
    """foreachBatch is at-least-once: after a crash between swap and
    checkpoint commit, the restarted trigger re-delivers the same
    epoch. The merge must be effectively-once — replaying an applied
    epoch_id must not double-count."""
    from classification_pyspark_spark.streaming.events import merge_stats_batch

    base = tmp_path_factory.mktemp("view_replay")
    view = str(base / "view")
    batch = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "value", "ts")
        .limit(200)
    )
    merge_stats_batch(batch, 0, view)
    first = {r["user_id"]: (r["n_events"], r["total_value"]) for r in
             spark.read.parquet(view).collect()}

    merge_stats_batch(batch, 0, view)  # replay of the SAME epoch: no-op
    replayed = {r["user_id"]: (r["n_events"], r["total_value"]) for r in
                spark.read.parquet(view).collect()}
    assert replayed == first

    merge_stats_batch(batch, 1, view)  # a NEW epoch still merges
    after = {r["user_id"]: r["n_events"] for r in spark.read.parquet(view).collect()}
    assert after == {u: 2 * n for u, (n, _) in first.items()}


def test_file_sink_checkpoint_restart_resumes(spark, sf_dir, tmp_path_factory):
    """File-source -> file-sink with a durable checkpoint must survive
    a deliberate stop/restart: the restarted query processes ONLY
    files that arrived after the stop (offsets from the checkpoint),
    and every input row lands in the sink exactly once — a re-run from
    scratch would double-write the first wave into the append sink."""
    import glob
    import os

    from classification_pyspark_spark.streaming.events import (
        read_events_stream,
        run_to_files,
    )

    base = tmp_path_factory.mktemp("restart")
    landing = str(base / "landing")
    out = str(base / "out")
    ckpt = str(base / "ckpt")

    events = load_table(spark, sf_dir, "events")
    events.repartition(4).write.mode("overwrite").parquet(str(base / "all"))
    files = sorted(glob.glob(str(base / "all" / "*.parquet")))
    assert len(files) == 4
    os.makedirs(landing)

    # stateless projection: isolates the recovery semantics under test
    # (source offset tracking + file-sink commit log) from watermark
    # state, which would legitimately drop late rows across waves
    def pipeline():
        return read_events_stream(spark, landing).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )

    # wave 1: two files arrive; run to termination (deliberate stop)
    for f in files[:2]:
        shutil.copy(f, os.path.join(landing, os.path.basename(f)))
    run_to_files(pipeline(), out, ckpt)
    n_wave1 = spark.read.parquet(out).count()
    assert 0 < n_wave1 < events.count()

    # wave 2: remaining files arrive; RESTART with the same checkpoint
    for f in files[2:]:
        shutil.copy(f, os.path.join(landing, os.path.basename(f)))
    run_to_files(pipeline(), out, ckpt)

    got = spark.read.parquet(out)
    # exactly-once across the restart: total equals the full batch
    # table (a from-scratch re-run would double-write wave 1 into the
    # append sink; a lost checkpoint would gap wave 1)
    assert got.count() == events.count()
    assert (
        got.groupBy("event_id").count().filter("count > 1").count()
        == events.groupBy("event_id").count().filter("count > 1").count()
    )
    assert got.count() > n_wave1


def test_foreachbatch_merge_survives_crash_mid_swap(spark, sf_dir, tmp_path_factory):
    """A crash between the swap's two renames leaves the view dir
    absent and the previous state in .old; the next merge must recover
    that state instead of rebuilding from the current batch alone."""
    import os

    from classification_pyspark_spark.streaming.events import merge_stats_batch

    base = tmp_path_factory.mktemp("view_crash")
    view = str(base / "view")
    batch = load_table(spark, sf_dir, "events").select("user_id", "value", "ts").limit(200)
    merge_stats_batch(batch, 0, view)

    # simulate the crash window: view renamed aside, replacement never landed
    shutil.move(view, view + ".old")
    assert not os.path.exists(view)

    merge_stats_batch(batch, 1, view)  # must merge WITH the .old state
    after = {r["user_id"]: r["n_events"] for r in spark.read.parquet(view).collect()}
    per_user = {r["user_id"]: r["n"] for r in
                batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert after == {u: 2 * n for u, n in per_user.items()}
    assert not os.path.exists(view + ".old")  # cleaned after a successful swap


def test_foreachbatch_merge_refuses_foreign_checkpoint(spark, sf_dir, tmp_path_factory):
    """Epoch ids are only monotonic within one checkpoint: a view built
    under checkpoint A must refuse merges tagged with checkpoint B
    (silently continuing would drop or double-merge batches)."""
    import pytest

    from classification_pyspark_spark.streaming.events import merge_stats_batch

    base = tmp_path_factory.mktemp("view_ckpt")
    view = str(base / "view")
    batch = load_table(spark, sf_dir, "events").select("user_id", "value", "ts").limit(50)
    merge_stats_batch(batch, 0, view, checkpoint_tag="ckpt-A")
    with pytest.raises(RuntimeError, match="checkpoint"):
        merge_stats_batch(batch, 0, view, checkpoint_tag="ckpt-B")


def test_stream_stream_left_outer_abandonment(spark, sf_dir, events_dir):
    from classification_pyspark_spark.streaming.events import (
        conversion_cond,
        conversion_sides,
        view_abandonment,
    )

    # single micro-batch drain (all files in one trigger), like the
    # inner-join twin above: batch 1 runs at watermark 0, so no input
    # is ever dropped as late and the completeness bound below is
    # exact. A multi-batch drain of time-interleaved files would
    # legitimately drop views arriving below the advanced watermark
    # (the operator's documented late-data semantics), making
    # completeness depend on the file split.
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=100)
    run_to_memory(view_abandonment(stream), "t_abandoned", output_mode="append")
    got = {r["view_id"] for r in spark.table("t_abandoned").select("view_id").collect()}

    ev = load_table(spark, sf_dir, "events")
    v, p = conversion_sides(ev)
    batch = v.join(p, conversion_cond(), "left_anti").select("view_id", "view_ts").collect()
    batch_ids = {r["view_id"] for r in batch}
    # 1) soundness: everything the stream emitted is truly abandoned
    assert got <= batch_ids
    # 2) completeness up to the watermark: an unmatched view old enough
    #    that the FINAL watermark (max_ts - 2h) passed view_ts + 1h has
    #    provably no future match and must have been emitted
    max_ts = ev.agg(F.max("ts")).first()[0]
    import datetime

    cutoff = max_ts - datetime.timedelta(hours=3, minutes=5)
    must_emit = {r["view_id"] for r in batch if r["view_ts"] < cutoff}
    assert must_emit and must_emit <= got


def test_foreachbatch_marker_matrix_replay_and_foreign_tag(spark, sf_dir, tmp_path_factory):
    """The full marker matrix in ONE run (locks the exactly-once-effect
    claim): tagged merges, same-epoch replay, crash-mid-swap followed by
    a replay that must SKIP via the .old marker (not double-merge), a
    foreign-checkpoint refusal mid-sequence, and a resumed merge that
    recovers the .old state."""
    import os

    import pytest

    from classification_pyspark_spark.streaming.events import merge_stats_batch

    base = tmp_path_factory.mktemp("view_matrix")
    view = str(base / "view")
    batch = load_table(spark, sf_dir, "events").select("user_id", "value", "ts").limit(200)
    per_user = {r["user_id"]: r["n"] for r in
                batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}

    merge_stats_batch(batch, 0, view, checkpoint_tag="ckpt-A")
    merge_stats_batch(batch, 0, view, checkpoint_tag="ckpt-A")  # replay: no-op
    merge_stats_batch(batch, 1, view, checkpoint_tag="ckpt-A")

    # crash between the swap's two renames: live dir gone, state in .old
    shutil.move(view, view + ".old")
    assert not os.path.exists(view)

    # checkpoint re-delivers epoch 1: the .old marker says it is already
    # applied, so the replay must SKIP (a re-merge would double epoch 1)
    merge_stats_batch(batch, 1, view, checkpoint_tag="ckpt-A")
    assert not os.path.exists(view)  # skip does not rebuild the dir

    # a foreign checkpoint is refused even while the view sits in .old
    with pytest.raises(RuntimeError, match="checkpoint"):
        merge_stats_batch(batch, 2, view, checkpoint_tag="ckpt-B")

    # the original checkpoint resumes: epoch 2 merges WITH the .old state
    merge_stats_batch(batch, 2, view, checkpoint_tag="ckpt-A")
    after = {r["user_id"]: r["n_events"] for r in spark.read.parquet(view).collect()}
    assert after == {u: 3 * n for u, n in per_user.items()}
    assert not os.path.exists(view + ".old")
