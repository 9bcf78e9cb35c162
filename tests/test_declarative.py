"""Spark 4.1 Declarative Pipelines authored with the STOCK
pyspark.pipelines decorators, executed by the local batch executor
(plans/declarative.py) on a classic session."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from classification_pyspark_spark.plans.declarative import run_pipeline


def test_three_stage_pipeline_materializes_and_wires_views(spark, sf_dir, tmp_path):
    from pyspark import pipelines as dp

    store = str(tmp_path / "pipeline")

    def define():
        @dp.temporary_view()
        def raw_orders():
            return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

        @dp.materialized_view(comment="orders deduped on key")
        def clean_orders():
            return spark.table("raw_orders").dropDuplicates(["o_orderkey"])

        @dp.materialized_view(partition_cols=["yr"])
        def daily_revenue():
            return (
                spark.table("clean_orders")
                .groupBy(
                    F.year("o_orderdate").alias("yr"),
                    F.to_date("o_orderdate").alias("d"),
                )
                .agg(
                    (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0).alias(
                        "rev"
                    )
                )
            )

    paths = run_pipeline(spark, define, store)
    assert paths["raw_orders"] == "<temp view>"
    assert os.path.isdir(paths["clean_orders"])
    # partition_cols honored -> hive layout on disk
    assert any(e.startswith("yr=") for e in os.listdir(paths["daily_revenue"]))

    # the registered views read FROM STORAGE and agree with a direct computation
    want = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).dropDuplicates(
        ["o_orderkey"]
    )
    assert spark.table("clean_orders").count() == want.count()
    n_days = want.select(F.to_date("o_orderdate")).distinct().count()
    assert spark.table("daily_revenue").count() == n_days


def test_streaming_tables_and_orphans_are_refused(spark, sf_dir, tmp_path):
    from pyspark import pipelines as dp

    def define_streaming():
        dp.create_streaming_table("events_stream")

    with pytest.raises(NotImplementedError, match="streaming"):
        run_pipeline(spark, define_streaming, str(tmp_path / "s"))

    # orphan check: the decorators always pair view+flow, so register a
    # flow-less materialized view through the active registry directly
    from pyspark.pipelines.output import MaterializedView
    from pyspark.pipelines.source_code_location import SourceCodeLocation

    from classification_pyspark_spark.plans.declarative import LocalGraphElementRegistry

    reg = LocalGraphElementRegistry()
    reg.register_output(
        MaterializedView(
            name="lonely",
            comment=None,
            source_code_location=SourceCodeLocation(filename="x", line_number=1),
            table_properties={},
            partition_cols=None,
            cluster_by=None,
            schema=None,
            format=None,
        )
    )
    # run_pipeline's orphan detection is exercised through a define()
    # that registers the same orphan output
    def define_with_orphan():
        from pyspark.pipelines.graph_element_registry import (
            get_active_graph_element_registry,
        )

        get_active_graph_element_registry().register_output(reg.outputs[0])

    with pytest.raises(ValueError, match="lonely"):
        run_pipeline(spark, define_with_orphan, str(tmp_path / "o"))
