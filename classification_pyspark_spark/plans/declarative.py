"""Local executor for Spark Declarative Pipelines (Spark 4.1 SDP).

Spark 4.1 ships a declarative authoring surface —
``pyspark.pipelines``'s ``@materialized_view`` / ``@temporary_view``
decorators — whose stock execution backend is the ``spark-pipelines``
CLI over Spark Connect. This module lets pipelines AUTHORED with the
standard decorators run on any classic in-process session (the
environment this engine targets): a ``GraphElementRegistry`` that
collects the dataflow graph, plus a small batch executor that
materializes each flow in declaration order.

This complements (not replaces) the YAML job planner
(``plans/planner.py``, the reference-parity orchestration of SURVEY
§2.12): the job planner sequences imperative processor functions; a
declarative pipeline states WHAT each dataset is and lets the executor
handle materialization + view wiring. Flows reference upstream
datasets with plain ``spark.read.table(name)`` / ``spark.table`` —
temporary views resolve in-session, materialized views resolve to
their parquet on disk, so a downstream job (or a later pipeline run)
can read the storage directly.

Deliberately batch-only: ``StreamingTable`` / ``append_flow`` raise a
clear error (streaming state needs the checkpoint lifecycle that
``streaming/corpus.py`` manages explicitly).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.sql import SparkSession

from pyspark.pipelines.graph_element_registry import (
    GraphElementRegistry,
    graph_element_registration_context,
)
from pyspark.pipelines.flow import Flow
from pyspark.pipelines.output import Output, StreamingTable, TemporaryView


@dataclass
class LocalGraphElementRegistry(GraphElementRegistry):
    """Collects outputs/flows registered by the stock decorators."""

    outputs: list[Output] = field(default_factory=list)
    flows: list[Flow] = field(default_factory=list)

    def register_output(self, output: Output) -> None:
        self.outputs.append(output)

    def register_flow(self, flow: Flow) -> None:
        self.flows.append(flow)

    def register_sql(self, sql_text: str, file_path: Path) -> None:
        raise NotImplementedError(
            "SQL-file graph elements are not supported by the local executor; "
            "define datasets with the Python decorators"
        )


def run_pipeline(
    spark: SparkSession,
    define: Callable[[], None],
    storage_dir: str,
) -> dict[str, str]:
    """Execute a declarative pipeline on a classic session.

    ``define`` is a zero-arg function whose body declares datasets with
    ``pyspark.pipelines`` decorators (the same code the
    ``spark-pipelines`` CLI would load). Flows run in DECLARATION
    order — state upstream datasets before their consumers, the
    natural top-down authoring layout. Materialized views/tables are
    written to ``storage_dir/<name>`` (their declared format,
    parquet default, ``partition_cols`` honored) and re-registered as
    temp views READING FROM STORAGE, so downstream flows scan the
    materialization (with its pruning layout), never the upstream
    lineage twice. Temporary views stay in-session.

    Returns ``{dataset name: storage path or '<temp view>'}``.
    """
    registry = LocalGraphElementRegistry()
    with graph_element_registration_context(registry):
        define()

    by_name = {o.name: o for o in registry.outputs}
    streaming = [o.name for o in registry.outputs if isinstance(o, StreamingTable)]
    if streaming:
        raise NotImplementedError(
            f"streaming tables {streaming} need the checkpoint lifecycle; "
            "use streaming/corpus.py or streaming/events.py"
        )
    flow_targets = [f.target for f in registry.flows]
    orphans = [n for n in by_name if n not in flow_targets]
    if orphans:
        raise ValueError(f"datasets declared without a defining flow: {orphans}")

    results: dict[str, str] = {}
    for fl in registry.flows:
        out = by_name.get(fl.target)
        if out is None:
            raise ValueError(f"flow {fl.name!r} targets undeclared dataset {fl.target!r}")
        df = fl.func()
        if isinstance(out, TemporaryView):
            df.createOrReplaceTempView(out.name)
            results[out.name] = "<temp view>"
            continue
        fmt = getattr(out, "format", None) or "parquet"
        path = os.path.join(storage_dir, out.name)
        writer = df.write.mode("overwrite").format(fmt)
        if getattr(out, "partition_cols", None):
            writer = writer.partitionBy(*out.partition_cols)
        writer.save(path)
        # MaterializedView and plain Table share this materialization
        # contract (write to storage, re-register view from storage)
        spark.read.format(fmt).load(path).createOrReplaceTempView(out.name)
        results[out.name] = path
    return results
