"""CLI (SURVEY.md §2.12 O5).

Re-expression of the reference's click CLI (``production/cli.py:19-111``:
``job list`` / ``job run -j <id>``) on argparse (no extra deps).
Usage::

    python -m classification_pyspark_spark.plans.cli list -c jobs.yml
    python -m classification_pyspark_spark.plans.cli run -c jobs.yml -j data-cleaning
"""

from __future__ import annotations

import argparse
import logging
import sys

from .. import production  # noqa: F401 — registers the 4-job pipeline's processors
from ..session import get_spark
from .planner import create_job_plan, load_job_catalog
from .runner import execute_job


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="classification-pyspark-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list jobs in the catalog")
    p_list.add_argument("-c", "--catalog", required=True)

    p_run = sub.add_parser("run", help="run one job")
    p_run.add_argument("-c", "--catalog", required=True)
    p_run.add_argument("-j", "--job", required=True)
    p_run.add_argument("--fail-fast", action="store_true")
    p_run.add_argument(
        "--track",
        metavar="RUNS_JSONL",
        help="append per-task run records (params, status, wall time) to this JSONL file",
    )

    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")

    jobs = load_job_catalog(args.catalog)
    if args.cmd == "list":
        for spec in jobs:
            n_tasks = sum(len(s.get("tasks", [])) for s in spec.get("stages", []))
            print(f"{spec['name']}: {len(spec.get('stages', []))} stages, {n_tasks} tasks")
        return 0

    spec = next((j for j in jobs if j["name"] == args.job), None)
    if spec is None:
        print(f"unknown job {args.job!r}; available: {[j['name'] for j in jobs]}", file=sys.stderr)
        return 2
    plan = create_job_plan(spec)
    spark = get_spark(f"job:{plan.name}")
    from .tracking import create_tracker

    results = execute_job(
        spark, plan, fail_fast=args.fail_fast, tracker=create_tracker(args.track)
    )
    failed = [k for k, v in results.items() if not v.success]
    for k, v in results.items():
        print(f"{'OK ' if v.success else 'ERR'} {k}: {v.message}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
