"""Job planner (SURVEY.md §2.12 O2).

Re-expression of ``job_planner.create_job_plan``
(``src/ta_lib/pyspark/job_planner.py:8-47``): a job spec (dict or YAML)
becomes the engine's only custom IR — a static plan
``{name, stages: [{name, tasks: [{name, params}]}]}`` executed
sequentially stage by stage (tasks inside a stage are independent).
Everything *inside* a task is a lazy Spark dataflow, so Catalyst owns
all real query planning; this layer only sequences jobs."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class TaskPlan:
    name: str
    job_name: str
    params: dict[str, Any] = field(default_factory=dict)


@dataclass
class StagePlan:
    name: str
    tasks: list[TaskPlan] = field(default_factory=list)


@dataclass
class JobPlan:
    name: str
    stages: list[StagePlan] = field(default_factory=list)


def create_job_plan(spec: dict[str, Any]) -> JobPlan:
    """Job spec -> JobPlan. Spec shape (parity with the reference's
    job_catalog YAML, ``production/conf/job_catalog/local.yml:1-46``)::

        {"name": "data-cleaning",
         "stages": [{"name": "stage-1",
                     "tasks": [{"name": "clean-orders", "params": {...}}]}]}
    """
    name = spec["name"]
    stages = []
    for s in spec.get("stages", []):
        tasks = [
            TaskPlan(name=t["name"], job_name=name, params=dict(t.get("params", {})))
            for t in s.get("tasks", [])
        ]
        stages.append(StagePlan(name=s["name"], tasks=tasks))
    return JobPlan(name=name, stages=stages)


def load_job_catalog(path: str) -> list[dict[str, Any]]:
    """YAML job catalog -> list of job specs."""
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    return cfg.get("jobs", [])
