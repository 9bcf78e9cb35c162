"""Run tracking for the job orchestrator (SURVEY.md §2.12 O4).

Re-expression of the reference's tracked task runner
(``src/ta_lib/pyspark/task_runner.py:92-128`` wraps every task in
nested MLflow runs created by ``tracking.py:52-125``). Spark-first
posture: tracking is a thin driver-side sidecar — it never touches the
dataflow, adds no Spark jobs, and is OFF unless a backend is asked
for.

Backends (picked by ``create_tracker``, mirroring the reference's
``create_client`` driver switch, ``tracking.py:96-115``):

- ``jsonl``  — append one JSON line per task/job run to a local file.
  No dependencies; the default durable backend for this container.
- ``mlflow`` — nested runs per job/task, used only when the optional
  mlflow package is importable (reference parity).
- ``none``   — the do-nothing tracker (default when no spec given).

Every record carries: run id, job, stage, task, params, status,
message, wall seconds, and start/end unix timestamps.
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import dataclass, field
from typing import Any


@dataclass
class TaskRunRecord:
    run_id: str
    job: str
    stage: str
    task: str
    params: dict[str, Any]
    success: bool
    message: str
    wall_s: float
    started_at: float
    ended_at: float

    def as_dict(self) -> dict[str, Any]:
        return {
            "kind": "task_run",
            "run_id": self.run_id,
            "job": self.job,
            "stage": self.stage,
            "task": self.task,
            "params": self.params,
            "success": self.success,
            "message": self.message,
            "wall_s": round(self.wall_s, 4),
            "started_at": self.started_at,
            "ended_at": self.ended_at,
        }


class NullTracker:
    """Tracking disabled: every hook is a no-op."""

    def start_job(self, job: str) -> None:
        pass

    def log_task(self, record: TaskRunRecord) -> None:
        pass

    def end_job(self, job: str, n_tasks: int, n_failed: int, wall_s: float) -> None:
        pass


@dataclass
class JsonlTracker:
    """Local JSON-lines run store: one line per task run plus a
    job-summary line — the no-dependency stand-in for an MLflow
    tracking server (each line is what the reference logs as a nested
    run's params/tags)."""

    path: str
    job_run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])
    _t0: float = 0.0

    def _write(self, obj: dict[str, Any]) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(obj, sort_keys=True) + "\n")

    def start_job(self, job: str) -> None:
        self._t0 = time.time()
        self._write(
            {"kind": "job_start", "run_id": self.job_run_id, "job": job, "started_at": self._t0}
        )

    def log_task(self, record: TaskRunRecord) -> None:
        self._write(record.as_dict())

    def end_job(self, job: str, n_tasks: int, n_failed: int, wall_s: float) -> None:
        self._write(
            {
                "kind": "job_end",
                "run_id": self.job_run_id,
                "job": job,
                "n_tasks": n_tasks,
                "n_failed": n_failed,
                "success": n_failed == 0,
                "wall_s": round(wall_s, 4),
                "ended_at": time.time(),
            }
        )


class MlflowTracker:
    """Nested-run MLflow backend (reference parity:
    ``task_runner.run_tracked_task`` opens a parent job run and one
    nested run per task). Only constructible when mlflow imports."""

    def __init__(self, experiment: str = "classification-pyspark-spark"):
        import mlflow  # noqa: F401 — availability gate

        self._mlflow = mlflow
        self._experiment = experiment
        self._parent = None

    def start_job(self, job: str) -> None:
        self._mlflow.set_experiment(self._experiment)
        self._parent = self._mlflow.start_run(run_name=job)

    def log_task(self, record: TaskRunRecord) -> None:
        with self._mlflow.start_run(run_name=f"{record.job}:{record.task}", nested=True):
            self._mlflow.log_params({k: str(v) for k, v in record.params.items()})
            self._mlflow.log_metric("wall_s", record.wall_s)
            self._mlflow.set_tag("stage", record.stage)
            self._mlflow.set_tag("status", "Success" if record.success else "Fail")
            self._mlflow.set_tag("mlflow.note.content", record.message)

    def end_job(self, job: str, n_tasks: int, n_failed: int, wall_s: float) -> None:
        self._mlflow.log_metric("n_tasks", n_tasks)
        self._mlflow.log_metric("n_failed", n_failed)
        self._mlflow.log_metric("wall_s", wall_s)
        self._mlflow.end_run("FINISHED" if n_failed == 0 else "FAILED")
        self._parent = None


def mlflow_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("mlflow") is not None


def create_tracker(spec: str | dict[str, Any] | None):
    """Tracker factory (parity: ``tracking.create_client`` driver
    switch). ``spec`` may be None (-> NullTracker), a path string
    (-> JsonlTracker), or {"driver": "jsonl"|"mlflow"|"none", ...}."""
    if spec is None:
        return NullTracker()
    if isinstance(spec, str):
        return JsonlTracker(path=spec)
    driver = spec.get("driver", "none")
    if driver == "none":
        return NullTracker()
    if driver == "jsonl":
        return JsonlTracker(path=spec["path"])
    if driver == "mlflow":
        if not mlflow_available():
            raise ValueError(
                "tracker driver 'mlflow' requires the optional mlflow package; "
                "use driver 'jsonl' in this environment"
            )
        return MlflowTracker(experiment=spec.get("experiment", "classification-pyspark-spark"))
    raise ValueError(f"unknown tracker driver {driver!r}; one of: none, jsonl, mlflow")
