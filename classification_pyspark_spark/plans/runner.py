"""Job runner (SURVEY.md §2.12 O3-O4).

Re-expression of ``job_runner.executor`` / ``task_runner.run_task``
(``src/ta_lib/pyspark/job_runner.py:51-89``,
``task_runner.py:37-89``): stages run sequentially; each task looks up
its processor and invokes it with (spark, params). Failures are
captured as TaskStatus, logged, and do not abort the job (parity with
the reference's safe-runner), unless ``fail_fast``. Pass a tracker
(``tracking.create_tracker``) to record per-task run records —
the tracked-runner parity with ``task_runner.run_tracked_task``
(``task_runner.py:92-128``)."""

from __future__ import annotations

import logging
import time

from pyspark.sql import SparkSession

from .planner import JobPlan
from .registry import TaskStatus, get_processor
from .tracking import NullTracker, TaskRunRecord

log = logging.getLogger(__name__)


def run_task(spark: SparkSession, job_name: str, task_name: str, params: dict) -> TaskStatus:
    from ..operators.caching import release_tracked

    processor = get_processor(job_name, task_name)
    t0 = time.perf_counter()
    try:
        result = processor(spark, params)
    except Exception as e:  # noqa: BLE001 — parity: safe-runner captures
        log.exception("task %s/%s failed", job_name, task_name)
        return TaskStatus(False, f"{type(e).__name__}: {e}")
    finally:
        # operators persist intermediates via caching.track; the task's
        # terminal action has run by now, so drop the cached blocks
        release_tracked()
    elapsed = time.perf_counter() - t0
    if isinstance(result, TaskStatus):
        return result
    return TaskStatus(True, f"ok in {elapsed:.1f}s")


def execute_job(
    spark: SparkSession,
    plan: JobPlan,
    fail_fast: bool = False,
    tracker=None,
) -> dict[str, TaskStatus]:
    """Run all stages sequentially; returns {stage/task: status}.

    ``tracker`` (any object with start_job/log_task/end_job, see
    ``plans.tracking``) receives one run record per task plus a job
    summary; the default NullTracker records nothing."""
    import uuid

    tracker = tracker or NullTracker()
    results: dict[str, TaskStatus] = {}
    job_t0 = time.perf_counter()
    tracker.start_job(plan.name)
    try:
        for stage in plan.stages:
            log.info("stage %s (%d tasks)", stage.name, len(stage.tasks))
            for task in stage.tasks:
                t0 = time.time()
                p0 = time.perf_counter()
                status = run_task(spark, plan.name, task.name, task.params)
                wall = time.perf_counter() - p0
                results[f"{stage.name}/{task.name}"] = status
                tracker.log_task(
                    TaskRunRecord(
                        run_id=uuid.uuid4().hex[:12],
                        job=plan.name,
                        stage=stage.name,
                        task=task.name,
                        params=task.params,
                        success=status.success,
                        message=status.message,
                        wall_s=wall,
                        started_at=t0,
                        ended_at=t0 + wall,
                    )
                )
                log.info(
                    "  %s/%s -> %s %s", stage.name, task.name, status.success, status.message
                )
                if fail_fast and not status.success:
                    return results
        return results
    finally:
        n_failed = sum(1 for v in results.values() if not v.success)
        tracker.end_job(plan.name, len(results), n_failed, time.perf_counter() - job_t0)
