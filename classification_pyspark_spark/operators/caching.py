"""Persist-lifecycle tracking for operators that cache internally.

Several operators persist an intermediate frame because it feeds two or
more downstream branches of one action (posting lists, tf frames,
range-partitioned offsets, iteration edges). The persist itself is
justified — without it Catalyst re-executes the shared subtree — but a
bare ``.persist()`` leaks: the operator returns a lazy DataFrame, so it
can never know when the caller's terminal action has finished, and in a
long-lived multi-query session the cached blocks accumulate until LRU
eviction.

This module closes the lifecycle without changing operator signatures:

- ``track(df)`` — persist ``df`` and record the handle in a
  process-wide registry; operators call this instead of
  ``df.persist()``.
- ``release_tracked()`` — unpersist every tracked frame; harnesses that
  run many queries in one session (the plan runner, the oracle sweep,
  ``bench.py``) call this after each query's terminal action.
- ``persisted(df)`` — context manager for library callers that manage
  a persist locally (``with persisted(df) as d: ...``).

A released handle is harmless to the returned DataFrame: unpersist only
drops cached blocks; re-running the frame recomputes from lineage.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def track(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` and register it for later ``release_tracked()``.

    Returns the same DataFrame so call sites read
    ``x = track(expr...)`` exactly where ``expr....persist()`` stood.
    """
    df = df.persist(level) if level is not None else df.persist()
    _TRACKED.append(df)
    return df


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released.

    Safe to call at any point between queries — an already-unpersisted
    or dead handle is skipped.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # session torn down mid-sweep: nothing to free
            pass
    return n


@contextmanager
def track_scope(blocking: bool = False):
    """Release ONLY the frames ``track()``ed inside this scope.

    ``release_tracked()`` is a process-wide drain: correct between
    queries in a single-query harness, but inside a long-lived session
    (a streaming ``foreachBatch`` step running next to other registry
    queries) it would unpersist frames those concurrent operators still
    rely on — their shared subtrees silently recompute. This scopes the
    release to the suffix of the registry appended during the ``with``
    block, leaving pre-existing tracked persists untouched.

    The suffix model assumes the scope's own ``track()`` calls happen on
    the calling thread (true for every operator here — persists are
    registered during plan *construction*, which is driver-side and
    synchronous); frames tracked by other threads mid-scope would be
    released with ours, which is the same behavior they already accept
    from any concurrent ``release_tracked()`` caller.
    """
    start = len(_TRACKED)
    try:
        yield
    finally:
        while len(_TRACKED) > start:
            df = _TRACKED.pop()
            try:
                df.unpersist(blocking)
            except Exception:
                pass


@contextmanager
def persisted(df: DataFrame, level: StorageLevel | None = None, blocking: bool = False):
    """``with persisted(df) as d:`` — persist on entry, unpersist on exit.

    For callers that consume the cached frame entirely inside one scope
    (e.g. production jobs that run their terminal action themselves).
    """
    df = df.persist(level) if level is not None else df.persist()
    try:
        yield df
    finally:
        try:
            df.unpersist(blocking)
        except Exception:
            pass
