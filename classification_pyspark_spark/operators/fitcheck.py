"""Shared guard for fit-style operators: a fit aggregate over an empty
(or all-null) frame yields NULL statistics, and silently continuing
turns into inscrutable ``NoneType`` arithmetic errors deep in the
transform. The contract instead: summary operators return empty/NULL
results on empty input; FIT operators (scalers, binners, outlier
bounds, target encoders, ANN quantizers) raise a clear ValueError —
there is nothing statistically meaningful to fit (same posture as
sklearn's empty-fit errors)."""

from __future__ import annotations

from collections.abc import Mapping


def require_fitted_stats(stats: Mapping[str, object], what: str) -> None:
    """Raise ValueError naming the columns whose fit statistics are
    NULL (empty input, or a column with no non-null values)."""

    def _has_null(v: object) -> bool:
        if isinstance(v, tuple):
            return any(x is None for x in v)
        return v is None

    bad = sorted(str(k) for k, v in stats.items() if _has_null(v))
    if bad:
        raise ValueError(
            f"cannot fit {what}: no non-null data for column(s) {', '.join(bad)} "
            "(empty input or all-null column)"
        )
