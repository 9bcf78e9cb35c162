"""Date/time functions (SURVEY.md §2.8 F2).

The reference parses raw ``ddMMMyyyy:HH:mm:ss`` strings via
``F.unix_timestamp(col, fmt).cast("timestamp")`` then ``to_date``
(``production/data_cleaning.py:49-53``) and derives recency features
with ``F.datediff(to_date(lit(ref)), col)``
(``production/feature_engineering.py:119-124``). Same capability here
with ``to_timestamp`` (vectorized, codegen) instead of the
unix_timestamp round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REFERENCE_FORMAT = "ddMMMyyyy:HH:mm:ss"


def parse_date_expr(col: Column | str, fmt: str = REFERENCE_FORMAT) -> Column:
    """String in ``fmt`` -> DateType (parity: ``data_cleaning.py:49-53``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(F.to_timestamp(c, fmt))


def parse_dates(df: DataFrame, cols: dict[str, str] | list[str], fmt: str = REFERENCE_FORMAT) -> DataFrame:
    """Parse several string columns to dates. ``cols`` is either a list
    (parsed in place) or a mapping old->new column name."""
    if isinstance(cols, list):
        cols = {c: c for c in cols}
    return df.withColumns({new: parse_date_expr(old, fmt) for old, new in cols.items()})


def days_since_expr(col: Column | str, reference_date: str) -> Column:
    """Days between ``reference_date`` (yyyy-MM-dd literal) and ``col``
    (parity: ``feature_engineering.py:119-124``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.datediff(F.to_date(F.lit(reference_date)), F.to_date(c))


def epoch_seconds_expr(col: Column | str) -> Column:
    """Seconds-since-epoch (long) for any time-like column.

    Parquet written without timezone adjustment reads back as
    TIMESTAMP_NTZ in Spark 4, which cannot be cast straight to a
    numeric type. Routing through TIMESTAMP first is legal from
    TIMESTAMP_NTZ, DATE, and TIMESTAMP alike, and with the session
    timezone pinned to UTC (session.py) the NTZ->LTZ hop is the
    identity mapping DuckDB's ``epoch()`` uses.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")
