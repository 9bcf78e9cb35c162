"""String cleaning functions (SURVEY.md §2.2 P10-P11, §2.8 F1).

Re-expresses the reference's column-name cleaner
(``src/ta_lib/pyspark/dp.py:109-131``) and string-value cleaner
(``dp.py:134-181``) as pure column expressions / metadata renames —
all JVM-side built-ins, whole-stage-codegen friendly, no UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snake_case(name: str) -> str:
    """camelCase / spaced / punctuated name -> snake_case (parity: ``dp.py:109-131``)."""
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", name)
    s = re.sub(r"[^0-9a-zA-Z]+", "_", s)
    return re.sub(r"_+", "_", s).strip("_").lower()


def clean_column_names(df: DataFrame) -> DataFrame:
    """Rename every column to snake_case in one ``toDF`` (no per-column jobs)."""
    return df.toDF(*[snake_case(c) for c in df.columns])


def clean_string_expr(
    col: Column | str,
    lowercase: bool = True,
    strip_bracketed: bool = True,
    keep_special: str = "",
) -> Column:
    """Column expression for the reference's string-value cleaner
    (``dp.py:134-181``): trim, collapse whitespace, optionally lower,
    strip ``(...)`` / ``[...]`` bracketed text, and drop special chars
    except an allow-list.

    Composition of ``regexp_replace``/``trim``/``lower`` only, so the
    whole clean stays inside whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    if strip_bracketed:
        c = F.regexp_replace(c, r"\([^)]*\)|\[[^\]]*\]", "")
    allowed = re.escape(keep_special)
    c = F.regexp_replace(c, rf"[^0-9a-zA-Z\s{allowed}]+", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return c


def clean_string_columns(df: DataFrame, cols: list[str] | None = None, **kw) -> DataFrame:
    """Apply :func:`clean_string_expr` to the given (default: all string) columns."""
    if cols is None:
        cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    return df.withColumns({c: clean_string_expr(c, **kw) for c in cols})
