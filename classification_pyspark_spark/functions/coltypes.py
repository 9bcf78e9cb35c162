"""Semantic column-type classification (SURVEY.md §2.2 P8).

Parity with the reference's 4-way classifier over ``df.dtypes``
(``src/ta_lib/pyspark/dp.py:184-294``): numerical = anything not in
{string, date/timestamp, boolean}; categorical = string; datelike =
date/timestamp; boolean = boolean. Extended (SURVEY §1) with complex
types (array/map/struct/binary) so events ``props`` / embeddings /
multimodal columns classify cleanly instead of falling into
"numerical".

Pure metadata inspection — no jobs are run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

NUMERICAL = "numerical"
CATEGORICAL = "categorical"
DATELIKE = "datelike"
BOOLEAN = "boolean"
COMPLEX = "complex"

_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)
_DATE_TYPES = (T.DateType, T.TimestampType, T.TimestampNTZType)
_COMPLEX_TYPES = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def classify_dtype(dtype: T.DataType) -> str:
    """Map one Spark type to a semantic class (parity: ``dp.py:266-294``)."""
    if isinstance(dtype, T.BooleanType):
        return BOOLEAN
    if isinstance(dtype, _DATE_TYPES):
        return DATELIKE
    if isinstance(dtype, T.StringType):
        return CATEGORICAL
    if isinstance(dtype, _COMPLEX_TYPES):
        return COMPLEX
    if isinstance(dtype, _NUMERIC_TYPES):
        return NUMERICAL
    # the reference's fallback: not string/date/bool => numerical
    return NUMERICAL


def identify_col_data_type(df: DataFrame, col: str) -> str:
    """Semantic class of one column (parity: ``dp.py:266-294``)."""
    return classify_dtype(df.schema[col].dataType)


def _cols_of(df: DataFrame, kind: str) -> list[str]:
    return [f.name for f in df.schema.fields if classify_dtype(f.dataType) == kind]


def list_numerical_columns(df: DataFrame) -> list[str]:
    """Parity: ``dp.py:199-203``."""
    return _cols_of(df, NUMERICAL)


def list_categorical_columns(df: DataFrame) -> list[str]:
    """Parity: ``dp.py:221-223``."""
    return _cols_of(df, CATEGORICAL)


def list_datelike_columns(df: DataFrame) -> list[str]:
    """Parity: ``dp.py:241-243``."""
    return _cols_of(df, DATELIKE)


def list_boolean_columns(df: DataFrame) -> list[str]:
    """Parity: ``dp.py:261-263``."""
    return _cols_of(df, BOOLEAN)


def list_complex_columns(df: DataFrame) -> list[str]:
    """Extension: array/map/struct/binary columns (embeddings, props, media)."""
    return _cols_of(df, COMPLEX)
