"""Grouped pandas operators (SURVEY.md §2.9 gap: applyInPandas).

Custom per-group transforms that genuinely need whole-group context in
Python: each group arrives as ONE pandas DataFrame (Arrow-shipped), so
the group must fit in executor memory — the operator contract at
100 TB is "many medium groups", with the shuffle on the group key.

``group_zscore`` is deliberately also SQL-expressible so the oracle
can verify the applyInPandas machinery end-to-end (the interesting
cases — per-group model fits, per-group resampling — use the same
plumbing with non-SQL bodies).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame


def group_zscore(
    df: DataFrame, group_cols: Sequence[str], value_col: str, out_col: str | None = None
) -> DataFrame:
    """Per-group standardization: (x - mean) / stddev (sample), NULL
    for singleton/zero-variance groups. One shuffle on the group key;
    each group is one Arrow batch into pandas."""
    out_col = out_col or f"{value_col}_z"
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, {out_col} double"

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf[value_col].mean()
        sd = pdf[value_col].std(ddof=1)
        pdf[out_col] = (pdf[value_col] - mu) / sd if sd and sd > 0 else None
        return pdf

    return df.groupBy(*group_cols).applyInPandas(standardize, schema=schema)
