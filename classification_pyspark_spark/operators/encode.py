"""Categorical encoders (SURVEY.md §2.10 M3, M7, M8).

Re-expression of the reference's ``Encoder`` family
(``features.py:96-286``):

- **onehot** — StringIndexer -> OneHotEncoder pipeline
  (``features.py:145-173``), via ``pyspark.ml``; plus a pure-SQL
  indicator-column variant (deterministic, oracle-checkable).
- **ordinal** — explicit category->code map applied as a literal map
  lookup (``features.py:181-212``).
- **target** — per-category mean/median of the target. The reference
  collects the mapping with ``rdd.collectAsMap()``
  (``features.py:236-247``) and its transform never applies it
  (gap noted at ``features.py:277-286``); here the mapping stays a
  DataFrame and is applied with a broadcast join — fixed and
  scalable.
- ``label_encode`` — StringIndexer over all categorical columns
  (``eda.py:805-827``).
- ``generate_features_vector`` — VectorAssembler (``dp.py:923-941``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fitcheck import require_fitted_stats


def ordinal_encode(
    df: DataFrame, col: str, mapping: Mapping[str, float], out_col: str | None = None
) -> DataFrame:
    """Literal-map ordinal encoding (parity: ``features.py:181-212``)."""
    out_col = out_col or f"{col}_ord"
    pairs = [x for k, v in mapping.items() for x in (F.lit(k), F.lit(float(v)))]
    return df.withColumn(out_col, F.create_map(*pairs).getItem(F.col(col)).cast("float"))


def onehot_indicators(
    df: DataFrame, col: str, categories: Sequence[str]
) -> DataFrame:
    """Deterministic 0/1 indicator columns for known categories — the
    SQL-expressible onehot (the ml OneHotEncoder emits sparse vectors
    whose category order depends on fitted frequencies)."""
    return df.withColumns(
        {
            f"{col}_{c.lower().replace(' ', '_').replace('-', '_')}": (F.col(col) == c).cast("int")
            for c in categories
        }
    )


class TargetEncoderModel:
    def __init__(self, mapping: DataFrame, col: str, out_col: str, default: float):
        self.mapping = mapping  # (category, encoding) DataFrame — stays distributed
        self.col = col
        self.out_col = out_col
        self.default = default

    def transform(self, df: DataFrame) -> DataFrame:
        m = F.broadcast(self.mapping.withColumnRenamed("category", self.col))
        out = df.join(m, on=self.col, how="left")
        return out.withColumn(
            self.out_col, F.coalesce(F.col("__te"), F.lit(self.default))
        ).drop("__te")


class TargetEncoder:
    """Mean/median target encoding; mapping applied via broadcast join
    (fixes the reference's unapplied-transform gap,
    ``features.py:277-286``)."""

    def __init__(self, col: str, target: str, how: str = "mean", out_col: str | None = None):
        self.col = col
        self.target = target
        self.how = how
        self.out_col = out_col or f"{col}_te"

    def fit(self, df: DataFrame) -> TargetEncoderModel:
        agg = (
            F.avg(self.target)
            if self.how == "mean"
            else F.expr(f"percentile_approx({self.target}, 0.5)")
        )
        mapping = df.groupBy(F.col(self.col).alias("category")).agg(agg.alias("__te"))
        default = df.agg(F.avg(self.target)).first()[0]
        require_fitted_stats({self.target: default}, "target encoder")
        return TargetEncoderModel(mapping, self.col, self.out_col, float(default))


def onehot_encode_ml(df: DataFrame, cols: Sequence[str], drop_input: bool = False):
    """StringIndexer -> OneHotEncoder pipeline (parity:
    ``features.py:145-173``). Returns (transformed_df, fitted_pipeline).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import OneHotEncoder, StringIndexer

    idx = StringIndexer(
        inputCols=list(cols),
        outputCols=[f"{c}_idx" for c in cols],
        handleInvalid="keep",
        stringOrderType="alphabetAsc",
    )
    ohe = OneHotEncoder(
        inputCols=[f"{c}_idx" for c in cols],
        outputCols=[f"{c}_ohe" for c in cols],
        handleInvalid="keep",
    )
    model = Pipeline(stages=[idx, ohe]).fit(df)
    out = model.transform(df)
    if drop_input:
        out = out.drop(*cols)
    return out, model


def label_encode(df: DataFrame, cols: Sequence[str]):
    """StringIndexer over categorical columns (parity: ``eda.py:805-827``).
    Returns (transformed_df, fitted_model)."""
    from pyspark.ml.feature import StringIndexer

    idx = StringIndexer(
        inputCols=list(cols),
        outputCols=[f"{c}_idx" for c in cols],
        handleInvalid="keep",
        stringOrderType="alphabetAsc",
    )
    model = idx.fit(df)
    return model.transform(df), model


def generate_features_vector(
    df: DataFrame, cols: Sequence[str], out_col: str = "features"
) -> DataFrame:
    """Assemble numeric columns into an ml Vector (parity:
    ``dp.py:923-941``)."""
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(inputCols=list(cols), outputCol=out_col, handleInvalid="skip").transform(df)


def feature_hash_expr(col, n_buckets: int = 32):
    """Hashing-trick bucket for one categorical value: first 8 hex
    chars of md5(value) mod ``n_buckets``. md5 (not Spark's murmur3
    ``hash()``) so the bucketing is portable across engines — DuckDB
    twin: ``CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) %
    n_buckets``. Stateless (no fitted vocabulary), which is the point:
    unseen categories at serve time land in a stable bucket instead of
    erroring, and no vocab broadcast is needed at 100 TB."""
    from .sampling import md5_prefix_long_expr

    return (md5_prefix_long_expr(col, 1, 8) % n_buckets).cast("int")


def feature_hash_encode(
    df: DataFrame, cols: Sequence[str], n_buckets: int = 32, prefix: str = "fh"
) -> DataFrame:
    """Hashing-trick encoder (the fit-free sibling of ordinal/onehot/
    target encoding, parity surface: ``features.py`` encoders): each
    column value maps to a stable bucket id in [0, n_buckets). Columns
    are salted with their own name so the same value in different
    columns lands in different buckets (standard FeatureHasher
    behavior). NULL stays NULL (concat_ws would silently hash the bare
    salt, diverging from the ``||``-based SQL twin where NULL
    propagates); impute-or-drop belongs upstream, not inside the
    encoder."""
    return df.withColumns(
        {
            f"{prefix}_{c}": F.when(
                F.col(c).isNotNull(),
                feature_hash_expr(
                    F.concat_ws("\x1f", F.lit(c), F.col(c).cast("string")), n_buckets
                ),
            )
            for c in cols
        }
    )
