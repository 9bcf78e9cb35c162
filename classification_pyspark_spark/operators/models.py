"""Model registry + train/score (SURVEY.md §2.10 M9, M12; §2.12 O-layer).

Re-expression of the reference's string->class model registry
(``model_gen.py:8-75``), dynamic class loading (``utils.py:23-57``)
and param-grid expansion (``list_models_from_config``), plus the
train/score entry points (``production/training.py:97-98``,
``production/scoring.py:117-120``) — all directly on ``pyspark.ml``.
"""

from __future__ import annotations

import itertools
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame

REGRESSION_MODELS = {
    "aft_survival": "pyspark.ml.regression.AFTSurvivalRegression",
    "decision_tree": "pyspark.ml.regression.DecisionTreeRegressor",
    "gbt": "pyspark.ml.regression.GBTRegressor",
    "glm": "pyspark.ml.regression.GeneralizedLinearRegression",
    "isotonic": "pyspark.ml.regression.IsotonicRegression",
    "linear": "pyspark.ml.regression.LinearRegression",
    "random_forest": "pyspark.ml.regression.RandomForestRegressor",
}

CLASSIFICATION_MODELS = {
    "logistic": "pyspark.ml.classification.LogisticRegression",
    "decision_tree": "pyspark.ml.classification.DecisionTreeClassifier",
    "gbt": "pyspark.ml.classification.GBTClassifier",
    "random_forest": "pyspark.ml.classification.RandomForestClassifier",
    "naive_bayes": "pyspark.ml.classification.NaiveBayes",
    "mlp": "pyspark.ml.classification.MultilayerPerceptronClassifier",
    "one_vs_rest": "pyspark.ml.classification.OneVsRest",
}


def load_class(path: str):
    """Dynamic import of a dotted class path (parity: ``utils.py:23-57``)."""
    module, _, cls = path.rpartition(".")
    mod = __import__(module, fromlist=[cls])
    return getattr(mod, cls)


def get_estimator(kind: str, name: str, **params):
    """Instantiate a registered estimator by (kind, name) with params."""
    registry = {"regression": REGRESSION_MODELS, "classification": CLASSIFICATION_MODELS}[kind]
    return load_class(registry[name])(**params)


def expand_param_grid(params: Mapping[str, object]) -> list[dict[str, object]]:
    """Config param grid -> list of concrete param dicts (parity:
    ``list_models_from_config``): any list-valued param fans out."""
    keys = list(params)
    grids = [v if isinstance(v, (list, tuple)) else [v] for v in params.values()]
    return [dict(zip(keys, combo)) for combo in itertools.product(*grids)]


def train(
    df: DataFrame,
    kind: str,
    name: str,
    features_col: str = "features",
    label_col: str = "y",
    **params,
):
    """Fit one registered estimator (parity: ``training.py:97-98``)."""
    est = get_estimator(kind, name, featuresCol=features_col, labelCol=label_col, **params)
    return est.fit(df)


def score(model, df: DataFrame) -> DataFrame:
    """Apply a fitted model (parity: ``scoring.py:117-120``; lazy)."""
    return model.transform(df)


def prediction_label_expr(probability_col: str = "probability", threshold: float = 0.5):
    """Thresholded label from the probability vector — native
    ``vector_to_array`` rewrite of the ``_get_label`` row UDF
    (``model_eval.py:444-455``)."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    return F.when(vector_to_array(F.col(probability_col))[1] > threshold, 1.0).otherwise(0.0)


def feature_importance(df: DataFrame, features_col: str, label_col: str, seed: int = 42):
    """RF feature importances (parity: ``eda.py:830-891`` — 3 trees,
    depth 2, fixed seed). Returns the fitted model's importances vector."""
    from pyspark.ml.classification import RandomForestClassifier

    rf = RandomForestClassifier(
        featuresCol=features_col, labelCol=label_col, numTrees=3, maxDepth=2, seed=seed
    )
    return rf.fit(df).featureImportances


def pca_2d(df: DataFrame, features_col: str = "features", k: int = 2):
    """PCA projection (parity: ``eda.feature_analysis_pca``,
    ``eda.py:894-923``). Returns (transformed_df, model)."""
    from pyspark.ml.feature import PCA

    model = PCA(k=k, inputCol=features_col, outputCol="pca_features").fit(df)
    return model.transform(df), model


def grid_search_cv(
    df: DataFrame,
    kind: str,
    name: str,
    param_grid: Mapping[str, Sequence[object] | object],
    features_col: str = "features",
    label_col: str = "y",
    evaluator=None,
    n_folds: int = 3,
    parallelism: int = 4,
    seed: int = 42,
):
    """K-fold cross-validated grid search over a registered estimator.

    The reference expands config grids (``list_models_from_config``,
    ``utils.py:23-57``) but fits each candidate once against a manual
    holdout; ``CrossValidator`` is the Spark-first upgrade — candidate
    x fold fits are scheduled ``parallelism`` at a time on the cluster
    and every metric is an avg over folds. Returns
    ``(best_model, [(param_dict, avg_metric), ...])``.
    """
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    est = get_estimator(kind, name, featuresCol=features_col, labelCol=label_col)
    evaluator = evaluator or BinaryClassificationEvaluator(labelCol=label_col)
    builder = ParamGridBuilder()
    for pname, values in param_grid.items():
        vals = list(values) if isinstance(values, (list, tuple)) else [values]
        builder.addGrid(est.getParam(pname), vals)
    maps = builder.build()
    cv = CrossValidator(
        estimator=est,
        estimatorParamMaps=maps,
        evaluator=evaluator,
        numFolds=n_folds,
        parallelism=parallelism,
        seed=seed,
    )
    fitted = cv.fit(df)
    results = [
        ({p.name: v for p, v in pm.items()}, m)
        for pm, m in zip(maps, fitted.avgMetrics)
    ]
    return fitted.bestModel, results


def calibrate_isotonic(
    df: DataFrame, score_col: str, label_col: str, out_col: str = "calibrated"
):
    """Isotonic (PAV) probability calibration of a model score —
    the post-training step that turns a ranker's raw score into a
    usable probability (Zadrozny & Elkan, KDD 2002; sklearn's
    ``CalibratedClassifierCV(method='isotonic')``).

    MLlib's IsotonicRegression is the distributed PAV: the fit pools
    adjacent violators over (score, label) pairs — deterministic for
    a given input. At transform time MLlib interpolates LINEARLY
    between the retained boundaries (still monotone; holdout scores
    between boundaries get interpolated values, not a step). Returns
    (model, calibrated_df); calibrated values are monotone in the
    score and minimize squared loss among monotone fits (so Brier
    score never degrades vs the raw score on the fit data — pinned
    in tests)."""
    from pyspark.ml.regression import IsotonicRegression

    from pyspark.sql import functions as F

    prepared = df.withColumn("__score_d", F.col(score_col).cast("double")).withColumn(
        "__label_d", F.col(label_col).cast("double")
    )
    iso = IsotonicRegression(
        featuresCol="__score_d",
        labelCol="__label_d",
        predictionCol=out_col,
        isotonic=True,
    )
    model = iso.fit(prepared)
    out = model.transform(prepared).drop("__score_d", "__label_d")
    return model, out
