"""Empty-input contract for the whole registry: a partition or table
with zero rows is an ordinary production condition, not an error.

Every registered query must either (a) return a well-formed (usually
empty or NULL-valued) result, or (b) — for fit-style operators where
no statistic exists to learn — raise a ValueError whose message says
so clearly. Raw NoneType arithmetic, ANSI DIVIDE_BY_ZERO, or array
index errors are regressions."""

from __future__ import annotations

import re

import pytest

from classification_pyspark_spark.catalog import load_table
from classification_pyspark_spark.queries import QUERIES

# fit-style operators: nothing statistically meaningful to fit on zero
# rows, so a clear ValueError IS the contract (sklearn posture)
EXPECT_FIT_ERROR = {
    "target_encode",
    "scaling_minmax_standard",
    "binning_fixed_width",
    "outlier_cap",
    "knn_ivf",
    "knn_ivf_recall",
    "pq_topk_rerank",  # PQ codebooks are a quantizer fit
}

FIT_ERROR_RE = re.compile(r"cannot (fit|build)")


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_empty"))
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        load_table(spark, sf_dir, t).limit(0).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    return out


def test_every_query_honors_the_empty_input_contract(spark, empty_sf_dir):
    violations = {}
    for name, fn in QUERIES.items():
        try:
            fn(spark, empty_sf_dir).collect()
            if name in EXPECT_FIT_ERROR:
                violations[name] = "expected a fit ValueError but it succeeded"
        except ValueError as e:
            if name not in EXPECT_FIT_ERROR or not FIT_ERROR_RE.search(str(e)):
                violations[name] = f"ValueError: {str(e)[:120]}"
        except Exception as e:  # noqa: BLE001 — collecting all violations
            violations[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
        finally:
            spark.catalog.clearCache()
    assert not violations, violations
