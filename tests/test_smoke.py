"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "c_custkey" in df.columns


def test_queries_registry_shape(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_all_queries_run_at_smoke_sf(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
