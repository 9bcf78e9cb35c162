"""Config/catalog tests: YAML interpolation, catalog reads."""

from __future__ import annotations

import yaml

from classification_pyspark_spark.config import Context, interpolate, load_config


def test_interpolation():
    cfg = {
        "base": "/data",
        "sf": "sf0.001",
        "paths": {"orders": "${base}/${sf}/orders.parquet"},
        "nested": {"deep": "${paths.orders}"},
    }
    out = interpolate(cfg, cfg)
    assert out["paths"]["orders"] == "/data/sf0.001/orders.parquet"
    assert out["nested"]["deep"] == "/data/sf0.001/orders.parquet"


def test_context_catalog_read(spark, sf_dir, tmp_path):
    cfg = {
        "base": sf_dir,
        "spark": {"spark.sql.shuffle.partitions": "4"},
        "data_catalog": {
            "orders": {"path": "${base}/orders.parquet"},
            "lineitem": "${base}/lineitem.parquet",
        },
    }
    p = tmp_path / "config.yml"
    p.write_text(yaml.safe_dump(cfg))
    ctx = Context.from_config_file(str(p))
    assert ctx.read_table("orders").count() > 0
    assert "l_orderkey" in ctx.read_table("lineitem").columns
