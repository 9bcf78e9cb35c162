"""YAML config + data catalog (SURVEY.md §2.1 S5, §1 config model).

Re-expression of the reference's Context/YAML layer
(``src/ta_lib/pyspark/context.py:148-203``, ``utils.load_yml``):
YAML with ``${dotted.path}`` interpolation resolved against the config
itself, a data catalog mapping table names to (path, format), and a
SparkSession built from the config's ``spark`` section with a plain
``.config()`` loop (the reference string-``eval``s the builder chain,
``context.py:79-92`` — deliberately not reproduced).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .session import get_spark
from .sources.io import read_data

_INTERP = re.compile(r"\$\{([^}]+)\}")


def _lookup(cfg: dict, dotted: str) -> Any:
    cur: Any = cfg
    for part in dotted.split("."):
        cur = cur[part]
    return cur


def interpolate(obj: Any, root: dict) -> Any:
    """Resolve ``${a.b.c}`` placeholders recursively (parity:
    ``context.py:162-199``)."""
    if isinstance(obj, dict):
        return {k: interpolate(v, root) for k, v in obj.items()}
    if isinstance(obj, list):
        return [interpolate(v, root) for v in obj]
    if isinstance(obj, str):
        def sub(m: re.Match) -> str:
            return str(interpolate(_lookup(root, m.group(1)), root))

        return _INTERP.sub(sub, obj)
    return obj


def load_config(path: str) -> dict:
    """YAML -> interpolated config dict."""
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    return interpolate(cfg, cfg)


class Context:
    """Config + lazily-built SparkSession + data-catalog reads
    (parity: ``context.py:36-102``)."""

    def __init__(self, cfg: dict):
        self.cfg = cfg
        self._spark: SparkSession | None = None

    @classmethod
    def from_config_file(cls, path: str) -> "Context":
        return cls(load_config(path))

    @property
    def spark(self) -> SparkSession:
        if self._spark is None:
            spark_cfg = {str(k): str(v) for k, v in (self.cfg.get("spark") or {}).items()}
            self._spark = get_spark(
                self.cfg.get("app_name", "classification_pyspark_spark"), conf=spark_cfg
            )
        return self._spark

    def read_table(self, name: str) -> DataFrame:
        """Read a data-catalog entry: ``data_catalog.<name>: {path, fmt}``."""
        entry = self.cfg["data_catalog"][name]
        if isinstance(entry, str):
            entry = {"path": entry}
        return read_data(self.spark, entry["path"], fmt=entry.get("fmt", "parquet"))
