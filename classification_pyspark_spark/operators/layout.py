"""Z-order (Morton curve) data layout — the multi-dimensional
scan-pruning lever for 100 TB tables (north-star extension; no
reference counterpart: `abhirup77/classification-pyspark` never
controls file layout).

A single `ORDER BY a` write gives parquet min/max stats that prune
scans filtered on `a` but leaves `b` scattered across every file. The
Morton curve interleaves the BITS of fixed-width ranks of several
columns, so rows close on the curve are close in EVERY dimension —
one sorted write, and range filters on any participating column skip
most files/row-groups (the public Delta Lake `OPTIMIZE ZORDER BY` /
Databricks layout idea, re-expressed as plain Spark expressions +
`repartitionByRange`).

Everything is deterministic closed-form arithmetic (clamped
fixed-width binning + unrolled shift/mask interleave), so an oracle
engine can replay the exact z-values: no sampling, no RNG, no UDF —
the interleave is ~bits·dims codegen terms inside one projection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rank_expr(col: Column | str, lo: float, hi: float, bits: int) -> Column:
    """Clamped fixed-width rank of a value in [lo, hi): an integer in
    [0, 2^bits). NULLs rank 0 (they sort together at the curve start).
    The (lo, hi) bounds are caller-supplied constants — at 100 TB they
    come from table statistics, not a data pass."""
    c = F.col(col) if isinstance(col, str) else col
    n = 1 << bits
    width = ((hi - lo) / n) or 1.0
    r = F.floor((c - F.lit(float(lo))) / F.lit(width))
    return F.coalesce(
        F.least(F.greatest(r, F.lit(0)), F.lit(n - 1)), F.lit(0)
    ).cast("long")


def zvalue_expr(dims: Sequence[tuple[Column | str, float, float]], bits: int = 8) -> Column:
    """Morton z-value of ``dims`` (each ``(column, lo, hi)``): the
    ``bits``-wide ranks bit-interleaved, dimension k taking bit
    positions ``i*d + k``. Unrolled to ``bits * len(dims)`` codegen
    terms — pure JVM arithmetic, whole-stage-codegen friendly, and
    exactly replayable in ANSI SQL (see ``zvalue_sql``).

    ``bits * len(dims)`` must stay <= 62 (long, sign bit spared)."""
    d = len(dims)
    if bits * d > 62:
        raise ValueError(f"bits*dims = {bits * d} exceeds a signed long")
    z = F.lit(0).cast("long")
    for k, (col, lo, hi) in enumerate(dims):
        r = rank_expr(col, lo, hi, bits)
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * d + k)
            )
    return z


def zvalue_sql(dims: Sequence[tuple[str, float, float]], bits: int = 8) -> str:
    """The ANSI-SQL mirror of ``zvalue_expr`` — same clamped ranks,
    same unrolled interleave — for DuckDB oracles and documentation."""
    d = len(dims)
    terms = []
    for k, (col, lo, hi) in enumerate(dims):
        n = 1 << bits
        width = ((hi - lo) / n) or 1.0
        rank = (
            f"CAST(COALESCE(LEAST(GREATEST(FLOOR(({col} - {lo!r}) / {width!r}), 0), "
            f"{n - 1}), 0) AS BIGINT)"
        )
        for i in range(bits):
            terms.append(f"((({rank} >> {i}) & 1) << {i * d + k})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    dims: Sequence[tuple[str, float, float]],
    bits: int = 8,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet laid out along the Morton curve of
    ``dims``: ``repartitionByRange`` on the z-value (files = contiguous
    curve segments, so each file's min/max footer stats span a small
    hyper-rectangle in every dimension) + ``sortWithinPartitions`` (the
    same locality for row-group stats inside each file). Range filters
    on ANY dim then skip most files at planning/scan time via the
    ordinary parquet min/max pruning path — no new reader needed.

    One extra column, one range exchange — the identical cost shape to
    a plain sorted write; the curve is what makes the sort pay off on
    more than one column."""
    z = zvalue_expr(dims, bits).alias("__z")
    out = df.withColumn("__z", z)
    out = (
        out.repartitionByRange(num_files, "__z")
        if num_files is not None
        else out.repartitionByRange("__z")
    )
    out.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(path)
