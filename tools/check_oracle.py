"""Local replica of the driver's correctness gate.

Runs every registered query in Spark and its DuckDB oracle at the
given sf dir, then compares: row count, column names, and
order-insensitive values (rows sorted after sorting columns by name).
Floats compare bit-near (we round inside the queries themselves, so
any residual mismatch is a real engine/oracle divergence).

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from classification_pyspark_spark.operators.caching import release_tracked  # noqa: E402
from classification_pyspark_spark.queries import ORACLES, QUERIES  # noqa: E402
from classification_pyspark_spark.catalog import TABLES  # noqa: E402
from classification_pyspark_spark.session import get_spark  # noqa: E402


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0; FULL precision (%.17g) — the driver's hash may
        # be bit-strict, so local leniency would hide 1-ulp divergence
        return f"{v + 0.0:.17g}"
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    keyed = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return sorted_cols, keyed


def main():
    args = [a for a in sys.argv[1:]]
    # --window: replicate exactly what the driver samples (the first
    # 50 registry entries, i.e. queries.DRIVER_WINDOW)
    window_only = "--window" in args
    if window_only:
        args.remove("--window")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if window_only:
        from classification_pyspark_spark.queries import DRIVER_WINDOW

        only = set(DRIVER_WINDOW) | only
    spark = get_spark("oracle-check")

    def fresh_con():
        c = duckdb.connect()
        for t in TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        return c

    con = fresh_con()

    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # several operators persist intermediates (posting lists,
            # weight tables) via caching.track; release them between
            # queries so a 150-query sweep doesn't accumulate caches
            release_tracked()
            sdf = fn(get_spark(), sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            con = fresh_con()  # an INTERNAL error invalidates the connection
            continue
        sc, sk = frame_key(scols, srows)
        dc, dk = frame_key(dcols, drows)
        ok = True
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            ok = False
        elif sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            ok = False
        elif sk != dk:
            diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            ok = False
        if ok:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(QUERIES)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
