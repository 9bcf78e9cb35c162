"""Driver-window rotation helper.

The driver's correctness harness samples the first 50 registry entries
(see ``queries.DRIVER_WINDOW``). This tool reads every
``CORRECTNESS_r*.json`` in the repo root and reports which
oracle-checked queries have NEVER had a driver row — the rotation
candidates for next round's window.

Usage: python tools/window_rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from classification_pyspark_spark.queries import DRIVER_WINDOW, ORACLES, QUERIES  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_green() -> dict[str, str]:
    """Map query name -> first CORRECTNESS_r*.json artifact it was green in."""
    seen: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("err") is None and row.get("hash_match"):
                    seen.setdefault(name, rnd)
    return seen


def last_green() -> dict[str, int]:
    """Map query name -> LATEST round number it was driver-green in —
    the freshness key the re-verification slots rotate on (stalest
    first). Distinct from driver_green(), which records the FIRST
    green round for never-checked detection."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("err") is None and row.get("hash_match"):
                    latest[name] = max(latest.get(name, 0), rnd)
    return latest


def rotation_candidates() -> list[str]:
    """Oracle queries that have never had a driver-green CORRECTNESS row,
    in registry order. The window's never-checked prefix must equal this
    (tests/test_registry_window.py pins it)."""
    seen = driver_green()
    return [n for n in QUERIES if n in ORACLES and n not in seen]


def main() -> int:
    seen = driver_green()
    never = rotation_candidates()
    rows_only = [n for n in QUERIES if n not in ORACLES]
    in_window_already_green = [n for n in DRIVER_WINDOW if n in seen]

    print(f"registry: {len(QUERIES)} queries, {len(ORACLES)} oracle-checked")
    print(f"driver-green somewhere: {len(seen)}")
    print(f"\nnever driver-checked (rotation candidates, {len(never)}):")
    for n in never:
        marker = "  [in current window]" if n in DRIVER_WINDOW else ""
        print(f"  {n}{marker}")
    print(f"\nrows-only by design ({len(rows_only)}): {rows_only}")
    print(
        f"\ncurrent window slots already green in a prior round "
        f"({len(in_window_already_green)}): rotate these out next"
    )
    for n in in_window_already_green:
        print(f"  {n} (green in {seen[n]})")

    # freshness ordering for the re-verification slots: next window =
    # never-checked (above, registry order) + this list's head until 50
    latest = last_green()
    stale = sorted(
        (n for n in QUERIES if n in ORACLES and n in latest),
        key=lambda n: (latest[n], list(QUERIES).index(n)),
    )
    fill = 50 - len(never)
    print(f"\nstalest driver-green rows (re-verification fill, take {fill}):")
    for n in stale[:fill]:
        print(f"  r{latest[n]:02d} {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
