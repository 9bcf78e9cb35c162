"""The driver's correctness harness samples the FIRST 50 registry
entries; these tests pin the curated window so a refactor can't
silently push a SURVEY §2 family back out of driver visibility
(round-2 verdict: 78 queries had never had a driver CORRECTNESS row).
"""

from classification_pyspark_spark.queries import DRIVER_WINDOW, ORACLES, QUERIES


def test_first_50_is_the_curated_window():
    assert list(QUERIES)[:50] == DRIVER_WINDOW
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_every_window_query_has_an_oracle():
    # No no_oracle rows in the driver-checked window: every slot buys
    # a full row-count + schema + value-hash comparison.
    missing = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert missing == []


def test_window_maximizes_new_driver_coverage():
    """Round-4+ rotation policy: a window slot is wasted if its query
    already has a driver-green CORRECTNESS row from a prior round, so
    as long as never-driver-checked oracle queries remain, EVERY slot
    must be one of them (the round-3 verdict: an unrotated window
    'verifies nothing new')."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("err") is None and row.get("hash_match"):
                    seen.add(name)
    if not seen:  # fresh clone without driver artifacts: nothing to pin
        return
    never = {n for n in QUERIES if n in ORACLES and n not in seen}
    wasted = [n for n in DRIVER_WINDOW if n in seen]
    # every wasted slot must be justified by candidate exhaustion:
    # allowed only when fewer never-checked candidates exist than slots
    assert len(never) <= 50 - len(wasted) or not wasted, (
        f"{len(never)} never-driver-checked oracle queries remain but the window "
        f"re-verifies already-green: {wasted}"
    )


def test_window_matches_rotation_tool():
    """Round-4 verdict: the hand-maintained rotation comment drifted from
    the tool's candidate list. Pin the window to tools/window_rotation.py
    output instead: every never-driver-checked oracle query (up to 50)
    must occupy a window slot, so the rotation can never be hand-mangled."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from window_rotation import rotation_candidates
    finally:
        sys.path.pop(0)

    candidates = rotation_candidates()
    if not candidates and not os.path.exists(
        os.path.join(repo, "CORRECTNESS_r01.json")
    ):
        return  # fresh clone without driver artifacts: nothing to pin
    missing = [n for n in candidates[:50] if n not in DRIVER_WINDOW]
    assert missing == [], (
        f"never-driver-checked oracle queries absent from DRIVER_WINDOW: {missing}"
    )


def test_registry_reorder_loses_nothing():
    # reordering must be a permutation: every registered query and
    # oracle is still present exactly once
    assert len(QUERIES) == len(set(QUERIES))
    assert set(ORACLES) <= set(QUERIES)
