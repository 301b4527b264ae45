"""Per-round rotation of the registry interleave (r8 verdict item 3).

The driver's correctness gate hashes only the FIRST ~50 registry
entries; the family interleave guarantees coverage of every family in
that prefix, but without rotation the SAME 50 names landed there every
round, leaving the rest only locally verified. These tests pin the two
properties the rotation must keep: it is a pure reordering (every query
present exactly once at any offset), and different offsets genuinely
move different family members into the prefix window.
"""

from __future__ import annotations

import os

from dataingestionplayground_spark.queries import all_queries


def _with_offset(offset: int) -> list[str]:
    prev = os.environ.get("SPARK_GRAFT_SAMPLE_OFFSET")
    os.environ["SPARK_GRAFT_SAMPLE_OFFSET"] = str(offset)
    try:
        return list(all_queries())
    finally:
        if prev is None:
            del os.environ["SPARK_GRAFT_SAMPLE_OFFSET"]
        else:
            os.environ["SPARK_GRAFT_SAMPLE_OFFSET"] = prev


def test_rotation_is_a_pure_reordering():
    base = _with_offset(0)
    for off in (1, 9, 137):
        rotated = _with_offset(off)
        assert sorted(rotated) == sorted(base)
        assert len(set(rotated)) == len(rotated)


def test_rotation_moves_new_names_into_the_prefix_window():
    # successive round offsets must surface a materially different
    # first-50 sample (the driver's gate size); 20 is the verdict's
    # "done" bar with headroom below the observed ~23
    first50 = {off: set(_with_offset(off)[:50]) for off in (0, 9, 10)}
    assert len(first50[9] - first50[0]) >= 20
    assert len(first50[10] - first50[0]) >= 20


def test_prefix_window_prefers_never_driver_checked_names():
    # r9 verdict item 4: the ordering is coverage-aware — names the
    # driver has already hash-checked (recorded in CORRECTNESS_r*.json)
    # sort AFTER never-checked ones, so each round's first-50 window is
    # spent entirely on fresh names until the registry is exhausted
    from dataingestionplayground_spark.queries import _driver_checked_names

    checked = _driver_checked_names()
    if not checked:  # fresh clone without driver artifacts
        return
    names = _with_offset(10)
    n_unchecked = len([n for n in names if n not in checked])
    window = names[: min(50, n_unchecked)]
    assert all(n not in checked for n in window)


def test_rotation_keeps_family_interleave_in_prefix():
    # the prefix window must still cover many families (the original
    # interleave guarantee) at any offset
    for off in (0, 9):
        fams = {n.split("_", 1)[0] for n in _with_offset(off)[:50]}
        assert len(fams) >= 12
