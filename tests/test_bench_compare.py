"""scripts/bench_compare.py — the regression-vs-noise classifier the
r8 measurement protocol rests on (a row regresses only when min AND
median both worsen; a noisy sample moves one but not both)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from bench_compare import compare  # noqa: E402


def _doc(mins, meds=None, big=None):
    d = {"queries": mins, "queries_median": meds or {}}
    if big:
        d["big"] = big
    return d


def test_flags_only_min_and_median_regressions():
    old = _doc({"a": 1.0, "b": 1.0, "c": 1.0}, {"a": 1.1, "b": 1.1, "c": 1.1})
    new = _doc(
        {"a": 1.5, "b": 1.5, "c": 0.8},  # a+b min regressed, c improved
        {"a": 1.6, "b": 1.12, "c": 0.9},  # only a's median regressed too
    )
    flagged, noise, improved, added, removed = compare(old, new)
    assert any("headline/a" in r for r in flagged) and len(flagged) == 1
    assert any("headline/b" in r for r in noise) and len(noise) == 1
    assert any("headline/c" in r for r in improved)
    assert not added and not removed


def test_pre_r8_artifact_falls_back_to_min_only():
    old = _doc({"a": 1.0})  # no medians (pre-r8 bench format)
    new = _doc({"a": 1.5}, {"a": 1.5})
    flagged, noise, *_ = compare(old, new)
    assert len(flagged) == 1 and "min-only" in flagged[0]
    assert not noise


def test_added_removed_and_big_blocks():
    old = _doc({"a": 1.0}, {"a": 1.0}, big={"queries": {"x": 2.0}, "queries_median": {"x": 2.0}})
    new = _doc({"a": 1.0, "n": 0.5}, {"a": 1.0, "n": 0.5}, big={"queries": {}, "queries_median": {}})
    flagged, noise, improved, added, removed = compare(old, new)
    assert added == ["headline/n"] and removed == ["big/x"]
    assert not flagged and not noise and not improved


def test_recall_floor_gate():
    from bench_compare import recall_floors

    good = _doc({"a": 1.0}, {"a": 1.0})
    good["pq_index"] = {
        "rerank_recall_at_10": 0.88,
        "ivf": {"recall_at_10": 0.9},
    }
    assert recall_floors(good) == []
    # r15: the IVF floor rose 0.6 -> 0.8 with the assign_top=2 soft
    # assignment (sf0.1 holds ~0.86) — the old 0.66 operating point now
    # correctly FAILS the gate, and the soft-assignment point passes
    mid = _doc({"a": 1.0}, {"a": 1.0})
    mid["pq_index"] = {"rerank_recall_at_10": 0.88, "ivf": {"recall_at_10": 0.86}}
    assert recall_floors(mid) == []
    old_point = _doc({"a": 1.0}, {"a": 1.0})
    old_point["pq_index"] = {
        "rerank_recall_at_10": 0.88,
        "ivf": {"recall_at_10": 0.66},
    }
    assert any("ivf.recall_at_10" in r for r in recall_floors(old_point))
    bad = _doc({"a": 1.0}, {"a": 1.0}, big={"queries": {}, "queries_median": {}})
    bad["pq_index"] = {"rerank_recall_at_10": 0.38, "ivf": {"recall_at_10": 0.9}}
    bad["big"]["pq_index"] = {"ivf": {"recall_at_10": 0.5}}
    out = recall_floors(bad)
    assert any("headline/rerank_recall_at_10" in r for r in out)
    assert any("big/ivf.recall_at_10" in r for r in out)
    assert len(out) == 2
    # absent recall fields (e.g. no-index runs) never flag
    assert recall_floors(_doc({"a": 1.0}, {"a": 1.0})) == []


def test_host_calibration_normalizes_uniform_slowdown():
    from bench_compare import compare, host_factor

    old = _doc({"a": 1.0, "b": 2.0}, {"a": 1.0, "b": 2.0})
    old["calibration"] = {"jvm_range_sum": 1.0, "py_spin": 0.5}
    new = _doc({"a": 1.25, "b": 2.5}, {"a": 1.25, "b": 2.5})
    new["calibration"] = {"jvm_range_sum": 1.25, "py_spin": 0.625}
    assert abs(host_factor(old, new) - 1.25) < 1e-9
    flagged, noise, improved, *_ = compare(old, new)
    assert not flagged and not noise and not improved  # pure host slowdown

    # a single genuinely-regressed row still stands out after scaling
    new["queries"]["b"] = 4.0
    new["queries_median"]["b"] = 4.0
    flagged, *_ = compare(old, new)
    assert len(flagged) == 1 and "b" in flagged[0]

    # artifacts without probes compare unscaled (back-compat)
    assert host_factor(_doc({"a": 1.0}), new) is None
