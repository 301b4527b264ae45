"""Per-round rotation of the registry interleave (r8/r9/r10 verdict items).

The driver's correctness gate hashes only the FIRST ~50 registry
entries. The ordering must (a) be a pure reordering, (b) rotate fresh
names into the prefix each round, (c) prefer never-driver-checked
oracle-bearing names, and (d) NEVER spend a sample slot on a rows-only
(oracle=None) query — the driver can only record `err: no_oracle` for
those (r10 verdict item 3).

r10 verdict item 2: these tests previously read the LIVE repo-root
CORRECTNESS_r*.json artifacts, so the driver writing a new artifact
broke the suite on exactly the tree it grades. Every coverage-aware
assertion now runs against SYNTHETIC checked-sets via monkeypatch
(empty / partial / near-exhausted), and the artifact parser is tested
against fixture files in a tmp dir — nothing here depends on what the
driver has or hasn't written.
"""

from __future__ import annotations

import json
import os

import pytest

import dataingestionplayground_spark.queries as Q
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


def _oracle_names() -> list[str]:
    qs = all_queries()
    return [n for n, q in qs.items() if q.oracle is not None]


def _bare_names() -> set[str]:
    qs = all_queries()
    return {n for n, q in qs.items() if q.oracle is None}


@pytest.fixture
def checked(monkeypatch):
    """Install a synthetic driver-checked set; returns the setter."""

    def _set(names):
        s = set(names)
        monkeypatch.setattr(Q, "_driver_checked_names", lambda root=None: s)
        return s

    return _set


def test_rotation_is_a_pure_reordering(checked):
    checked([])
    base = _with_offset(0)
    for off in (1, 9, 137):
        rotated = _with_offset(off)
        assert sorted(rotated) == sorted(base)
        assert len(set(rotated)) == len(rotated)


def test_rotation_moves_new_names_into_the_prefix_window(checked):
    # successive round offsets must surface a materially different
    # first-50 sample (the driver's gate size) when nothing is checked
    checked([])
    first50 = {off: set(_with_offset(off)[:50]) for off in (0, 9, 10)}
    assert len(first50[9] - first50[0]) >= 20
    assert len(first50[10] - first50[0]) >= 20


def test_rotation_keeps_family_interleave_in_prefix(checked):
    # with an EMPTY checked set the prefix window must still cover many
    # families (the original interleave guarantee) at any offset
    checked([])
    for off in (0, 9):
        fams = {n.split("_", 1)[0] for n in _with_offset(off)[:50]}
        assert len(fams) >= 12


def test_prefix_window_prefers_never_checked_names_partial(checked):
    # synthetic mid-campaign state: 125 names checked (the real r10
    # cumulative count) -> the whole first-50 window is never-checked
    oracle_names = _oracle_names()
    cset = checked(oracle_names[:125])
    names = _with_offset(10)
    window = names[:50]
    assert all(n not in cset for n in window)
    assert all(n not in _bare_names() for n in window)


def test_prefix_window_near_exhausted(checked):
    # all but 30 oracle-bearing names checked: the 30 survivors lead,
    # then green names re-fill the window; rows-only names still last
    oracle_names = _oracle_names()
    survivors = set(oracle_names[-30:])
    cset = checked(set(oracle_names) - survivors)
    names = _with_offset(11)
    window = names[:50]
    assert set(window[:30]) == survivors or all(
        n in survivors for n in window if n not in cset
    )
    # the first 30 slots are exactly the unchecked names (order aside)
    assert {n for n in window if n not in cset} == survivors
    assert all(n not in _bare_names() for n in window)


def test_rows_only_queries_never_occupy_sample_slots(checked):
    # r10 verdict item 3: even with EVERYTHING checked, oracle=None
    # queries sort behind every oracle-bearing name — the driver's
    # 50-name window must contain zero of them at any offset
    bare = _bare_names()
    assert bare, "registry should have some rows-only queries"
    for cset in (set(), set(_oracle_names())):
        checked(cset)
        for off in (0, 5, 11):
            names = _with_offset(off)
            assert not (set(names[:50]) & bare)
            # still a pure reordering: rows-only names are present, last
            assert bare <= set(names)
            assert set(names[-len(bare):]) == bare


def test_checked_names_parser_counts_no_oracle_rows_as_checked(tmp_path):
    # the artifact parser itself, on fixture files in a tmp root:
    # clean hash match -> checked; sampled rows-only -> checked;
    # hash mismatch / spark error / zero-rows no_oracle -> NOT checked
    art = {
        "green_q": {"err": None, "hash_match": True, "rows_match": True,
                    "spark_rows": 10, "oracle_rows": 10},
        "rows_only_q": {"err": "no_oracle", "hash_match": None,
                        "rows_match": None, "spark_rows": 500,
                        "oracle_rows": None},
        "red_q": {"err": None, "hash_match": False, "rows_match": False,
                  "spark_rows": 10, "oracle_rows": 10},
        # the r10 events_ema_smooth shape: rows matched, HASH failed —
        # must re-front (NOT count as checked)
        "hash_red_q": {"err": None, "hash_match": False, "rows_match": True,
                       "spark_rows": 10, "oracle_rows": 10},
        "err_q": {"err": "spark error", "hash_match": None,
                  "rows_match": None, "spark_rows": 0, "oracle_rows": None},
        "empty_rows_only_q": {"err": "no_oracle", "spark_rows": 0},
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(art))
    got = Q._driver_checked_names(root=tmp_path)
    assert got == {"green_q", "rows_only_q"}


def test_checked_names_parser_ignores_junk(tmp_path):
    (tmp_path / "CORRECTNESS_r1.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_rX.json").write_text('{"a": {"err": null, "hash_match": true}}')
    assert Q._driver_checked_names(root=tmp_path) == set()


def test_live_artifacts_never_break_ordering():
    # integration smoke WITHOUT brittle assertions: whatever the driver
    # has written into the repo root, all_queries stays a complete,
    # duplicate-free ordering with rows-only names out of the window
    names = list(all_queries())
    assert len(set(names)) == len(names)
    assert not (set(names[:50]) & _bare_names())


def test_fallback_snapshot_fronts_post_snapshot_names():
    # r13: CORRECTNESS artifacts are untracked, so a fresh checkout
    # (driver session restart) loses them mid-round. The tracked
    # snapshot must then stand in: the live checked-set is non-empty
    # and every registry name ABSENT from the snapshot (i.e. added
    # after its as_of_round) sorts into the first-50 window.
    import json
    from pathlib import Path

    pkg = Path(Q.__file__).resolve().parent
    snap = json.loads((pkg / "driver_checked_fallback.json").read_text())
    snap_names = set(snap["names"])
    assert len(snap_names) >= 200 and snap["as_of_round"] >= 12
    qs = all_queries()
    post = {n for n, q in qs.items() if n not in snap_names and q.oracle is not None}
    # on a tree with no artifacts this is the live path; with artifacts
    # present the artifact-derived set governs instead — either way the
    # window math below must hold for the snapshot itself
    import dataingestionplayground_spark.queries as QQ

    live = QQ._driver_checked_names()
    assert live, "fallback (or artifacts) must yield a non-empty checked set"
    if not post:
        return
    # simulate the artifact-less state explicitly
    order = None
    orig = QQ._driver_checked_names
    try:
        QQ.__dict__["_driver_checked_names"] = lambda root=None: snap_names
        order = list(all_queries())
    finally:
        QQ.__dict__["_driver_checked_names"] = orig
    first50 = set(order[:50])
    assert post <= first50, f"post-snapshot names missing from window: {post - first50}"


def test_fallback_ignored_when_artifacts_exist(tmp_path):
    # explicit root + a valid artifact: only the artifact's names count
    # (the snapshot never overrides live driver records)
    art = {"only_q": {"err": None, "hash_match": True, "spark_rows": 1,
                      "oracle_rows": 1}}
    (tmp_path / "CORRECTNESS_r50.json").write_text(json.dumps(art))
    assert Q._driver_checked_names(root=tmp_path) == {"only_q"}


def test_snapshot_unions_with_artifacts_and_respects_failures(tmp_path):
    # post-ledger review of the fallback: the first artifact written
    # after a fresh checkout covers ~50 names; it must UNION with the
    # snapshot (not shadow it), while an explicit failure record beats
    # the snapshot (live bad news re-fronts the query)
    pkg = __import__("pathlib").Path(Q.__file__).resolve().parent
    snap_names = set(
        json.loads((pkg / "driver_checked_fallback.json").read_text())["names"]
    )
    victim = sorted(snap_names)[0]
    art = {
        "brand_new_green": {"err": None, "hash_match": True,
                            "spark_rows": 5, "oracle_rows": 5},
        victim: {"err": None, "hash_match": False, "rows_match": False,
                 "spark_rows": 5, "oracle_rows": 5},
    }
    (tmp_path / "CORRECTNESS_r40.json").write_text(json.dumps(art))
    got = Q._driver_checked_names(root=tmp_path, use_snapshot=True)
    assert "brand_new_green" in got
    assert victim not in got            # live hash-fail overrides snapshot
    assert (snap_names - {victim}) <= got  # the rest of the snapshot survives


def test_snapshot_regenerate_prunes_failed_and_hashes(tmp_path):
    # r14 ADVICE item 1: regeneration merges (old | artifact_checked)
    # - artifact_failed, so a name whose latest artifact records a hash
    # mismatch LEAVES the tracked fallback instead of riding the old
    # snapshot through the union forever; names absent from the live
    # registry are pruned; every survivor carries its content hash.
    from scripts.snapshot_checked import regenerate

    qs = all_queries()
    oracle_names = [n for n, q in qs.items() if q.oracle is not None]
    victim, fresh = oracle_names[0], oracle_names[1]
    art = {
        fresh: {"err": None, "hash_match": True, "spark_rows": 3,
                "oracle_rows": 3},
        victim: {"err": None, "hash_match": False, "rows_match": True,
                 "spark_rows": 3, "oracle_rows": 3},
    }
    (tmp_path / "CORRECTNESS_r77.json").write_text(json.dumps(art))
    old = {"names": [victim, "deleted_query_name"], "as_of_round": 1}
    out = regenerate(tmp_path, old)
    assert victim not in out["names"]
    assert fresh in out["names"]
    assert "deleted_query_name" not in out["names"]
    assert set(out["hashes"]) == set(out["names"])
    assert out["as_of_round"] == 77
    # and the failure prune survives a SECOND regeneration with no new
    # artifacts recording the victim (it must not resurrect via `before`)
    out2 = regenerate(tmp_path, out)
    assert victim not in out2["names"]


def test_snapshot_hash_invalidation_refronts_changed_queries(tmp_path):
    # r14 ADVICE item 2: a snapshot entry whose stored content hash no
    # longer matches the live registry (fn source or oracle changed
    # since verification) is dropped from the checked set, so the
    # changed query re-fronts into the driver's sample window.
    qs = all_queries()
    oracle_names = [n for n, q in qs.items() if q.oracle is not None]
    a, b = oracle_names[0], oracle_names[1]
    snap = {
        "names": [a, b],
        "hashes": {a: Q._query_content_hash(qs[a]), b: "0" * 16},
    }
    p = tmp_path / "snap.json"
    p.write_text(json.dumps(snap))
    got = Q._driver_checked_names(root=tmp_path, use_snapshot=True, snap_path=p)
    assert a in got
    assert b not in got


def test_snapshot_regenerate_drops_stale_hashes_unless_rechecked(tmp_path):
    # a carried-over name whose content hash changed since the old
    # snapshot is NOT re-stamped (the driver verified the OLD code) —
    # unless an artifact records a fresh check of the new code
    from scripts.snapshot_checked import regenerate

    qs = all_queries()
    oracle_names = [n for n, q in qs.items() if q.oracle is not None]
    changed, rechecked = oracle_names[0], oracle_names[1]
    (tmp_path / "CORRECTNESS_r78.json").write_text(json.dumps({
        rechecked: {"err": None, "hash_match": True, "spark_rows": 1,
                    "oracle_rows": 1},
    }))
    old = {
        "names": [changed, rechecked],
        "hashes": {changed: "f" * 16, rechecked: "f" * 16},  # both stale
    }
    out = regenerate(tmp_path, old)
    assert changed not in out["names"]       # stale + unrechecked: drops
    assert rechecked in out["names"]         # stale but artifact-green
    assert out["hashes"][rechecked] == Q._query_content_hash(qs[rechecked])


def test_snapshot_refold_does_not_rebless_edited_code(tmp_path):
    # r15 ADVICE: each artifact round is stamped exactly once. If a
    # query is edited AFTER its CORRECTNESS artifact was folded in, a
    # later regeneration with the same artifact still on disk must NOT
    # re-stamp the new (unverified) code as hash-matched — the name
    # drops and re-fronts until a NEW artifact round records it.
    from scripts.snapshot_checked import regenerate

    qs = all_queries()
    oracle_names = [n for n, q in qs.items() if q.oracle is not None]
    edited, stable = oracle_names[0], oracle_names[1]
    (tmp_path / "CORRECTNESS_r80.json").write_text(json.dumps({
        edited: {"err": None, "hash_match": True, "spark_rows": 1,
                 "oracle_rows": 1},
        stable: {"err": None, "hash_match": True, "spark_rows": 1,
                 "oracle_rows": 1},
    }))
    out1 = regenerate(tmp_path, {"names": []})
    assert edited in out1["names"] and stable in out1["names"]
    stamps = out1["artifact_stamps"]["80"]
    assert stamps[edited] == Q._query_content_hash(qs[edited])
    # simulate an edit after the first fold: the round-80 stamp now
    # disagrees with the live hash
    out1["artifact_stamps"]["80"][edited] = "0" * 16
    out1["hashes"][edited] = "0" * 16  # carried hash is stale too
    out2 = regenerate(tmp_path, out1)
    assert edited not in out2["names"], "refold re-blessed edited code"
    assert stable in out2["names"]
    # the first-fold stamp is preserved, not overwritten
    assert out2["artifact_stamps"]["80"][edited] == "0" * 16
    # a NEW artifact round re-verifying the edited query brings it back
    (tmp_path / "CORRECTNESS_r81.json").write_text(json.dumps({
        edited: {"err": None, "hash_match": True, "spark_rows": 1,
                 "oracle_rows": 1},
    }))
    out3 = regenerate(tmp_path, out2)
    assert edited in out3["names"]
    assert out3["hashes"][edited] == Q._query_content_hash(qs[edited])


def test_tracked_snapshot_hashes_match_live_registry():
    # the committed snapshot must be regenerated whenever a listed query
    # changes — otherwise its entries silently self-invalidate and the
    # window floods with long-green names on a fresh checkout
    from pathlib import Path

    pkg = Path(Q.__file__).resolve().parent
    snap = json.loads((pkg / "driver_checked_fallback.json").read_text())
    qs = all_queries()
    hashes = snap.get("hashes") or {}
    assert hashes, "tracked snapshot must carry content hashes (r14)"
    stale = {
        n
        for n in snap["names"]
        if n in qs and hashes.get(n) != Q._query_content_hash(qs[n])
    }
    assert not stale, (
        f"{len(stale)} snapshot entries are stale — run "
        f"scripts/snapshot_checked.py and commit: {sorted(stale)[:5]}"
    )
