"""Regenerate the tracked rotation-state fallback from live artifacts.

The driver's CORRECTNESS_r{N}.json files are untracked, so a fresh
checkout loses them and with them the coverage-aware sample rotation's
memory of what has already been hash-checked. Run this while artifacts
ARE on disk to fold their clean hash-matches into
dataingestionplayground_spark/queries/driver_checked_fallback.json
(tracked), then commit the result.

r14 (ADVICE): the merge is computed from the ARTIFACT-derived sets
only — ``merged = (old_snapshot | artifact_checked) - artifact_failed``
— so a name whose latest artifact recorded a hash mismatch or error is
pruned from the tracked fallback instead of riding the old snapshot
forever. The snapshot also stores a per-name content hash (query fn
source + oracle text); ``_driver_checked_names`` drops entries whose
hash no longer matches, so queries refactored after the snapshot
re-front automatically.

Usage: python scripts/snapshot_checked.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SNAP = (
    ROOT / "dataingestionplayground_spark" / "queries" / "driver_checked_fallback.json"
)


def regenerate(root, snap: dict) -> dict:
    """Pure merge: fold the artifacts under ``root`` into ``snap``.

    * checked/failed come from the artifacts ONLY (use_snapshot=False
      semantics) — a recorded failure prunes the name from the snapshot;
    * names are restricted to the live registry (deleted queries leave);
    * every surviving name gets its current content hash.

    r15 (ADVICE): each artifact round is STAMPED exactly once. The first
    regeneration that sees ``CORRECTNESS_r{N}.json`` records, under
    ``artifact_stamps[N]``, the content hash of every checked name as it
    stands on disk at that moment (run the tool at round open/close,
    before editing queries, so this equals what the driver verified).
    Later regenerations do NOT re-stamp: a name whose current hash no
    longer matches its round-N stamp is treated as unverified by round N
    and re-fronts, instead of riding back in with a fresh hash.
    """
    from dataingestionplayground_spark.queries import (
        REGISTRY,
        _artifact_check_records,
        _query_content_hash,
        all_queries,
    )

    all_queries()  # populate REGISTRY
    records = _artifact_check_records(root)
    stamps: dict[str, dict[str, str]] = {
        k: dict(v) for k, v in (snap.get("artifact_stamps") or {}).items()
    }
    checked: set[str] = set()
    failed: set[str] = set()
    for rnd in sorted(records):
        chk, fld = records[rnd]
        failed |= fld
        prior = stamps.get(str(rnd))
        if prior is None:
            # first fold of this artifact: stamp its checked names with
            # the implementation hash on disk right now
            stamp = {
                n: _query_content_hash(REGISTRY[n]) for n in sorted(chk & set(REGISTRY))
            }
            stamps[str(rnd)] = stamp
            checked |= set(stamp)
        else:
            # re-fold: only names still matching their first-fold stamp
            # count as verified by this artifact
            checked |= {
                n
                for n in chk
                if n in REGISTRY and prior.get(n) == _query_content_hash(REGISTRY[n])
            }
    before = set(snap.get("names", []))
    # a carried-over name whose content hash changed since the old
    # snapshot was stamped is NOT re-stamped — the driver verified the
    # OLD implementation, so the name re-fronts until a new artifact
    # records the new code (names re-checked by artifacts stay, since
    # checked re-adds them below)
    old_hashes = snap.get("hashes") or {}
    if old_hashes:
        before -= {
            n
            for n in before
            if n in REGISTRY and old_hashes.get(n) != _query_content_hash(REGISTRY[n])
        }
    merged = sorted(((before | checked) - failed) & set(REGISTRY))
    out = dict(snap)
    out["names"] = merged
    out["hashes"] = {n: _query_content_hash(REGISTRY[n]) for n in merged}
    out["artifact_stamps"] = stamps
    out["as_of_round"] = max([snap.get("as_of_round", 0), *records, 0])
    return out


def main() -> None:
    artifacts = sorted(
        p
        for p in ROOT.glob("CORRECTNESS_r*.json")
        if re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
    )
    if not artifacts:
        print("no CORRECTNESS_r*.json artifacts on disk — nothing to fold in")
        return
    snap = json.loads(SNAP.read_text()) if SNAP.exists() else {"names": []}
    before = len(snap.get("names", []))
    out = regenerate(ROOT, snap)
    SNAP.write_text(json.dumps(out, indent=1))
    print(
        f"snapshot regenerated from {len(artifacts)} artifacts: "
        f"{before} -> {len(out['names'])} names "
        f"(as_of_round={out['as_of_round']}, hashes={len(out['hashes'])})"
    )


if __name__ == "__main__":
    main()
