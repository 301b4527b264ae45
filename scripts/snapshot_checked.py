"""Regenerate the tracked rotation-state fallback from live artifacts.

The driver's CORRECTNESS_r{N}.json files are untracked, so a fresh
checkout loses them and with them the coverage-aware sample rotation's
memory of what has already been hash-checked. Run this while artifacts
ARE on disk to fold their clean hash-matches into
dataingestionplayground_spark/queries/driver_checked_fallback.json
(tracked), then commit the result.

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


def main() -> None:
    import dataingestionplayground_spark.queries as Q

    artifacts = sorted(
        p
        for p in ROOT.glob("CORRECTNESS_r*.json")
        if re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
    )
    if not artifacts:
        print("no CORRECTNESS_r*.json artifacts on disk — nothing to fold in")
        return
    live = Q._driver_checked_names()  # artifact-derived (artifacts present)
    snap = json.loads(SNAP.read_text()) if SNAP.exists() else {"names": []}
    before = set(snap.get("names", []))
    merged = sorted(before | live)
    rounds = [int(re.findall(r"\d+", p.name)[0]) for p in artifacts]
    snap["names"] = merged
    snap["as_of_round"] = max([snap.get("as_of_round", 0), *rounds])
    SNAP.write_text(json.dumps(snap, indent=1))
    print(
        f"folded {len(live)} artifact-checked names into snapshot: "
        f"{len(before)} -> {len(merged)} (as_of_round={snap['as_of_round']})"
    )


if __name__ == "__main__":
    main()
