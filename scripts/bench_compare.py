"""Compare two bench JSON artifacts per query and separate real plan
regressions from scheduler noise, using the r8 measurement protocol:
a row is flagged only when BOTH its min and its median worsened past
the threshold (noise inflates individual samples — it moves the min or
the median, rarely both, while a plan regression moves every sample).

Usage:
    python scripts/bench_compare.py OLD.json NEW.json [threshold]

threshold: fractional worsening that counts (default 0.10 = +10%).
Exit code 1 when any row is flagged. Rows present in only one artifact
(added/removed queries) are listed but never flagged.
"""

from __future__ import annotations

import json
import sys


def _blocks(doc: dict):
    """Yield (block_name, queries_min, queries_median) for every scale
    block in a bench artifact. Pre-r8 artifacts have no medians — an
    empty dict makes the median test vacuously pass and the comparison
    falls back to min-only (reported as 'min-only')."""
    yield "headline", doc.get("queries", {}), doc.get("queries_median", {})
    for name in ("big", "big2"):
        blk = doc.get(name)
        if blk:
            yield name, blk.get("queries", {}), blk.get("queries_median", {})


# r8 verdict item 2: PQ rerank below 0.8 is a weak index — the rerank
# depth/codebook must recover quantization loss. IVF's floor is a
# COLLAPSE guard, not a quality bar: exact cosine over probed cells is
# information-limited by corpus cluster structure at a fixed scan
# fraction (the sf0.1 synthetic embeddings plateau at ~0.66 recall for
# a 25% probe no matter how the cells are built — measured across
# seeded/kmeans/8/16/32-cell configs; at sf0.5+ the same config sits at
# 0.9-1.0), so the floor flags a broken bucketer (~0.25 = scan-fraction
# recall), not data-dependent headroom.
# r15: IVF floor raised 0.6 -> 0.8 (verdict item 2) — assign_top=2 soft
# assignment holds ~0.86 at the sf0.1 bench config, the binding block
RECALL_FLOORS = {"rerank_recall_at_10": 0.8, "ivf.recall_at_10": 0.8}


def recall_floors(doc: dict, floors: dict | None = None) -> list[str]:
    """Flag any scale block whose index recall@10 sits below its floor:
    latency rows are useless if the index stopped finding the true
    neighbors. Checks the PQ rerank path and IVF (the quantities the
    bench archives); raw no-rerank ADC recall is diagnostic-only."""
    floors = floors or RECALL_FLOORS
    bad = []
    blocks = [("headline", doc)] + [
        (n, doc[n]) for n in ("big", "big2") if doc.get(n)
    ]
    for name, blk in blocks:
        idx = blk.get("pq_index") or {}
        for key, val in (
            ("rerank_recall_at_10", idx.get("rerank_recall_at_10")),
            ("ivf.recall_at_10", (idx.get("ivf") or {}).get("recall_at_10")),
        ):
            if val is not None and val < floors[key]:
                bad.append(f"{name}/{key}: {val} < floor {floors[key]}")
    return bad


def host_factor(old: dict, new: dict) -> float | None:
    """new-host / old-host slowdown from the fixed calibration probes
    (bench.py `calibration`): the geometric mean of the two probe
    ratios, or None when either artifact predates the probes. A factor
    of 1.25 means today's machine runs the SAME work 25% slower — every
    per-query time is scaled by it before comparison, so a uniform
    host slowdown (r9: mean row ratio 1.24, Spearman 0.988, rows
    untouched since r8 inflating 45%+) no longer floods the report
    while a genuine single-plan regression still stands out."""
    co, cn = old.get("calibration"), new.get("calibration")
    if not co or not cn:
        return None
    ratios = [
        cn[k] / co[k]
        for k in ("jvm_range_sum", "jvm_shuffle_agg", "py_spin")
        if co.get(k) and cn.get(k)
    ]
    if not ratios:
        return None
    prod = 1.0
    for r in ratios:
        prod *= r
    return prod ** (1.0 / len(ratios))


def compare(old: dict, new: dict, threshold: float = 0.10):
    flagged, noise, improved, added, removed = [], [], [], [], []
    factor = host_factor(old, new) or 1.0
    old_blocks = {n: (q, m) for n, q, m in _blocks(old)}
    for name, nq, nm in _blocks(new):
        oq, om = old_blocks.get(name, ({}, {}))
        for q in sorted(nq):
            if q not in oq:
                added.append(f"{name}/{q}")
                continue
            o, n = oq[q] * factor, nq[q]
            delta = (n - o) / o if o else 0.0
            row = f"{name}/{q}: {o:.3f} -> {n:.3f} ({delta:+.0%})"
            if n > (1 + threshold) * o:
                o_med, n_med = om.get(q), nm.get(q)
                o_med = o_med * factor if o_med is not None else None
                med_worse = (
                    o_med is None  # pre-r8 artifact: min-only evidence
                    or n_med is None
                    or n_med > (1 + threshold) * o_med
                )
                if med_worse:
                    tag = " [min-only evidence]" if o_med is None or n_med is None else ""
                    flagged.append(row + tag)
                else:
                    noise.append(row + f" (median {o_med:.3f} -> {n_med:.3f}: noise)")
            elif n < (1 - threshold) * o:
                improved.append(row)
        for q in sorted(oq):
            if q not in nq:
                removed.append(f"{name}/{q}")
    return flagged, noise, improved, added, removed


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.10
    factor = host_factor(old, new)
    if factor is not None:
        print(f"== host calibration factor: new/old = {factor:.3f} "
              "(old times scaled by it before comparison) ==")
    flagged, noise, improved, added, removed = compare(old, new, threshold)
    low_recall = recall_floors(new)
    if low_recall:
        print("== RECALL BELOW FLOOR ==")
        for r in low_recall:
            print("  " + r)
        flagged = flagged + low_recall
    for title, rows in (
        ("REGRESSED (min AND median past threshold)", flagged),
        ("noisy (min worsened, median held)", noise),
        ("improved", improved),
        ("added", added),
        ("removed", removed),
    ):
        if rows:
            print(f"== {title} ==")
            for r in rows:
                print("  " + r)
    print(
        f"== {len(flagged)} regressed, {len(noise)} noisy, "
        f"{len(improved)} improved, {len(added)} added, {len(removed)} removed =="
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
