"""Regenerate QUERIES.md: the full registry index (name, module,
oracle status, one-line description from the implementation comment).

Usage: python scripts/dump_queries.py
"""

from __future__ import annotations

import inspect
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataingestionplayground_spark.queries import all_queries


def first_comment(fn) -> str:
    doc = inspect.getdoc(fn)
    if doc:
        return doc.splitlines()[0].strip()
    src = inspect.getsource(fn)
    m = re.search(r"^\s*#\s*(.+)$", src, re.MULTILINE)
    return m.group(1).strip() if m else ""


def main():
    reg = all_queries()
    lines = [
        "# QUERIES — registry index (regenerate: `python scripts/dump_queries.py`)\n",
        f"{len(reg)} queries; **[oracle]** = hash-matched vs DuckDB at sf0.01,",
        "**[rows]** = rows-only (approximate/sketch results by construction).\n",
        "Scale-contract notes (ADVICE r11):",
        "- `vector_semdedup`: the output `cell` column is the top-level",
        "  16-cell assignment at EVERY SF (oracle-exact everywhere); `keep`",
        "  matches the oracle exactly wherever no cell exceeds the pair",
        "  budget (all sf<=0.1, where the hash gate runs) — at sf>=0.5 the",
        "  split guard engages and `keep` is computed on the refined",
        "  clustering (SemDeDup locality approximation, documented in the",
        "  operator docstring).",
        "- `agg_approx_top_users`: exact-counts oracle is guarded by an",
        "  engine-side assert_true (fails loudly past 4096 distinct users",
        "  instead of flaking the gate).",
        "- `agg_countmin_point_freq` (r12): the CMS is measured",
        "  collision-free over the full event user domain at both gate SFs,",
        "  so probe estimates ARE exact counts; the window is pinned in",
        "  pytest (tests/test_r12_ops.py) — at sf0.1+ estimates go",
        "  approximate by design (bounded in tests/test_sketches.py).",
        "- `vector_pca_project` (r12): fixed-iteration decimal-routed power",
        "  iteration (top-2, T=6) — exact-hash everywhere; on this corpus's",
        "  near-flat spectrum the axes are variance-near-optimal rather",
        "  than eigh-identical (pinned in tests/test_pipeline_extras.py);",
        "  operators/pca.py:pca_project (eigh, k=8) is the production",
        "  path.\n",
        "**Rows-only floor — PERMANENT at 2** (r12 verdict item 6, mirroring",
        "the r8 environment-blocked pattern): `agg_kll_quantiles` and",
        "`agg_approx_distinct` (HLL++/t-digest) are the only registry entries",
        "without a value-hash oracle, and they cannot gain one — both",
        "sketches are genuinely randomized inside their published error",
        "bounds (KLL compaction coin-flips above retained capacity;",
        "HLL++/t-digest register/centroid assignment), so two correct runs",
        "legitimately differ and no deterministic SQL can reproduce them.",
        "Their correctness is exactness/error-bound-pinned in",
        "`tests/test_sketches.py` (bounds asserted against exact",
        "counts/quantiles, fixed-seed determinism where the engine exposes a",
        "seed). Every other sketch query (theta, ApproxTopK, count-min) is",
        "hash-matched via a bounded-domain exactness window with loud",
        "in-query guards. Future rounds should not re-open this.\n",
        "| query | check | module | summary |",
        "|---|---|---|---|",
    ]
    for name in sorted(reg):
        q = reg[name]
        mod = q.fn.__module__.split(".")[-1]
        check = "oracle" if q.oracle is not None else "rows"
        lines.append(f"| `{name}` | {check} | {mod} | {first_comment(q.fn)[:90]} |")
    Path("QUERIES.md").write_text("\n".join(lines) + "\n")
    n_oracle = sum(1 for q in reg.values() if q.oracle is not None)
    print(f"wrote QUERIES.md: {len(reg)} queries, {n_oracle} oracle-matched")


if __name__ == "__main__":
    main()
