"""bench.py's final stdout line must survive the driver's capture.

r13 verdict item 4: the driver keeps only the LAST 2000 characters of
bench stdout; BENCH_r13.json came back ``"parsed": null`` because the
~4 KB compact line was truncated mid-dict. The final line is now built
by ``bench.compact_line`` and hard-asserted under 1900 bytes — these
tests pin that bound against a full-sized synthetic document (more
headline rows and longer names than the real bench ships today, so the
bound fails HERE before it fails in a round archive).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from bench import compact_line  # noqa: E402


def _doc(n_queries: int) -> dict:
    # name length matches the real headline block's mean (~24 chars);
    # the count is padded past today's 37 rows for growth headroom
    queries = {
        f"family_subject_detail_{i:03d}": round(0.123 + i * 0.01, 3)
        for i in range(n_queries)
    }
    ratios = {n: round(1.0 + (i % 13) / 10, 2) for i, n in enumerate(queries)}
    return {
        "metric": "headline_total",
        "value": 123.456,
        "unit": "sec",
        "queries": queries,
        "queries_median": queries,
        "sf": 0.1,
        "pq_index": {
            "rerank_recall_at_10": 0.88,
            "ivf": {"recall_at_10": 0.66},
        },
        "big": {"sf": 0.5, "total": 111.111, "queries": queries},
        "big2": {
            "sf": 1.0,
            "total": 222.222,
            "queries": queries,
            "ratio_vs_sf0.5": ratios,
        },
        "skew": {
            "ratio_hot_vs_uniform": {
                "events_sessionize": 1.39,
                "events_changepoint_cusum": 0.85,
                "events_bot_regularity": 0.98,
            }
        },
    }


def test_compact_line_fits_driver_tail_window():
    # 42 rows of real-length names is bigger than the real headline block
    # (37 rows today) — growth past this trips the in-bench assert first
    line = compact_line(_doc(42))
    assert len(line) < 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_total"
    assert len(parsed["queries"]) == 42
    # ratio table must be cut to the worst 3 steps, not shipped whole
    assert len(parsed["big2"]["worst_steps"]) == 3
    assert max(parsed["big2"]["worst_steps"].values()) == 2.2
    assert parsed["skew_max_ratio"] == 1.39
    assert "queries_median" not in parsed  # full doc stays in the file


def test_compact_line_on_last_archived_full_doc():
    # the real r13 document (the exact shape that failed capture) must
    # now produce a parseable line under the window
    full = ROOT / "BENCH_FULL.json"
    if not full.exists():
        return
    line = compact_line(json.loads(full.read_text()))
    assert len(line) < 1900
    assert json.loads(line)["queries"]


def test_compact_line_minimal_doc():
    # sf-only run (no big blocks, no index bench) still produces a line
    out = {"value": 1.0, "queries": {"a": 1.0}, "sf": 0.01}
    parsed = json.loads(compact_line(out))
    assert parsed["value"] == 1.0
    assert "big" not in parsed and "recall" not in parsed
