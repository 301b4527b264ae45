"""Three-run adjudication protocol for driver-flagged bench rows
(r11 verdict item 1): time EXACTLY the flagged rows at sf0.5 and sf1.0
on an idle host, with the bench's own probe calibration recorded, and
report the host-invariant 2x-rows step (sf0.5 -> sf1.0) as min AND
median per row.

r12 targets: vector_pq_index_search (driver step 4.36x) and
vector_pq_index_rerank (6.01x), plus the watch rows
events_autocorrelation (3.12x) and sample_reservoir_weighted (2.26x),
plus text_interpolated_perplexity (verdict item 4: the r11 archives
carry big-block rows from superseded interim plans — this re-archives
the SHIPPED broadcast plan). Index rows run through the bench's own
_bench_index_paths so conditions match the driver exactly (same
n_runs, same store/index cache, same refresh timing), which also
yields the sf1.0 rerank-recall row item 3 wants.

Usage: python scripts/adjudicate_weak_rows.py [run_tag]
Writes one JSON line to stdout; run three times on an idle host and
archive as BENCH_ADJUDICATE_r12.json (list of three run objects).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent

REGISTRY_ROWS = [
    "events_autocorrelation",
    "sample_reservoir_weighted",
    "text_interpolated_perplexity",
]


def probes(spark) -> dict:
    """The BENCH-EXACT probe loop (memory: ad-hoc spins differ 2x)."""
    out = {}
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 2)").collect()
        samples.append(time.perf_counter() - t0)
    out["jvm_range_sum"] = round(min(samples), 3)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(20_000_000).selectExpr("id % 100000 as k", "id as v").groupBy(
            "k"
        ).sum("v").selectExpr("sum(`sum(v)`)").collect()
        samples.append(time.perf_counter() - t0)
    out["jvm_shuffle_agg"] = round(min(samples), 3)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(5_000_000):
            acc += i * i
        samples.append(time.perf_counter() - t0)
    out["py_spin"] = round(min(samples), 3)
    return out


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "run"
    os.chdir(REPO)
    from bench import _bench_block, _bench_index_paths
    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.session import get_spark
    from scripts.make_bench_scale import build

    spark = get_spark("adjudicate")
    registry = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    result = {"tag": tag, "probes_start": probes(spark), "blocks": {}}
    dirs = {}
    for name, copies in (("sf0.5", 5), ("sf1.0", 10)):
        d = str(REPO / ".benchdata" / name)
        if not os.path.isdir(os.path.join(d, "lineitem.parquet")):
            build(spark, sf_dir, d, copies=copies)
        dirs[name] = d

    for name, n_runs in (("sf0.5", 3), ("sf1.0", 2)):
        timings, medians = _bench_block(
            spark, registry, REGISTRY_ROWS, dirs[name], n_runs=n_runs
        )
        idx_meta = _bench_index_paths(spark, dirs[name], timings, medians)
        result["blocks"][name] = {
            "queries": timings,
            "queries_median": medians,
            "pq_index": idx_meta,
        }

    b, b2 = result["blocks"]["sf0.5"], result["blocks"]["sf1.0"]
    result["step_min"] = {
        q: round(b2["queries"][q] / b["queries"][q], 2)
        for q in b2["queries"]
        if b["queries"].get(q)
    }
    result["step_median"] = {
        q: round(b2["queries_median"][q] / b["queries_median"][q], 2)
        for q in b2["queries_median"]
        if b["queries_median"].get(q)
    }
    result["probes_end"] = probes(spark)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
