"""Time a named subset of registry queries with bench.py's exact
protocol (1 warm-up + N timed noop-sink runs, min+median reported) —
the optimization round's before/after instrument for touched rows.

Usage: python scripts/minibench.py [--sf DIR] [--runs N] <query> [...]
Prints one JSON line: {"sf": ..., "queries": {...}, "queries_median": {...}}
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_TWONN_PROBES", "64")


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    n_runs = 5
    while args and args[0].startswith("--"):
        if args[0] == "--sf":
            sf_dir = args[1]
        elif args[0] == "--runs":
            n_runs = int(args[1])
        args = args[2:]

    from bench import _bench_block
    from dataingestionplayground_spark.queries import all_queries
    from dataingestionplayground_spark.session import get_spark, load_table

    spark = get_spark("minibench")
    registry = all_queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    for tbl in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, tbl).limit(1).count()
    registry["agg_pricing_summary"].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    timings, medians = _bench_block(spark, registry, args, sf_dir, n_runs=n_runs)
    print(json.dumps({"sf": sf_dir, "queries": timings, "queries_median": medians}))


if __name__ == "__main__":
    main()
