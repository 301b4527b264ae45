"""Headline benchmark: runs representative queries from every operator
family at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query executes its full physical plan via the noop sink (no driver
collect — measures engine throughput, not py4j transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dataingestionplayground_spark.queries import all_queries  # noqa: E402
from dataingestionplayground_spark.session import get_spark, load_table  # noqa: E402

# One per family: scan-agg, multiway join, window, event-window,
# sessionize+asof, dedup (minhash full pipeline + LSH->Jaccard verify),
# text stats, vector search, chunking, plus the most shuffle-heavy TPC-H
# shape (Q21: 4-way fact self-joins + exists/not-exists). These are the
# throughput-critical shapes at 100 TB.
HEADLINE = [
    "agg_pricing_summary",
    "join_inner_agg",
    "join_multiway",
    "tpch_q21_suppliers_kept_waiting",
    "window_topk_per_group",
    "window_running_sum",
    "events_tumbling_window",
    "events_sessionize",
    "events_asof_join",
    "dedup_minhash_lsh_pairs",
    "dedup_lsh_verified_pairs",
    "dedup_simhash",
    "dedup_decontaminate",
    "text_token_stats",
    "vector_knn_bruteforce",
    "ingest_chunk_token_windows",
    # round-2 verdict item 6: the slowest dedup/vector tail, tracked so
    # round-over-round movement on them is visible
    "vector_semdedup",
    "dedup_clusters",
    "vector_pq_adc_rerank",
    # r7: the de-skewed window rewrites (sharded prefix counts) — track
    # their cost so the scale-safe shapes stay cheap locally too
    "window_ntile_buckets",
    "window_ratio_to_total",
    # r7: cross-doc exact-substring dedup — the heaviest new shape
    # (explode + two hash aggs + equi-join on the window hash)
    "dedup_exact_substring_signal",
]

# round-2 verdict item 7: one larger scale point (5x sf0.1 replicas,
# built lazily under .benchdata/ by scripts/make_bench_scale.py) for the
# 5 heaviest shapes — big enough for shuffle regressions to show.
BIG_HEADLINE = [
    "agg_pricing_summary",
    "tpch_q21_suppliers_kept_waiting",
    "dedup_lsh_verified_pairs",
    "dedup_clusters",
    "vector_semdedup",
]


def _bench_index_paths(spark, data_dir: str, timings: dict) -> dict:
    """Time the PQ and IVF index-backed search paths over ``data_dir``'s
    embeddings table (store + indexes built lazily, cached under
    .benchdata keyed by the data dir's basename). Adds
    vector_pq_index_search / vector_ivf_index_search rows to
    ``timings`` and returns the refresh metadata."""
    from pyspark.sql import functions as F

    from dataingestionplayground_spark.ingest.ann_index import (
        build_ivf_index,
        build_pq_index,
        ivf_search_indexed,
        pq_search_indexed,
        refresh_ivf_index,
        refresh_pq_index,
    )
    from dataingestionplayground_spark.ingest.store import CollectionStore

    sf_name = os.path.basename(data_dir.rstrip("/"))
    idx_base = str(Path(__file__).resolve().parent / ".benchdata" / f"pqidx-{sf_name}")
    store = CollectionStore(idx_base)
    emb = load_table(spark, data_dir, "embeddings")
    if not store.exists("embeddings"):
        chunks = emb.select(
            F.col("vec_id").cast("string").alias("key"),
            "embedding",
            F.lit("").alias("content"),
            F.lit(None).cast("string").alias("context"),
            F.col("vec_id").cast("string").alias("documentid"),
            F.lit(0).cast("int").alias("chunk_idx"),
        )
        store.write(chunks, "embeddings")
    if not os.path.exists(
        os.path.join(idx_base, "_indexes", "embeddings", "pq", "pq.json")
    ):
        build_pq_index(spark, store, "embeddings", m=4, n_centroids=8, dims=64)
    t0 = time.perf_counter()
    refreshed = refresh_pq_index(spark, store, "embeddings")
    refresh_sec = round(time.perf_counter() - t0, 3)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("string").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    best = float("inf")
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        pq_search_indexed(spark, store, "embeddings", q, k=10).write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["vector_pq_index_search"] = round(best, 3)
    meta = {"refresh_sec": refresh_sec, **refreshed}

    if not os.path.exists(
        os.path.join(idx_base, "_indexes", "embeddings", "ivf", "ivf.json")
    ):
        build_ivf_index(spark, store, "embeddings", n_cells=8)
    t0 = time.perf_counter()
    ivf_refreshed = refresh_ivf_index(spark, store, "embeddings")
    ivf_refresh_sec = round(time.perf_counter() - t0, 3)
    best = float("inf")
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        ivf_search_indexed(spark, store, "embeddings", q, k=10, n_probe=2).write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["vector_ivf_index_search"] = round(best, 3)
    meta["ivf"] = {"refresh_sec": ivf_refresh_sec, **ivf_refreshed}
    return meta


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")
    registry = all_queries()

    # JVM/codegen/parquet-reader warmup so q1 isn't billed for session
    # startup: touch each input table and compile one agg pipeline at the
    # smallest SF (codegen classes are cached by structure, not by data).
    spark.range(1000).selectExpr("sum(id)").collect()
    for tbl in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, tbl).limit(1).count()
    registry["agg_pricing_summary"].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    # min of three runs per query: the steady-state number (first run can
    # be polluted by codegen compilation / page-cache warmup / GC, and
    # local[32] timings carry ~30% scheduler noise — the min is the
    # stable round-over-round signal).
    timings = {}
    for name in HEADLINE:
        fn = registry[name].fn
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()  # no cross-run cache reuse: honest timings
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # store-backed index search rows (round-5 item 4 / round-6 item 7):
    # the adc_rerank row re-derives codes per call; these rows measure
    # the amortized paths — search straight off the persisted code /
    # cell-assignment tables. Index BUILD is excluded (one-time, cached
    # under .benchdata); incremental refresh (the steady-state
    # maintenance cost) is timed once per run.
    pq_index = None
    if os.environ.get("SPARK_GRAFT_INDEX_BENCH", "1") != "0":
        pq_index = _bench_index_paths(spark, sf_dir, timings)

    total = round(sum(timings.values()), 3)

    # larger-SF block: min-of-2 over the heaviest shapes at 5x. Opt out
    # with SPARK_GRAFT_BIG_BENCH=0 (e.g. disk-constrained runs).
    big = None
    if os.environ.get("SPARK_GRAFT_BIG_BENCH", "1") != "0":
        big_dir = os.environ.get(
            "SPARK_GRAFT_BIG_DIR",
            str(Path(__file__).resolve().parent / ".benchdata" / "sf0.5"),
        )
        if not os.path.isdir(os.path.join(big_dir, "lineitem.parquet")):
            from scripts.make_bench_scale import build

            build(spark, sf_dir, big_dir, copies=5)
        big_timings = {}
        for name in BIG_HEADLINE:
            fn = registry[name].fn
            best = float("inf")
            # min-of-3 (was 2): the iterative queries localCheckpoint
            # per round and the async ContextCleaner can lag behind,
            # inflating a later query's first run — nudge a GC so freed
            # checkpoint blocks are actually dropped, then take the min
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, big_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            big_timings[name] = round(best, 3)
        # round-6 verdict item 7: the amortized index paths at the
        # larger scale point too (store/index build cached, like sf0.1)
        big_index = None
        if os.environ.get("SPARK_GRAFT_INDEX_BENCH", "1") != "0":
            big_index = _bench_index_paths(spark, big_dir, big_timings)
        big = {
            "sf": round(sf * 5, 3),
            "total": round(sum(big_timings.values()), 3),
            "queries": big_timings,
        }
        if big_index is not None:
            big["pq_index"] = big_index

    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if pq_index is not None:
        out["pq_index"] = pq_index
    if big is not None:
        out["big"] = big
    print(json.dumps(out))


if __name__ == "__main__":
    main()
