"""Window functions (SURVEY.md §2.5): ranking, analytic (lag/lead),
running frames — generalizing the reference's only sequential semantic
(footer-after-break flag, ``MarkdownParser.cs:48-56``) plus top-k-per-group
search ranking.

Every window partitions by a key and orders by a *unique* tuple so results
are deterministic across engines (ties broken explicitly).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t


@register(
    "window_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice, rk FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(row_number() OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice DESC, p_partkey ASC) AS INTEGER) AS rk
      FROM part) WHERE rk <= 3
    """,
)
def window_topk_per_group(spark, sf):
    # Top-3 parts per brand — the batched generalization of the reference's
    # top-1 search (VectorStoreCommands.cs:113).
    #
    # p_brand has a FIXED 25 values, so a single window partitioned by it
    # sorts |part|/25 rows per reducer to keep 3 — the low-cardinality
    # skew shape. Two-phase partial top-k instead: phase 1 ranks within
    # (brand, deterministic hash shard) and keeps 3 per shard; phase 2
    # re-ranks the <= 3*32 survivors per brand.
    p = t(spark, sf, "part")
    sharded = p.withColumn("__shard", F.pmod(F.xxhash64("p_partkey"), F.lit(32)))
    w1 = W.partitionBy("p_brand", "__shard").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    partial = (
        sharded.withColumn("prk", F.row_number().over(w1))
        .filter(F.col("prk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )
    w2 = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        partial.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT p_brand, p_size,
           CAST(rank()       OVER (PARTITION BY p_brand ORDER BY p_size) AS INTEGER) AS size_rank,
           CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS INTEGER) AS size_dense,
           CAST(ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS INTEGER) AS quartile
    FROM part
    """,
)
def window_rank_dense(spark, sf):
    # rank/dense_rank over a BOUNDED-DOMAIN order key: p_size has ~50
    # values and p_brand 25, so instead of a skewed per-brand window
    # (|part|/25 rows per reducer), both ranks derive from the tiny
    # (brand, size) count table — one hash agg, driver-side cumsum over
    # <= 25*50 rows, broadcast join back. rank = 1 + count of rows with
    # a smaller size in the brand; dense_rank = # distinct smaller
    # sizes + 1. The quartile keeps exact per-row ntile semantics via
    # the sharded prefix count (operators/prefix.py).
    from dataingestionplayground_spark.operators.prefix import sharded_ntile

    p = t(spark, sf, "part").select("p_brand", "p_size", "p_partkey")
    counts = p.groupBy("p_brand", "p_size").count().collect()
    rows, acc = [], {}
    for r in sorted(counts, key=lambda r: (r["p_brand"], r["p_size"])):
        start, dense = acc.get(r["p_brand"], (1, 1))
        rows.append((r["p_brand"], r["p_size"], start, dense))
        acc[r["p_brand"]] = (start + r["count"], dense + 1)
    ranks = spark.createDataFrame(
        rows, "p_brand string, p_size int, size_rank int, size_dense int"
    )
    with_q = sharded_ntile(
        p, 4, [("p_size", True), ("p_partkey", True)], ("p_brand",), "quartile"
    )
    return with_q.join(F.broadcast(ranks), ["p_brand", "p_size"]).select(
        "p_brand", "p_size", "size_rank", "size_dense", "quartile"
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(lag(o_totalprice)  OVER w AS DOUBLE) AS prev_price,
           CAST(lead(o_totalprice) OVER w AS DOUBLE) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark, sf):
    # The footer heuristic's lag(kind) formulation (SURVEY §2.5), on orders.
    o = t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
    FROM orders
    """,
)
def window_running_sum(spark, sf):
    # Running frame: decimal-exact so the prefix sums hash-match (every
    # prefix is its own float-summation order hazard otherwise).
    o = t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "window_sliding_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_3line
    FROM lineitem
    """,
)
def window_sliding_frame(spark, sf):
    li = t(spark, sf, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-2, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).over(w).cast("double").alias("qty_3line"),
    )


@register(
    "window_ratio_to_total",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice
                 / CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER () AS DOUBLE), 10) AS pct_of_total,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                      OVER (PARTITION BY o_orderpriority) AS DOUBLE)
                 / CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER () AS DOUBLE), 10) AS priority_share
    FROM orders
    """,
)
def window_ratio_to_total(spark, sf):
    # Ratio-to-report: decimal-exact denominators cast to double once,
    # double division, rounded — decimal DIVISION scale rules differ
    # across engines, so never divide decimals directly.
    #
    # The oracle states this with SUM() OVER () frames; the Spark plan
    # must NOT: an empty-partition window sends every orders row to one
    # reducer and the output is corpus-sized, so at 100x scale that
    # single WindowExec IS the job. Same answer, scale-safe shape:
    # ordinary aggregates for the global and per-priority denominators,
    # broadcast back onto the stream (one hash agg + two broadcast
    # joins, zero single-partition stages).
    o = t(spark, sf, "orders")
    dec = F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
    grand = o.agg(dec.cast("double").alias("grand_total"))
    per_pri = o.groupBy("o_orderpriority").agg(dec.cast("double").alias("pri_total"))
    return (
        o.join(F.broadcast(per_pri), "o_orderpriority")
        .crossJoin(F.broadcast(grand))
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") / F.col("grand_total"), 10).alias(
                "pct_of_total"
            ),
            F.round(F.col("pri_total") / F.col("grand_total"), 10).alias(
                "priority_share"
            ),
        )
    )


@register(
    "window_median_sliding",
    oracle="""
    SELECT user_id, event_id,
           ROUND(median(cents) OVER (
             PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS med10
    FROM (
      SELECT user_id, event_id, ts,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events
    )
    """,
)
def window_median_sliding(spark, sf):
    # Sliding-window MEDIAN per user (last 10 events) — the robust
    # sibling of window_sliding_frame's mean: a windowed order
    # statistic with no running-accumulator form. Spark's median/
    # percentile aggregates refuse window FRAMES outright
    # (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame is
    # materialized with collect_list (bounded: <=10 values) and the
    # interpolated median computed in-row from the sorted array —
    # exact halves on integer cents, so both engines agree
    # bit-for-bit. Per-user partitioning (high-cardinality key) keeps
    # it lint-safe: one sort-shuffle, bounded 10-row frames.
    e = t(spark, sf, "events")
    a = e.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-9, W.currentRow)
    )
    win = a.select(
        "user_id",
        "event_id",
        F.array_sort(F.collect_list("cents").over(w)).alias("s"),
    )
    med = F.expr(
        "case when size(s) % 2 = 1 "
        "then cast(element_at(s, cast((size(s) + 1) div 2 as int)) as double) "
        "else (element_at(s, cast(size(s) div 2 as int)) "
        "+ element_at(s, cast(size(s) div 2 + 1 as int))) / 2.0d end"
    )
    return win.select(
        "user_id", "event_id", F.round(med, 6).alias("med10")
    )


@register(
    "window_running_distinct",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS n_types_seen
    FROM events
    """,
)
def window_running_distinct(spark, sf):
    # Running COUNT(DISTINCT) per user — the "how many distinct behaviors
    # has this user shown so far" feature. Spark windows reject DISTINCT
    # aggregates outright, and the naive emulation (collect_set over an
    # unbounded frame, then size) carries O(frame) set state per row.
    # Decompose instead: distinct-so-far == running SUM of a
    # first-occurrence flag (row_number() == 1 over (user, type) by time).
    # One explicit repartition on user_id satisfies BOTH window
    # distributions — HashPartitioning([user]) clusters [user, type] too —
    # so the plan is ONE exchange + two in-partition sorts, no second
    # shuffle, and every frame is a plain running sum (O(1) state/row).
    # Per-user partitioning keeps it skew-safe at 100 TB like the other
    # event windows.
    e = t(spark, sf, "events").select("event_id", "user_id", "ts", "event_type")
    e = e.repartition("user_id")
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        e.withColumn(
            "__first",
            F.when(F.row_number().over(w_first) == 1, F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn("n_types_seen", F.sum("__first").over(w_run).cast("long"))
        .select("event_id", "user_id", "n_types_seen")
    )
