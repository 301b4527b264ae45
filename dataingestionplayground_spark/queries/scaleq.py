"""Scale-infrastructure query surface: Bloom-pruned joins, layout
pruning-gain measurement, snapshot diffing, and column profiling.

These are the operational queries a 100 TB pipeline runs around its data
rather than on it: prune a fact shuffle with a dim-side Bloom filter
(sideways information passing), quantify how much file skipping a Z-order
layout buys over a linear sort, audit what changed between two snapshots
of a table, and profile per-column null/distinct/min/max health.

Reference parity: the reference has no maintenance surface (its store is
rebuilt per run — ``Program.cs:40-52``); these extend it with the
operations any production deployment of the same pipeline needs, per the
LLM-pipeline mandate. All hot paths are Catalyst built-ins; the only
broadcast state is one-row bitmaps/extent rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.functions.portable import dsum, dsum_expr
from dataingestionplayground_spark.operators.bloom import bloom_bitmap, bloom_prefilter
from dataingestionplayground_spark.operators.layout import morton2, morton2_sql
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t


# --------------------------------------------------------------------------
# Bloom-pruned dim->fact join
# --------------------------------------------------------------------------

@register(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum_expr('o_totalprice')} AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 7500
    GROUP BY o_orderpriority
    """,
)
def join_bloom_prefilter(spark, sf):
    # Selective dim->fact join with an explicit Bloom prefilter: the
    # filtered customer keys build a distributed bitmap (bounded bit_or
    # shuffle, one broadcast-sized map row); orders rows failing the
    # k-probe membership test drop at the SCAN, before the join
    # Exchange. False positives are removed by the exact join that
    # follows, so the result is identical to the plain join — the oracle
    # is the plain SQL join, independent of hash parity. At 100 TB this
    # is the difference between shuffling |orders| and ~|matching
    # orders| rows (Spark's runtime bloomFilter injects the same shape
    # when stats allow; here it is guaranteed and plan-testable).
    cust = (
        t(spark, sf, "customer")
        .where((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 7500))
        .select("c_custkey")
    )
    orders = t(spark, sf, "orders")
    pruned = bloom_prefilter(orders, bloom_bitmap(cust, "c_custkey"), "o_custkey")
    return (
        pruned.join(F.broadcast(cust), pruned.o_custkey == cust.c_custkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Z-order vs linear layout: file-pruning gain
# --------------------------------------------------------------------------

# The 2-d box probe, in NORMALIZED (8-bit) coordinates — 20%-40% of each
# dimension's range, so the probe intersects real data at every scale
# factor. Part of the query's definition on both engines.
_QN_LO, _QN_HI = 51, 102
_N_FILES = 64


def _pruning_sql() -> str:
    z = morton2_sql("xn", "yn")
    return f"""
    WITH pts AS (
      SELECT CAST(floor(p_retailprice) AS BIGINT) AS x,
             CAST(p_size AS BIGINT) AS y
      FROM part
    ), gext AS (
      SELECT MIN(x) AS x_lo, MAX(x) AS x_hi, MIN(y) AS y_lo, MAX(y) AS y_hi
      FROM pts
    ), norm AS (
      SELECT x, y,
             ((x - g.x_lo) * 256) // (g.x_hi - g.x_lo + 1) AS xn,
             ((y - g.y_lo) * 256) // (g.y_hi - g.y_lo + 1) AS yn
      FROM pts CROSS JOIN gext g
    ), keyed AS (
      SELECT xn, yn, xn * 256 + yn AS k_linear, {z} AS k_zorder FROM norm
    ), layouts AS (
      SELECT 'linear' AS layout, xn, yn, k_linear AS k FROM keyed
      UNION ALL
      SELECT 'zorder' AS layout, xn, yn, k_zorder AS k FROM keyed
    ), ext AS (
      SELECT layout, MIN(k) AS k_lo, MAX(k) AS k_hi FROM layouts GROUP BY layout
    ), filed AS (
      SELECT l.layout, l.xn, l.yn,
             CAST(((l.k - e.k_lo) * {_N_FILES}) // (e.k_hi - e.k_lo + 1) AS BIGINT)
               AS file_id
      FROM layouts l JOIN ext e ON l.layout = e.layout
    ), files AS (
      SELECT layout, file_id,
             MIN(xn) AS min_x, MAX(xn) AS max_x,
             MIN(yn) AS min_y, MAX(yn) AS max_y,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM filed GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN min_x <= {_QN_HI} AND max_x >= {_QN_LO}
                          AND min_y <= {_QN_HI} AND max_y >= {_QN_LO}
                         THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(SUM(CASE WHEN min_x <= {_QN_HI} AND max_x >= {_QN_LO}
                          AND min_y <= {_QN_HI} AND max_y >= {_QN_LO}
                         THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
    FROM files GROUP BY layout
    """


@register("layout_zorder_pruning_gain", oracle=_pruning_sql())
def layout_zorder_pruning_gain(spark, sf):
    # Measures WHY layout_zorder_codes matters: model a range-partitioned
    # write as equal-width segments of the layout key (64 "files"),
    # record each file's (x, y) min/max footer stats, and count how many
    # files a 2-d box probe must open under a lexicographic (x, y) sort
    # vs the Z-order curve. The curve's files cover tight 2-d tiles, so
    # both predicates prune everywhere; lexicographic files span all of y
    # except in the final x stripe, so mostly only x prunes. Shapes: one
    # scan, two tiny extent aggs (broadcast back), one groupBy(file) agg
    # — nothing grows with data volume except the scan.
    pts = t(spark, sf, "part").select(
        F.floor("p_retailprice").cast("long").alias("x"),
        F.col("p_size").cast("long").alias("y"),
    )
    gext = pts.agg(
        F.min("x").alias("x_lo"),
        F.max("x").alias("x_hi"),
        F.min("y").alias("y_lo"),
        F.max("y").alias("y_hi"),
    )
    # Range-normalize both dimensions to 8 bits before interleaving —
    # the rank/range quantization real OPTIMIZE ZORDER passes apply, so
    # the curve weights both dimensions equally regardless of raw scale.
    norm = (
        pts.crossJoin(F.broadcast(gext))
        .withColumn("xn", F.expr("((x - x_lo) * 256) div (x_hi - x_lo + 1)"))
        .withColumn("yn", F.expr("((y - y_lo) * 256) div (y_hi - y_lo + 1)"))
    )
    keyed = norm.withColumn("k_zorder", morton2("xn", "yn")).withColumn(
        "k_linear", F.col("xn") * 256 + F.col("yn")
    )
    layouts = keyed.selectExpr(
        "stack(2, 'linear', xn, yn, k_linear, 'zorder', xn, yn, k_zorder) "
        "AS (layout, xn, yn, k)"
    )
    ext = layouts.groupBy("layout").agg(
        F.min("k").alias("k_lo"), F.max("k").alias("k_hi")
    )
    filed = layouts.join(F.broadcast(ext), "layout").withColumn(
        "file_id",
        # integer floor-division on BOTH engines (Spark `div`, DuckDB `//`)
        # — a double divide + cast would round on DuckDB but truncate here
        F.expr(f"CAST(((k - k_lo) * {_N_FILES}) div (k_hi - k_lo + 1) AS BIGINT)"),
    )
    files = filed.groupBy("layout", "file_id").agg(
        F.min("xn").alias("min_x"),
        F.max("xn").alias("max_x"),
        F.min("yn").alias("min_y"),
        F.max("yn").alias("max_y"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    hit = (
        (F.col("min_x") <= _QN_HI)
        & (F.col("max_x") >= _QN_LO)
        & (F.col("min_y") <= _QN_HI)
        & (F.col("max_y") >= _QN_LO)
    )
    return files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("files_scanned"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
    )


# --------------------------------------------------------------------------
# Snapshot diff (CDC-style audit between two table versions)
# --------------------------------------------------------------------------

@register(
    "pipeline_snapshot_diff",
    oracle=f"""
    WITH snap_a AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 97 <> 0
    ), snap_b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 89 <> 0
    ), diff AS (
      SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                  WHEN b.o_orderkey IS NULL THEN 'removed'
                  WHEN a.o_totalprice <> b.o_totalprice THEN 'changed'
                  ELSE 'unchanged' END AS status,
             COALESCE(b.o_totalprice, 0.0) - COALESCE(a.o_totalprice, 0.0) AS delta
      FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
           {dsum_expr('delta')} AS net_price_delta
    FROM diff GROUP BY status
    """,
)
def pipeline_snapshot_diff(spark, sf):
    # Snapshot-to-snapshot audit: classify every key as
    # added/removed/changed/unchanged via ONE full outer join and roll
    # up counts + net value drift. The two "versions" are carved
    # deterministically from orders (mod-97 deletes, mod-89 inserts,
    # mod-7 price updates of +1.0 — an exact double op on both engines)
    # so the query is reproducible without writing state. At scale this
    # is one co-partitioned shuffle on the key; AQE handles skew. The
    # per-row modification uses addition, not round(), because Spark and
    # the oracle disagree on double rounding modes.
    orders = t(spark, sf, "orders")
    snap_a = orders.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    snap_b = orders.where(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(1.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    a = snap_a.alias("a")
    b = snap_b.alias("b")
    diff = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer").select(
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .when(F.col("a.o_totalprice") != F.col("b.o_totalprice"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        (
            F.coalesce(F.col("b.o_totalprice"), F.lit(0.0))
            - F.coalesce(F.col("a.o_totalprice"), F.lit(0.0))
        ).alias("delta"),
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        dsum("delta").alias("net_price_delta"),
    )


# --------------------------------------------------------------------------
# Column profiling (data-quality observability)
# --------------------------------------------------------------------------

_PROFILE_COLS = ("doc_id", "lang", "source", "n_chars")


def _profile_sql() -> str:
    parts = [
        f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_val,
           CAST(MAX({c}) AS VARCHAR) AS max_val
    FROM documents
    """
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts)


@register("pipeline_column_profile", oracle=_profile_sql())
def pipeline_column_profile(spark, sf):
    # Long-form data profile of the documents table: per column, row
    # count, null count, exact distinct count, and min/max rendered as
    # strings. Spark computes all four columns' stats in ONE pass (a
    # single multi-countDistinct agg — Catalyst's Expand feeds one
    # shuffle); the long form then pivots driver-free from the single
    # result row. Exact distincts keep the oracle hashable; a 100 TB
    # profiler would swap in approx_count_distinct per the sketch
    # queries, same plan shape minus the Expand.
    d = t(spark, sf, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__null"),
            F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = d.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stacked}) "
        "AS (col_name, n_rows, n_null, n_distinct, min_val, max_val)"
    )


# --------------------------------------------------------------------------
# Constraint validation (Deequ-style data-quality gate)
# --------------------------------------------------------------------------

_CONSTRAINT_SQL = """
    WITH o AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(COUNT(o_custkey) AS DOUBLE) AS nn,
             CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) AS nd,
             CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                  THEN 1 ELSE 0 END) AS DOUBLE) AS ok
      FROM orders
    ), l AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CASE WHEN l_quantity >= 1 THEN 1 ELSE 0 END) AS DOUBLE) AS qok,
             CAST(SUM(CASE WHEN l_discount <= 0.08 THEN 1 ELSE 0 END) AS DOUBLE) AS dok
      FROM lineitem
    ), ri AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS orphans
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT c AS constraint_name, ROUND(m, 6) AS metric,
           CAST(ROUND(m, 6) >= 1.0 AS BOOLEAN) AS passed
    FROM (
      SELECT 'completeness:o_custkey' AS c, o.nn / o.n AS m FROM o
      UNION ALL SELECT 'uniqueness:o_orderkey', o.nd / o.n FROM o
      UNION ALL SELECT 'domain:o_orderstatus', o.ok / o.n FROM o
      UNION ALL SELECT 'referential:orders->customer', 1.0 - ri.orphans / o.n
        FROM o, ri
      UNION ALL SELECT 'min:l_quantity>=1', l.qok / l.n FROM l
      UNION ALL SELECT 'range:l_discount<=0.08', l.dok / l.n FROM l
    )
"""


@register("pipeline_constraint_checks", oracle=_CONSTRAINT_SQL)
def pipeline_constraint_checks(spark, sf):
    # Deequ-style constraint VALIDATION (the profiler's judging sibling:
    # pipeline_column_profile reports stats, this asserts expectations
    # and emits per-constraint pass/fail). Six constraint families over
    # orders/lineitem/customer: completeness, key uniqueness, value
    # domain, referential integrity, and two range rules — one of which
    # (discount <= 0.08) genuinely FAILS on the data, so both outcomes
    # are exercised. Plan shape at 100 TB: ONE conditional agg pass per
    # fact table (all same-table metrics share a scan) plus one
    # anti-join count for RI; the three 1-row frames cross-join
    # (broadcast) and stack into long form — no per-constraint rescans.
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    c = t(spark, sf, "customer")
    o_stats = o.agg(
        F.count(F.lit(1)).cast("double").alias("o_n"),
        F.count("o_custkey").cast("double").alias("o_nn"),
        F.countDistinct("o_orderkey").cast("double").alias("o_nd"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).cast("double").alias("o_ok"),
    )
    l_stats = li.agg(
        F.count(F.lit(1)).cast("double").alias("l_n"),
        F.sum(F.when(F.col("l_quantity") >= 1, 1).otherwise(0))
        .cast("double")
        .alias("l_qok"),
        F.sum(F.when(F.col("l_discount") <= 0.08, 1).otherwise(0))
        .cast("double")
        .alias("l_dok"),
    )
    orphans = (
        o.join(c.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti")
        .agg(F.count(F.lit(1)).cast("double").alias("ri_orphans"))
    )
    one = o_stats.join(F.broadcast(l_stats)).join(F.broadcast(orphans))
    rows = one.selectExpr(
        "stack(6, "
        "'completeness:o_custkey', o_nn / o_n, "
        "'uniqueness:o_orderkey', o_nd / o_n, "
        "'domain:o_orderstatus', o_ok / o_n, "
        "'referential:orders->customer', 1.0D - ri_orphans / o_n, "
        "'min:l_quantity>=1', l_qok / l_n, "
        "'range:l_discount<=0.08', l_dok / l_n"
        ") AS (constraint_name, m)"
    )
    return rows.select(
        "constraint_name",
        F.round("m", 6).alias("metric"),
        (F.round("m", 6) >= 1.0).alias("passed"),
    )
