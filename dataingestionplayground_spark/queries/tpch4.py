"""TPC-H-shaped query batch 4: the remaining shapes for full 22-query
coverage (Q2, Q5, Q6, Q11, Q12, Q13, Q17, Q20), adapted to the driver
schema. Q1 == agg_pricing_summary; Q2/Q11/Q20 need a partsupp table the
testdata lacks — a partsupp-shaped relation is DERIVED from lineitem
(group by (partkey, suppkey)) identically on both engines, which keeps
the classic query topology (correlated-min subquery, global-threshold
HAVING, nested-IN semi-joins) intact.

New physical topologies vs batch 3: correlated scalar-min subquery over a
derived dimension (Q2), region-constrained 6-way cycle join (Q5), pure
scan-filter-agg with no join at all (Q6), group-agg filtered by a scalar
aggregate of itself (Q11), two-level aggregation to a distribution (Q13),
per-group threshold anti-pattern guarded by a correlated AVG (Q17), and
chained IN-subqueries over derived quantities (Q20).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.functions.portable import davg_expr, dsum, dsum_expr
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t

# derived partsupp: one row per (partkey, suppkey) with min unit price as
# the supply cost and total shipped quantity as availqty — both exact
# integers/mins, so Spark and DuckDB agree bitwise.
_PS_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice) AS ps_supplycost,
           {qty} AS ps_availqty
    FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def _partsupp(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min("l_extendedprice").alias("ps_supplycost"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)"))
        .cast("double")
        .alias("ps_availqty"),
    )


_PS_CTE = _PS_SQL.format(
    qty="CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)"
)


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS ({_PS_CTE})
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type, ps.ps_supplycost
    FROM part p
    JOIN ps ON ps.ps_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark, sf):
    # classic Q2: correlated min-supplycost subquery, decorrelated by hand
    # into a min-per-part aggregate joined back (what Catalyst does to the
    # SQL form anyway, stated explicitly). Dims broadcast; the only big
    # shuffle is the partsupp derivation itself.
    p = t(spark, sf, "part").filter(F.col("p_size") == 15)
    s = t(spark, sf, "supplier")
    n = F.broadcast(t(spark, sf, "nation"))
    r = F.broadcast(t(spark, sf, "region").filter(F.col("r_name") == "EUROPE"))
    ps = _partsupp(spark, sf)

    eu_supp = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eu_ps = ps.join(eu_supp, ps.ps_suppkey == eu_supp.s_suppkey)
    min_cost = eu_ps.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("__min_cost")
    )
    return (
        eu_ps.join(min_cost, "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("__min_cost"))
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name, {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark, sf):
    # the cycle join (supplier nation == customer nation) is the defining
    # Q5 constraint: expressed as an extra equi-condition on the same
    # fact-side join, no second nation scan needed.
    c, o, li, s = (t(spark, sf, x) for x in ("customer", "orders", "lineitem", "supplier"))
    n = F.broadcast(t(spark, sf, "nation"))
    r = F.broadcast(t(spark, sf, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(n, n.n_nationkey == c.c_nationkey)
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_expr('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf):
    # the no-join query: every predicate pushes to the parquet scan, the
    # agg is one partial+final over a 3-column pruned read.
    li = t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH ps AS ({_PS_CTE}),
    nation_ps AS (
      SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS value
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT ps_partkey, {dsum_expr('value')} AS part_value
    FROM nation_ps
    GROUP BY ps_partkey
    HAVING {dsum_expr('value')} > (
      SELECT {dsum_expr('value')} * 0.001 FROM nation_ps
    )
    """,
)
def tpch_q11_important_stock(spark, sf):
    # group-agg filtered against a scalar aggregate of the SAME relation:
    # the threshold is a 1-row frame cross-joined (broadcast) into the
    # HAVING filter — no recomputation of nation_ps (ReusedExchange).
    s = t(spark, sf, "supplier")
    n = F.broadcast(t(spark, sf, "nation").filter(F.col("n_name") == "NATION_7"))
    ps = _partsupp(spark, sf)
    nation_ps = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("value"))
    )
    per_part = nation_ps.groupBy("ps_partkey").agg(dsum("value").alias("part_value"))
    threshold = nation_ps.agg((dsum("value") * 0.001).alias("__thresh"))
    return per_part.join(F.broadcast(threshold)).filter(
        F.col("part_value") > F.col("__thresh")
    ).select("ps_partkey", "part_value")


@register(
    "tpch_q12_shipmode_priority",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate > o.o_orderdate
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_shipmode_priority(spark, sf):
    # Q12 shape (join + dual conditional counts by priority class); the
    # schema has no l_shipmode/commitdate, so the mode dimension is
    # l_returnflag and "late" is shipdate after orderdate.
    o, li = t(spark, sf, "orders"), t(spark, sf, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") > F.col("o_orderdate"))
        )
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark, sf):
    # two-level aggregation to a distribution; the join predicate (not a
    # post-filter!) keeps customers with zero qualifying orders at count 0.
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    o_f = o.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o_f, o_f.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    SELECT {dsum_expr('l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (
        SELECT 0.2 * ({davg_expr('l2.l_quantity')})
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark, sf):
    # correlated AVG subquery decorrelated into an avg-per-part join —
    # computed over ALL lineitems of the part (not just the brand's),
    # exactly like the SQL form.
    li, p = t(spark, sf, "lineitem"), t(spark, sf, "part")
    avg_qty = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
                / F.count("l_quantity").cast("double")
            )
        ).alias("__limit_qty")
    )
    return (
        li.join(F.broadcast(p.filter(F.col("p_brand") == "Brand#11")), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__limit_qty"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "tpch_q20_potential_promotion",
    oracle=f"""
    WITH ps AS ({_PS_CTE})
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey FROM ps
        WHERE ps.ps_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        AND ps.ps_availqty > (
          SELECT 0.5 * {dsum_expr('l.l_quantity')}
          FROM lineitem l
          WHERE l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
            AND l.l_shipdate >= TIMESTAMP '1995-01-01'
            AND l.l_shipdate < TIMESTAMP '1996-01-01'
        )
      )
    ORDER BY s.s_name
    """,
)
def tpch_q20_potential_promotion(spark, sf):
    # chained IN-subqueries as semi-joins; the correlated 1995-quantity
    # threshold decorrelates into a (partkey, suppkey) aggregate joined
    # INNER: the SQL scalar subquery yields NULL for a pair with no 1995
    # shipments, and availqty > NULL is never true — so such pairs are
    # excluded, which the inner join reproduces exactly.
    s, n = t(spark, sf, "supplier"), F.broadcast(
        t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    )
    p = t(spark, sf, "part").filter(F.col("p_name").like("small%"))
    li = t(spark, sf, "lineitem")
    ps = _partsupp(spark, sf)

    shipped_95 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("__pk"), F.col("l_suppkey").alias("__sk"))
        .agg((0.5 * dsum("l_quantity")).alias("__half_qty"))
    )
    qualifying = (
        ps.join(p.select("p_partkey"), ps.ps_partkey == F.col("p_partkey"), "leftsemi")
        .join(
            shipped_95,
            (ps.ps_partkey == F.col("__pk")) & (ps.ps_suppkey == F.col("__sk")),
        )
        .filter(F.col("ps_availqty") > F.col("__half_qty"))
        .select("ps_suppkey")
    )
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, s.s_suppkey == F.col("ps_suppkey"), "leftsemi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
