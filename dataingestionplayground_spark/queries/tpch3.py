"""TPC-H-shaped query batch 3: the remaining classic join/agg topologies
(Q3, Q7, Q8, Q9, Q10, Q15, Q18, Q21), adapted to the driver schema
(no partsupp table: supply cost ~ 0.8 * p_retailprice).

Each exercises a distinct physical topology: top-k over a 3-way join,
nation-pair anti-symmetric joins, ratio-of-conditional-aggregates,
multi-fact join with derived columns, group-by over semi-joined subquery
thresholds, max-over-view scalar subquery, and multi-EXISTS self-joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.functions.portable import dsum, dsum_expr
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey, {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15' AND l.l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf):
    c, o, li = t(spark, sf, "customer"), t(spark, sf, "orders"), t(spark, sf, "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp"))
        .join(li, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def tpch_q7_volume_shipping(spark, sf):
    s, li, o, c = (t(spark, sf, x) for x in ("supplier", "lineitem", "orders", "customer"))
    n1 = F.broadcast(t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .filter(F.col("l_shipdate").between("1995-01-01", "1996-12-31"))
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    WITH all_nations AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
        AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    )
    SELECT o_year,
           {dsum_expr("CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0.0 END")}
           / {dsum_expr('volume')} AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark, sf):
    li, s, o, c = (t(spark, sf, x) for x in ("lineitem", "supplier", "orders", "customer"))
    n1 = F.broadcast(t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")))
    r = F.broadcast(t(spark, sf, "region").filter(F.col("r_name") == "EUROPE"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    german = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0.0))
    return (
        li.join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .filter(F.col("o_orderdate").between("1995-01-01", "1996-12-31"))
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(r, F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(german) / dsum(vol)).alias("mkt_share"))
    )


@register(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           {dsum_expr('l.l_extendedprice * (1 - l.l_discount) - 0.8 * p.p_retailprice * l.l_quantity')} AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9_product_profit(spark, sf):
    # Q9 with supply cost approximated as 0.8*retailprice (no partsupp).
    li, p, s, o = (t(spark, sf, x) for x in ("lineitem", "part", "supplier", "orders"))
    n = F.broadcast(t(spark, sf, "nation"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.8 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p.filter(F.col("p_name").like("%red%")), p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("profit"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf):
    c, o, li = t(spark, sf, "customer"), t(spark, sf, "orders"), t(spark, sf, "lineitem")
    n = F.broadcast(t(spark, sf, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(li.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {dsum_expr('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark, sf):
    # view + scalar max subquery; decimal-exact revenue makes the equality
    # comparison portable.
    t(spark, sf, "lineitem").createOrReplaceTempView("v_li_q15")
    t(spark, sf, "supplier").createOrReplaceTempView("v_s_q15")
    return spark.sql(
        f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 {dsum_expr('l_extendedprice * (1 - l_discount)')} AS total_revenue
          FROM v_li_q15
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM v_s_q15 s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        """
    )


@register(
    "tpch_q18_large_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           {dsum_expr('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 210.0
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def tpch_q18_large_orders(spark, sf):
    # threshold subquery -> semi join (l_quantity integral => exact sums
    # either way; 210 chosen to select a handful of orders at sf0.01).
    c, o, li = t(spark, sf, "customer"), t(spark, sf, "orders"), t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 210.0)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
)
def tpch_q21_suppliers_kept_waiting(spark, sf):
    # EXISTS + NOT EXISTS self-joins on the fact table (semi + anti join
    # over the same shuffle key — Catalyst reuses the l_orderkey exchange).
    t(spark, sf, "supplier").createOrReplaceTempView("v_s_q21")
    t(spark, sf, "lineitem").createOrReplaceTempView("v_li_q21")
    t(spark, sf, "orders").createOrReplaceTempView("v_o_q21")
    return spark.sql(
        """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM v_s_q21 s
        JOIN v_li_q21 l1 ON s.s_suppkey = l1.l_suppkey
        JOIN v_o_q21 o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM v_li_q21 l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM v_li_q21 l3
                          JOIN v_o_q21 o3 ON o3.o_orderkey = l3.l_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s.s_name
        """
    )
