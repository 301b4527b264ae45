"""Relational substrate: scan/filter/project, aggregation, joins of every
flavor, set ops, grouping sets, subqueries, scalar functions.

SURVEY.md §2.1-2.8: the reference's relational surface (EF-Core projection
``DatabaseIngestionReader.cs:27-40``, filters ``MarkdownParser.cs:63-66``,
the implicit chunk->document association) generalized to the full set of
Catalyst-native operators the engine exposes.

Every query is declarative DataFrame API — Catalyst does pushdown/pruning/
join selection; explicit ``broadcast`` hints only where a side is known
small at any scale (region/nation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.functions.portable import davg, davg_expr, dsum, dsum_expr
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t


# --- scans / filters / projections (S1-S4, P1-P6 analogues) ---------------


@register(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-03-01'
      AND l_discount > 0.05
    """,
)
def scan_filter_project(spark, sf):
    # Predicate + projection reach the parquet scan (PushedFilters/ReadSchema).
    return (
        t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-03-01").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
    )


@register(
    "project_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substr(p_name, 1, 8) AS name_prefix,
           concat(p_type, '#', CAST(p_size AS VARCHAR)) AS type_size,
           CAST(length(p_name) AS INTEGER) AS name_len,
           replace(p_type, 'ECONOMY', 'ECO') AS type_repl,
           CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END AS has_gold
    FROM part
    """,
)
def project_string_funcs(spark, sf):
    # F1-F7 scalar-function surface (substring/trim/concat/format, SURVEY §2.8).
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_type"), F.lit("#"), F.col("p_size").cast("string")).alias("type_size"),
        F.length("p_name").alias("name_len"),
        F.expr("replace(p_type, 'ECONOMY', 'ECO')").alias("type_repl"),
        F.when(F.col("p_name").like("%gold%"), 1).otherwise(0).alias("has_gold"),
    )


@register(
    "filter_null_guards",
    oracle="""
    SELECT c_custkey, c_name, trim(c_mktsegment) AS seg
    FROM customer
    WHERE c_name IS NOT NULL AND length(trim(c_mktsegment)) > 0 AND c_acctbal >= 0
    """,
)
def filter_null_guards(spark, sf):
    # P1/P2/P4: empty-text and null guards (MarkdownParser.cs:63-66,
    # DatabaseIngestionReader.cs:52) as relational predicates.
    c = t(spark, sf, "customer")
    return c.filter(
        F.col("c_name").isNotNull()
        & (F.length(F.trim("c_mktsegment")) > 0)
        & (F.col("c_acctbal") >= 0)
    ).select("c_custkey", "c_name", F.trim("c_mktsegment").alias("seg"))


# --- aggregation (§2.4) ----------------------------------------------------


@register(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_expr('l_quantity')} AS sum_qty,
           {dsum_expr('l_extendedprice')} AS sum_base_price,
           {dsum_expr('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_expr('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_expr('l_quantity')} AS avg_qty,
           {davg_expr('l_extendedprice')} AS avg_price,
           {davg_expr('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark, sf):
    # TPC-H Q1 shape: map-side partial agg + one hash shuffle on 2 keys.
    # r16: the four decimal(38,6) sums are the headline's heaviest
    # per-row scan work and the local single-row-group file caps the
    # scan at ~3 tasks — fan out AFTER the pushed filter (no-op at
    # scale; A/B 1.70 -> 1.15 s min in-session).
    from dataingestionplayground_spark.session import fan_out_small_scan

    li = fan_out_small_scan(
        t(spark, sf, "lineitem").filter(
            F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(min(o_totalprice) AS DOUBLE) AS min_price,
           CAST(max(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark, sf):
    o = t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT l_partkey, {dsum_expr('l_quantity')} AS total_qty, COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_partkey
    HAVING COUNT(*) >= 40
    """,
)
def agg_having(spark, sf):
    li = t(spark, sf, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(dsum("l_quantity").alias("total_qty"), F.count(F.lit(1)).alias("n_lines"))
        .filter(F.col("n_lines") >= 40)
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_expr('l_extendedprice')} AS sum_price, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice").alias("sum_price"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dsum_expr('o_totalprice')} AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf):
    o = t(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("sum_price")
    )


@register(
    "agg_case_conditional",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           {dsum_expr("CASE WHEN o_totalprice > 250000 THEN o_totalprice ELSE 0.0 END")} AS big_order_value
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_case_conditional(spark, sf):
    # TPC-H Q12-style conditional aggregation.
    o = t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        dsum(
            F.when(F.col("o_totalprice") > 250000, F.col("o_totalprice")).otherwise(F.lit(0.0))
        ).alias("big_order_value"),
    )


@register(
    "agg_single_row",
    oracle=f"""
    SELECT {dsum_expr('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
    """,
)
def agg_single_row(spark, sf):
    # TPC-H Q6 shape: pure scan + filter + one global agg (no group keys).
    li = t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.04, 0.06))
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


# --- joins (§2.3) ----------------------------------------------------------


@register(
    "join_inner_agg",
    oracle=f"""
    SELECT c.c_mktsegment, COUNT(*) AS n_lines,
           {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_mktsegment
    """,
)
def join_inner_agg(spark, sf):
    # TPC-H Q3 shape: two equi-joins sharing the orders key; Catalyst picks
    # broadcast for customer at small SF, SMJ at scale — we don't force it.
    c, o, li = t(spark, sf, "customer"), t(spark, sf, "orders"), t(spark, sf, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "join_star_broadcast",
    oracle=f"""
    SELECT n.n_name, r.r_name, COUNT(*) AS n_customers,
           {dsum_expr('c.c_acctbal')} AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def join_star_broadcast(spark, sf):
    # Star-schema dims are fixed-size (25/5 rows at ANY SF) -> explicit
    # broadcast: zero shuffle for the joins, one shuffle for the agg.
    c = t(spark, sf, "customer")
    n = F.broadcast(t(spark, sf, "nation"))
    r = F.broadcast(t(spark, sf, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("total_balance"))
    )


@register(
    "join_multiway",
    oracle=f"""
    SELECT n.n_name, {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def join_multiway(spark, sf):
    # TPC-H Q5 shape: 6-way join; region filter prunes before the fact join.
    c, o, li = t(spark, sf, "customer"), t(spark, sf, "orders"), t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = F.broadcast(t(spark, sf, "nation"))
    r = F.broadcast(t(spark, sf, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark, sf):
    # TPC-H Q13 shape: outer join preserving empty groups.
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        c.join(
            o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark, sf):
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return c.join(
        o.filter(F.col("o_totalprice") > 400000),
        c.c_custkey == o.o_custkey,
        "left_semi",
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_anti(spark, sf):
    # The incremental-ingestion dedup join (VectorStoreCommands.cs:159 ->
    # SURVEY §2.3): new-rows = source ANTI JOIN existing on documentid.
    # (Filtered right side keeps the anti-set non-empty at every SF.)
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return c.join(
        o.filter(F.col("o_totalprice") > 300000), c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_acctbal")


@register(
    "join_cross_small",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    WHERE n.n_regionkey <> r.r_regionkey
    """,
)
def join_cross_small(spark, sf):
    r, n = t(spark, sf, "region"), t(spark, sf, "nation")
    return r.crossJoin(n).filter(F.col("n_regionkey") != F.col("r_regionkey")).select(
        "r_name", "n_name"
    )


@register(
    "join_theta_range",
    oracle="""
    SELECT o.o_orderkey, COUNT(*) AS n_late_lines
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderkey
    """,
)
def join_theta_range(spark, sf):
    # Equi-key + range residual: stays a hash/SMJ join (the equi conjunct
    # carries the shuffle), residual evaluated post-match.
    o, li = t(spark, sf, "orders"), t(spark, sf, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_late_lines"))
    )


@register(
    "join_range_bucketized",
    oracle="""
    SELECT b.p_partkey AS band_part, COUNT(*) AS n_in_band
    FROM part p JOIN (SELECT p_partkey, p_retailprice - 2.5 AS lo,
                             p_retailprice + 2.5 AS hi FROM part) b
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.p_partkey
    """,
)
def join_range_bucketized(spark, sf):
    # Point-in-interval self-join: parts whose price falls in +-2.5 bands of
    # each part. Spark side bucketizes (operators.asof.range_join) so the
    # theta join becomes an equi-join — the oracle states plain semantics.
    from dataingestionplayground_spark.operators.asof import range_join

    p = t(spark, sf, "part")
    points = p.select("p_retailprice")
    bands = p.select(
        F.col("p_partkey"),
        (F.col("p_retailprice") - 2.5).alias("lo"),
        (F.col("p_retailprice") + 2.5).alias("hi"),
    )
    joined = range_join(points, bands, "p_retailprice", "lo", "hi", bucket_width=5.0)
    return joined.groupBy(F.col("p_partkey").alias("band_part")).agg(
        F.count(F.lit(1)).alias("n_in_band")
    )


# --- sorts / limits / top-k (§2.6) ----------------------------------------


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
)
def sort_limit_topk(spark, sf):
    # TakeOrdered physical op: per-partition top-k + driver merge, no full sort.
    o = t(spark, sf, "orders")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).select(
        "o_orderkey", "o_totalprice"
    ).limit(25)


# --- set operations (§2.7) -------------------------------------------------


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark, sf):
    c, s = t(spark, sf, "customer"), t(spark, sf, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def set_intersect(spark, sf):
    c, s = t(spark, sf, "customer"), t(spark, sf, "supplier")
    return c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey")
    ).intersect(s.filter(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").alias("nationkey")))


@register(
    "set_except",
    oracle="""
    SELECT n_nationkey FROM nation
    EXCEPT
    SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
    """,
)
def set_except(spark, sf):
    n, c = t(spark, sf, "nation"), t(spark, sf, "customer")
    return n.select("n_nationkey").exceptAll(
        c.select(F.col("c_nationkey").alias("n_nationkey")).distinct()
    ).distinct()


# --- subqueries (Catalyst decorrelation) ----------------------------------


@register(
    "subquery_scalar",
    oracle="""
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
    """,
)
def subquery_scalar(spark, sf):
    # Scalar subquery via SQL front-end: same Catalyst plan as DataFrame.
    t(spark, sf, "customer").createOrReplaceTempView("v_customer_sq")
    return spark.sql(
        """
        SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal FROM v_customer_sq
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM v_customer_sq WHERE c_acctbal > 0.0)
        """
    )


@register(
    "subquery_in",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
)
def subquery_in(spark, sf):
    t(spark, sf, "supplier").createOrReplaceTempView("v_supplier_sq")
    t(spark, sf, "nation").createOrReplaceTempView("v_nation_sq")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM v_supplier_sq
        WHERE s_nationkey IN (SELECT n_nationkey FROM v_nation_sq WHERE n_regionkey = 2)
        """
    )


@register(
    "subquery_correlated",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity
    FROM lineitem l1
    WHERE l_quantity > (SELECT 2.0 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def subquery_correlated(spark, sf):
    # TPC-H Q17 shape; Catalyst decorrelates to an aggregate + join.
    t(spark, sf, "lineitem").createOrReplaceTempView("v_lineitem_sq")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS l_quantity
        FROM v_lineitem_sq l1
        WHERE l_quantity > (SELECT 2.0 * avg(l_quantity) FROM v_lineitem_sq l2
                            WHERE l2.l_partkey = l1.l_partkey)
        """
    )


# --- pivot -----------------------------------------------------------------


@register(
    "pivot_status_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_priority(spark, sf):
    o = t(spark, sf, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


# --- date/time functions ---------------------------------------------------


@register(
    "date_functions",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(month(o_orderdate) AS INTEGER) AS o_month,
           COUNT(*) AS n_orders,
           {dsum_expr('o_totalprice')} AS monthly_value
    FROM orders GROUP BY 1, 2
    """,
)
def date_functions(spark, sf):
    o = t(spark, sf, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
            "o_totalprice",
        )
        .groupBy("o_year", "o_month")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("monthly_value"))
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
           coalesce(CAST(c.n_cust AS BIGINT), 0) AS n_cust,
           coalesce(CAST(s.n_supp AS BIGINT), 0) AS n_supp
    FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
          WHERE c_acctbal > 9990 GROUP BY c_nationkey) c
    FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
                     WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
      ON c.c_nationkey = s.s_nationkey
    """,
)
def join_full_outer(spark, sf):
    # FULL OUTER preserving both unmatched sides (rare-key aggregates so
    # each side genuinely has keys the other lacks).
    c = (
        t(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9990)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@register(
    "set_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def set_union_all(spark, sf):
    # UNION ALL (bag semantics) vs the distinct UNION above.
    c, s = t(spark, sf, "customer"), t(spark, sf, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .unionAll(s.select(F.col("s_nationkey").alias("nationkey")))
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT l_orderkey, l_linenumber,
             CAST(datediff('day', DATE '1992-01-01', l_shipdate) AS BIGINT) AS lo,
             CAST(datediff('day', DATE '1992-01-01', l_shipdate)
                  + CAST(l_quantity AS BIGINT) AS BIGINT) AS hi
      FROM lineitem
    )
    SELECT a.l_orderkey, a.l_linenumber AS line_a, b.l_linenumber AS line_b,
           CAST(least(a.hi, b.hi) - greatest(a.lo, b.lo) AS BIGINT) AS overlap_days
    FROM iv a JOIN iv b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
     AND a.lo < b.hi AND b.lo < a.hi
    """,
)
def join_interval_overlap(spark, sf):
    # Interval-interval overlap join: pairs of lineitems in the same
    # order whose [commit, receipt) windows overlap, with the overlap
    # length. Spark side grid-bucketizes both interval sets
    # (operators.asof.interval_overlap_join) so the theta predicate
    # becomes an equi-join on (bucket, orderkey) with each pair emitted
    # exactly once (anchored to the overlap-start bucket, no distinct);
    # the oracle states the plain quadratic semantics.
    from dataingestionplayground_spark.operators.asof import interval_overlap_join

    # synthetic lineitem has no commit/receipt dates; model each line's
    # "delivery window" as [shipdate, shipdate + quantity days)
    li = t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.datediff("l_shipdate", F.lit("1992-01-01")).cast("long").alias("lo"),
        (
            F.datediff("l_shipdate", F.lit("1992-01-01")).cast("long")
            + F.col("l_quantity").cast("long")
        ).alias("hi"),
    )
    a = li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber").alias("line_a"),
        F.col("lo").alias("a_lo"),
        F.col("hi").alias("a_hi"),
    )
    b = li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber").alias("line_b"),
        F.col("lo").alias("b_lo"),
        F.col("hi").alias("b_hi"),
    )
    joined = interval_overlap_join(
        a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=30.0, extra_on=["l_orderkey"]
    ).filter(F.col("line_a") < F.col("line_b"))
    return joined.select(
        "l_orderkey",
        "line_a",
        "line_b",
        (
            F.least("a_hi", "b_hi") - F.greatest("a_lo", "b_lo")
        ).cast("long").alias("overlap_days"),
    )
