"""Relational coverage, batch 2: ordered-set aggregates, moment statistics,
grouping sets, unpivot, array/map functions, regexp, null semantics, CTEs,
range frames, TPC-H Q4/Q14/Q22 shapes, systematic sampling.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataingestionplayground_spark.functions.portable import davg_expr, dsum, dsum_expr
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.95) AS p95,
           CAST(min(l_extendedprice) AS DOUBLE) AS p_min
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf):
    # Exact interpolated percentiles: Spark percentile() and DuckDB
    # quantile_cont share the linear-interpolation definition bit-for-bit.
    # (At 100 TB you'd switch to percentile_approx — see agg_approx below.)
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        F.min("l_extendedprice").alias("p_min"),
    )


@register("agg_approx_distinct", oracle=None)  # sketch-based: rows-only
def agg_approx_distinct(spark, sf):
    # HLL++ and t-digest sketches — THE scale path for distincts/quantiles
    # (no exact-agg state explosion). Sketch values are engine-specific,
    # so correctness is rows-only; tests bound the relative error.
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("approx_p50"),
    )


@register(
    "agg_variance_moments",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           round(sqrt(({dsum_expr('o_totalprice * o_totalprice')}
                 - {dsum_expr('o_totalprice')} * {dsum_expr('o_totalprice')} / CAST(COUNT(*) AS DOUBLE))
                / CAST(COUNT(*) - 1 AS DOUBLE)), 4) AS stddev_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_variance_moments(spark, sf):
    # Moment statistics from decimal-exact power sums: the one-pass
    # (sum, sum-of-squares) formulation every engine parallelizes. The raw
    # sum-of-squares is ~21 significant digits — decimal->double conversion
    # differs by 1 ulp across engines at that magnitude, so only the
    # (rounded) derived statistic is exposed, not the power sums.
    o = t(spark, sf, "orders")
    n = F.count(F.lit(1))
    s1 = dsum("o_totalprice")
    s2 = dsum(F.col("o_totalprice") * F.col("o_totalprice"))
    return o.groupBy("o_orderstatus").agg(
        n.alias("n"),
        F.round(
            F.sqrt((s2 - s1 * s1 / n.cast("double")) / (n - F.lit(1)).cast("double")), 4
        ).alias("stddev_price"),
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
           CAST(grouping(l_linestatus) AS INTEGER) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def agg_grouping_sets(spark, sf):
    t(spark, sf, "lineitem").createOrReplaceTempView("v_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status
        FROM v_li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "unpivot_long_form",
    oracle="""
    SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'price' AS attr, p_retailprice AS val FROM part
    """,
)
def unpivot_long_form(spark, sf):
    # wide -> long via stack (the UNPIVOT physical form).
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', cast(p_size as double), 'price', p_retailprice) as (attr, val)"
        ),
    )


@register(
    "array_agg_functions",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), '|') AS nations,
           CAST(len(list(n_name)) AS INTEGER) AS n_nations,
           list_contains(list(n_name), 'NATION_3') AS has_china,
           array_to_string(list_sort(list(n_name)), ',') AS nations_csv
    FROM nation GROUP BY n_regionkey
    """,
)
def array_agg_functions(spark, sf):
    # collect_list is unordered across partitions -> always sort before
    # exposing (determinism rule for any array-valued aggregate). The array
    # itself is projected through array_join: the driver's pandas
    # canonicalizer hashes scalar columns only (lists are unhashable), so
    # every registry query must expose scalar output columns.
    n = t(spark, sf, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
        F.size(F.collect_list("n_name")).alias("n_nations"),
        F.array_contains(F.collect_list("n_name"), "NATION_3").alias("has_china"),
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"),
    )


@register(
    "array_lambda_functions",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_transform(list_sort(list(n_name)), x -> lower(x)), '|')
             AS lowered,
           coalesce(array_to_string(list_filter(list_sort(list(n_name)),
                                                x -> length(x) <= 5), '|'), '')
             AS short_names,
           CAST(list_aggregate(list_transform(list(n_name), x -> length(x)), 'sum')
                AS BIGINT) AS total_len
    FROM nation GROUP BY n_regionkey
    """,
)
def array_lambda_functions(spark, sf):
    # higher-order functions on arrays (transform/filter/aggregate) — JVM-side
    # lambdas. Output arrays are flattened via array_join so the driver's
    # scalar-only canonicalizer can hash the rows.
    n = t(spark, sf, "nation")
    return n.groupBy("n_regionkey").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(n_name)), x -> lower(x)), '|')"
        ).alias("lowered"),
        F.expr(
            "array_join(filter(array_sort(collect_list(n_name)), x -> length(x) <= 5), '|')"
        ).alias("short_names"),
        F.expr(
            "aggregate(transform(collect_list(n_name), x -> length(x)), 0L, (a, x) -> a + x)"
        ).alias("total_len"),
    )


@register(
    "string_regexp_functions",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS INTEGER) AS consonant_len,
           lpad(p_brand, 12, '.') AS brand_padded,
           reverse(p_type) AS type_rev,
           CASE WHEN regexp_matches(p_name, '^[a-z]+ [a-z]+$') THEN 1 ELSE 0 END AS two_words
    FROM part
    """,
)
def string_regexp_functions(spark, sf):
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.length(F.regexp_replace("p_name", "[aeiou]", "")).alias("consonant_len"),
        F.lpad("p_brand", 12, ".").alias("brand_padded"),
        F.reverse("p_type").alias("type_rev"),
        F.when(F.col("p_name").rlike("^[a-z]+ [a-z]+$"), 1).otherwise(0).alias("two_words"),
    )


@register(
    "null_semantics",
    oracle="""
    SELECT c.c_custkey,
           coalesce(CAST(o.n_orders AS BIGINT), 0) AS n_orders,
           CASE WHEN o.n_orders IS NULL THEN 'inactive' ELSE 'active' END AS status,
           nullif(c.c_mktsegment, 'MACHINERY') AS seg_or_null
    FROM customer c LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    """,
)
def null_semantics(spark, sf):
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.when(F.col("n_orders").isNull(), "inactive").otherwise("active").alias("status"),
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg_or_null"),
    )


@register(
    "cte_above_average_nations",
    oracle=f"""
    WITH rev AS (
      SELECT c.c_nationkey, {dsum_expr('o.o_totalprice')} AS nation_rev
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    )
    SELECT c_nationkey, nation_rev FROM rev
    WHERE nation_rev > (SELECT {davg_expr('nation_rev')} FROM rev)
    """,
)
def cte_above_average_nations(spark, sf):
    # CTE + scalar subquery over the CTE (TPC-H Q11/Q15 shape). The CTE's
    # decimal-exact sums make the avg threshold bit-stable cross-engine.
    t(spark, sf, "customer").createOrReplaceTempView("v_cust_cte")
    t(spark, sf, "orders").createOrReplaceTempView("v_ord_cte")
    return spark.sql(
        f"""
        WITH rev AS (
          SELECT c.c_nationkey, {dsum_expr('o.o_totalprice')} AS nation_rev
          FROM v_cust_cte c JOIN v_ord_cte o ON o.o_custkey = c.c_custkey
          GROUP BY c.c_nationkey
        )
        SELECT c_nationkey, nation_rev FROM rev
        WHERE nation_rev > (SELECT {davg_expr('nation_rev')} FROM rev)
        """
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf):
    # Correlated EXISTS via semi-join on a (key, residual) condition —
    # the residual (l_shipdate > o_orderdate) rides the equi-join.
    o, li = t(spark, sf, "orders"), t(spark, sf, "lineitem")
    filtered = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    return (
        filtered.join(
            li,
            (filtered.o_orderkey == li.l_orderkey) & (li.l_shipdate > filtered.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q14_promo_ratio",
    oracle=f"""
    SELECT 100.0 * {dsum_expr("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")}
           / {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01' AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def tpch_q14_promo_ratio(spark, sf):
    li, p = t(spark, sf, "lineitem"), t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(p, li.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_revenue_pct"))
    )


@register(
    "tpch_q22_cntrycode",
    oracle=f"""
    WITH cust AS (
      SELECT substr(c_name, 1, 4) AS cntrycode, c_acctbal, c_custkey FROM customer
    )
    SELECT cntrycode, COUNT(*) AS numcust, {dsum_expr('c_acctbal')} AS totacctbal
    FROM cust c
    WHERE c_acctbal > (SELECT {davg_expr('c_acctbal')} FROM cust WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    GROUP BY cntrycode
    """,
)
def tpch_q22_cntrycode(spark, sf):
    t(spark, sf, "customer").createOrReplaceTempView("v_cust_q22")
    t(spark, sf, "orders").createOrReplaceTempView("v_ord_q22")
    return spark.sql(
        f"""
        WITH cust AS (
          SELECT substr(c_name, 1, 4) AS cntrycode, c_acctbal, c_custkey FROM v_cust_q22
        )
        SELECT cntrycode, COUNT(*) AS numcust, {dsum_expr('c_acctbal')} AS totacctbal
        FROM cust c
        WHERE c_acctbal > (SELECT {davg_expr('c_acctbal')} FROM cust WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM v_ord_q22 o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        GROUP BY cntrycode
        """
    )


@register(
    "window_analytic_suite",
    oracle="""
    SELECT p_partkey, p_brand,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           first_value(p_partkey) OVER w AS cheapest,
           nth_value(p_partkey, 2) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_cheapest
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
)
def window_analytic_suite(spark, sf):
    # percent_rank / cume_dist / first / nth over a 25-value partition
    # key (p_brand): the window form puts |part|/25 rows on each reducer
    # at scale. Exact equivalents from the sharded prefix rank instead:
    # the order (p_retailprice, p_partkey) is unique, so
    # percent_rank = (rn-1)/(n-1), cume_dist = rn/n, and the first/
    # second keys per brand are a tiny broadcast (25 x 2).
    from dataingestionplayground_spark.operators.prefix import sharded_row_number

    p = t(spark, sf, "part").select("p_partkey", "p_brand", "p_retailprice")
    ranked = sharded_row_number(
        p, [("p_retailprice", True), ("p_partkey", True)], ("p_brand",), "__rn"
    )
    nd = ranked.groupBy("p_brand").agg(F.count(F.lit(1)).alias("__n"))
    top2 = (
        ranked.filter(F.col("__rn") <= 2)
        .groupBy("p_brand")
        .agg(
            F.min(F.when(F.col("__rn") == 1, F.col("p_partkey"))).alias("cheapest"),
            F.min(F.when(F.col("__rn") == 2, F.col("p_partkey"))).alias(
                "second_cheapest"
            ),
        )
    )
    return (
        ranked.join(F.broadcast(nd), "p_brand")
        .join(F.broadcast(top2), "p_brand")
        .select(
            "p_partkey",
            "p_brand",
            F.when(
                F.col("__n") > 1, (F.col("__rn") - 1) / (F.col("__n") - 1)
            )
            .otherwise(F.lit(0.0))
            .alias("pr"),
            (F.col("__rn") / F.col("__n")).alias("cd"),
            "cheapest",
            "second_cheapest",
        )
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           COUNT(*) OVER (ORDER BY o_totalprice
                          RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1k
    FROM orders
    """,
)
def window_range_frame(spark, sf):
    # RANGE frame over a value column: COUNT(*) of peers within $1000
    # below, i.e. |{rows : price in [x-1000, x]}| for every row.
    #
    # The SQL frame (`COUNT(*) OVER (ORDER BY price RANGE 1000
    # PRECEDING)`) is a GLOBAL unpartitioned window — every orders row
    # on one reducer, corpus-sized output: a scale-killer. The Spark
    # plan computes the same value with ONE range exchange and zero row
    # replication (r10 — the r9 version replicated boundary rows via a
    # corpus x bounds BroadcastNestedLoopJoin plus a SECOND full
    # shuffle, the round's flagged sf1.0 scaling row): range-partition
    # by price, COLLECT only the <=$1000-wide boundary slice of each
    # shard (n_shards x window-width x boundary-density values — never
    # corpus-sized), broadcast the sorted slice arrays, and count per
    # row as local-searchsorted + foreign-slice-searchsorted. A row's
    # [x-1000, x] window reaches other shards only through those
    # slices: earlier shards contribute their tails above
    # lo_next - 1000, later shards only boundary ties.
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    o = t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    n_shards = max(2, o.sparkSession.sparkContext.defaultParallelism)
    ranged = (
        o.repartitionByRange(n_shards, F.asc("o_totalprice"), F.asc("o_orderkey"))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    span = ranged.groupBy("__pid").agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bounds = sorted(
        (int(r["__pid"]), float(r["lo"]), float(r["hi"])) for r in span.collect()
    )
    out_schema = T.StructType(
        [
            o.schema["o_orderkey"],
            o.schema["o_totalprice"],
            T.StructField("n_within_1k", T.LongType(), False),
        ]
    )
    slices: dict[int, np.ndarray] = {}
    if len(bounds) > 1:
        # shard q's tail slice [lo_next(q) - 1000, hi_q] covers every
        # window reaching q from a later shard (lo_p >= lo_next(q));
        # boundary-tie rows (price == lo_q == hi of the previous shard,
        # chains included) cover windows reaching q from EARLIER shards,
        # whose only in-range values are ties at their own hi.
        rows = []
        for i, (pid, lo, hi) in enumerate(bounds):
            thresh = bounds[i + 1][1] - 1000.0 if i + 1 < len(bounds) else None
            tie = lo if i > 0 and lo == bounds[i - 1][2] else None
            rows.append((pid, thresh, tie))
        bdf = spark.createDataFrame(rows, "__pid int, thresh double, tie double")
        sliced = (
            ranged.join(F.broadcast(bdf), "__pid")  # broadcast HASH join
            .filter(
                (F.col("o_totalprice") >= F.col("thresh"))
                | (F.col("o_totalprice") == F.col("tie"))
            )
            .groupBy("__pid")
            .agg(F.sort_array(F.collect_list("o_totalprice")).alias("vals"))
            .collect()
        )
        slices = {int(r["__pid"]): np.asarray(r["vals"], dtype="float64") for r in sliced}
        total = sum(len(v) for v in slices.values())
        # contract: window width x boundary density stays driver-sized
        # (at sf1.0: ~90k doubles). A window spanning a large corpus
        # fraction has no partitioned evaluation at all — fail loudly.
        if total > 20_000_000:
            raise ValueError(
                f"range-frame boundary slices hold {total} rows — the "
                "frame width covers too much of the value domain for "
                "sharded evaluation"
            )
    s_all = np.sort(np.concatenate(list(slices.values()))) if slices else np.empty(0)
    bc = spark.sparkContext.broadcast((s_all, slices))

    def count_in_range(batches):
        s_all_v, own_v = bc.value
        # one shard may span several Arrow batches — the local count
        # needs the whole partition's price array, so accumulate
        acc = []
        for pdf in batches:
            if len(pdf):
                acc.append(pdf)
        if not acc:
            return
        pdf = pd.concat(acc, ignore_index=True)
        pid = int(pdf["__pid"].iloc[0])
        x = pdf["o_totalprice"].to_numpy(dtype="float64")
        prices = np.sort(x)
        own = own_v.get(pid, np.empty(0))

        def rangecount(arr, q):
            return np.searchsorted(arr, q, side="right") - np.searchsorted(
                arr, q - 1000.0, side="left"
            )

        # foreign = all boundary-slice values minus this shard's own
        # contribution to them (those rows are already counted locally)
        n = rangecount(prices, x) + rangecount(s_all_v, x) - rangecount(own, x)
        yield pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_totalprice": pdf["o_totalprice"],
                "n_within_1k": n.astype("int64"),
            }
        )

    return ranged.mapInPandas(count_in_range, schema=out_schema)


@register(
    "sample_systematic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_orderkey % 97 = 0
    """,
)
def sample_systematic(spark, sf):
    # Deterministic systematic sampling (key mod k) — the reproducible
    # alternative to Bernoulli sample() for cross-engine checks.
    li = t(spark, sf, "lineitem")
    return li.filter(F.col("l_orderkey") % 97 == 0).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "agg_histogram",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(o_totalprice) AS DOUBLE) AS lo, CAST(max(o_totalprice) AS DOUBLE) AS hi
      FROM orders
    )
    SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20.0)), 19) AS INTEGER) AS bucket,
           COUNT(*) AS n,
           CAST(min(o_totalprice) AS DOUBLE) AS bucket_min,
           CAST(max(o_totalprice) AS DOUBLE) AS bucket_max
    FROM orders CROSS JOIN bounds
    GROUP BY 1
    """,
)
def agg_histogram(spark, sf):
    # Equi-width 20-bucket histogram: bounds from one agg pass (broadcast
    # 1-row), bucket index arithmetic identical on both engines (min/max
    # are exact, the division/floor path is the same IEEE expression).
    o = t(spark, sf, "orders")
    bounds = o.agg(
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 20.0)),
        F.lit(19),
    ).cast("int")
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("bucket_min"),
            F.max("o_totalprice").alias("bucket_max"),
        )
    )


@register(
    "fuzzy_match_levenshtein",
    oracle="""
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_match_levenshtein(spark, sf):
    # Fuzzy string matching: brand-blocked self-join + edit-distance
    # filter (blocking bounds the candidate pairs; at scale the block key
    # comes from LSH/phonetic bucketing).
    p = t(spark, sf, "part")
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(b, (F.col("a.p_brand") == F.col("b.p_brand"))
               & (F.col("a.p_partkey") < F.col("b.p_partkey")))
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= 2)
    )


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_cnt(spark, sf):
    # Q16 shape: NOT IN subquery (null-aware anti join) + distinct count
    # over a filtered dimension join.
    t(spark, sf, "lineitem").createOrReplaceTempView("v_li_q16")
    t(spark, sf, "part").createOrReplaceTempView("v_p_q16")
    t(spark, sf, "supplier").createOrReplaceTempView("v_s_q16")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM v_li_q16 l JOIN v_p_q16 p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#5'
          AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM v_s_q16 WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
        """
    )


@register(
    "tpch_q19_disjunctive",
    oracle=f"""
    SELECT {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19_disjunctive(spark, sf):
    # Q19 shape: disjunction of conjunctive predicates across both join
    # sides — Catalyst pushes the common p_partkey equi-key and evaluates
    # the OR residual post-join.
    li, p = t(spark, sf, "lineitem"), t(spark, sf, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "window_ntile_buckets",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
           ntile(10) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
             AS decile_in_status
    FROM orders
    """,
)
def window_ntile_buckets(spark, sf):
    # ntile bucketing (equi-depth partitioning) — global and per-group;
    # unique tie-break column makes the assignment deterministic.
    #
    # NOT expressed as window functions on the Spark side: the global
    # ntile(4) would move every orders row to one reducer, and the
    # per-status ntile(10) partitions on a 3-value key (~|orders|/3 per
    # reducer) — both corpus-sized single/skewed-partition WindowExecs
    # at 100x scale. Both buckets come from the sharded exact
    # prefix-count (operators/prefix.py) in ONE pass: range-partition on
    # the shared sort key, per-(shard, status) counts collected (tiny —
    # they also roll up to the global per-shard counts), local grouped
    # cumcount + broadcast offset = exact rank, ntile arithmetic from
    # rank. r10: the r9 version chained two sharded_ntile calls (two
    # range shuffles, two materializations) and was the round's flagged
    # sf1.0 scaling row; sharded_rank_multi halves that.
    from pyspark.sql import types as T

    from dataingestionplayground_spark.operators.prefix import (
        _ntile_buckets,
        sharded_rank_multi,
    )

    o = t(spark, sf, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    order = [("o_totalprice", True), ("o_orderkey", True)]
    out = sharded_rank_multi(
        o,
        order,
        [
            ((), lambda r, n: _ntile_buckets(r, n, 4), "quartile", T.IntegerType(), "int32"),
            (
                ("o_orderstatus",),
                lambda r, n: _ntile_buckets(r, n, 10),
                "decile_in_status",
                T.IntegerType(),
                "int32",
            ),
        ],
    )
    return out.select("o_orderkey", "quartile", "decile_in_status")


@register(
    "fuzzy_join_qgram_overlap",
    oracle="""
    WITH g AS MATERIALIZED (
      SELECT p_partkey,
             list_sort(list_distinct(
               [substr(nm, i, 3) for i in range(1, len(nm) - 1)]
             )) AS grams
      FROM (SELECT p_partkey, lower(p_name) AS nm FROM part)
      WHERE len(nm) >= 3
    ), gr AS MATERIALIZED (
      SELECT p_partkey, unnest(grams) AS gram FROM g
    )
    -- equi-join-on-gram + per-pair gram count == brute-force
    -- list_intersect length EXACTLY: grams are distinct within a key,
    -- so COUNT(*) per (a,b) IS |A n B|, and any pair with overlap >= 8
    -- shares >= 8 grams, hence appears in the join (trivially lossless
    -- blocking, INDEPENDENT of the engine's prefix-filter rule being
    -- proved). Replaces the O(n^2) nested-loop theta join with two
    -- per-pair list_intersect evaluations — 13.0s of the sf0.01 gate
    -- (r11 verdict hygiene) for identical output.
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(COUNT(*) AS INTEGER) AS overlap
    FROM gr a JOIN gr b ON a.gram = b.gram AND a.p_partkey < b.p_partkey
    GROUP BY a.p_partkey, b.p_partkey
    HAVING COUNT(*) >= 8
    """,
)
def fuzzy_join_qgram_overlap(spark, sf):
    # Set-similarity self-join with LOSSLESS prefix filtering (the
    # AllPairs/PPJoin candidate rule, Bayardo et al. 2007 / Xiao et al.
    # 2008): pairs of part names sharing >= T distinct character
    # trigrams. The oracle is the O(n^2) brute force; the engine plan
    # never forms all pairs — per name the distinct trigrams are sorted
    # into a global (lexicographic) order and only the FIRST
    # |grams| - T + 1 of them are indexed, because two sets with
    # |A ∩ B| >= T must share an element inside both prefixes. The
    # hash-match against the cross-join oracle is the machine-checked
    # proof the pruning is lossless, not approximate. Plan shape at
    # 100 TB: in-row gram arrays, one equi-join on the (bounded) prefix
    # grams, distinct candidate pairs, in-row array_intersect verify —
    # the quadratic blow-up is confined to genuinely-similar blocks,
    # exactly like the banded MinHash join (operators/dedup.py:105).
    T = 8
    p = t(spark, sf, "part").select(
        "p_partkey", F.lower(F.col("p_name")).alias("nm")
    ).filter(F.length("nm") >= 3)
    g = p.select(
        "p_partkey",
        F.expr(
            "array_sort(array_distinct("
            "transform(sequence(1, length(nm) - 2), i -> substring(nm, i, 3))))"
        ).alias("grams"),
    ).filter(F.size("grams") >= T)  # |A ∩ B| <= min|.|, can't reach T
    # The prefix-filter lemma holds for ANY global total order, but the
    # candidate count depends enormously on WHICH: a lexicographic
    # order front-loads common grams ("sma" from every "small ..."
    # name), whose blocks pair quadratically. The classic AllPairs
    # choice is GLOBAL-FREQUENCY order — rarest grams first — so
    # prefixes are made of the grams with the SMALLEST blocks. Measured
    # at sf0.1: candidate pairs 6.9M (lexicographic) -> 2.1M
    # (rarest-first), near-tight against the ~2M TRUE pairs — the
    # slack that explodes under further scale-up is what the order
    # removes. (The true-pair count itself is quadratic on this
    # replica corpus — 64 distinct names copied thousands of times are
    # genuinely all-pairs similar — which is why dup-heavy production
    # corpora route through dedup_clusters representatives before any
    # pairwise join; this query keeps the raw-pairs contract for the
    # oracle proof.) The order key is simply the (df, gram) struct
    # (ties broken on the gram string: total and deterministic); the
    # df table is bounded by the distinct-gram domain (<= |charset|^3)
    # and broadcasts.
    gram_rows = g.select("p_partkey", F.explode("grams").alias("gram"))
    freq = gram_rows.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    pre = (
        gram_rows.join(F.broadcast(freq), "gram")
        .groupBy("p_partkey")
        .agg(F.expr("array_sort(collect_list(struct(__df, gram)))").alias("ranked"))
        .select(
            "p_partkey",
            F.explode(
                F.expr(
                    f"transform(slice(ranked, 1, size(ranked) - {T} + 1), "
                    "x -> x.gram)"
                )
            ).alias("gram"),
        )
    )
    cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("id_a"), F.col("b.p_partkey").alias("id_b")
        )
        .distinct()
    )
    ga = g.select(F.col("p_partkey").alias("id_a"), F.col("grams").alias("g_a"))
    gb = g.select(F.col("p_partkey").alias("id_b"), F.col("grams").alias("g_b"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn(
            "overlap", F.size(F.array_intersect("g_a", "g_b")).cast("int")
        )
        .filter(F.col("overlap") >= T)
        .select("id_a", "id_b", "overlap")
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount")


def _corr_sql(a: str, b: str) -> str:
    """Pearson r of two lineitem columns from decimal-exact power sums
    (same one-pass moment formulation as agg_variance_moments)."""
    n = "CAST(COUNT(*) AS DOUBLE)"
    return (
        f"round(({n} * {dsum_expr(f'{a} * {b}')} "
        f"       - {dsum_expr(a)} * {dsum_expr(b)})"
        f" / sqrt(({n} * {dsum_expr(f'{a} * {a}')} - {dsum_expr(a)} * {dsum_expr(a)})"
        f"      * ({n} * {dsum_expr(f'{b} * {b}')} - {dsum_expr(b)} * {dsum_expr(b)})),"
        f" 6)"
    )


@register(
    "agg_corr_pairs",
    oracle=f"""
    {' UNION ALL '.join(
        f"SELECT '{a}' AS col_x, '{b}' AS col_y, {_corr_sql(a, b)} AS corr FROM lineitem"
        for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1:]
    )}
    """,
)
def agg_corr_pairs(spark, sf):
    # Pairwise Pearson correlation matrix (upper triangle) over the
    # lineitem measures — the feature-analysis pass a training pipeline
    # runs before picking de-correlated features or sampling weights.
    # NOT Spark's corr(): that computes per-partition co-moments in
    # float (order-dependent low bits vs a sequential engine); instead
    # the one-pass power sums route through DECIMAL(38,6) (exact,
    # associative — partial aggregation stays enabled) and only the
    # final r is derived in double and rounded. ONE scan computes all
    # nine sums (grand agg, map-side partial); the 3-row matrix
    # materializes driver-free via an in-plan stack of the one agg row.
    li = t(spark, sf, "lineitem")

    def s(e):
        return dsum(e)

    c = {a: F.col(a) for a in _CORR_COLS}
    agg = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[s(c[a]).alias(f"s_{a}") for a in _CORR_COLS],
        *[
            s(c[a] * c[b]).alias(f"s_{a}_{b}")
            for i, a in enumerate(_CORR_COLS)
            for b in _CORR_COLS[i:]
        ],
    )

    def r_expr(a, b):
        n = F.col("n")
        sa, sb = F.col(f"s_{a}"), F.col(f"s_{b}")
        sab = F.col(f"s_{a}_{b}")
        saa, sbb = F.col(f"s_{a}_{a}"), F.col(f"s_{b}_{b}")
        return F.round(
            (n * sab - sa * sb)
            / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
            6,
        )

    pairs = [
        (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
    ]
    stack_args = ", ".join(f"'{a}', '{b}', r_{a}_{b}" for a, b in pairs)
    withr = agg.select(
        *[r_expr(a, b).alias(f"r_{a}_{b}") for a, b in pairs]
    )
    return withr.select(
        F.expr(f"stack({len(pairs)}, {stack_args}) as (col_x, col_y, corr)")
    )


@register(
    "hierarchy_rollup_ancestors",
    oracle="""
    WITH chain AS (
      SELECT p_retailprice,
             unnest([p_partkey // 1, p_partkey // 10, p_partkey // 100,
                     p_partkey // 1000, p_partkey // 10000,
                     p_partkey // 100000, p_partkey // 1000000]) AS node
      FROM part
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_desc,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
             AS total_price
    FROM chain WHERE node > 0 GROUP BY node
    """,
)
def hierarchy_rollup_ancestors(spark, sf):
    # Hierarchy (BOM-style) subtree rollup WITHOUT a recursive CTE or an
    # iterative join: the part keyspace forms a decimal-trie hierarchy
    # (parent(k) = k div 10), so every node's full ancestor chain is
    # computable IN-ROW as the prefix divisions k div 10^i — explode
    # the (depth<=7)-element chain, one hash agg, and each node holds
    # its descendant count and price mass. The general lesson for
    # 100 TB: when the parent function is arithmetic (tries, geo-cells,
    # time-grain ladders, org codes), the O(depth * n) explode beats
    # any fixpoint join — no iteration, no driver loop, partial-agg
    # friendly. Cf. operators/graph.py pointer-jumping for hierarchies
    # that are DATA (arbitrary parent pointers), where iteration is
    # unavoidable.
    p = t(spark, sf, "part")
    chain = F.array(
        *[F.expr(f"CAST(p_partkey DIV {10 ** i} AS BIGINT)") for i in range(7)]
    )
    return (
        p.select("p_retailprice", F.explode(chain).alias("node"))
        .filter(F.col("node") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_desc"),
            dsum("p_retailprice").alias("total_price"),
        )
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH pq AS (
      SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS w
      FROM lineitem GROUP BY 1, 2
    ), tot AS (
      SELECT l_returnflag, SUM(w) AS tw FROM pq GROUP BY 1
    ), folded AS (
      SELECT a.l_returnflag, a.qty, SUM(b.w) AS cum
      FROM pq a JOIN pq b
        ON b.l_returnflag = a.l_returnflag AND b.qty <= a.qty
      GROUP BY a.l_returnflag, a.qty
    )
    SELECT f.l_returnflag,
           CAST(MIN(f.qty) AS BIGINT) AS w_median_qty,
           round(CAST(MAX(t.tw) AS DOUBLE), 6) AS total_weight
    FROM folded f JOIN tot t ON t.l_returnflag = f.l_returnflag
    WHERE 2 * f.cum >= t.tw
    GROUP BY f.l_returnflag
    """,
)
def agg_weighted_median(spark, sf):
    # Weighted median (price-mass-weighted quantity) per return flag —
    # the order statistic where HALF THE REVENUE sits at or below the
    # answer, not half the rows. No unpartitioned window and no
    # per-group sort of corpus rows: the corpus collapses first to a
    # (flag x distinct-quantity) weight table (50 distinct quantities —
    # bounded by the MEASURE's domain, not the corpus), the cumulative
    # fold is a conditioned self-join on that bounded table, and the
    # median is the smallest value whose doubled cumulative weight
    # clears the group total. Weights stay DECIMAL(38,6) end-to-end —
    # the 2*cum >= total comparison is exact on both engines, no float
    # boundary at the median cut.
    li = t(spark, sf, "lineitem")
    pq = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    ).agg(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("w"))
    tot = pq.groupBy("l_returnflag").agg(F.sum("w").alias("tw"))
    folded = (
        pq.alias("a")
        .join(
            pq.select(
                F.col("l_returnflag").alias("b_flag"),
                F.col("qty").alias("b_qty"),
                F.col("w").alias("b_w"),
            ),
            (F.col("b_flag") == F.col("l_returnflag"))
            & (F.col("b_qty") <= F.col("qty")),
        )
        .groupBy("l_returnflag", "qty")
        .agg(F.sum("b_w").alias("cum"))
    )
    return (
        folded.join(tot, "l_returnflag")
        .filter(F.lit(2) * F.col("cum") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("qty").cast("long").alias("w_median_qty"),
            F.round(F.max("tw").cast("double"), 6).alias("total_weight"),
        )
    )
