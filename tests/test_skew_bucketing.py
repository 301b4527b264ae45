"""Salted aggregation/join exactness + bucketed-join shuffle elimination."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.operators.skew import (
    bucketed_join,
    salted_agg,
    salted_skew_join,
    write_bucketed,
)
from dataingestionplayground_spark.plans import physical_plan
from dataingestionplayground_spark.session import load_table


def test_salted_agg_matches_direct(spark):
    # heavily skewed: 90% of rows share one key
    rows = [(("hot" if i % 10 else f"k{i}"), float(i)) for i in range(10_000)]
    df = spark.createDataFrame(rows, "k string, v double")
    fast = {
        r.k: (r.sum_v, r.count_v, r.min_v, r.max_v)
        for r in salted_agg(df, ["k"], {"v": "sum"} | {}, salt_buckets=8)
        .join(
            salted_agg(df, ["k"], {"v": "count"}, salt_buckets=8), "k"
        )
        .join(salted_agg(df, ["k"], {"v": "min"}, salt_buckets=8), "k")
        .join(salted_agg(df, ["k"], {"v": "max"}, salt_buckets=8), "k")
        .collect()
    }
    direct = {
        r.k: (r.s, r.c, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    assert set(fast) == set(direct)
    for k in direct:
        assert fast[k][1:] == direct[k][1:]          # count/min/max exact
        assert abs(fast[k][0] - direct[k][0]) < 1e-6  # float sum to tolerance


def test_salted_skew_join_matches_plain(spark):
    left = spark.createDataFrame(
        [(1 if i % 5 else i, i) for i in range(2000)], "k long, payload long"
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(50)], "k long, tag string")
    fast = salted_skew_join(left, right, "k", salt_buckets=4)
    plain = left.join(right, "k")
    assert fast.count() == plain.count()
    assert sorted((r.k, r.payload, r.tag) for r in fast.collect()) == sorted(
        (r.k, r.payload, r.tag) for r in plain.collect()
    )


def test_bucketed_join_eliminates_shuffle(spark, sf_dir):
    # tables land in the session's default warehouse dir (gitignored)
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=4)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", num_buckets=4)
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = physical_plan(joined)
        assert joined.count() > 0
        # co-located buckets: no shuffle exchange on either join side
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
