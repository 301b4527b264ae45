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


def test_write_target_sized_splits_and_coalesces(spark, tmp_path):
    import os

    from dataingestionplayground_spark.operators.layout import write_target_sized

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    # huge target -> exactly one file
    n1 = write_target_sized(docs, str(tmp_path / "one"), target_mb=1024)
    assert n1 == 1
    # tiny target (~8 KB) -> several files, roughly evenly sized
    n2 = write_target_sized(docs, str(tmp_path / "many"), target_mb=8 / 1024.0)
    assert n2 > 1
    sizes = sorted(
        os.path.getsize(os.path.join(tmp_path / "many", f))
        for f in os.listdir(tmp_path / "many")
        if f.endswith(".parquet")
    )
    assert len(sizes) == n2
    assert sizes[0] > 0 and sizes[-1] / sizes[0] < 4  # no degenerate shards
    # round trip: no data loss either way
    assert spark.read.parquet(str(tmp_path / "many")).count() == docs.count()


def test_write_target_sized_empty_frame(spark, tmp_path):
    from dataingestionplayground_spark.operators.layout import write_target_sized

    empty = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter("doc_id < 0")
    n = write_target_sized(empty, str(tmp_path / "empty"), target_mb=64)
    assert n == 1
    assert spark.read.parquet(str(tmp_path / "empty")).count() == 0
