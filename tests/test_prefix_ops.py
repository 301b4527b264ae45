"""operators/prefix.py — sharded rank-family stats must equal the
window-function semantics they replace, including the edge cases the
sharding could get wrong: ties spanning range-partition boundaries,
groups spanning shards, groups smaller than the tile count, and
single-row groups."""

from __future__ import annotations

import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataingestionplayground_spark.operators.prefix import (
    bounded_rank,
    sharded_ntile,
    sharded_row_number,
)


@pytest.fixture(scope="module")
def skewed_df(spark):
    # 3 groups of very different sizes, heavy value ties (v = i % 7) so
    # range-partition boundaries fall INSIDE tie runs, unique tie-break
    rows = [
        (f"g{i % 3 if i < 90 else 0}", i % 7, i)  # g0 dominates
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "g string, v int, id long").repartition(13)


def test_sharded_ntile_matches_window(spark, skewed_df):
    got = sharded_ntile(
        skewed_df, 4, [("v", True), ("id", True)], ("g",), "nt"
    )
    w = W.partitionBy("g").orderBy("v", "id")
    want = skewed_df.withColumn("nt", F.ntile(4).over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sharded_ntile_global_and_small_groups(spark):
    # n < k: every row is its own bucket (SQL-standard distribution)
    df = spark.createDataFrame([(i,) for i in range(3)], "id long")
    got = {r["id"]: r["nt"] for r in sharded_ntile(df, 10, [("id", True)], (), "nt").collect()}
    assert got == {0: 1, 1: 2, 2: 3}


def test_sharded_row_number_matches_window(spark, skewed_df):
    got = sharded_row_number(
        skewed_df, [("v", False), ("id", True)], ("g",), "rn"
    )
    w = W.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = skewed_df.withColumn("rn", F.row_number().over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sharded_row_number_global(spark, skewed_df):
    got = sharded_row_number(skewed_df, [("v", True), ("id", True)], (), "rn")
    ranks = [r["rn"] for r in got.collect()]
    assert sorted(ranks) == list(range(1, 301))
    # exact order: rank follows (v, id)
    by_rank = {r["rn"]: (r["v"], r["id"]) for r in got.collect()}
    keys = [by_rank[i] for i in range(1, 301)]
    assert keys == sorted(keys)


def test_sharded_row_number_null_string_key(spark):
    # ADVICE r7: a NULL partition key surfaces as None in collected Rows
    # but NaN in the pandas batches — both sides must normalize to the
    # same dict key or offsets silently miss / raise KeyError
    rows = [(None if i % 3 == 0 else f"g{i % 2}", i % 5, i) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v int, id long").repartition(11)
    got = sharded_row_number(df, [("v", True), ("id", True)], ("g",), "rn")
    w = W.partitionBy("g").orderBy("v", "id")
    want = df.withColumn("rn", F.row_number().over(w))
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


def test_sharded_ntile_int_key_with_nulls(spark):
    # an int partition column CONTAINING nulls is promoted to float64 by
    # pandas (2 -> 2.0); driver-side keys stay Python ints — _norm_key
    # must reconcile them or every non-null group misses its offset
    rows = [(None if i % 7 == 0 else i % 3, i % 5, i) for i in range(210)]
    df = spark.createDataFrame(rows, "g int, v int, id long").repartition(9)
    got = sharded_ntile(df, 4, [("v", True), ("id", True)], ("g",), "nt")
    w = W.partitionBy("g").orderBy("v", "id")
    want = df.withColumn("nt", F.ntile(4).over(w))
    assert sorted(
        map(tuple, got.collect()), key=str
    ) == sorted(map(tuple, want.collect()), key=str)


def test_sharded_rank_high_cardinality_key_fails_fast(spark, monkeypatch):
    # r7 verdict item 3: a high-cardinality partition key must raise
    # (bounded driver collect) instead of OOMing the driver
    import dataingestionplayground_spark.operators.prefix as P

    monkeypatch.setattr(P, "MAX_COLLECTED_GROUPS", 50)
    df = spark.range(500).withColumn("g", F.col("id").cast("string"))
    with pytest.raises(ValueError, match="bounded-cardinality"):
        sharded_row_number(df, [("id", True)], ("g",), "rn").collect()


def test_bounded_rank_after_limit(spark):
    df = (
        spark.range(1000)
        .withColumn("v", (F.col("id") * 37) % 100)
        .orderBy(F.desc("v"), F.asc("id"))
        .limit(7)
    )
    got = bounded_rank(df, [("v", False), ("id", True)], "rk").collect()
    assert [r["rk"] for r in sorted(got, key=lambda r: (-r["v"], r["id"]))] == list(
        range(1, 8)
    )


def test_no_windowexec_in_sharded_plans(spark, skewed_df):
    plan = (
        sharded_row_number(skewed_df, [("v", True), ("id", True)], ("g",), "rn")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_window_range_frame_exact_on_boundary_ties(spark, tmp_path):
    """The sharded value-range frame (queries/relational2.py
    window_range_frame) must equal the SQL window even when tie runs
    and window edges land exactly on range-partition boundaries — the
    boundary-slice replication covers ties the partitioner splits
    across shards."""
    import __spark_entry__ as E

    # 2000 rows over just 5 distinct prices spaced exactly 500 apart:
    # every shard boundary falls inside a tie run, and x-1000 edges hit
    # other tie runs exactly
    df = spark.createDataFrame(
        [(i, float((i % 5) * 500)) for i in range(2000)],
        "o_orderkey long, o_totalprice double",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = E.queries()["window_range_frame"](spark, str(tmp_path)).collect()
    df.createOrReplaceTempView("v_rf_expected")
    want = spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               COUNT(*) OVER (ORDER BY o_totalprice
                              RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1k
        FROM v_rf_expected
        """
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_sharded_prefix_sum_matches_window(spark, skewed_df):
    from dataingestionplayground_spark.operators.prefix import sharded_prefix_sum

    df = skewed_df.withColumn("w", (F.col("v") % 7 + 1).cast("long"))
    got = {
        r["id"]: r["before"]
        for r in sharded_prefix_sum(df, [("id", True)], "w", "before").collect()
    }
    w = W.orderBy(F.asc("id")).rowsBetween(W.unboundedPreceding, -1)
    want = {
        r["id"]: r["before"] or 0
        for r in df.withColumn("before", F.sum("w").over(w)).collect()
    }
    assert got == want
    assert min(got.values()) == 0


def test_sharded_prefix_sum_keeps_columns_and_no_windowexec(spark, skewed_df):
    from dataingestionplayground_spark.operators.prefix import sharded_prefix_sum

    df = skewed_df.withColumn("w", F.lit(2).cast("long"))
    out = sharded_prefix_sum(df, [("id", True)], "w", "before")
    assert set(out.columns) == set(df.columns) | {"before"}
    assert "Window" not in out._jdf.queryExecution().executedPlan().toString()


def test_sharded_rank_multi_matches_two_windows(spark, skewed_df):
    """sharded_rank_multi computes BOTH a global and a grouped ntile
    over one range shuffle; each column must equal the corresponding
    WindowExec result — including ties straddling shard boundaries and
    groups interleaving within a shard (the property the single-shuffle
    design leans on)."""
    from pyspark.sql import types as T

    from dataingestionplayground_spark.operators.prefix import (
        _ntile_buckets,
        sharded_rank_multi,
    )

    got = sharded_rank_multi(
        skewed_df,
        [("v", True), ("id", True)],
        [
            ((), lambda r, n: _ntile_buckets(r, n, 4), "q4", T.IntegerType(), "int32"),
            (("g",), lambda r, n: _ntile_buckets(r, n, 10), "d10", T.IntegerType(), "int32"),
        ],
    ).select("g", "v", "id", "q4", "d10")
    w_glob = W.orderBy("v", "id")
    w_grp = W.partitionBy("g").orderBy("v", "id")
    want = skewed_df.select(
        "g", "v", "id",
        F.ntile(4).over(w_glob).alias("q4"),
        F.ntile(10).over(w_grp).alias("d10"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sharded_rank_multi_randomized_vs_windows(spark):
    """Seeded randomized sweep: random sizes, tie densities, and group
    fans must all reproduce the WindowExec semantics exactly (the
    multi-task offsets share one count table — an off-by-one in the
    per-(shard, group) bookkeeping would show here)."""
    import random

    from pyspark.sql import types as T

    from dataingestionplayground_spark.operators.prefix import (
        _ntile_buckets,
        sharded_rank_multi,
    )

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        n = rng.randrange(1, 400)
        n_groups = rng.randrange(1, 6)
        tie_mod = rng.choice([1, 2, 5, 50])
        k1, k2 = rng.randrange(1, 9), rng.randrange(1, 12)
        rows = [
            (f"g{rng.randrange(n_groups)}", rng.randrange(tie_mod), i)
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "g string, v int, id long").repartition(7)
        got = sharded_rank_multi(
            df,
            [("v", True), ("id", True)],
            [
                ((), lambda r, nn, k=k1: _ntile_buckets(r, nn, k), "a", T.IntegerType(), "int32"),
                (("g",), lambda r, nn, k=k2: _ntile_buckets(r, nn, k), "b", T.IntegerType(), "int32"),
            ],
        ).select("g", "v", "id", "a", "b")
        want = df.select(
            "g", "v", "id",
            F.ntile(k1).over(W.orderBy("v", "id")).alias("a"),
            F.ntile(k2).over(W.partitionBy("g").orderBy("v", "id")).alias("b"),
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"seed {seed} (n={n}, groups={n_groups}, ties={tie_mod}, k={k1},{k2})"


def test_sharded_prefix_multi_matches_window(spark):
    """Both exclusive prefix columns equal the unpartitioned-window
    cumsum-minus-self, across seeds with heavy ties and empty-ish
    shards; non-integral columns fail fast."""
    import random

    import pytest

    from dataingestionplayground_spark.operators.prefix import (
        sharded_prefix_multi,
    )

    for seed in (3, 41):
        rng = random.Random(seed)
        n = rng.randrange(1, 300)
        rows = [
            (rng.randrange(5), rng.randrange(4), rng.randrange(4), i)
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "k int, x int, y int, id long").repartition(7)
        got = sharded_prefix_multi(
            df, [("k", True), ("id", True)], ["x", "y"], ["cx", "cy"]
        ).select("id", "cx", "cy")
        w = W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, -1)
        want = df.select(
            "id",
            F.coalesce(F.sum("x").over(w), F.lit(0)).alias("cx"),
            F.coalesce(F.sum("y").over(w), F.lit(0)).alias("cy"),
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"seed {seed} (n={n})"

    bad = spark.createDataFrame([(1.0, 1)], "f double, id long")
    with pytest.raises(TypeError, match="integral column required"):
        sharded_prefix_multi(bad, [("id", True)], ["f"])
