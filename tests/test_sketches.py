"""Sketch-surface guarantees (queries/sketchq.py): theta set algebra is
exact below capacity, approx_top_k matches the exact heavy hitters
(tie-aware), and KLL quantiles land inside the sketch's rank error
bound — the properties the rows-only gating leans on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.queries import all_queries

QS = all_queries()


def _exact_sets(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    users = lambda typ: {
        r["user_id"]
        for r in e.filter(F.col("event_type") == typ).select("user_id").distinct().collect()
    }
    return users("view"), users("click"), users("purchase")


def test_theta_set_algebra_exact_below_capacity(spark, sf_dir):
    v, c, p = _exact_sets(spark, sf_dir)
    row = QS["agg_theta_set_algebra"].fn(spark, sf_dir).collect()[0]
    assert row["n_view"] == len(v)
    assert row["n_view_or_click"] == len(v | c)
    assert row["n_view_and_purchase"] == len(v & p)
    assert row["n_view_not_purchase"] == len(v - p)


def test_theta_partitioning_invariance(spark, sf_dir):
    """Sketch merge is associative/commutative: result identical under
    different shuffle partitioning (exact mode keeps all hashes)."""
    q = QS["agg_theta_set_algebra"]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    res = []
    try:
        for parts in ("2", "13"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            res.append(tuple(q.fn(spark, sf_dir).collect()[0]))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert res[0] == res[1]


def test_approx_top_users_matches_exact_counts(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = QS["agg_approx_top_users"].fn(spark, sf_dir).orderBy("rk").collect()
    assert len(got) == 10
    # every reported count is the EXACT count for that user (distinct
    # users fit in maxItemsTracked), ranks are 1..10 and non-increasing
    for i, r in enumerate(got):
        assert exact[r["user_id"]] == r["est_n"]
        assert r["rk"] == i + 1
    counts = [r["est_n"] for r in got]
    assert counts == sorted(counts, reverse=True)
    # tie-aware top-k agreement: the reported counts multiset must equal
    # the exact top-10 counts multiset (the item SET may differ only
    # inside a boundary tie)
    exact_top = sorted(exact.values(), reverse=True)[:10]
    assert sorted(counts, reverse=True) == exact_top


def test_kll_quantiles_within_rank_error(spark, sf_dir):
    row = QS["agg_kll_quantiles"].fn(spark, sf_dir).collect()[0]
    vals = sorted(
        r["v"]
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(F.col("l_extendedprice").cast("double").alias("v"))
        .collect()
    )
    n = len(vals)
    assert row["n"] == n
    # default KLL k=200 -> normalized rank error ~1.65%; assert 5% slack
    import bisect

    for name, frac in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p95", 0.95)):
        got = row[name]
        rank = bisect.bisect_left(vals, got) / n
        assert abs(rank - frac) <= 0.05, (name, got, rank)
    assert row["p25"] <= row["p50"] <= row["p75"] <= row["p95"]


def test_sketch_aggs_are_partial(spark, sf_dir):
    """The physical plan must show two-phase (partial + final) hash
    aggregation — the map-side-combine property the scale story cites."""
    df = QS["agg_theta_set_algebra"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ObjectHashAggregate") >= 2 or plan.count("HashAggregate") >= 2
