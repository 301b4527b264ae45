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


def _mk_events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_distinct_rollup_answers_range_queries_without_raw_events(spark, tmp_path):
    """Per-day theta sketches merge into ANY day-range distinct count —
    the question daily exact-unique tables cannot answer."""
    from dataingestionplayground_spark.operators.incremental import (
        build_distinct_rollup,
        distinct_users_over,
    )

    base = _mk_events(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (2, "2024-01-01 11:00:00", 2, "view", 1.0),
            (3, "2024-01-02 09:00:00", 1, "view", 1.0),  # same user, day 2
            (4, "2024-01-02 09:30:00", 3, "click", 1.0),
            (5, "2024-01-03 09:00:00", 4, "view", 1.0),
        ],
    )
    path = str(tmp_path / "droll")
    build_distinct_rollup(base, path)
    # day-1..2 uniques = {1,2,3} — NOT 2+2=4 (user 1 repeats): the merge
    # dedups across partitions, which a summable count can't
    assert distinct_users_over(spark, path, "2024-01-01", "2024-01-02") == 3
    assert distinct_users_over(spark, path, "2024-01-01", "2024-01-03") == 4
    assert distinct_users_over(spark, path, "2024-01-02", "2024-01-02") == 2
    assert (
        distinct_users_over(spark, path, "2024-01-01", "2024-01-03", ["view"]) == 3
    )
    assert distinct_users_over(spark, path, "2024-02-01", "2024-02-28") == 0


def test_distinct_rollup_incremental_refresh(spark, tmp_path):
    import os

    from dataingestionplayground_spark.operators.incremental import (
        build_distinct_rollup,
        distinct_users_over,
        refresh_distinct_rollup,
    )

    base = _mk_events(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (2, "2024-01-02 10:00:00", 2, "view", 1.0),
        ],
    )
    path = str(tmp_path / "droll2")
    build_distinct_rollup(base, path)

    def mtimes(day):
        d = os.path.join(path, f"day={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    day1_before = mtimes("2024-01-01")
    extra = _mk_events(spark, [(3, "2024-01-02 11:00:00", 5, "view", 1.0)])
    n = refresh_distinct_rollup(
        spark, base.unionByName(extra), path, ["2024-01-02"]
    )
    assert n == 1
    assert distinct_users_over(spark, path, "2024-01-01", "2024-01-02") == 3
    # untouched partition not rewritten
    assert mtimes("2024-01-01") == day1_before


def test_merge_distinct_rollup_idempotent_and_incremental(spark, tmp_path):
    """Batch-merge maintenance: sketch union folds new events in without
    rescanning the day's history, and REPLAYING a batch changes nothing
    (set-summary idempotence — the retry-safety foreachBatch leans on)."""
    from dataingestionplayground_spark.operators.incremental import (
        distinct_users_over,
        merge_distinct_rollup,
    )

    path = str(tmp_path / "mroll")
    b1 = _mk_events(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (2, "2024-01-01 11:00:00", 2, "view", 1.0),
        ],
    )
    assert merge_distinct_rollup(spark, b1, path) == 1
    assert distinct_users_over(spark, path, "2024-01-01", "2024-01-01") == 2
    # new users land on an EXISTING day: union, not overwrite-with-batch
    b2 = _mk_events(
        spark,
        [
            (3, "2024-01-01 12:00:00", 3, "view", 1.0),
            (4, "2024-01-02 09:00:00", 1, "click", 1.0),
        ],
    )
    assert merge_distinct_rollup(spark, b2, path) == 2
    assert distinct_users_over(spark, path, "2024-01-01", "2024-01-01") == 3
    assert distinct_users_over(spark, path, "2024-01-01", "2024-01-02") == 3
    # replay the same batch: no change (idempotent union)
    merge_distinct_rollup(spark, b2, path)
    assert distinct_users_over(spark, path, "2024-01-01", "2024-01-02") == 3
    assert merge_distinct_rollup(spark, b1.limit(0), path) == 0


def test_stream_maintains_distinct_rollup(spark, tmp_path):
    """End-to-end streaming maintenance: two file drops -> two
    availableNow passes -> rollup answers range queries across both."""
    import json as _json
    import os

    from dataingestionplayground_spark.operators.incremental import (
        distinct_users_over,
    )
    from dataingestionplayground_spark.streaming.ingest import (
        stream_maintain_distinct_rollup,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    roll = str(tmp_path / "sroll")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        with open(watch / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    drop(
        "a.json",
        [
            {"event_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 1, "event_type": "view", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T11:00:00", "user_id": 2, "event_type": "view", "value": 1.0},
        ],
    )
    q = stream_maintain_distinct_rollup(spark, str(watch), roll, ckpt)
    q.awaitTermination(60)
    assert distinct_users_over(spark, roll, "2024-01-01", "2024-01-01") == 2

    drop(
        "b.json",
        [
            {"event_id": 3, "ts": "2024-01-01T12:00:00", "user_id": 3, "event_type": "view", "value": 1.0},
            {"event_id": 4, "ts": "2024-01-02T09:00:00", "user_id": 2, "event_type": "purchase", "value": 1.0},
        ],
    )
    q2 = stream_maintain_distinct_rollup(spark, str(watch), roll, ckpt)
    q2.awaitTermination(60)
    # checkpoint replays only the NEW file; day-1 unions to 3 users,
    # the range query dedups user 2 across the two days
    assert distinct_users_over(spark, roll, "2024-01-01", "2024-01-01") == 3
    assert distinct_users_over(spark, roll, "2024-01-01", "2024-01-02") == 3
    assert distinct_users_over(spark, roll, "2024-01-01", "2024-01-02", ["purchase"]) == 1
    assert os.path.isdir(os.path.join(roll, "day=2024-01-02"))


def test_distinct_rollup_matches_exact_on_real_events(spark, sf_dir, tmp_path):
    from dataingestionplayground_spark.operators.incremental import (
        build_distinct_rollup,
        distinct_users_over,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / "droll3")
    build_distinct_rollup(e, path)
    days = [r["d"] for r in e.select(F.to_date("ts").alias("d")).distinct().collect()]
    lo, hi = str(min(days)), str(max(days))
    exact = e.select("user_id").distinct().count()
    assert distinct_users_over(spark, path, lo, hi) == exact


def test_topk_rollup_answers_range_heavy_hitters(spark, tmp_path):
    """Per-day top-k lists can't answer range top-k (a user just below k
    daily can lead the range); combined accumulators can. User 9 is 2nd
    each day but 1st over the range."""
    from dataingestionplayground_spark.operators.incremental import (
        build_topk_rollup,
        refresh_topk_rollup,
        top_users_over,
    )

    rows = []
    eid = 0
    for day, leader in (("2024-01-01", 1), ("2024-01-02", 2)):
        for _ in range(5):  # daily leader: 5 events
            eid += 1
            rows.append((eid, f"{day} 10:00:00", leader, "view", 1.0))
        for _ in range(4):  # user 9: 4 events EVERY day -> 8 total
            eid += 1
            rows.append((eid, f"{day} 11:00:00", 9, "view", 1.0))
    base = _mk_events(spark, rows)
    path = str(tmp_path / "topk")
    build_topk_rollup(base, path)
    top = top_users_over(spark, path, "2024-01-01", "2024-01-02", k=3)
    assert top[0] == (9, 8)  # range leader despite never leading a day
    assert set(top[1:]) == {(1, 5), (2, 5)}
    # single-day range: that day's leader wins
    assert top_users_over(spark, path, "2024-01-01", "2024-01-01", k=1) == [(1, 5)]
    assert top_users_over(spark, path, "2025-01-01", "2025-01-02") == []

    # incremental refresh: new events on day 2 only
    extra = _mk_events(spark, [(99, "2024-01-02 12:00:00", 2, "view", 1.0)] * 1)
    assert refresh_topk_rollup(spark, base.unionByName(extra), path, ["2024-01-02"]) == 1
    top2 = top_users_over(spark, path, "2024-01-01", "2024-01-02", k=3)
    assert top2[0] == (9, 8) and (2, 6) in top2


def test_sketch_aggs_are_partial(spark, sf_dir):
    """The physical plan must show two-phase (partial + final) hash
    aggregation — the map-side-combine property the scale story cites."""
    df = QS["agg_theta_set_algebra"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ObjectHashAggregate") >= 2 or plan.count("HashAggregate") >= 2


def test_merge_topk_rollup_epoch_idempotent(spark, tmp_path):
    """Frequency-rollup exactly-once (r8 verdict item 6): replaying a
    micro-batch under ITS OWN epoch replaces its staged accumulator
    rows (identical table), while the same events under a NEW epoch
    double-count — proving the idempotence really is the epoch keying,
    not an accidental property of the data."""
    from dataingestionplayground_spark.operators.incremental import (
        compact_topk_rollup,
        merge_topk_rollup,
        top_users_over,
    )

    path = str(tmp_path / "etopk")
    b1 = _mk_events(
        spark,
        [(i, "2024-01-01 10:00:00", 1, "view", 1.0) for i in range(5)]
        + [(10 + i, "2024-01-01 11:00:00", 9, "view", 1.0) for i in range(4)],
    )
    b2 = _mk_events(
        spark,
        [(20 + i, "2024-01-02 10:00:00", 2, "view", 1.0) for i in range(5)]
        + [(30 + i, "2024-01-02 11:00:00", 9, "view", 1.0) for i in range(4)],
    )
    assert merge_topk_rollup(spark, b1, path, epoch_id=0) == 1
    assert merge_topk_rollup(spark, b2, path, epoch_id=1) == 1
    want = [(9, 8), (1, 5), (2, 5)]
    assert top_users_over(spark, path, "2024-01-01", "2024-01-02", k=3) == want

    # replay epoch 1 (foreachBatch retry): REPLACED, not re-added
    assert merge_topk_rollup(spark, b2, path, epoch_id=1) == 1
    assert top_users_over(spark, path, "2024-01-01", "2024-01-02", k=3) == want

    # the negative control: same events, fresh epoch -> double-counted
    assert merge_topk_rollup(spark, b2, path, epoch_id=2) == 1
    doubled = top_users_over(spark, path, "2024-01-01", "2024-01-02", k=3)
    assert doubled[0] == (9, 12) and (2, 10) in doubled
    # undo the control by replaying epoch 2 as empty? no — epochs only
    # replace themselves; rebuild the day instead via epoch 2 replay
    # with the original batch to restore for the compaction check
    merge_topk_rollup(spark, b2.limit(0).unionByName(b2), path, epoch_id=2)

    # compaction folds epochs to one row per day, answers unchanged
    rows_before = spark.read.option("mergeSchema", "true").parquet(path).count()
    assert compact_topk_rollup(spark, path) == 2
    rows_after = spark.read.parquet(path).count()
    assert rows_after == 2 < rows_before
    after = top_users_over(spark, path, "2024-01-01", "2024-01-02", k=3)
    assert after[0] == (9, 12) and (2, 10) in after and (1, 5) in after


def test_merge_topk_rollup_seeded_from_batch_build(spark, tmp_path):
    """A build_topk_rollup base table (no epoch column) composes with
    epoch-keyed maintenance: base rows read as epoch NULL and survive
    every merge/replay."""
    from dataingestionplayground_spark.operators.incremental import (
        build_topk_rollup,
        merge_topk_rollup,
        top_users_over,
    )

    path = str(tmp_path / "btopk")
    base = _mk_events(
        spark, [(i, "2024-01-01 10:00:00", 1, "view", 1.0) for i in range(3)]
    )
    build_topk_rollup(base, path)
    inc = _mk_events(
        spark, [(10 + i, "2024-01-01 12:00:00", 2, "view", 1.0) for i in range(2)]
    )
    assert merge_topk_rollup(spark, inc, path, epoch_id=0) == 1
    assert top_users_over(spark, path, "2024-01-01", "2024-01-01", k=2) == [
        (1, 3),
        (2, 2),
    ]
    merge_topk_rollup(spark, inc, path, epoch_id=0)  # replay: unchanged
    assert top_users_over(spark, path, "2024-01-01", "2024-01-01", k=2) == [
        (1, 3),
        (2, 2),
    ]


def test_stream_maintains_topk_rollup(spark, tmp_path):
    """End-to-end streaming maintenance of the frequency rollup: two
    file drops -> two availableNow passes -> range heavy hitters
    correct across both, exactly-once per event."""
    import json as _json

    from dataingestionplayground_spark.operators.incremental import top_users_over
    from dataingestionplayground_spark.streaming.ingest import (
        stream_maintain_topk_rollup,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    roll = str(tmp_path / "stopk")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        with open(watch / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def ev(eid, day_hour, uid):
        return {
            "event_id": eid,
            "ts": day_hour,
            "user_id": uid,
            "event_type": "view",
            "value": 1.0,
        }

    drop(
        "a.json",
        [ev(i, "2024-01-01T10:00:00", 1) for i in range(5)]
        + [ev(10 + i, "2024-01-01T11:00:00", 9) for i in range(4)],
    )
    q = stream_maintain_topk_rollup(spark, str(watch), roll, ckpt)
    q.awaitTermination(60)
    assert top_users_over(spark, roll, "2024-01-01", "2024-01-01", k=1) == [(1, 5)]

    drop(
        "b.json",
        [ev(20 + i, "2024-01-02T10:00:00", 2) for i in range(5)]
        + [ev(30 + i, "2024-01-02T11:00:00", 9) for i in range(4)],
    )
    # restart from the checkpoint: only the NEW file is processed (the
    # committed epoch is not re-merged), and user 9 leads the range
    # despite never leading a day
    q2 = stream_maintain_topk_rollup(spark, str(watch), roll, ckpt)
    q2.awaitTermination(60)
    assert top_users_over(spark, roll, "2024-01-01", "2024-01-02", k=3) == [
        (9, 8),
        (1, 5),
        (2, 5),
    ]


def test_countmin_point_freq_bounds(spark, sf_dir):
    """CMS guarantee vs exact counts: never under, over by at most
    eps * N (eps = 0.001, deterministic at seed 42 so two runs agree)."""
    from dataingestionplayground_spark.queries import all_queries

    QS2 = all_queries()
    got = {
        r["user_id"]: r["est_n"]
        for r in QS2["agg_countmin_point_freq"].fn(spark, sf_dir).collect()
    }
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_total = e.count()
    exact = {
        r["user_id"]: r["n"]
        for r in e.filter(F.col("user_id") < 10)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(range(10))
    for uid, est in got.items():
        true = exact.get(uid, 0)
        assert est >= true
        assert est <= true + max(1, int(0.001 * n_total))
    again = {
        r["user_id"]: r["est_n"]
        for r in QS2["agg_countmin_point_freq"].fn(spark, sf_dir).collect()
    }
    assert again == got  # fixed seed -> deterministic


def test_merge_inverted_index_matches_batch_query_and_is_idempotent(
    spark, tmp_path
):
    """Incremental inverted index == the oracle-checked batch query:
    merging the documents table in two halves (then REPLAYING the
    second half — set-union idempotence) produces exactly the posting
    lists text_inverted_index computes in one pass, and a term lookup
    plans with a partition-pruned bucket filter."""
    from dataingestionplayground_spark.operators.incremental import (
        inverted_lookup,
        merge_inverted_index,
    )
    from dataingestionplayground_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    path = str(tmp_path / "invidx")
    h1 = docs.filter(F.col("doc_id") % 2 == 0)
    h2 = docs.filter(F.col("doc_id") % 2 == 1)
    assert merge_inverted_index(spark, h1, path) > 0
    assert merge_inverted_index(spark, h2, path) > 0
    merge_inverted_index(spark, h2, path)  # replay: set-union no-op

    got = {
        r["term"]: (r["df"], ",".join(str(d) for d in r["postings"]))
        for r in spark.read.parquet(path).select(
            "term", F.size("postings").alias("df"), "postings"
        ).collect()
        if r["df"] >= 2  # the batch query's df band
    }
    want = {
        r["term"]: (r["df"], r["postings"])
        for r in all_queries()["text_inverted_index"].fn(spark, sf).collect()
    }
    assert got == want and len(want) > 0

    # partition-pruned lookup: literal bucket filter reaches the scan
    some_terms = list(want)[:3]
    lk = inverted_lookup(spark, path, some_terms)
    rows = {r["term"]: r["df"] for r in lk.collect()}
    assert rows == {t: want[t][0] for t in some_terms}
    plan = lk._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "bucket" in plan


def test_stream_maintains_inverted_index(spark, tmp_path):
    """Two file drops -> two availableNow passes -> the index holds the
    union, with the checkpoint replaying only the new file."""
    import json as _json

    from dataingestionplayground_spark.operators.incremental import inverted_lookup
    from dataingestionplayground_spark.streaming.ingest import (
        stream_maintain_inverted_index,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    idx = str(tmp_path / "sidx")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        with open(watch / name, "w") as f:
            for doc_id, text in rows:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    drop("a.json", [(1, "alpha beta gamma"), (2, "beta gamma delta")])
    q = stream_maintain_inverted_index(spark, str(watch), idx, ckpt)
    q.awaitTermination(60)
    r = {x["term"]: list(x["postings"]) for x in inverted_lookup(
        spark, idx, ["beta", "delta"]
    ).collect()}
    assert r == {"beta": [1, 2], "delta": [2]}

    drop("b.json", [(3, "delta epsilon"), (1, "alpha beta gamma")])  # doc 1 replayed
    q2 = stream_maintain_inverted_index(spark, str(watch), idx, ckpt)
    q2.awaitTermination(60)
    r2 = {x["term"]: list(x["postings"]) for x in inverted_lookup(
        spark, idx, ["beta", "delta", "epsilon"]
    ).collect()}
    assert r2 == {"beta": [1, 2], "delta": [2, 3], "epsilon": [3]}
