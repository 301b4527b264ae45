"""Unit tests for the scale-infrastructure operators: Bloom join
pruning, Hamming sign ANN, layout pruning gain, snapshot diff, column
profile, and the bigram perplexity gate."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataingestionplayground_spark.operators.bloom import (
    bloom_bitmap,
    bloom_prefilter,
)
from dataingestionplayground_spark.operators.similarity import (
    hamming_sign_ann,
    knn_brute_force,
)

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------

def test_bloom_no_false_negatives(spark):
    dim = spark.createDataFrame([Row(k=i) for i in range(0, 1000, 7)])
    fact = spark.createDataFrame([Row(k=i) for i in range(1000)])
    kept = {
        r.k for r in bloom_prefilter(fact, bloom_bitmap(dim, "k"), "k").collect()
    }
    # every true member must survive — Bloom filters never false-negative
    assert set(range(0, 1000, 7)) <= kept


def test_bloom_prunes_disjoint_keys(spark):
    dim = spark.createDataFrame([Row(k=i) for i in range(100)])
    fact = spark.createDataFrame([Row(k=i) for i in range(100_000, 110_000)])
    n = bloom_prefilter(fact, bloom_bitmap(dim, "k"), "k").count()
    # disjoint key ranges: ~all 10k fact rows should drop (fp rate < 5%)
    assert n < 500


def test_bloom_bitmap_is_one_bounded_row(spark):
    dim = spark.createDataFrame([Row(k=i) for i in range(10_000)])
    rows = bloom_bitmap(dim, "k", m_bits=1 << 12).collect()
    assert len(rows) == 1
    assert len(rows[0].bloom) <= (1 << 12) // 64


# --------------------------------------------------------------------------
# Hamming sign ANN
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_corpus(spark):
    import random

    rng = random.Random(7)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(64)])
        for i in range(200)
    ]
    return spark.createDataFrame(rows)


def test_hamming_self_is_top1(spark, tiny_corpus):
    queries = tiny_corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = hamming_sign_ann(tiny_corpus, queries, k=5).collect()
    top1 = {r.query_id: r.vec_id for r in res if r.rank == 1}
    assert top1 == {0: 0, 1: 1, 2: 2}
    # the self-match has Hamming distance 0 and cosine 1.0
    for r in res:
        if r.rank == 1:
            assert r.hamming == 0
            assert r.score == pytest.approx(1.0, abs=1e-6)


def test_hamming_recall_vs_bruteforce(spark, tiny_corpus):
    queries = tiny_corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn_brute_force(tiny_corpus, queries, k=10).collect()
    approx = hamming_sign_ann(tiny_corpus, queries, k=10, shortlist=100).collect()
    truth = {(r.query_id, r.vec_id) for r in exact}
    got = {(r.query_id, r.vec_id) for r in approx}
    recall = len(truth & got) / len(truth)
    # sign bits on random uniform vectors: a 100-deep shortlist over 200
    # candidates must recover well over half the exact top-10
    assert recall >= 0.5, recall


# --------------------------------------------------------------------------
# Registry queries on sf0.001 (shape + semantics sanity)
# --------------------------------------------------------------------------

def _q(name):
    import __spark_entry__ as entry

    return entry.queries()[name]


def test_zorder_pruning_gain_beats_linear(spark):
    # sf0.01: enough distinct (x, y) pairs that both layouts fill all 64
    # files (at sf0.001 the lexicographic key has too few distinct values
    # and equal-width segmentation leaves empty files, skewing the file
    # count comparison). part is 2000 rows — still a sub-second read.
    rows = {
        r.layout: r
        for r in _q("layout_zorder_pruning_gain")(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert set(rows) == {"linear", "zorder"}
    # the curve layout must prune at least as well as the linear sort on
    # BOTH metrics, and strictly better on at least one
    lin, zo = rows["linear"], rows["zorder"]
    assert zo.files_scanned < lin.files_scanned
    assert zo.rows_scanned < lin.rows_scanned


def test_snapshot_diff_statuses(spark):
    out = {r.status: r for r in _q("pipeline_snapshot_diff")(spark, SF).collect()}
    assert set(out) == {"added", "removed", "changed", "unchanged"}
    # every changed row drifted +1.0 exactly
    assert out["changed"].net_price_delta == pytest.approx(
        float(out["changed"].n_rows), abs=1e-6
    )
    # adds have no A-side price, so their delta is the full B price (> 0)
    assert out["added"].net_price_delta > 0
    assert out["removed"].net_price_delta < 0


def test_column_profile_shape(spark):
    out = {r.col_name: r for r in _q("pipeline_column_profile")(spark, SF).collect()}
    assert set(out) == {"doc_id", "lang", "source", "n_chars"}
    d = out["doc_id"]
    assert d.n_null == 0
    assert d.n_distinct == d.n_rows  # primary key
    assert out["lang"].n_distinct < out["lang"].n_rows


def test_bigram_perplexity_flags_gibberish(spark):
    natural = "the cat sat on the mat and the dog sat on the rug " * 5
    docs = [Row(doc_id=0, text=natural)] * 0 + [
        Row(doc_id=i, text=natural) for i in range(10)
    ] + [Row(doc_id=99, text="zq xv jk wq pl mn bv cx dz fg hj kl qw er ty ui")]
    df = spark.createDataFrame(docs)

    from dataingestionplayground_spark.functions import text as TX

    tk = df.select("doc_id", TX.tokens("lower(text)").alias("tk")).where(
        F.size("tk") >= 2
    )
    bigr = tk.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1), "
                "i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    ctx = bigr.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bc = bigr.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    vocab = tk.select(F.explode("tk").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    ppl = (
        bigr.join(ctx, "w1")
        .join(bc, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.exp(
                F.sum(
                    F.log((F.col("c1") + F.col("v")).cast("double"))
                    - F.log((F.col("c12") + 1).cast("double"))
                )
                / F.count(F.lit(1))
            ).alias("ppl")
        )
    )
    scores = {r.doc_id: r.ppl for r in ppl.collect()}
    # the gibberish doc's bigrams are all unseen-once: far higher ppl
    assert scores[99] > 2 * max(v for k, v in scores.items() if k != 99)


# --------------------------------------------------------------------------
# Keyed-table MERGE upsert
# --------------------------------------------------------------------------

def _keyed_fixture(spark):
    return spark.createDataFrame(
        [Row(k=i, v=float(i), tag="base") for i in range(100)]
    )


def test_merge_upsert_semantics(spark, tmp_path):
    from dataingestionplayground_spark.operators.incremental import (
        build_keyed_table,
        merge_upsert,
        read_keyed_table,
    )

    path = str(tmp_path / "tbl")
    build_keyed_table(_keyed_fixture(spark), path, "k", n_buckets=8)

    updates = spark.createDataFrame(
        [Row(k=5, v=500.0, tag="upd", deleted=False)]       # replace
        + [Row(k=200, v=200.0, tag="new", deleted=False)]   # insert
        + [Row(k=7, v=0.0, tag="x", deleted=True)]          # delete
    )
    n = merge_upsert(spark, updates, path, "k", n_buckets=8, delete_col="deleted")
    assert 1 <= n <= 3  # at most one bucket per update key

    got = {r.k: r for r in read_keyed_table(spark, path).collect()}
    assert got[5].v == 500.0 and got[5].tag == "upd"
    assert got[200].tag == "new"
    assert 7 not in got
    assert len(got) == 100  # 100 - 1 delete + 1 insert
    assert got[6].tag == "base"  # untouched keys intact


def test_merge_upsert_leaves_untouched_buckets_alone(spark, tmp_path):
    import glob
    import os

    from dataingestionplayground_spark.operators.incremental import (
        build_keyed_table,
        merge_upsert,
    )

    path = str(tmp_path / "tbl2")
    build_keyed_table(_keyed_fixture(spark), path, "k", n_buckets=8)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/bucket=*/*.parquet")
    }
    updates = spark.createDataFrame([Row(k=5, v=1.0, tag="u", deleted=False)])
    merge_upsert(spark, updates, path, "k", n_buckets=8, delete_col="deleted")
    # every bucket except k=5's is byte-untouched (same files, same mtime)
    from pyspark.sql import functions as FF

    target = (
        spark.range(1)
        .select(FF.pmod(FF.xxhash64(FF.lit(5).cast("long")), FF.lit(8)).cast("int").alias("b"))
        .collect()[0]
        .b
    )
    untouched = {
        f: m for f, m in before.items() if f"bucket={target}/" not in f
    }
    after = {f: os.path.getmtime(f) for f in untouched}
    assert untouched == after


def test_merge_upsert_empties_bucket_readably(spark, tmp_path):
    from dataingestionplayground_spark.operators.incremental import (
        build_keyed_table,
        merge_upsert,
        read_keyed_table,
    )

    # two keys that land in the same bucket, alone in it
    path = str(tmp_path / "tbl3")
    base = spark.createDataFrame([Row(k=1, v=1.0, tag="a"), Row(k=2, v=2.0, tag="b")])
    build_keyed_table(base, path, "k", n_buckets=1)
    updates = spark.createDataFrame(
        [Row(k=1, v=0.0, tag="x", deleted=True), Row(k=2, v=0.0, tag="x", deleted=True)]
    )
    merge_upsert(spark, updates, path, "k", n_buckets=1, delete_col="deleted")
    # the fully-deleted table still reads (0 rows), never
    # unable-to-infer-schema
    assert read_keyed_table(spark, path).count() == 0


def test_merge_upsert_matches_full_recompute(spark, tmp_path):
    from dataingestionplayground_spark.operators.incremental import (
        build_keyed_table,
        merge_upsert,
        read_keyed_table,
    )

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    path = str(tmp_path / "ord")
    build_keyed_table(orders, path, "o_orderkey", n_buckets=8)
    updates = orders.limit(50).select(
        "o_orderkey",
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        (F.col("o_orderkey") % 5 == 0).alias("deleted"),
    )
    merge_upsert(
        spark, updates, path, "o_orderkey", n_buckets=8, delete_col="deleted"
    )
    got = read_keyed_table(spark, path)
    upd = updates.collect()
    expect_deleted = {r.o_orderkey for r in upd if r.deleted}
    expect_updated = {r.o_orderkey: r.o_totalprice for r in upd if not r.deleted}
    rows = {r.o_orderkey: r.o_totalprice for r in got.collect()}
    assert not (expect_deleted & set(rows))
    for k, v in expect_updated.items():
        assert rows[k] == v
    assert len(rows) == orders.count() - len(expect_deleted)


def test_stream_maintains_keyed_table(spark, tmp_path):
    import json as _json

    from dataingestionplayground_spark.operators.incremental import read_keyed_table
    from dataingestionplayground_spark.streaming.ingest import (
        stream_maintain_keyed_table,
    )

    watch = tmp_path / "watch"
    watch.mkdir()
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        with open(watch / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def ev(i, v, deleted=False):
        return {
            "event_id": i,
            "ts": "2024-01-01T10:00:00",
            "user_id": i,
            "event_type": "view",
            "value": v,
            "deleted": deleted,
        }

    drop("a.json", [ev(1, 1.0), ev(2, 2.0)])
    q = stream_maintain_keyed_table(spark, str(watch), tbl, ckpt)
    q.awaitTermination(60)
    got = {r.event_id: r.value for r in read_keyed_table(spark, tbl).collect()}
    assert got == {1: 1.0, 2: 2.0}

    # second drop: update 1, delete 2, insert 3 — checkpoint replays
    # only the new file
    drop("b.json", [ev(1, 10.0), ev(2, 0.0, True), ev(3, 3.0)])
    q2 = stream_maintain_keyed_table(spark, str(watch), tbl, ckpt)
    q2.awaitTermination(60)
    got = {r.event_id: r.value for r in read_keyed_table(spark, tbl).collect()}
    assert got == {1: 10.0, 3: 3.0}
