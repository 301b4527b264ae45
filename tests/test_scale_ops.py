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
