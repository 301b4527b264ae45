"""Recall grading for the approximate similarity paths.

The oracle harness proves each ANN query computes exactly what its SQL
twin computes; these tests prove the *strategies* are worth using — that
bucketing keeps most of the true neighbors. Exact top-k from
knn_brute_force (itself pandas-cross-checked elsewhere) is ground truth.

Guaranteed relations are asserted as hard invariants (multi-probe
candidates are a superset of single-probe at equal planes); absolute
floors are set well below observed values so the tests flag collapse
(a broken bucketer sends recall to ~1/2^planes), not noise.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from ann_recall import recall_at_k, topk_sets  # noqa: E402

from dataingestionplayground_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"
K = 10
N_QUERIES = 20


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@pytest.fixture(scope="module")
def exact(corpus, queries):
    return topk_sets(S.knn_brute_force(corpus, queries, k=K), K)


def test_ivf_kmeans_recall_floor(corpus, queries, exact):
    approx = topk_sets(
        S.ivf_ann(
            corpus, queries, k=K, n_centroids=16, n_probe=4,
            centroid_mode="kmeans", kmeans_iters=2,
        ),
        K,
    )
    assert recall_at_k(exact, approx, K) >= 0.5


def test_ivf_probe_dial_monotone(corpus, queries, exact):
    # probing every cell IS brute force: recall must be exactly 1, and
    # more probes can never lose candidates (superset of cells searched).
    r = {
        p: recall_at_k(
            exact,
            topk_sets(S.ivf_ann(corpus, queries, k=K, n_centroids=8, n_probe=p), K),
            K,
        )
        for p in (1, 4, 8)
    }
    assert r[1] <= r[4] <= r[8]
    assert r[8] == 1.0


def test_lsh_multiprobe_beats_single_probe(corpus, queries, exact):
    single = topk_sets(S.lsh_bucket_ann(corpus, queries, k=K, num_planes=4), K)
    multi = topk_sets(
        S.lsh_bucket_ann(corpus, queries, k=K, num_planes=4, probe_radius=1), K
    )
    r_single = recall_at_k(exact, single, K)
    r_multi = recall_at_k(exact, multi, K)
    # radius-1 probes a strict superset of buckets -> recall can only rise
    assert r_multi >= r_single
    assert r_multi >= 0.5


def test_recall_self_is_one(exact):
    assert recall_at_k(exact, exact, K) == 1.0


def test_pq_encode_seed_vectors_reconstruct_exactly(corpus):
    from dataingestionplayground_spark.operators.similarity import pq_encode

    rows = pq_encode(corpus, m=4, k=8, dims=64).collect()
    assert len(rows) == corpus.count()
    for r in rows:
        for s in range(4):
            assert 0 <= r[f"code_{s}"] < 8
    # a seed vector's slices ARE centroids -> distance 0 -> exact recon
    seeds = [r.cos_recon for r in rows if r.vec_id < 8]
    assert seeds and all(c == 1.0 for c in seeds)
    # collapse guard: a broken argmin/codebook sends average recon to ~0
    cos = [r.cos_recon for r in rows]
    assert sum(cos) / len(cos) > 0.1


def test_pq_encode_rejects_bad_dims():
    import pytest as _pytest

    from dataingestionplayground_spark.operators.similarity import pq_encode

    with _pytest.raises(ValueError):
        pq_encode(None, m=5, dims=64)


def test_indexed_search_recall_floors(spark, corpus, queries, exact, tmp_path):
    """r7 verdict item 6: the bench reports recall@10 for the
    store-backed index paths; these floors pin the same quantities so a
    collapse (broken codebook, wrong probe pruning) fails in CI, not in
    a bench artifact. Floors sit well below observed values (IVF ~0.6+,
    PQ-vs-L2 ~0.2) to flag collapse, not noise."""
    from ann_recall import exact_l2_topk

    from dataingestionplayground_spark.ingest.ann_index import (
        build_ivf_index,
        build_pq_index,
        ivf_search_indexed,
        pq_search_indexed,
    )
    from dataingestionplayground_spark.ingest.store import CollectionStore

    store = CollectionStore(str(tmp_path / "idx"))
    chunks = corpus.select(
        F.col("vec_id").cast("string").alias("key"),
        "embedding",
        F.lit("").alias("content"),
        F.lit(None).cast("string").alias("context"),
        F.col("vec_id").cast("string").alias("documentid"),
        F.lit(0).cast("int").alias("chunk_idx"),
    )
    store.write(chunks, "emb")
    build_pq_index(spark, store, "emb", m=4, n_centroids=8, dims=64)
    build_ivf_index(spark, store, "emb", n_cells=8)

    def keysets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(int(r["key"]))
        return out

    qs = queries.withColumn("query_id", F.col("query_id").cast("string"))
    exact_str = {str(q): v for q, v in exact.items()}
    ivf = keysets(ivf_search_indexed(spark, store, "emb", qs, k=K, n_probe=2))
    assert recall_at_k(exact_str, ivf, K) >= 0.3
    exact_l2 = topk_sets(exact_l2_topk(corpus, queries, K), K)
    exact_l2_str = {str(q): v for q, v in exact_l2.items()}
    pq = keysets(pq_search_indexed(spark, store, "emb", qs, k=K))
    assert recall_at_k(exact_l2_str, pq, K) >= 0.08
    # exact-cosine rerank over the ADC shortlist recovers most of the
    # quantization loss — graded against the COSINE truth
    pq_rr = keysets(pq_search_indexed(spark, store, "emb", qs, k=K, rerank=50))
    r_rr = recall_at_k(exact_str, pq_rr, K)
    assert r_rr >= 0.25
    assert r_rr >= recall_at_k(exact_str, pq, K)  # rerank can only help
    # depth monotonicity (r8 verdict item 2): rerank='auto' = 16*k is a
    # SUPERSET shortlist of rerank=50, and exact-cosine top-k over a
    # superset can only keep or gain true neighbors
    pq_auto = keysets(pq_search_indexed(spark, store, "emb", qs, k=K, rerank="auto"))
    assert recall_at_k(exact_str, pq_auto, K) >= r_rr


def test_indexed_pq_default_build_clears_bench_floor(spark, corpus, queries, exact, tmp_path):
    """The production build defaults (8x16 kmeans codebook) + the
    production rerank depth ('auto' = 16*k) must clear the same 0.8
    recall floor scripts/bench_compare.py gates bench artifacts on —
    the r8 fix for PQ recall 0.38 (4x8 seeded @ rerank=50)."""
    from dataingestionplayground_spark.ingest.ann_index import (
        build_pq_index,
        pq_search_indexed,
    )
    from dataingestionplayground_spark.ingest.store import CollectionStore

    store = CollectionStore(str(tmp_path / "idx2"))
    chunks = corpus.select(
        F.col("vec_id").cast("string").alias("key"),
        "embedding",
        F.lit("").alias("content"),
        F.lit(None).cast("string").alias("context"),
        F.col("vec_id").cast("string").alias("documentid"),
        F.lit(0).cast("int").alias("chunk_idx"),
    )
    store.write(chunks, "emb")
    meta = build_pq_index(spark, store, "emb", dims=64)  # library defaults
    assert (meta["m"], meta["codebook_mode"]) == (8, "kmeans")

    qs = queries.withColumn("query_id", F.col("query_id").cast("string"))
    exact_str = {str(q): v for q, v in exact.items()}
    out = {}
    for r in pq_search_indexed(spark, store, "emb", qs, k=K, rerank="auto").collect():
        out.setdefault(r["query_id"], set()).add(int(r["key"]))
    assert recall_at_k(exact_str, out, K) >= 0.8
