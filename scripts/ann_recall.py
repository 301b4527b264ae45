"""Recall-graded ANN benchmark: measure recall@k of every approximate
similarity path against the exact brute-force baseline.

Usage:
    python scripts/ann_recall.py [sf_dir]     # default /root/testdata/sf0.01

Prints one JSON line:
    {"k": 10, "n_queries": 20, "recall": {"ivf_seed": .., "ivf_kmeans": ..,
     "lsh_p8": .., "lsh_p4_multiprobe": ..}}

Recall@k = |approx_topk ∩ exact_topk| / k, averaged over queries. The
exact set comes from :func:`knn_brute_force` (oracle-matched elsewhere),
so this script grades ONLY the recall loss of the bucketing strategies —
the speed story is in bench.py, the correctness story in check_oracle.py.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataingestionplayground_spark.operators import similarity as S
from dataingestionplayground_spark.session import get_spark


def topk_sets(df, k):
    """{query_id: frozenset(top-k vec_ids)} from a (query_id, vec_id, rank) frame."""
    rows = df.filter(F.col("rank") <= k).select("query_id", "vec_id").collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def recall_at_k(exact, approx, k):
    if not exact:
        return 0.0
    return sum(len(exact[q] & approx.get(q, set())) for q in exact) / (k * len(exact))


def exact_l2_topk(corpus, queries, k):
    """Exact L2 top-k (the right baseline for the ADC path, which ranks
    by distance, not cosine) — brute-force crossJoin + window; baseline
    only, bench-scale corpora go through knn_brute_force's two-phase."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    dist = F.expr(
        "aggregate(sequence(1, size(embedding)), cast(0.0 as double), "
        "(acc, i) -> acc + (cast(element_at(embedding, i) as double) - "
        "cast(element_at(query_vec, i) as double)) * "
        "(cast(element_at(embedding, i) as double) - "
        "cast(element_at(query_vec, i) as double)))"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        corpus.crossJoin(F.broadcast(queries))
        .withColumn("dist", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    k, n_queries = 10, 20
    spark = get_spark(app_name="ann-recall")
    corpus = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = (
        corpus.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )

    exact = topk_sets(S.knn_brute_force(corpus, queries, k=k), k)
    variants = {
        "ivf_seed": S.ivf_ann(corpus, queries, k=k, n_centroids=16, n_probe=4),
        "ivf_kmeans": S.ivf_ann(
            corpus, queries, k=k, n_centroids=16, n_probe=4,
            centroid_mode="kmeans", kmeans_iters=2,
        ),
        "lsh_p8": S.lsh_bucket_ann(corpus, queries, k=k, num_planes=8),
        "lsh_p4_multiprobe": S.lsh_bucket_ann(
            corpus, queries, k=k, num_planes=4, probe_radius=1
        ),
    }
    recall = {
        name: round(recall_at_k(exact, topk_sets(df, k), k), 4)
        for name, df in variants.items()
    }
    # ADC ranks by (approximate) L2 distance — grade it against exact L2
    exact_l2 = topk_sets(exact_l2_topk(corpus, queries, k), k)
    adc = topk_sets(
        S.pq_adc_search(corpus, queries, k=k, m=4, n_centroids=8, dims=64), k
    )
    recall["pq_adc_vs_l2"] = round(recall_at_k(exact_l2, adc, k), 4)
    reranked = topk_sets(
        S.pq_adc_rerank(corpus, queries, k=k, shortlist=50, m=4, n_centroids=8, dims=64), k
    )
    recall["pq_adc_rerank"] = round(recall_at_k(exact, reranked, k), 4)
    reranked_km = topk_sets(
        S.pq_adc_rerank(corpus, queries, k=k, shortlist=50, m=4, n_centroids=8,
                        dims=64, codebook_mode="kmeans"), k
    )
    recall["pq_adc_rerank_kmeans"] = round(recall_at_k(exact, reranked_km, k), 4)
    print(json.dumps({"k": k, "n_queries": n_queries, "recall": recall}))


if __name__ == "__main__":
    main()
