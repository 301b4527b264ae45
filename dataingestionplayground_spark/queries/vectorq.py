"""Vector similarity-search query surface (reference capability #2:
``VectorStoreCommands.cs:83-139`` top-k cosine search) over the driver's
deterministic ``embeddings`` table: exact brute-force top-k (baseline) and
LSH-bucketed ANN (scale path), plus norm statistics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.functions.portable import davg
from dataingestionplayground_spark.functions.portable import davg_expr
from dataingestionplayground_spark.functions.vector import cosine_sql, l2_norm, l2_norm_sql
from dataingestionplayground_spark.operators.similarity import ivf_ann, knn_brute_force, lsh_bucket_ann
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t


def _queries_df(spark, sf, n=5):
    e = t(spark, sf, "embeddings")
    return e.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@register(
    "vector_knn_bruteforce",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             {cosine_sql('e.embedding', 'q.query_vec')} AS score
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, score, "rank" FROM (
      SELECT query_id, vec_id, score,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS INTEGER) AS "rank"
      FROM scored) WHERE "rank" <= 10
    """,
)
def vector_knn_bruteforce(spark, sf):
    # Exact cosine top-10 for 5 query vectors: broadcast queries, one corpus
    # scan, per-query window top-k.
    return knn_brute_force(t(spark, sf, "embeddings"), _queries_df(spark, sf), k=10)


@register("vector_lsh_ann", oracle=None)  # approximate: rows-only check
def vector_lsh_ann(spark, sf):
    # Scale-path ANN: deterministic random-hyperplane buckets + exact rerank
    # within bucket. Approximate by construction -> no SQL oracle.
    return lsh_bucket_ann(
        t(spark, sf, "embeddings"), _queries_df(spark, sf), k=10, num_planes=6
    )


@register("vector_ivf_ann", oracle=None)  # approximate: rows-only check
def vector_ivf_ann(spark, sf):
    # IVF scale path: coarse cells + n_probe probing + exact in-cell rerank.
    return ivf_ann(
        t(spark, sf, "embeddings"), _queries_df(spark, sf), k=10, n_centroids=16, n_probe=4
    )


@register(
    "vector_norm_stats",
    oracle=f"""
    SELECT label, COUNT(*) AS n_vectors,
           {davg_expr(l2_norm_sql('embedding'))} AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def vector_norm_stats(spark, sf):
    e = t(spark, sf, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        davg(l2_norm("embedding")).alias("avg_norm"),
    )
