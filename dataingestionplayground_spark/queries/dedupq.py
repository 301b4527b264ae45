"""Deduplication query surface over the ``documents`` table — exact,
MinHash signature + LSH banding, SimHash, n-gram Jaccard, embedding-cosine
near-dup. Spark side = operators.dedup; oracles replicate the same
portable md5-based pipeline in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.functions import text as TX
from dataingestionplayground_spark.functions.vector import cosine_similarity, cosine_sql
from dataingestionplayground_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t

_TOKS = TX.tokens_sql("text")
_SHINGLES = TX.word_shingles_sql("text", 3)


@register(
    "dedup_exact",
    oracle=f"""
    SELECT {TX.fingerprint_sql('text')} AS fingerprint,
           min(doc_id) AS keep_id, COUNT(*) AS n_dups
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark, sf):
    return exact_dedup(t(spark, sf, "documents"), "doc_id", "text")


@register(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ), hashed AS (
      SELECT doc_id, h, md5(concat(CAST(h AS VARCHAR), ':', shingle)) AS hv
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS h)
    )
    SELECT doc_id, CAST(h AS INTEGER) AS h, min(hv) AS minhash
    FROM hashed GROUP BY doc_id, h
    """,
)
def dedup_minhash_signatures(spark, sf):
    return minhash_signatures(t(spark, sf, "documents"), "doc_id", "text", num_hashes=8)


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM documents
    ), hashed AS (
      SELECT doc_id, h, md5(concat(CAST(h AS VARCHAR), ':', shingle)) AS hv
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS h)
    ), sig AS (
      SELECT doc_id, h, min(hv) AS minhash FROM hashed GROUP BY doc_id, h
    ), bands AS (
      SELECT doc_id, h // 2 AS band, string_agg(minhash, '|' ORDER BY h) AS band_key
      FROM sig GROUP BY doc_id, h // 2
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh_pairs(spark, sf):
    return minhash_lsh_pairs(
        t(spark, sf, "documents"), "doc_id", "text", num_hashes=8, rows_per_band=2
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
    ), contrib AS (
      SELECT doc_id, b,
             CASE WHEN ((instr('0123456789abcdef', substr(md5(tok), (b // 4) + 1, 1)) - 1)
                        >> (3 - (b % 4))) % 2 = 1 THEN 1 ELSE -1 END AS sign
      FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS b)
    ), per_bit AS (
      SELECT doc_id, b, CAST(SUM(sign) AS BIGINT) AS s FROM contrib GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
    FROM per_bit GROUP BY doc_id
    """,
)
def dedup_simhash(spark, sf):
    return simhash(t(spark, sf, "documents"), "doc_id", "text", bits=63)


@register(
    "dedup_jaccard_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, source, shingle
      FROM (SELECT doc_id, source, unnest({_SHINGLES}) AS shingle FROM documents)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, n_common,
           CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= 0.05
    """,
)
def dedup_jaccard_pairs(spark, sf):
    return ngram_jaccard_pairs(
        t(spark, sf, "documents"), "doc_id", "text", shingle_n=3, threshold=0.05, block_col="source"
    )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {cosine_sql('a.embedding', 'b.embedding')} AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.95
    """,
)
def dedup_embedding_cosine(spark, sf):
    # Embedding near-dup with label blocking (at scale: LSH buckets replace
    # the label block; see operators.similarity.lsh_bucket_ann).
    e = t(spark, sf, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    sim = cosine_similarity("a.embedding", "b.embedding")
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.95)
    )
