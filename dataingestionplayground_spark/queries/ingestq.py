"""Document-ingestion pipeline query surface (reference capability #1:
parse -> chunk -> embed -> collection; ``VectorStoreCommands.cs:19-81``).

Queries over the driver's ``documents`` table exercising the engine's
chunking and embedding stages. Chunking here is the deterministic
token-window contract (SURVEY.md §7.4) so the DuckDB oracle can verify
boundaries; the semantic chunker (model-dependent) lives in
dataingestionplayground_spark.ingest and is covered by pytest, not the
SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestionplayground_spark.queries import register
from dataingestionplayground_spark.session import load_table as t

# Deterministic token-window chunking: fixed 32-token windows with 8-token
# stride overlap disabled (non-overlapping) — both engines slice the same
# token array, so chunk text is bit-identical.
_CHUNK = 32


@register(
    "ingest_chunk_token_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS w
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             CAST(c - 1 AS INTEGER) AS chunk_idx,
             array_to_string(w[(c - 1) * {_CHUNK} + 1 : c * {_CHUNK}], ' ') AS content
      FROM toks
      CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS c)
      WHERE (c - 1) * {_CHUNK} < len(w)
    )
    SELECT doc_id, chunk_idx, content,
           md5(concat(CAST(doc_id AS VARCHAR), ':', CAST(chunk_idx AS VARCHAR))) AS "key",
           CAST(len(list_filter(regexp_split_to_array(content, '\\s+'), x -> x != '')) AS INTEGER) AS n_tokens
    FROM chunks
    """,
)
def ingest_chunk_token_windows(spark, sf):
    # The chunker's relational core: explode fixed token windows per doc.
    # Chunk key = md5(docid:idx) — the deterministic analogue of the
    # reference's Guid chunk key (VectorStoreCommands.cs:95).
    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.expr("filter(split(text, '\\\\s+'), x -> x != '')").alias("w")
    )
    chunks = (
        toks.select(
            "doc_id",
            "w",
            F.explode(F.expr("sequence(1, 64)")).alias("c"),
        )
        .filter((F.col("c") - 1) * _CHUNK < F.size("w"))
        .select(
            "doc_id",
            (F.col("c") - 1).cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.expr(f"slice(w, (c - 1) * {_CHUNK} + 1, {_CHUNK})")).alias("content"),
        )
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "content",
        F.md5(F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx"))).alias("key"),
        F.expr("size(filter(split(content, '\\\\s+'), x -> x != ''))").alias("n_tokens"),
    )


@register(
    "ingest_doc_reassembly",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS w
      FROM documents
    ), chunks AS (
      SELECT doc_id, source, CAST(c - 1 AS INTEGER) AS chunk_idx
      FROM toks CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS c)
      WHERE (c - 1) * {_CHUNK} < len(w)
    )
    SELECT source, COUNT(*) AS n_chunks, COUNT(DISTINCT doc_id) AS n_docs
    FROM chunks GROUP BY source
    """,
)
def ingest_doc_reassembly(spark, sf):
    # chunk->document reassembly + corpus stats per source (SURVEY §2.3/2.4:
    # chunks.join(docs, documentid) with docs broadcast when small).
    d = t(spark, sf, "documents")
    chunks = ingest_chunk_token_windows(spark, sf).select("doc_id", "chunk_idx")
    docs = d.select("doc_id", "source")
    return (
        chunks.join(F.broadcast(docs), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_chunks"), F.countDistinct("doc_id").alias("n_docs"))
    )
