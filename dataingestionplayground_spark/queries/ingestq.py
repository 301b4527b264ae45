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
    "multimodal_metadata",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS media_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents
    """,
)
def multimodal_metadata(spark, sf):
    # Multimodal binary-column plumbing (SURVEY §1.2 byte[] + media type):
    # metadata (size, content hash) computed JVM-side over BINARY content.
    from dataingestionplayground_spark.sources.multimodal import binary_with_metadata

    d = t(spark, sf, "documents").select(
        "doc_id",
        F.lit("text/plain").alias("mt"),
        F.encode("text", "UTF-8").alias("data"),
    )
    return binary_with_metadata(d, "doc_id", "mt", "data").select(
        "media_id", "media_type", "n_bytes", "content_sha"
    )


@register(
    "multimodal_features",
    oracle="""
    WITH base AS (
      SELECT CAST(doc_id AS VARCHAR) AS media_id,
             'text/plain' AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             sha256(text) AS h
      FROM documents
    )
    SELECT media_id, media_type, n_bytes,
           CAST(16 + ((instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 2, 1)) - 1)) % 64 AS INTEGER) AS width,
           CAST(16 + ((instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 4, 1)) - 1)) % 64 AS INTEGER) AS height,
           CAST(round(((instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 6, 1)) - 1)) / 255.0, 6) AS REAL) AS f1,
           CAST(round(((instr('0123456789abcdef', substr(h, 7, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 8, 1)) - 1)) / 255.0, 6) AS REAL) AS f2,
           CAST(round(((instr('0123456789abcdef', substr(h, 9, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 10, 1)) - 1)) / 255.0, 6) AS REAL) AS f3,
           CAST(round(((instr('0123456789abcdef', substr(h, 11, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 12, 1)) - 1)) / 255.0, 6) AS REAL) AS f4,
           CAST(round(((instr('0123456789abcdef', substr(h, 13, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 14, 1)) - 1)) / 255.0, 6) AS REAL) AS f5,
           CAST(round(((instr('0123456789abcdef', substr(h, 15, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 16, 1)) - 1)) / 255.0, 6) AS REAL) AS f6,
           CAST(round(((instr('0123456789abcdef', substr(h, 17, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 18, 1)) - 1)) / 255.0, 6) AS REAL) AS f7,
           CAST(round(((instr('0123456789abcdef', substr(h, 19, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(h, 20, 1)) - 1)) / 255.0, 6) AS REAL) AS f8
    FROM base
    """,
)
def multimodal_features(spark, sf):
    # Decode/feature-extract plumbing through mapInPandas with the
    # deterministic fake decoder (real codecs absent from this image);
    # the oracle replicates the fake decoder (sha256 nibble decode) in
    # SQL so even the Python stage is value-checked. The 8-d feature
    # array is exposed as scalar columns f1..f8 because the driver's
    # canonicalizer hashes atomic columns only.
    from dataingestionplayground_spark.sources.multimodal import (
        binary_with_metadata,
        extract_features,
        fake_decoder,
    )

    d = t(spark, sf, "documents").select(
        "doc_id",
        F.lit("text/plain").alias("mt"),
        F.encode("text", "UTF-8").alias("data"),
    )
    media = binary_with_metadata(d, "doc_id", "mt", "data")
    feats = extract_features(media, decoder=fake_decoder)
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        "width",
        "height",
        *[F.element_at("feature", i + 1).alias(f"f{i + 1}") for i in range(8)],
    )


@register(
    "ingest_pipeline_e2e",
    oracle=f"""
    WITH toks AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS w
      FROM documents
    ), chunks AS (
      SELECT doc_id, CAST(c - 1 AS INTEGER) AS chunk_idx,
             array_to_string(w[(c - 1) * 64 + 1 : c * 64], ' ') AS content
      FROM toks CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS c)
      WHERE (c - 1) * 64 < len(w)
    )
    SELECT doc_id AS documentid,
           md5(concat(doc_id, ':', CAST(chunk_idx AS VARCHAR))) AS "key",
           384 AS dims,
           CAST(length(content) AS INTEGER) AS n_chars
    FROM chunks
    """,
)
def ingest_pipeline_e2e(spark, sf):
    # The embedding VALUES are non-SQL (hash model), but every other
    # observable — chunk boundaries, keys, dimensionality — is, so the
    # oracle checks the full pipeline shape, not just row counts.
    # Full parse->chunk->embed composition over the documents table (texts
    # treated as single-paragraph docs), returning chunk records with
    # 384-d deterministic embeddings (ingest.pipeline.build_chunk_records).
    from dataingestionplayground_spark.ingest.pipeline import build_chunk_records

    d = t(spark, sf, "documents")
    elements = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(0).alias("section_idx"),
        F.lit(0).alias("block_idx"),
        F.expr("cast(array() as array<int>)").alias("parent_path"),
        F.lit("paragraph").alias("kind"),
        F.col("text").alias("markdown"),
        F.col("text").alias("text"),
        F.lit(None).cast("int").alias("level"),
        F.lit(None).cast("string").alias("alt_text"),
        F.lit(None).cast("string").alias("media_type"),
        F.lit(None).cast("binary").alias("content"),
        F.lit(None).cast("array<array<string>>").alias("table_cells"),
    )
    records = build_chunk_records(elements, max_tokens=64, overlap=0)
    return records.select(
        "documentid", "key", F.size("embedding").alias("dims"), F.length("content").alias("n_chars")
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
