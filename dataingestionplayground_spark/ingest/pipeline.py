"""Pipeline composition (D9/E1/E2 in SURVEY.md §2.9/§3).

The reference wires reader -> chunker -> writer into an
``IngestionPipeline`` and loops documents with per-item try/catch
(``VectorStoreCommands.cs:28-48,58-64``). The Spark realization is a
DataFrame composition:

    elements (any source) -> chunk (applyInPandas per doc)
      -> embed (pandas_udf) -> chunk records -> CollectionStore

with error isolation as data: a document that produced no chunks (empty
or unparsable) is reported failed in the results DataFrame, mirroring
``IngestionResult`` (``:163-180``) — the job itself never dies on one
bad document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataingestionplayground_spark.ingest.chunker import chunk_elements
from dataingestionplayground_spark.ingest.embed import embed_text_udf
from dataingestionplayground_spark.ingest.store import CollectionStore


def build_chunk_records(
    elements: DataFrame,
    max_tokens: int = 64,
    overlap: int = 8,
    strategy: str = "token_window",
    embed_udf=None,
) -> DataFrame:
    """elements -> CHUNK_SCHEMA records: chunk, embed, key.

    Chunk key = md5(documentid:chunk_idx) — deterministic analogue of the
    reference's Guid key (``VectorStoreCommands.cs:95``); embedding is the
    deterministic 384-d hash embedding unless a model UDF is swapped in
    via ``embed_udf`` (ingest.embed.numpy_transformer_udf /
    onnx_model_udf / real_model_udf — all share the iterator-pandas_udf
    contract: STRING column in, ARRAY<FLOAT> out).
    """
    chunks = chunk_elements(elements, max_tokens=max_tokens, overlap=overlap, strategy=strategy)
    embed = embed_udf if embed_udf is not None else embed_text_udf()
    return chunks.select(
        F.md5(F.concat_ws(":", "documentid", "chunk_idx")).alias("key"),
        embed(F.col("content")).alias("embedding"),
        "content",
        "context",
        "documentid",
        "chunk_idx",
    )


def ingest_corpus(
    elements: DataFrame,
    store: CollectionStore,
    collection: str,
    source_doc_ids: DataFrame | None = None,
    incremental: bool = False,
    **chunk_kwargs,
) -> DataFrame:
    """Run the full ingest; returns the per-document results DataFrame
    (documentid, succeeded, error).

    ``source_doc_ids`` (one ``doc_id`` column) is the authoritative list
    of documents attempted — documents that yielded zero elements/chunks
    come back ``succeeded=false`` instead of silently vanishing.
    """
    records = build_chunk_records(elements, **chunk_kwargs)
    store.write(records, collection, incremental=incremental)

    spark = elements.sparkSession
    written = store.read(spark, collection).select("documentid").distinct()
    if source_doc_ids is None:
        source_doc_ids = elements.select(F.col("doc_id")).distinct()
    attempted = source_doc_ids.select(F.col("doc_id").alias("documentid")).distinct()
    return (
        attempted.join(written.withColumn("__ok", F.lit(True)), "documentid", "left")
        .select(
            "documentid",
            F.coalesce(F.col("__ok"), F.lit(False)).alias("succeeded"),
            F.when(F.col("__ok").isNull(), F.lit("no chunks produced")).alias("error"),
        )
    )
