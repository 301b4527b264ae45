"""Ingestion pipeline: parse -> chunk -> embed -> collection sink + search.

The Spark realization of the reference's ``IngestionPipeline`` composition
(``VectorStoreCommands.cs:28,58,74``): instead of a per-document driver
loop, each stage is a DataFrame transformation; per-document error
isolation becomes an error column, never a job failure.
"""

from dataingestionplayground_spark.ingest.embed import embed_text_udf, hash_embed
from dataingestionplayground_spark.ingest.chunker import chunk_elements
from dataingestionplayground_spark.ingest.store import CollectionStore
from dataingestionplayground_spark.ingest.pipeline import ingest_corpus
from dataingestionplayground_spark.ingest.search import search_collection

__all__ = [
    "embed_text_udf",
    "hash_embed",
    "chunk_elements",
    "CollectionStore",
    "ingest_corpus",
    "search_collection",
]
