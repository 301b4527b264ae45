"""Streaming document ingestion: watch a directory, parse -> chunk ->
embed -> append to a collection, exactly-once per micro-batch.

The engine extension of the reference's one-shot ingest (E1) to a
continuously-arriving corpus. The chunker is a grouped-map stage
(applyInPandas), which streaming cannot run directly — the canonical
pattern is ``foreachBatch``: each micro-batch is a bounded DataFrame, so
the *batch* pipeline (ingest.pipeline.build_chunk_records) runs unchanged
inside it, and the sink write is idempotent per documentid (incremental
anti-join), giving effective exactly-once under retries.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from dataingestionplayground_spark.ingest.pipeline import build_chunk_records
from dataingestionplayground_spark.ingest.store import CollectionStore
from dataingestionplayground_spark.sources.markdown import parse_markdown_df

RAW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)


def stream_ingest_markdown(
    spark: SparkSession,
    watch_dir: str,
    store: CollectionStore,
    collection: str,
    checkpoint_dir: str,
    **chunk_kwargs,
):
    """Start a streaming query ingesting JSON-lines files of
    (doc_id, content) from ``watch_dir``. Returns the StreamingQuery.

    File source + checkpoint = replayable input; incremental collection
    write = idempotent output; together: exactly-once per document.
    """
    raw = spark.readStream.schema(RAW_SCHEMA).json(watch_dir)

    def process_batch(batch_df, epoch_id: int) -> None:
        if not batch_df.isEmpty():
            elements = parse_markdown_df(batch_df)
            records = build_chunk_records(elements, **chunk_kwargs)
            store.write(records, collection, incremental=True)

    return (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
