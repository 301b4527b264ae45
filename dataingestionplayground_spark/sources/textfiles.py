"""JSONL / CSV document corpora — the common large-scale text-pipeline
source formats, normalized to the element IR so they compose with the
same chunk/embed/store pipeline as markdown/pdf/database sources.

Both readers are schema'd (no inference — production corpora are too
large to sample-infer) and stay fully relational: a corpus row becomes
one paragraph element via projection, so Catalyst keeps pushdown and
pruning all the way to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    id_field: str = "doc_id",
    text_field: str = "text",
) -> DataFrame:
    """JSON-lines corpus scan -> (doc_id, content) rows."""
    schema = T.StructType(
        [
            T.StructField(id_field, T.StringType(), True),
            T.StructField(text_field, T.StringType(), True),
        ]
    )
    return (
        spark.read.schema(schema)
        .json(path)
        .select(
            F.col(id_field).cast("string").alias("doc_id"),
            F.col(text_field).alias("content"),
        )
    )


def read_csv_docs(
    spark: SparkSession,
    path: str,
    id_field: str = "doc_id",
    text_field: str = "text",
) -> DataFrame:
    """CSV corpus scan (header row expected) -> (doc_id, content) rows."""
    schema = T.StructType(
        [
            T.StructField(id_field, T.StringType(), True),
            T.StructField(text_field, T.StringType(), True),
        ]
    )
    return (
        spark.read.option("header", "true")
        .schema(schema)
        .csv(path)
        .select(
            F.col(id_field).cast("string").alias("doc_id"),
            F.col(text_field).alias("content"),
        )
    )


def docs_to_elements(docs: DataFrame) -> DataFrame:
    """(doc_id, content) -> element rows: one paragraph per document
    (plain-text corpora carry no structure), empty documents dropped by
    the pipeline's failure reporting rather than silently."""
    return docs.filter(F.length(F.trim(F.coalesce("content", F.lit("")))) > 0).select(
        F.col("doc_id"),
        F.lit(0).alias("section_idx"),
        F.lit(0).alias("block_idx"),
        F.expr("cast(array() as array<int>)").alias("parent_path"),
        F.lit("paragraph").alias("kind"),
        F.col("content").alias("markdown"),
        F.col("content").alias("text"),
        F.lit(None).cast("int").alias("level"),
        F.lit(None).cast("string").alias("alt_text"),
        F.lit(None).cast("string").alias("media_type"),
        F.lit(None).cast("binary").alias("content"),
        F.lit(None).cast("array<array<string>>").alias("table_cells"),
    )


def read_xml_docs(
    spark: SparkSession,
    path: str,
    row_tag: str = "article",
    id_field: str = "doc_id",
    text_field: str = "text",
) -> DataFrame:
    """XML corpus scan (Spark 4 built-in ``xml`` source, one document per
    ``row_tag`` element) -> (doc_id, content) rows. Schema'd like the
    other readers — no inference pass over a 100 TB corpus."""
    schema = T.StructType(
        [
            T.StructField(id_field, T.StringType(), True),
            T.StructField(text_field, T.StringType(), True),
        ]
    )
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(schema)
        .load(path)
        .select(
            F.col(id_field).cast("string").alias("doc_id"),
            F.col(text_field).alias("content"),
        )
    )
