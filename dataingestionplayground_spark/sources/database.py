"""Database source: typed rows -> documents (S3/S4 in SURVEY.md §2.1).

The reference reads SQLite table ``Items(Id, Title, Body)`` through EF
Core and converts each ``Article`` row to a document: title becomes an
H1 header, body lines become paragraphs, whitespace-only lines dropped
(``Readers/Database/DatabaseIngestionReader.cs:27-63``); the document id
is ``Article #{Id}`` (``VectorStoreCommands.cs:37``).

Spark-first: the row->document conversion is a pure *projection* — no
Python stage needed until chunking (SURVEY.md §3 E2). The scan is a JDBC
DataSourceV2 read when a driver jar is available, else any DataFrame with
(Id, Title, Body) columns (e.g. a staged parquet of the table).

The live JDBC path is exercised end-to-end against embedded Apache Derby
(whose driver ships in Spark's own classpath): the reference's CMS.DB
rows round-trip through a real database and ``read_jdbc_articles`` scan,
with filter pushdown asserted in the executed plan
(``tests/test_reference_corpus.py``). SQLite itself still needs the
sqlite-jdbc jar (absent here); the scan code is driver-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestionplayground_spark.sources.schemas import ELEMENT_SCHEMA


def read_jdbc_articles(spark: SparkSession, url: str, table: str = "Items") -> DataFrame:
    """S3: JDBC scan (column pruning/pushdown via DataSourceV2). Requires
    the matching JDBC driver jar on the classpath; raises otherwise."""
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).load()


def articles_to_elements(articles: DataFrame) -> DataFrame:
    """S4/P2/P6: one Article row -> header + non-empty-line paragraphs,
    entirely in Catalyst expressions (explode + filter + projection).

    Output matches ELEMENT_SCHEMA (sparse columns null).
    """
    doc = articles.select(
        F.format_string("Article #%d", F.col("Id").cast("long")).alias("doc_id"),
        F.col("Title").cast("string").alias("title"),
        F.col("Body").cast("string").alias("body"),
    )
    header = doc.select(
        "doc_id",
        F.lit(0).alias("block_idx"),
        F.lit("header").alias("kind"),
        F.concat(F.lit("# "), F.col("title")).alias("markdown"),
        F.col("title").alias("text"),
        F.lit(1).alias("level"),
    )
    paras = (
        doc.select(
            "doc_id",
            F.posexplode(F.split(F.col("body"), "\r?\n")).alias("pos", "line"),
        )
        .filter(F.length(F.trim("line")) > 0)  # P2: drop whitespace-only lines
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("block_idx"),
            F.lit("paragraph").alias("kind"),
            F.col("line").alias("markdown"),
            F.trim("line").alias("text"),
            F.lit(None).cast("int").alias("level"),
        )
    )
    both = header.unionByName(paras)
    # renumber block_idx densely per doc while preserving source order
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("block_idx")
    dense = both.withColumn("block_idx", (F.row_number().over(w) - 1).cast("int"))
    return dense.select(
        "doc_id",
        F.lit(0).alias("section_idx"),
        "block_idx",
        F.expr("cast(array() as array<int>)").alias("parent_path"),
        "kind",
        "markdown",
        "text",
        "level",
        F.lit(None).cast("string").alias("alt_text"),
        F.lit(None).cast("string").alias("media_type"),
        F.lit(None).cast("binary").alias("content"),
        F.lit(None).cast("array<array<string>>").alias("table_cells"),
    )
