"""Document-level IR: roll element rows up to DOCUMENT_SCHEMA rows.

The reference's ``IngestionDocument`` (id + ordered sections,
``MarkdownParser.cs:42-46``) as a derived table: one row per document
with per-section summaries (page number, markdown, element count) in
source order. Purely relational — two hash aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_documents(elements: DataFrame, source: str) -> DataFrame:
    """elements (ELEMENT_SCHEMA) -> documents (DOCUMENT_SCHEMA)."""
    sections = (
        elements.groupBy("doc_id", "section_idx")
        .agg(
            F.count(F.lit(1)).cast("int").alias("element_count"),
            F.concat_ws(
                "\n\n",
                F.expr(
                    "transform(array_sort(collect_list(struct(block_idx, markdown))), s -> s.markdown)"
                ),
            ).alias("markdown"),
        )
        .withColumn("page_number", (F.col("section_idx") + 1).cast("int"))
    )
    return sections.groupBy("doc_id").agg(
        F.expr(
            "sort_array(collect_list(struct(section_idx, "
            "struct(page_number, markdown, element_count) as sec)))"
        ).alias("__ordered")
    ).select(
        "doc_id",
        F.lit(source).alias("source"),
        F.expr("transform(__ordered, s -> s.sec)").alias("sections"),
    )
