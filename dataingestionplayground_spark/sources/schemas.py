"""Engine IR schemas (FIXTURES.md §2; SURVEY.md §1.1-1.2).

The reference's in-memory object graph (``IngestionDocument`` ->
``IngestionDocumentSection`` -> element union, constructed at
``Readers/Markdown/MarkdownParser.cs:42-46`` / ``Readers/Pdf/PdfReader.cs:20-25``
/ ``Readers/Database/DatabaseIngestionReader.cs:58-62``) maps to two
columnar tables:

* ``documents`` — one row per document (id, source, section summaries);
* ``elements`` — one row per element, flattened with ``parent_path``
  (Spark structs cannot recurse; quotes/lists nest in the reference,
  ``MarkdownParser.cs:157-197``).

``chunks`` mirrors the vector-store record written by the reference
(key, embedding, content, context, documentid —
``VectorStoreCommands.cs:91-104``); ``ingest_results`` mirrors per-document
error isolation (``VectorStoreCommands.cs:163-180``).
"""

from __future__ import annotations

from pyspark.sql import types as T

ELEMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("section_idx", T.IntegerType(), False),
        T.StructField("block_idx", T.IntegerType(), False),
        T.StructField("parent_path", T.ArrayType(T.IntegerType()), False),
        T.StructField("kind", T.StringType(), False),  # header|paragraph|footer|image|table|section|code|footnote
        T.StructField("markdown", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("level", T.IntegerType(), True),  # headers
        T.StructField("alt_text", T.StringType(), True),  # images
        T.StructField("media_type", T.StringType(), True),  # images
        T.StructField("content", T.BinaryType(), True),  # images (decoded data-URL)
        T.StructField("table_cells", T.ArrayType(T.ArrayType(T.StringType())), True),
    ]
)

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),  # markdown|pdf|database
        T.StructField(
            "sections",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("page_number", T.IntegerType(), True),
                        T.StructField("markdown", T.StringType(), True),
                        T.StructField("element_count", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("content", T.StringType(), False),
        T.StructField("context", T.StringType(), True),
        T.StructField("documentid", T.StringType(), False),
        # ordinal of the chunk within its document; the reassembly sort key
        # (collect_list order is partition-dependent, so document text can
        # only be rebuilt deterministically from an explicit ordinal).
        # Nullable: collections written before this column existed read as
        # null and reassembly falls back to (key, content) ordering.
        T.StructField("chunk_idx", T.IntegerType(), True),
    ]
)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("documentid", T.StringType(), False),
        T.StructField("succeeded", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)
