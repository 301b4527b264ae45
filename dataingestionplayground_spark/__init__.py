"""dataingestionplayground_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference document-ingestion + vector-search playground
(f2bo/DataIngestionPlayground, surveyed in SURVEY.md):

* batch document ETL: multi-format parse -> normalize -> chunk -> embed ->
  collection sink (reference: ``VectorStoreCommands.cs:19-81``)
* vector similarity search (reference: ``VectorStoreCommands.cs:83-139``)
* the full relational substrate (scan/project/filter/join/agg/window/sort/
  set-op) those capabilities rest on, expressed as DataFrame plans that
  Catalyst optimizes — nothing hand-scheduled.
* LLM-data-pipeline extensions: dedup (exact/MinHash/SimHash/Jaccard),
  ANN similarity search, multimodal binary columns, text analysis.

Everything is declarative DataFrame/SQL first; Python (Arrow-batched
``mapInPandas``/``pandas_udf``) only where built-ins genuinely cannot
express the semantics (document parsing, chunking, embedding).
"""

__version__ = "0.1.0"

from dataingestionplayground_spark.session import get_spark, load_table, register_views

__all__ = ["get_spark", "load_table", "register_views", "__version__"]
