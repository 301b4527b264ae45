"""Document sources: markdown, database rows, PDF (stubbed), multimodal
binary columns — each producing the uniform document/element IR
(schemas module) so multi-source corpora union cleanly
(reference: the ``IngestionDocument`` IR, SURVEY.md §1.1).
"""

from dataingestionplayground_spark.sources.schemas import (
    DOCUMENT_SCHEMA,
    ELEMENT_SCHEMA,
    CHUNK_SCHEMA,
    RESULT_SCHEMA,
)

__all__ = ["DOCUMENT_SCHEMA", "ELEMENT_SCHEMA", "CHUNK_SCHEMA", "RESULT_SCHEMA"]
