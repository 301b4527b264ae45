"""PDF source (S2/D6 in SURVEY.md §2.1/2.9) — plumbing real, decode gated.

The reference's PDF path (``Readers/Pdf/PdfReader.cs:13-49``) opens each
PDF, runs letters->words->text-block extraction per page, and emits one
section per page with one paragraph per text block. Spark-first shape:

    binaryFile scan -> per-file parse in mapInPandas -> element rows
    (page_number carried in section_idx)

No PDF library ships in this container, so the page-extraction callable
is injectable: production passes a pypdf/pdfminer extractor; tests pass a
deterministic fake. The Spark plumbing (binary scan, Arrow batching,
schema) is real and tested either way.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestionplayground_spark.sources.schemas import ELEMENT_SCHEMA

# extractor: bytes -> list of pages, each a list of text-block strings
PageExtractor = Callable[[bytes], list[list[str]]]


def default_extractor(data: bytes) -> list[list[str]]:
    """Real extractor requires pypdf/pdfminer.six (not in this image)."""
    try:
        import pypdf  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without pypdf
        raise NotImplementedError(
            "PDF text extraction needs pypdf/pdfminer.six; inject a custom "
            "PageExtractor or install one of them"
        ) from e
    import io

    reader = pypdf.PdfReader(io.BytesIO(data))
    return [[blk for blk in (page.extract_text() or "").split("\n\n") if blk.strip()] for page in reader.pages]


def read_pdf_dir(spark: SparkSession, path: str) -> DataFrame:
    """S2: binary directory scan — (doc_id, content BINARY) rows."""
    return (
        spark.read.format("binaryFile")
        .load(f"{path}/*.pdf")
        .select(F.col("path").alias("doc_id"), F.col("content"))
    )


def parse_pdf_df(raw: DataFrame, extractor: PageExtractor = default_extractor) -> DataFrame:
    """D6: per-page text blocks -> element rows; one section per page
    (page order preserved via section_idx = page_number - 1,
    PdfReader.cs:21-25,32-35)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in ELEMENT_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, data in zip(pdf["doc_id"], pdf["content"]):
                pages = extractor(bytes(data))
                for page_no, blocks in enumerate(pages, start=1):
                    for b, blk in enumerate(blocks):
                        txt = blk.strip()
                        if not txt:
                            continue
                        rows.append(
                            {
                                "doc_id": str(doc_id),
                                "section_idx": page_no - 1,
                                "block_idx": b,
                                "parent_path": [],
                                "kind": "paragraph",
                                "markdown": txt,
                                "text": txt,
                                "level": None,
                                "alt_text": None,
                                "media_type": None,
                                "content": None,
                                "table_cells": None,
                            }
                        )
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    return raw.mapInPandas(run, schema=ELEMENT_SCHEMA)
