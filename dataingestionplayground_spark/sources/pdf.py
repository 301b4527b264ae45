"""PDF source (S2/D6 in SURVEY.md §2.1/2.9).

The reference's PDF path (``Readers/Pdf/PdfReader.cs:13-49``) opens each
PDF, runs letters->words->text-block extraction per page, and emits one
section per page with one paragraph per text block. Spark-first shape:

    binaryFile scan -> per-file parse in mapInPandas -> element rows
    (page_number carried in section_idx)

Extraction backends, in preference order:
1. pypdf (if installed) — full-fidelity layout extraction;
2. :func:`stdlib_extract` — a dependency-free extractor for the common
   Flate-compressed, ToUnicode-CMap'ed PDFs that office/export tools emit
   (decompress content streams with zlib, decode glyph-index hex strings
   through the embedded bfchar/bfrange CMaps, rebuild lines by text-matrix
   y ordinates, group into blocks by line-gap). Handles the reference's
   own Content/Pdf corpus end-to-end.
A custom ``PageExtractor`` can always be injected (tests use a
deterministic fake).
"""

from __future__ import annotations

import re
import zlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestionplayground_spark.sources.schemas import ELEMENT_SCHEMA

# extractor: bytes -> list of pages, each a list of text-block strings
PageExtractor = Callable[[bytes], list[list[str]]]

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_HEXTRIPLE_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_BT_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_TM_RE = re.compile(rb"1 0 [\d.+-]+ -?1 ([\d.+-]+) ([\d.+-]+) Tm")
_HEXSTR_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_LITSTR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")


def _parse_cmaps(streams: list[bytes]) -> dict[int, str]:
    """Glyph-index -> unicode from embedded ToUnicode CMaps."""
    g2u: dict[int, str] = {}
    for raw in streams:
        if b"beginbfchar" not in raw and b"beginbfrange" not in raw:
            continue
        for m in _BFCHAR_RE.finditer(raw):
            for a, b in _HEXPAIR_RE.findall(m.group(1)):
                g2u[int(a, 16)] = bytes.fromhex(b.decode()).decode("utf-16-be", "replace")
        for m in _BFRANGE_RE.finditer(raw):
            for lo, hi, d in _HEXTRIPLE_RE.findall(m.group(1)):
                lo_i, hi_i, d_i = int(lo, 16), int(hi, 16), int(d, 16)
                for k in range(lo_i, min(hi_i, lo_i + 65535) + 1):
                    g2u[k] = chr(d_i + (k - lo_i))
    return g2u


def stdlib_extract(data: bytes) -> list[list[str]]:
    """Dependency-free text extraction (see module docstring). Returns one
    list of text blocks per page; empty when the PDF has no recoverable
    text layer."""
    streams = []
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        try:
            raw = zlib.decompress(raw)
        except Exception:
            pass
        streams.append(raw)
    g2u = _parse_cmaps(streams)
    pages: list[list[str]] = []
    for raw in streams:
        if b"BT" not in raw or b"Tf" not in raw:
            continue  # not a page content stream (fonts, cmaps, images)
        lines: list[tuple[float, str]] = []
        for bt in _BT_RE.finditer(raw):
            seg = bt.group(1)
            tm = _TM_RE.search(seg)
            y = float(tm.group(2)) if tm else (lines[-1][0] + 1 if lines else 0.0)
            parts: list[str] = []
            for h in _HEXSTR_RE.findall(seg):
                hs = h.decode()
                for i in range(0, len(hs) - 3, 4):
                    parts.append(g2u.get(int(hs[i : i + 4], 16), ""))
            for lit in _LITSTR_RE.findall(seg):
                parts.append(lit.decode("latin-1"))
            text = "".join(parts)
            if text.strip():
                lines.append((y, text))
        if not lines:
            continue
        lines.sort(key=lambda p: p[0])
        gaps = [b[0] - a[0] for a, b in zip(lines, lines[1:])]
        typical = sorted(gaps)[len(gaps) // 2] if gaps else 20.0
        blocks, cur = [], [lines[0][1]]
        for (y0, _), (y1, t1) in zip(lines, lines[1:]):
            if y1 - y0 > typical * 1.5:
                blocks.append(" ".join(cur))
                cur = [t1]
            else:
                cur.append(t1)
        blocks.append(" ".join(cur))
        pages.append(blocks)
    return pages


def default_extractor(data: bytes) -> list[list[str]]:
    """pypdf when available, else the dependency-free extractor."""
    try:
        import pypdf  # noqa: F401
    except ImportError:
        return stdlib_extract(data)
    import io

    reader = pypdf.PdfReader(io.BytesIO(data))
    return [
        [blk for blk in (page.extract_text() or "").split("\n\n") if blk.strip()]
        for page in reader.pages
    ]


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
