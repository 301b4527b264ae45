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
_HEXSTR_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_NUM = rb"[\d.+-]+"
# text-positioning / showing operators, scanned in stream order so the
# interpreter can carry the text-line matrix across them
_TOK_RE = re.compile(
    rb"(?P<tm>(" + _NUM + rb")\s+(" + _NUM + rb")\s+(" + _NUM + rb")\s+("
    + _NUM + rb")\s+(" + _NUM + rb")\s+(" + _NUM + rb")\s+Tm)"
    rb"|(?P<td>(" + _NUM + rb")\s+(" + _NUM + rb")\s+(?:Td|TD))"
    rb"|(?P<tstar>T\*)"
    rb"|(?P<tl>(" + _NUM + rb")\s+TL)"
    rb"|(?P<tf>/\w+\s+(" + _NUM + rb")\s+Tf)"
    # TJ array elements are literal strings (escapes allowed — a raw or
    # escaped ']' inside one must not end the array), hex strings, and
    # numbers/whitespace; match them balanced instead of [^\]]*
    rb"|(?P<tj>\[(?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|[^\]()<])*\]\s*TJ)"
    rb"|(?P<hexshow><[0-9A-Fa-f]+>\s*Tj)"
    rb"|(?P<lit>\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|'))",
    re.DOTALL,
)


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


_ESC_RE = re.compile(rb"\\([0-7]{1,3}|.)", re.DOTALL)
_ESC_MAP = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f"}
_SHOW_STR_RE = re.compile(rb"<([0-9A-Fa-f]+)>|\(((?:[^()\\]|\\.)*)\)")


def _unescape(lit: bytes) -> bytes:
    def sub(m):
        e = m.group(1)
        if e in _ESC_MAP:
            return _ESC_MAP[e]
        if e.isdigit():
            return bytes([int(e, 8) & 0xFF])
        return e  # \( \) \\ and, per spec, any other char: backslash dropped

    return _ESC_RE.sub(sub, lit)


def _decode_show(seg: bytes, g2u: dict[int, str]) -> str:
    """Hex strings through the ToUnicode CMap (4-hex-digit glyph ids),
    literal strings as latin-1 with escapes — in stream order."""
    parts: list[str] = []
    for m in _SHOW_STR_RE.finditer(seg):
        if m.group(1) is not None:
            hs = m.group(1).decode()
            for i in range(0, len(hs) - 3, 4):
                parts.append(g2u.get(int(hs[i : i + 4], 16), ""))
        else:
            parts.append(_unescape(m.group(2)).decode("latin-1", "replace"))
    return "".join(parts)


def _interpret_text_ops(
    raw: bytes, g2u: dict[int, str]
) -> tuple[list[dict], float | None]:
    """Run the text-positioning operators of one content stream and emit
    ``(runs, flip_hint)``: positioned text runs {x, y, fs, text, seq},
    plus the page-orientation hint derived from the Tm matrices' d sign
    (None when no Tm was seen — caller falls back to stream-order
    inference).

    Tracks Tm (line matrix origin), Td/TD (relative line moves, TD also
    sets the leading), T*/' (advance one leading), TL and Tf — the
    coordinate trail the reference's PdfPig pipeline consumes as letter
    positions (``Readers/Pdf/PdfReader.cs:30-49``). Full matrix algebra
    (rotation/skew) is out of scope: e/f translation components carry
    the layout signal in office/export PDFs."""
    runs: list[dict] = []
    d_signs: list[float] = []
    fs, tl = 12.0, None
    for bt in _BT_RE.finditer(raw):
        seg = bt.group(1)
        lx, ly = 0.0, 0.0
        down = 1.0  # +leading direction; flipped (d=-1) matrices go +y
        num_re = re.compile(_NUM)
        for m in _TOK_RE.finditer(seg):
            if m.group("tm"):
                nums = [float(n) for n in num_re.findall(m.group("tm"))]
                lx, ly = nums[4], nums[5]
                down = 1.0 if nums[3] < 0 else -1.0
                d_signs.append(nums[3])
            elif m.group("td"):
                tx, ty = (float(n) for n in num_re.findall(m.group("td"))[:2])
                if m.group("td").rstrip().endswith(b"TD"):
                    tl = abs(ty)
                lx, ly = lx + tx, ly + ty
            elif m.group("tstar"):
                ly += down * (tl if tl else 1.2 * fs)
            elif m.group("tl"):
                tl = abs(float(num_re.findall(m.group("tl"))[0]))
            elif m.group("tf"):
                fs = float(num_re.findall(m.group("tf"))[-1])
            else:  # tj / hexshow / lit (the ' form advances a line first)
                show = m.group(0)
                if show.rstrip().endswith(b"'"):
                    ly += down * (tl if tl else 1.2 * fs)
                text = _decode_show(show, g2u)
                if text.strip():
                    runs.append(
                        {"x": lx, "y": ly, "fs": fs, "text": text, "seq": len(runs)}
                    )
    # orientation from the matrices themselves: standard text space
    # (d > 0) has y shrinking down the page (normalize with flip=-1),
    # flipped exporters (d < 0) grow it; None -> no Tm seen, caller
    # falls back to stream-order inference
    if d_signs:
        flip_hint = 1.0 if sum(1 for d in d_signs if d < 0) * 2 >= len(d_signs) else -1.0
    else:
        flip_hint = None
    return runs, flip_hint


def _median(vals: list[float], default: float) -> float:
    return sorted(vals)[len(vals) // 2] if vals else default


def _layout_blocks(runs: list[dict], flip_hint: float | None = None) -> list[str]:
    """Docstrum-approximating words -> lines -> blocks grouping
    (``Readers/Pdf/PdfReader.cs:30-49``: letters -> words -> bounding-box
    blocks) from run coordinates:

    * reading orientation inferred from how y moves with stream order
      (flipped-matrix exporters grow y down the page, standard text
      space shrinks it);
    * one vertical whitespace gutter wider than ~3 em splits columns
      (X-Y-cut style), left column first;
    * runs cluster into lines by y proximity, merge in x order with a
      space only when the inter-run gap exceeds ~0.25 em (word
      spacing from coordinates, not from the byte stream);
    * lines group into blocks on leading jumps (> 1.5x the typical
      line gap) or font-size changes — one paragraph per block.
    """
    fs_med = _median([r["fs"] for r in runs], 12.0)
    if flip_hint is not None:
        flip = flip_hint
    else:
        ys = [r["y"] for r in runs]
        asc = sum(1 for a, b in zip(ys, ys[1:]) if b > a)
        desc = sum(1 for a, b in zip(ys, ys[1:]) if b < a)
        flip = -1.0 if desc > asc else 1.0  # larger ny == further down
    for r in runs:
        r["ny"] = flip * r["y"]
        r["x_end"] = r["x"] + 0.5 * r["fs"] * len(r["text"])

    # one-level vertical gutter cut (columns) on x-coverage gaps
    cover: list[list[float]] = []
    for x0, x1 in sorted((r["x"], r["x_end"]) for r in runs):
        if cover and x0 <= cover[-1][1] + fs_med:
            cover[-1][1] = max(cover[-1][1], x1)
        else:
            cover.append([x0, x1])
    bands: list[list[dict]] = []
    if len(cover) > 1:
        cuts = [
            (a[1] + b[0]) / 2.0
            for a, b in zip(cover, cover[1:])
            if b[0] - a[1] > 3.0 * fs_med
        ]
        if cuts:
            edges = [float("-inf"), *cuts, float("inf")]
            for lo, hi in zip(edges, edges[1:]):
                band = [r for r in runs if lo <= r["x"] < hi]
                if band:
                    bands.append(band)
    if not bands:
        bands = [runs]

    blocks: list[str] = []
    for band in bands:
        # lines: cluster by y proximity, then merge runs in x order
        tol = 0.45 * fs_med
        lines: list[dict] = []
        for r in sorted(band, key=lambda r: (r["ny"], r["x"], r["seq"])):
            if lines and abs(r["ny"] - lines[-1]["ny"]) <= tol:
                lines[-1]["runs"].append(r)
            else:
                lines.append({"ny": r["ny"], "runs": [r]})
        for ln in lines:
            parts: list[str] = []
            prev = None
            for r in sorted(ln["runs"], key=lambda r: (r["x"], r["seq"])):
                if prev is not None:
                    gap = r["x"] - prev["x_end"]
                    joined = parts[-1].endswith(" ") or r["text"].startswith(" ")
                    if gap > 0.25 * prev["fs"] and not joined:
                        parts.append(" ")
                parts.append(r["text"])
                prev = r
            ln["text"] = "".join(parts)
            ln["fs"] = _median([r["fs"] for r in ln["runs"]], fs_med)
        # blocks: split on leading jumps or font-size changes. "Typical"
        # leading comes from plausible LINE gaps only (<= ~2.2 em):
        # paragraph whitespace must not inflate its own baseline, and a
        # page of isolated paragraphs still splits against the 1.2 em
        # fallback
        gaps = [b["ny"] - a["ny"] for a, b in zip(lines, lines[1:])]
        typical = _median(
            [g for g in gaps if 0 < g <= 2.2 * fs_med], 1.2 * fs_med
        )
        cur = [lines[0]]
        for a, b in zip(lines, lines[1:]):
            if (b["ny"] - a["ny"]) > 1.5 * typical or abs(b["fs"] - a["fs"]) > 1.0:
                blocks.append(" ".join(ln["text"] for ln in cur))
                cur = [b]
            else:
                cur.append(b)
        blocks.append(" ".join(ln["text"] for ln in cur))
    return blocks


def stdlib_extract(data: bytes) -> list[list[str]]:
    """Dependency-free text extraction (see module docstring): decompress
    content streams, interpret the text-positioning operators into
    coordinate runs, and group words -> lines -> blocks geometrically
    (:func:`_layout_blocks`). Returns one list of text blocks per page;
    empty when the PDF has no recoverable text layer."""
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
        runs, flip_hint = _interpret_text_ops(raw, g2u)
        if runs:
            pages.append(_layout_blocks(runs, flip_hint))
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
