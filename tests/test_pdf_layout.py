"""Coordinate-based PDF layout grouping (SURVEY.md D6, round-6 verdict
item 4): words -> lines -> blocks from text-operator coordinates,
approximating the reference's PdfPig Docstrum pipeline
(``Readers/Pdf/PdfReader.cs:30-49``).

The synthetic fixtures are real content streams (the stdlib extractor
reads `stream...endstream` sections directly), crafted so coordinates —
not byte order — determine the layout: relative Td/TD/T* moves,
paragraph leading jumps, font-size changes, out-of-order emission,
word gaps, and a two-column page.

The reference's own Content/Pdf corpus is a uniform line grid (single
font, constant 17.12pt leading, no paragraph gaps), so ANY
spacing-based segmenter — Docstrum included — yields exactly one block
per page there; the golden below pins that, plus title-first ordering.
"""

from __future__ import annotations

import pathlib

from dataingestionplayground_spark.sources.pdf import stdlib_extract

REF_PDF = pathlib.Path("/root/reference/DataIngestionPlayground/Content/Pdf")


def _pdf(content: str) -> bytes:
    return b"%PDF-1.4\nstream\n" + content.encode("latin-1") + b"\nendstream\n"


def test_title_and_paragraphs_split_by_leading_and_font():
    # standard text space (y decreases down the page): 18pt title, two
    # 11pt paragraphs with 13pt leading and a 30pt paragraph gap
    doc = _pdf(
        """BT
/F1 18 Tf
1 0 0 1 72 700 Tm
(Grand Title) Tj
ET
BT
/F1 11 Tf
1 0 0 1 72 660 Tm
(para one line one) Tj
0 -13 Td
(para one line two) Tj
0 -30 Td
(para two line one) Tj
0 -13 Td
(para two line two) Tj
ET"""
    )
    pages = stdlib_extract(doc)
    assert pages == [
        [
            "Grand Title",
            "para one line one para one line two",
            "para two line one para two line two",
        ]
    ]


def test_tstar_and_tl_advance_lines():
    doc = _pdf(
        """BT
/F1 12 Tf
14 TL
1 0 0 1 72 500 Tm
(first) Tj
T*
(second) Tj
(third)'
ET"""
    )
    pages = stdlib_extract(doc)
    assert pages == [["first second third"]]


def test_out_of_order_emission_is_reordered_by_coordinates():
    # the byte stream emits the SECOND paragraph first; geometry wins
    doc = _pdf(
        """BT
/F1 11 Tf
1 0 0 1 72 600 Tm
(second paragraph) Tj
1 0 0 1 72 680 Tm
(first paragraph) Tj
ET"""
    )
    pages = stdlib_extract(doc)
    assert pages == [["first paragraph", "second paragraph"]]


def test_word_gap_spacing_from_coordinates():
    # three runs on one line: "Hel"+"lo" abut (no space), "world" sits
    # beyond a quarter-em gap (space inserted) — word grouping from
    # x coordinates, as PdfPig's nearest-neighbour word extractor does
    doc = _pdf(
        """BT
/F1 12 Tf
1 0 0 1 72 500 Tm
(Hel) Tj
1 0 0 1 90 500 Tm
(lo) Tj
1 0 0 1 110 500 Tm
(world) Tj
ET"""
    )
    pages = stdlib_extract(doc)
    assert pages == [["Hello world"]]


def test_two_columns_read_left_then_right():
    doc = _pdf(
        """BT
/F1 11 Tf
1 0 0 1 50 700 Tm
(left one) Tj
1 0 0 1 350 700 Tm
(right one) Tj
1 0 0 1 50 687 Tm
(left two) Tj
1 0 0 1 350 687 Tm
(right two) Tj
ET"""
    )
    pages = stdlib_extract(doc)
    assert pages == [["left one left two", "right one right two"]]


def test_tj_array_literals_concatenate():
    doc = _pdf(
        """BT
/F1 12 Tf
1 0 0 1 72 500 Tm
[(ker) -120 (ning)] TJ
ET"""
    )
    assert stdlib_extract(doc) == [["kerning"]]


def test_tj_array_with_bracket_inside_literal():
    # ADVICE r7: a ']' inside a TJ literal string (escaped or raw) must
    # not terminate the array match and drop or mangle the text
    doc = _pdf(
        r"""BT
/F1 12 Tf
1 0 0 1 72 500 Tm
[(a\]b) -120 (c]d)] TJ
0 -14 Td
(next line) Tj
ET"""
    )
    assert stdlib_extract(doc) == [["a]bc]d next line"]]


def test_flipped_matrix_orientation():
    # exporter style of the reference corpus: cm-flipped page, Tm with
    # d=-1 and y growing DOWN the page — reading order must not invert
    doc = _pdf(
        """BT
/F1 12 Tf
1 0 0.000000 -1 72 108 Tm
(top line) Tj
ET
BT
/F1 12 Tf
1 0 0.000000 -1 72 125 Tm
(bottom line) Tj
ET"""
    )
    assert stdlib_extract(doc) == [["top line bottom line"]]


# --- golden over the reference's own 10 PDFs ---------------------------

TITLES = {
    "ancient_egypt.pdf": "Ancient Egypt",
    "black_holes.pdf": "Black Holes",
    "coral_reefs.pdf": "Coral Reefs",
    "human_brain.pdf": "The Human Brain",
    "machine_learning.pdf": "Machine Learning",
    "photosynthesis.pdf": "Photosynthesis",
    "plate_tectonics.pdf": "Plate Tectonics",
    "renewable_energy.pdf": "Renewable Energy",
    "roman_empire.pdf": "The Roman Empire",
    "solar_system.pdf": "The Solar System",
}


def test_reference_corpus_layout_golden():
    """Block count/order golden for all 10 reference PDFs: these pages
    are uniform line grids (one font, constant leading, no paragraph
    whitespace), so the correct spacing-based segmentation is exactly
    one block per page, opening with the document title — the same
    result PdfPig's Docstrum (or pypdf's gap splitter) produces on
    them. The synthetic tests above pin the multi-block behavior."""
    seen = 0
    for f in sorted(REF_PDF.glob("*.pdf")):
        pages = stdlib_extract(f.read_bytes())
        assert [len(p) for p in pages] == [1], f.name
        assert pages[0][0].startswith(TITLES[f.name]), f.name
        # title precedes body inside the block (reading order held)
        body_probe = pages[0][0][len(TITLES[f.name]) :]
        assert len(body_probe) > 200, f.name
        seen += 1
    assert seen == 10
