"""Markdown -> element-IR parser (reference semantics, Spark-first plumbing).

Re-implements the observable semantics of the reference's Markdig-based
parser (``/root/reference/DataIngestionPlayground/Readers/Markdown/
MarkdownParser.cs``) in dependency-free Python:

* ATX headers -> header(level)            (MarkdownParser.cs:97-101)
* thematic break skipped; the paragraph immediately after one becomes a
  **footer**                              (:48-56, 102-105)
* image-only paragraph -> image element; ``data:<type>;base64,`` URLs
  decoded to bytes + media type          (:106, 118-155)
* pipe tables -> 2-D cell grid with colspan expansion (a cell followed by
  empty spill cells repeats across the span, :265-269), header-separator
  handling (:249), and the MarkItDown bogus-blank-first-row skip (:278-296)
* list items' leaf blocks flattened into a sub-section (:157-181); block
  quotes recurse as sub-sections (:183-197) — both flattened here to
  element rows with ``parent_path`` (SURVEY.md §7.4: no recursive structs)
* empty inline blocks dropped (:63-66, 75-76)
* fenced code blocks kept as ``code`` elements (text = code body)
* link-reference definition groups skipped (:51-61)
* Markdig "advanced extensions" breadth (MarkdownParser.cs:24-29): task-
  list markers (``[ ]``/``[x]``) are stripped from list-item text;
  footnote definitions (``[^label]: text``) become ``footnote`` elements
  (Markdig renders footnote bodies as document-end content) and inline
  ``[^label]`` references are stripped like other inline markers;
  definition lists (term + ``:   definition`` lines) become a section
  with ``definition_term``/``definition`` leaf elements; autolinks
  (``<https://...>``, ``<user@host>``) reduce to their literal URL text;
  grid tables (``+---+`` rules, ``+===+`` header rule, multi-line cells)
  land in the same ``table`` element as pipe tables; math blocks
  (``$$`` fences) become ``math`` elements carrying the LaTeX body;
  figures (``^^^`` fences) become a section with their content as
  children plus a ``figure_caption`` leaf; mermaid/nomnoml fences are
  ``diagram`` elements; inline citations (``""text""``) reduce to the
  cited text — the full UseAdvancedExtensions long tail

Distribution: parsing runs per-document inside ``mapInPandas`` (Arrow
batches, parser state never leaves the executor); everything before and
after the parse stage stays relational so Catalyst can prune and push
down around it.
"""

from __future__ import annotations

import base64
import re
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataingestionplayground_spark.sources.schemas import ELEMENT_SCHEMA

_ATX_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_BREAK_RE = re.compile(r"^ {0,3}((\*\s*){3,}|(-\s*){3,}|(_\s*){3,})$")
_IMAGE_RE = re.compile(r"^!\[(?P<alt>[^\]]*)\]\((?P<src>[^)]*)\)\s*$")
_DATA_URL_RE = re.compile(r"^data:(?P<type>[^;,]+);base64,(?P<data>.*)$", re.DOTALL)
_LIST_ITEM_RE = re.compile(r"^ {0,3}(?:[-*+]|\d{1,9}[.)])\s+(.*)$")
_TABLE_ROW_RE = re.compile(r"^\s*\|.*\|\s*$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-{2,}:?\s*(\|\s*:?-{3,}:?\s*)*\|?\s*$")
_LINKREF_RE = re.compile(r"^ {0,3}\[[^\]]+\]:\s+\S+")
_FOOTNOTE_DEF_RE = re.compile(r"^ {0,3}\[\^([^\]]+)\]:\s*(.*)$")
_FOOTNOTE_REF_RE = re.compile(r"\[\^[^\]]+\]")
_TASK_MARKER_RE = re.compile(r"^\[( |x|X)\]\s+")
_INLINE_MD_RE = re.compile(r"(\*\*|__|\*|_|`)")
_LINK_RE = re.compile(r"\[([^\]]*)\]\([^)]*\)")
# Markdig autolink extension: <scheme://url> / <user@host> render as a
# link whose literal text is the URL itself
_AUTOLINK_RE = re.compile(
    r"<((?:https?|ftp)://[^<>\s]+|mailto:[^<>\s]+|[^@<>\s]+@[^@<>\s]+\.[^<>\s]+)>"
)
# definition-list item (Markdig advanced extension / PHP Markdown Extra):
# ':' + space, up to 3 leading spaces
_DEF_ITEM_RE = re.compile(r"^ {0,3}:\s+(.*)$")
# grid-table separator (Markdig GridTableExtension): +---+---+ rows
# between cell rows; '=' marks the header separator
_GRID_SEP_RE = re.compile(r"^\s*\+([-=]+\+)+\s*$")
# math block (Markdig MathExtension): $$ fence on its own line
_MATH_FENCE_RE = re.compile(r"^\s*\$\$\s*$")
# figure fence (Markdig FigureExtension): ^^^ opens/closes; the closing
# line may carry the caption
_FIGURE_FENCE_RE = re.compile(r"^\s*\^{3,}\s*(.*)$")
# inline citation (Markdig CitationExtension): ""cited text"" -> <cite>
_CITE_RE = re.compile(r'""(.+?)""')
# fence info strings Markdig's DiagramExtension claims (rendered as a
# diagram div, not code)
_DIAGRAM_LANGS = {"mermaid", "nomnoml"}


@dataclass
class Element:
    kind: str
    markdown: str | None = None
    text: str | None = None
    level: int | None = None
    alt_text: str | None = None
    media_type: str | None = None
    content: bytes | None = None
    table_cells: list[list[str]] | None = None
    parent_path: list[int] = field(default_factory=list)


def _inline_text(md: str) -> str:
    """Accumulate inline literal text: strip emphasis/code markers, reduce
    links to their text, and drop footnote references — Markdig's literal
    accumulation skips non-literal inlines (MarkdownParser.cs:199-240)."""
    out = _FOOTNOTE_REF_RE.sub("", md)
    out = _AUTOLINK_RE.sub(r"\1", out)  # autolink -> its literal URL text
    out = _LINK_RE.sub(r"\1", out)
    out = _CITE_RE.sub(r"\1", out)  # citation -> its literal cited text
    out = _INLINE_MD_RE.sub("", out)
    return out.strip()


def _split_table_row(line: str) -> list[str]:
    inner = line.strip()
    if inner.startswith("|"):
        inner = inner[1:]
    if inner.endswith("|"):
        inner = inner[:-1]
    return [c.strip() for c in inner.split("|")]


def _expand_colspan(rows: list[list[str]]) -> list[list[str]]:
    """Colspan expansion: pad every row to the grid width by repeating the
    last non-empty cell across trailing missing columns (the reference
    copies a spanning cell into each column it covers,
    MarkdownParser.cs:265-269)."""
    width = max((len(r) for r in rows), default=0)
    out = []
    for r in rows:
        rr = list(r)
        while len(rr) < width:
            rr.append(rr[-1] if rr else "")
        out.append(rr)
    return out


def _parse_table(lines: list[str]) -> list[list[str]] | None:
    rows = [_split_table_row(ln) for ln in lines]
    # locate separator row (---|---): delimits header from body
    sep_idx = None
    for i, ln in enumerate(lines):
        cells = _split_table_row(ln)
        if cells and all(re.fullmatch(r":?-{2,}:?", c) for c in cells if c != "") and any(c for c in cells):
            sep_idx = i
            break
    if sep_idx is None:
        return None
    header_rows = rows[:sep_idx]
    body_rows = rows[sep_idx + 1 :]
    # MarkItDown workaround: a completely blank first header row before the
    # separator is bogus — drop it (MarkdownParser.cs:278-296).
    header_rows = [r for r in header_rows if any(c.strip() for c in r)]
    return _expand_colspan(header_rows + body_rows)


def _parse_grid_table(lines: list[str]) -> list[list[str]] | None:
    """Markdig grid table -> 2-D cell grid: ``+---+``/``+===+`` rules
    separate logical rows; consecutive ``|`` lines between two rules are
    ONE row whose multi-line cells join with spaces (the '=' rule marks
    the header row exactly like a pipe table's ``---`` separator, so the
    grid lands in the same table element as pipe tables — the reference's
    Markdig pipeline maps both block types to IngestionDocumentTable,
    MarkdownParser.cs:87)."""
    groups: list[list[list[str]]] = []
    cur: list[list[str]] = []
    for ln in lines:
        if _GRID_SEP_RE.match(ln.strip()):
            if cur:
                groups.append(cur)
                cur = []
        elif _TABLE_ROW_RE.match(ln):
            cur.append(_split_table_row(ln))
        else:
            return None
    if cur:
        groups.append(cur)
    if not groups:
        return None
    rows = []
    for g in groups:
        width = max(len(r) for r in g)
        rows.append(
            [
                " ".join(r[c] for r in g if c < len(r) and r[c]).strip()
                for c in range(width)
            ]
        )
    return _expand_colspan(rows)


def parse_markdown(doc_id: str, text: str) -> list[Element]:
    """Parse one markdown document into the flat element list (source order
    preserved — T2 in SURVEY.md §2.6)."""
    lines = text.split("\n")
    elements: list[Element] = []
    previous_was_break = False  # footer heuristic flag (MarkdownParser.cs:48-56)
    i = 0

    def emit(el: Element, after_break_sensitive: bool = False):
        elements.append(el)

    while i < len(lines):
        line = lines[i]
        stripped = line.strip()

        if not stripped:
            i += 1
            continue

        # fenced code block; a mermaid/nomnoml info string is Markdig's
        # DiagramExtension (rendered as a diagram, not code) -> 'diagram'
        if stripped.startswith("```"):
            lang = stripped[3:].strip().lower()
            j = i + 1
            body = []
            while j < len(lines) and not lines[j].strip().startswith("```"):
                body.append(lines[j])
                j += 1
            code = "\n".join(body)
            if code.strip():
                kind = "diagram" if lang in _DIAGRAM_LANGS else "code"
                elements.append(Element(kind, markdown="\n".join(lines[i : j + 1]), text=code))
            i = j + 1
            previous_was_break = False
            continue

        # thematic break: skipped, arms the footer flag
        if _BREAK_RE.match(stripped):
            previous_was_break = True
            i += 1
            continue

        # footnote definition: checked BEFORE linkrefs ([^1]: also matches
        # the linkref pattern); the body (plus indented continuations)
        # becomes a footnote element — Markdig's footnote extension hoists
        # definitions to a document-end group rendered as content.
        fm = _FOOTNOTE_DEF_RE.match(line)
        if fm:
            j = i + 1
            body = [fm.group(2)]
            while j < len(lines) and lines[j].startswith((" ", "\t")) and lines[j].strip():
                body.append(lines[j].strip())
                j += 1
            txt = _inline_text(" ".join(b for b in body if b))
            if txt:
                elements.append(
                    Element("footnote", markdown="\n".join(lines[i:j]), text=txt)
                )
            i = j
            previous_was_break = False
            continue

        # link-reference definition group: skipped (structural P3)
        if _LINKREF_RE.match(line):
            i += 1
            continue

        # ATX header
        m = _ATX_RE.match(stripped)
        if m:
            txt = _inline_text(m.group(2))
            if txt:
                elements.append(
                    Element("header", markdown=stripped, text=txt, level=len(m.group(1)))
                )
            previous_was_break = False
            i += 1
            continue

        # figure (Markdig FigureExtension): ^^^ fences wrap arbitrary
        # content; either fence line may carry the caption. Emitted like
        # quotes: a section anchor, the recursively-parsed content as
        # children, and a 'figure_caption' leaf when a caption exists.
        fig = _FIGURE_FENCE_RE.match(stripped)
        if fig is not None:
            j = i + 1
            body: list[str] = []
            caption = fig.group(1).strip()
            while j < len(lines):
                cm = _FIGURE_FENCE_RE.match(lines[j].strip())
                if cm:
                    caption = cm.group(1).strip() or caption
                    j += 1
                    break
                body.append(lines[j])
                j += 1
            sec_idx = len(elements)
            elements.append(Element("section", markdown="\n".join(lines[i:j])))
            for sub in parse_markdown(doc_id, "\n".join(body)):
                sub.parent_path = [sec_idx] + sub.parent_path
                elements.append(sub)
            cap_txt = _inline_text(caption) if caption else ""
            if cap_txt:
                elements.append(
                    Element(
                        "figure_caption",
                        markdown=caption,
                        text=cap_txt,
                        parent_path=[sec_idx],
                    )
                )
            i = j
            previous_was_break = False
            continue

        # math block (Markdig MathExtension, enabled by the reference's
        # UseAdvancedExtensions pipeline): '$$' fences -> a 'math' element
        # carrying the LaTeX body as text (the same generalization 'code'
        # makes for fenced code blocks)
        if _MATH_FENCE_RE.match(stripped):
            j = i + 1
            body = []
            while j < len(lines) and not _MATH_FENCE_RE.match(lines[j].strip()):
                body.append(lines[j])
                j += 1
            latex = "\n".join(body).strip()
            if latex:
                elements.append(
                    Element("math", markdown="\n".join(lines[i : j + 1]), text=latex)
                )
            i = j + 1
            previous_was_break = False
            continue

        # grid table (Markdig GridTableExtension): starts with a +---+ rule
        if _GRID_SEP_RE.match(stripped):
            j = i
            g_lines = []
            while j < len(lines) and (
                _GRID_SEP_RE.match(lines[j].strip()) or _TABLE_ROW_RE.match(lines[j])
            ):
                g_lines.append(lines[j])
                j += 1
            # a grid table ENDS at its last +---+ rule: '|' rows after it
            # (e.g. a pipe table with no blank line between) are a
            # separate element, not extra grid body rows
            last_sep = max(
                idx
                for idx, gl in enumerate(g_lines)
                if _GRID_SEP_RE.match(gl.strip())
            )
            if last_sep + 1 < len(g_lines):
                g_lines = g_lines[: last_sep + 1]
                j = i + last_sep + 1
            cells = _parse_grid_table(g_lines) if len(g_lines) >= 2 else None
            if cells:
                elements.append(
                    Element("table", markdown="\n".join(g_lines), table_cells=cells)
                )
                i = j
                previous_was_break = False
                continue
            # a lone '+---+' line is not a table: fall through to paragraph

        # pipe table
        if _TABLE_ROW_RE.match(line):
            j = i
            tbl_lines = []
            while j < len(lines) and _TABLE_ROW_RE.match(lines[j]):
                tbl_lines.append(lines[j])
                j += 1
            cells = _parse_table(tbl_lines)
            if cells is not None:
                elements.append(
                    Element("table", markdown="\n".join(tbl_lines), table_cells=cells)
                )
                i = j
                previous_was_break = False
                continue
            # not a real table: fall through to paragraph handling

        # block quote -> sub-section (recursive)
        if stripped.startswith(">"):
            j = i
            q_lines = []
            while j < len(lines) and lines[j].strip().startswith(">"):
                q_lines.append(re.sub(r"^\s*>\s?", "", lines[j]))
                j += 1
            sec_idx = len(elements)
            elements.append(Element("section", markdown="\n".join(lines[i:j])))
            for sub in parse_markdown(doc_id, "\n".join(q_lines)):
                sub.parent_path = [sec_idx] + sub.parent_path
                elements.append(sub)
            i = j
            previous_was_break = False
            continue

        # list -> flattened sub-section of its items' leaf paragraphs
        if _LIST_ITEM_RE.match(line):
            j = i
            items = []
            while j < len(lines):
                lm = _LIST_ITEM_RE.match(lines[j])
                if lm:
                    items.append(lm.group(1))
                    j += 1
                elif lines[j].startswith((" ", "\t")) and lines[j].strip():
                    if items:
                        items[-1] += " " + lines[j].strip()
                    j += 1
                else:
                    break
            sec_idx = len(elements)
            elements.append(Element("section", markdown="\n".join(lines[i:j])))
            for it in items:
                # task-list marker ([ ]/[x]) stripped: Markdig's TaskList
                # inline is not a literal, so it never reaches the text
                txt = _inline_text(_TASK_MARKER_RE.sub("", it))
                if txt:  # empty-block filter inside lists (:169)
                    elements.append(
                        Element("paragraph", markdown=it, text=txt, parent_path=[sec_idx])
                    )
            i = j
            previous_was_break = False
            continue

        # definition list (Markdig advanced extension): TERM line(s), each
        # followed by one or more ':   definition' lines. Emitted like
        # lists/quotes: a section anchor, then definition_term/definition
        # leaf elements parented to it (source order preserved).
        if (
            not _DEF_ITEM_RE.match(line)
            and i + 1 < len(lines)
            and _DEF_ITEM_RE.match(lines[i + 1])
        ):
            j = i
            pairs: list[tuple[str, list[str]]] = []
            while j < len(lines):
                ln = lines[j]
                if not ln.strip():
                    # a blank continues the block only when a def (or a
                    # term-then-def) follows — else the list is done
                    if j + 1 < len(lines) and _DEF_ITEM_RE.match(lines[j + 1]):
                        j += 1
                        continue
                    if (
                        j + 2 < len(lines)
                        and lines[j + 1].strip()
                        and not _DEF_ITEM_RE.match(lines[j + 1])
                        and _DEF_ITEM_RE.match(lines[j + 2])
                    ):
                        j += 1
                        continue
                    break
                dm = _DEF_ITEM_RE.match(ln)
                if dm:
                    pairs[-1][1].append(dm.group(1).strip())
                    j += 1
                    # indented lazy continuations extend the definition
                    while j < len(lines) and lines[j].startswith(("    ", "\t")) and lines[j].strip():
                        pairs[-1][1][-1] += " " + lines[j].strip()
                        j += 1
                    continue
                if j + 1 < len(lines) and _DEF_ITEM_RE.match(lines[j + 1]):
                    pairs.append((ln.strip(), []))
                    j += 1
                    continue
                break
            sec_idx = len(elements)
            elements.append(Element("section", markdown="\n".join(lines[i:j])))
            for term, defs in pairs:
                ttxt = _inline_text(term)
                if ttxt:
                    elements.append(
                        Element(
                            "definition_term", markdown=term, text=ttxt, parent_path=[sec_idx]
                        )
                    )
                for d in defs:
                    dtxt = _inline_text(d)
                    if dtxt:  # empty-block filter, same as list items
                        elements.append(
                            Element(
                                "definition", markdown=": " + d, text=dtxt, parent_path=[sec_idx]
                            )
                        )
            i = j
            previous_was_break = False
            continue

        # paragraph (possibly an image, a setext heading, or a footer)
        j = i
        p_lines = []
        while j < len(lines) and lines[j].strip() and not _BREAK_RE.match(lines[j].strip()) \
                and not _ATX_RE.match(lines[j].strip()) and not lines[j].strip().startswith((">", "```")) \
                and not _LIST_ITEM_RE.match(lines[j]) and not _TABLE_ROW_RE.match(lines[j]):
            if p_lines and re.fullmatch(r"=+|-+", lines[j].strip()):
                break  # setext underline terminates the paragraph
            if p_lines and (
                _DEF_ITEM_RE.match(lines[j])
                or (j + 1 < len(lines) and _DEF_ITEM_RE.match(lines[j + 1]))
            ):
                break  # a definition list starts: leave its term unconsumed
            p_lines.append(lines[j].strip())
            j += 1
        # setext heading: a one-line paragraph underlined with === (H1) or
        # --- (H2). The underline wins over thematic-break interpretation
        # when it directly follows paragraph text (CommonMark precedence).
        if p_lines and j < len(lines):
            underline = lines[j].strip()
            if re.fullmatch(r"=+", underline) or (
                re.fullmatch(r"-+", underline) and len(p_lines) == 1
            ):
                level = 1 if underline.startswith("=") else 2
                txt = _inline_text(" ".join(p_lines))
                if txt:
                    elements.append(
                        Element(
                            "header",
                            markdown="\n".join(p_lines + [underline]),
                            text=txt,
                            level=level,
                        )
                    )
                previous_was_break = False
                i = j + 1
                continue
        md_block = "\n".join(p_lines)

        im = _IMAGE_RE.match(md_block.strip())
        if im:
            alt, src = im.group("alt"), im.group("src")
            content = None
            media_type = None
            dm = _DATA_URL_RE.match(src)
            if dm:
                media_type = dm.group("type")
                try:
                    content = base64.b64decode(dm.group("data"), validate=False)
                except Exception:
                    content = None
            elements.append(
                Element(
                    "image",
                    markdown=md_block,
                    text=alt or None,
                    alt_text=alt,
                    media_type=media_type,
                    content=content,
                )
            )
            previous_was_break = False
        else:
            txt = _inline_text(md_block)
            if txt:  # empty-block filter (P1, :63-66)
                kind = "footer" if previous_was_break else "paragraph"
                elements.append(Element(kind, markdown=md_block, text=txt))
            previous_was_break = False
        i = j

    return elements


def elements_to_rows(doc_id: str, elements: list[Element], section_idx: int = 0) -> list[dict]:
    return [
        {
            "doc_id": doc_id,
            "section_idx": section_idx,
            "block_idx": b,
            "parent_path": el.parent_path,
            "kind": el.kind,
            "markdown": el.markdown,
            "text": el.text,
            "level": el.level,
            "alt_text": el.alt_text,
            "media_type": el.media_type,
            "content": el.content,
            "table_cells": el.table_cells,
        }
        for b, el in enumerate(elements)
    ]


def read_markdown_dir(spark, path: str) -> DataFrame:
    """S1: markdown directory scan -> (path, content) rows.

    ``wholetext`` keeps one file per row; ``input_file_name()`` is the
    document identifier (the reference uses the file path,
    ``VectorStoreCommands.cs:60-61``).
    """
    # Spark's text source passes file bytes through unvalidated; dirty
    # corpora with invalid UTF-8 would crash the Arrow conversion into the
    # parse stage. The encode/decode roundtrip validates JVM-side,
    # replacing malformed sequences with U+FFFD.
    return (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(f"{path}/*.md")
        .select(
            F.input_file_name().alias("doc_id"),
            F.decode(F.encode(F.col("value"), "UTF-8"), "UTF-8").alias("content"),
        )
    )


def parse_markdown_df(raw: DataFrame, id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """D1-D5: parse stage as ``mapInPandas`` (Arrow-batched; the parser is
    pure Python per document, so this is the designated Python island —
    filters/projections belong outside it)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                # per-document error isolation (reference semantics,
                # VectorStoreCommands.cs:32-47): one pathological document
                # yields zero elements — reported failed downstream by
                # ingest_corpus(source_doc_ids=...) — never a dead job.
                try:
                    # dirty corpora contain invalid UTF-8 that Spark decodes
                    # to lone surrogates; Arrow refuses to serialize those on
                    # the way back out — normalize to replacement chars.
                    clean = (content or "").encode("utf-8", "replace").decode("utf-8")
                    rows.extend(
                        elements_to_rows(str(doc_id), parse_markdown(str(doc_id), clean))
                    )
                except Exception:
                    continue
            yield pd.DataFrame(
                rows, columns=[f.name for f in ELEMENT_SCHEMA.fields]
            ) if rows else pd.DataFrame(columns=[f.name for f in ELEMENT_SCHEMA.fields])

    return raw.mapInPandas(run, schema=ELEMENT_SCHEMA)
