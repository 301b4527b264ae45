"""Golden tests for the markdown parser (D1-D5 semantics,
MarkdownParser.cs branch coverage per FIXTURES.md §1.2)."""

from __future__ import annotations

import base64

from dataingestionplayground_spark.sources.markdown import parse_markdown


def kinds(els):
    return [e.kind for e in els]


def test_header_and_paragraphs():
    els = parse_markdown(
        "d", "# Title\n\nPara one.\n\nPara two line a.\npara two line b.\n"
    )
    assert kinds(els) == ["header", "paragraph", "paragraph"]
    assert els[0].level == 1 and els[0].text == "Title"
    assert els[2].text == "Para two line a.\npara two line b."


def test_footer_after_thematic_break():
    # MarkdownParser.cs:48-56,102-105: paragraph right after a break -> footer
    els = parse_markdown("d", "Para.\n\n---\n\nThe footer.\n\nNormal again.\n")
    assert kinds(els) == ["paragraph", "footer", "paragraph"]
    assert els[1].text == "The footer."


def test_break_variants_and_no_footer_for_header():
    els = parse_markdown("d", "***\n\n# H\n\ntext\n")
    assert kinds(els) == ["header", "paragraph"]  # header clears the flag


def test_image_data_url_decoded():
    payload = b"\x89PNG fake"
    md = f"![alt text](data:image/png;base64,{base64.b64encode(payload).decode()})\n"
    els = parse_markdown("d", md)
    assert kinds(els) == ["image"]
    assert els[0].alt_text == "alt text"
    assert els[0].media_type == "image/png"
    assert els[0].content == payload


def test_image_plain_url_no_decode():
    els = parse_markdown("d", "![alt](http://x/y.png)\n")
    assert els[0].kind == "image"
    assert els[0].media_type is None and els[0].content is None


def test_table_grid_and_bogus_first_row():
    md = (
        "| a | b |\n| --- | --- |\n| 1 | 2 |\n"
        "\n"
        "|   |   |\n| --- | --- |\n| x | y |\n"
    )
    els = parse_markdown("d", md)
    assert kinds(els) == ["table", "table"]
    assert els[0].table_cells == [["a", "b"], ["1", "2"]]
    # MarkItDown blank header row skipped (MarkdownParser.cs:278-296)
    assert els[1].table_cells == [["x", "y"]]


def test_table_colspan_expansion():
    md = "| wide | x |\n| --- | --- |\n| spans |\n"
    els = parse_markdown("d", md)
    # short row padded by repeating the spanning cell (:265-269)
    assert els[0].table_cells == [["wide", "x"], ["spans", "spans"]]


def test_list_flattened_with_parent_path():
    els = parse_markdown("d", "- one\n- two\n  continued\n- *three*\n")
    assert kinds(els) == ["section", "paragraph", "paragraph", "paragraph"]
    assert els[1].parent_path == [0]
    assert els[2].text == "two continued"
    assert els[3].text == "three"  # inline emphasis stripped


def test_quote_recursion():
    els = parse_markdown("d", "> outer quote\n> # quoted heading\n")
    assert els[0].kind == "section"
    sub_kinds = kinds(els[1:])
    assert "paragraph" in sub_kinds and "header" in sub_kinds
    assert all(e.parent_path == [0] for e in els[1:])


def test_empty_blocks_dropped_and_linkrefs_skipped():
    els = parse_markdown("d", "   \n\n[ref]: http://x\n\nreal text\n")
    assert kinds(els) == ["paragraph"]
    assert els[0].text == "real text"


def test_fenced_code():
    els = parse_markdown("d", "```\ncode body\n```\n")
    assert kinds(els) == ["code"]
    assert els[0].text == "code body"


def test_order_preserved():
    md = "# T\n\np1\n\n| a |\n| --- |\n| 1 |\n\np2\n"
    els = parse_markdown("d", md)
    assert kinds(els) == ["header", "paragraph", "table", "paragraph"]


def test_setext_headers():
    els = parse_markdown("d", "Main Title\n===\n\nSub Title\n---\n\nbody text\n")
    assert kinds(els) == ["header", "header", "paragraph"]
    assert (els[0].text, els[0].level) == ("Main Title", 1)
    assert (els[1].text, els[1].level) == ("Sub Title", 2)


def test_setext_vs_thematic_break_precedence():
    # underline directly after text = setext H2; isolated --- = break
    els = parse_markdown("d", "Heading\n---\n\npara\n\n---\n\nfooter after break\n")
    assert kinds(els) == ["header", "paragraph", "footer"]
    assert els[0].level == 2


def test_task_list_markers_stripped():
    els = parse_markdown("t.md", "- [ ] open item\n- [x] done item\n- plain item")
    texts = [e.text for e in els if e.kind == "paragraph"]
    assert texts == ["open item", "done item", "plain item"]
    assert not any("[x]" in (t or "") or "[ ]" in (t or "") for t in texts)


def test_footnote_definition_and_reference():
    doc = (
        "Some claim[^1] in a paragraph.\n"
        "\n"
        "[^1]: The footnote body\n"
        "    with a continuation line.\n"
        "\n"
        "After.\n"
    )
    els = parse_markdown("f.md", doc)
    kinds = [e.kind for e in els]
    assert kinds == ["paragraph", "footnote", "paragraph"]
    # inline reference stripped from the paragraph text
    assert els[0].text == "Some claim in a paragraph."
    assert els[1].text == "The footnote body with a continuation line."
    # plain linkref definitions are still skipped, not footnotes
    els2 = parse_markdown("l.md", "[ref]: https://example.com\n\ntext")
    assert [e.kind for e in els2] == ["paragraph"]


def test_definition_list():
    doc = (
        "Intro paragraph.\n"
        "\n"
        "Apple\n"
        ":   A red fruit\n"
        ":   A tech company\n"
        "\n"
        "Orange\n"
        ":   A citrus fruit\n"
        "    with a continuation.\n"
        "\n"
        "After.\n"
    )
    els = parse_markdown("d.md", doc)
    kinds = [e.kind for e in els]
    assert kinds == [
        "paragraph",
        "section",
        "definition_term",
        "definition",
        "definition",
        "definition_term",
        "definition",
        "paragraph",
    ]
    sec = kinds.index("section")
    assert els[2].text == "Apple" and els[2].parent_path == [sec]
    assert els[3].text == "A red fruit"
    assert els[4].text == "A tech company"
    assert els[5].text == "Orange"
    assert els[6].text == "A citrus fruit with a continuation."
    assert els[7].text == "After."


def test_definition_list_term_after_paragraph_lines():
    # the term directly follows paragraph text: the paragraph must not
    # swallow it (CommonMark lazy-continuation vs deflist precedence)
    doc = "Some text\nTerm\n: def one\n"
    els = parse_markdown("d2.md", doc)
    assert [e.kind for e in els] == ["paragraph", "section", "definition_term", "definition"]
    assert els[0].text == "Some text"
    assert els[2].text == "Term" and els[3].text == "def one"
    # an orphan ':' line with no term stays paragraph text
    els2 = parse_markdown("d3.md", ": just a colon line\n")
    assert [e.kind for e in els2] == ["paragraph"]


def test_autolinks_reduce_to_url_text():
    els = parse_markdown(
        "a.md",
        "See <https://example.com/x?a=1> and mail <bob@example.com>.\n",
    )
    assert [e.kind for e in els] == ["paragraph"]
    assert els[0].text == "See https://example.com/x?a=1 and mail bob@example.com."
    # inside list items too
    els2 = parse_markdown("a2.md", "- link <http://spark.apache.org> here\n")
    texts = [e.text for e in els2 if e.kind == "paragraph"]
    assert texts == ["link http://spark.apache.org here"]


def test_grid_table_golden():
    """Markdig GridTableExtension: +---+ rules delimit rows, '=' rule
    marks the header, multi-line cells join with spaces — same table
    element as pipe tables (MarkdownParser.cs:87 maps both to
    IngestionDocumentTable)."""
    md = "\n".join(
        [
            "+---------+---------+",
            "| Name    | Role    |",
            "+=========+=========+",
            "| Ada     | Eng     |",
            "+---------+---------+",
            "| Grace   | Admiral |",
            "| (ret.)  |         |",
            "+---------+---------+",
        ]
    )
    els = parse_markdown("g.md", md)
    assert [e.kind for e in els] == ["table"]
    assert els[0].table_cells == [
        ["Name", "Role"],
        ["Ada", "Eng"],
        ["Grace (ret.)", "Admiral"],
    ]


def test_grid_table_between_paragraphs_and_lone_rule_is_not_a_table():
    md = "before\n\n+-----+-----+\n| a   | b   |\n+-----+-----+\n\nafter"
    els = parse_markdown("g2.md", md)
    assert [e.kind for e in els] == ["paragraph", "table", "paragraph"]
    assert els[1].table_cells == [["a", "b"]]
    # a bare horizontal +---+ with no cell rows falls through to paragraph
    lone = parse_markdown("g3.md", "+---+---+\n")
    assert [e.kind for e in lone] == ["paragraph"]


def test_pipe_table_immediately_after_grid_table_stays_separate():
    """The grid scan ends at the LAST +---+ rule: a pipe table directly
    below (no blank line) must parse as its own table, not be swallowed
    as extra grid body rows."""
    md = "\n".join(
        [
            "+-----+-----+",
            "| a   | b   |",
            "+-----+-----+",
            "| x | y |",
            "|---|---|",
            "| 1 | 2 |",
        ]
    )
    els = parse_markdown("g4.md", md)
    assert [e.kind for e in els] == ["table", "table"]
    assert els[0].table_cells == [["a", "b"]]
    assert els[1].table_cells == [["x", "y"], ["1", "2"]]


def test_math_block_golden():
    """Markdig MathExtension ($$ fences): the LaTeX body becomes a 'math'
    element, inline $x$ stays paragraph text."""
    md = "intro\n\n$$\nE = mc^2 \\\\\n\\int_0^1 x\\,dx\n$$\n\nuses $x$ inline"
    els = parse_markdown("m.md", md)
    assert [e.kind for e in els] == ["paragraph", "math", "paragraph"]
    assert els[1].text == "E = mc^2 \\\\\n\\int_0^1 x\\,dx"
    assert els[1].markdown.startswith("$$") and els[1].markdown.endswith("$$")
    assert els[2].text == "uses $x$ inline"
    # unclosed fence: body still captured, parser does not loop
    els2 = parse_markdown("m2.md", "$$\nx+y\n")
    assert [e.kind for e in els2] == ["math"]
    assert els2[0].text == "x+y"


def test_figure_block_with_caption():
    """Markdig FigureExtension: ^^^ fences -> section + children +
    figure_caption leaf (caption on the closing fence)."""
    md = "^^^\n![alt](data:text/plain;base64,aGk=)\n\nnote text\n^^^ The **caption**\n\nafter"
    els = parse_markdown("f.md", md)
    kinds = [e.kind for e in els]
    assert kinds == ["section", "image", "paragraph", "figure_caption", "paragraph"]
    assert els[3].text == "The caption"
    assert els[3].parent_path == [0]
    assert els[1].parent_path == [0] and els[2].parent_path == [0]
    assert els[4].parent_path == []  # 'after' is top-level


def test_figure_unclosed_and_caption_on_open_fence():
    els = parse_markdown("f2.md", "^^^ open caption\ncontent line\n")
    assert [e.kind for e in els] == ["section", "paragraph", "figure_caption"]
    assert els[2].text == "open caption"


def test_diagram_fence_kind():
    """Markdig DiagramExtension claims mermaid/nomnoml fences."""
    md = "```mermaid\ngraph TD; A-->B;\n```\n\n```python\nx = 1\n```"
    els = parse_markdown("d.md", md)
    assert [e.kind for e in els] == ["diagram", "code"]
    assert els[0].text == "graph TD; A-->B;"


def test_inline_citation_reduces_to_cited_text():
    els = parse_markdown("c.md", 'He said ""to be or not"" loudly.\n')
    assert [e.kind for e in els] == ["paragraph"]
    assert els[0].text == "He said to be or not loudly."
