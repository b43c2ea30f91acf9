"""HTML → text extraction (functions/htmltext.py): pure-core semantics on
hand-built pages (nesting, entities, malformed markup, CDATA drops, link
density), the Arrow stage's schema/explode plumbing, and the staged driver
pair through the identical assert_parity gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storage_spark.functions.htmltext import (
    explode_html_lines,
    extract_html_text,
    html_text_blocks,
)


def test_blocks_basic_page():
    title, lines = html_text_blocks(
        "<html><head><title> My  Page &amp; Co </title></head>"
        "<body><h1>Head&#233;r</h1><p>First <b>bold</b> text</p>"
        "<div><p>   spaced   out   </p></div></body></html>"
    )
    assert title == "My Page & Co"
    assert lines == [
        ("Headér", 0),
        ("First bold text", 0),
        ("spaced out", 0),
    ]


def test_script_style_template_and_comments_dropped():
    title, lines = html_text_blocks(
        "<body><script>if (a<b && c>d) { alert(\"<p>no</p>\"); }</script>"
        "<style>p > a { color: red; }</style>"
        "<template><p>ghost</p></template>"
        "<!-- comment <p>nope</p> --><p>kept</p></body>"
    )
    assert lines == [("kept", 0)]


def test_inline_tags_do_not_split_lines():
    _, lines = html_text_blocks(
        "<p>a <b>b</b> <i>c</i> <span>d</span>&amp;<code>e</code></p>"
    )
    assert lines == [("a b c d&e", 0)]


def test_block_tags_split_lines_and_br_flushes():
    _, lines = html_text_blocks("<div>one<br>two<hr/>three</div>")
    assert [ln for ln, _ in lines] == ["one", "two", "three"]


def test_link_density_milli():
    _, lines = html_text_blocks(
        "<ul><li><a href='/'>Home</a></li>"
        "<li>half <a href='x'>link</a></li>"
        "<li>no links at all here</li></ul>"
    )
    assert lines == [
        ("Home", 1000),
        # "halflink" non-ws = 8, inside <a> = 4
        ("half link", 500),
        ("no links at all here", 0),
    ]


def test_malformed_markup_degrades_gracefully():
    # unclosed tags never raise; flushed lines are unaffected
    _, lines = html_text_blocks("<p>unclosed <b>bold")
    assert lines == [("unclosed bold", 0)]
    _, lines = html_text_blocks("</p>stray close<p>after</p>")
    assert [ln for ln, _ in lines] == ["stray close", "after"]
    # nested <a> inside a dropped subtree contributes nothing
    _, lines = html_text_blocks("<script><a>x</a></script><p>ok</p>")
    assert lines == [("ok", 0)]


def test_empty_and_none_inputs():
    assert html_text_blocks("") == (None, [])
    assert html_text_blocks(None) == (None, [])
    assert html_text_blocks("<p>   </p>") == (None, [])


def test_first_title_wins_and_title_is_not_a_line():
    title, lines = html_text_blocks(
        "<title>One</title><title>Two</title><p>body</p>"
    )
    assert title == "One"
    assert [ln for ln, _ in lines] == ["body"]


def test_loose_text_flushes_at_document_end():
    _, lines = html_text_blocks("<body><p>a</p>trailing loose")
    assert [ln for ln, _ in lines] == ["a", "trailing loose"]


def test_extract_stage_schema_and_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "<title>T</title><p>hello</p><p><a href='x'>nav</a></p>"),
         (2, None)],
        "id int, html string",
    )
    out = extract_html_text(df, "html").collect()
    byid = {r.id: r for r in out}
    assert byid[1].extracted.title == "T"
    assert [(l.line, l.link_density_milli)
            for l in byid[1].extracted.lines] == [("hello", 0), ("nav", 1000)]
    assert byid[2].extracted.lines == []


def test_explode_lines_numbering_and_boilerplate_filter(spark):
    df = spark.createDataFrame(
        [(1, "<p>keep one</p><p><a href='x'>NAVNAV</a></p><p>keep two</p>")],
        "id int, html string",
    )
    all_lines = explode_html_lines(df, "html").collect()
    assert [(r.line_no, r.line, r.link_density_milli) for r in all_lines] == [
        (1, "keep one", 0), (2, "NAVNAV", 1000), (3, "keep two", 0),
    ]
    kept = explode_html_lines(df, "html", max_link_density_milli=500)
    assert [r.line for r in kept.collect()] == ["keep one", "keep two"]
    # line_no keeps DOCUMENT order (assigned before the filter)
    assert [r.line_no for r in kept.collect()] == [1, 3]


def test_extraction_feeds_line_dedup_shape(spark):
    """The exploded frame slots straight into the line-level gates: a
    groupBy on (normalized line) over the extracted lines — the CCNet
    pre-filter composition the operator exists for."""
    df = spark.createDataFrame(
        [(1, "<p>Shared Line</p><p>only here</p>"),
         (2, "<p>shared   line</p><p><a href='x'>nav</a></p>")],
        "id int, html string",
    )
    lines = explode_html_lines(df, "html", max_link_density_milli=500)
    counts = (
        lines.groupBy(F.lower(F.col("line")).alias("norm"))
        .count().orderBy("norm").collect()
    )
    assert [(r.norm, r["count"]) for r in counts] == [
        ("only here", 1), ("shared line", 2),
    ]


def test_html_extract_text_staged_driver_pair_hash_matches(spark, sf_dir):
    """The staged-for-r13 driver pair (q_html_extract_text /
    _oracle_html_extract_text) must pass the IDENTICAL gate the driver
    runs — generation-rule replay over the documents table — so
    registering it is a two-line diff when a window slot opens."""
    import __spark_entry__ as entry_mod
    from tests.parity import assert_parity

    assert_parity(
        entry_mod.q_html_extract_text(spark, sf_dir),
        entry_mod._oracle_html_extract_text(),
        sf_dir,
        "html_extract_text_staged",
    )
