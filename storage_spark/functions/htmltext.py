"""HTML → text extraction for web-corpus ingestion.

Not part of the reference's surface (extension, SURVEY §7.10) — this is
the FIRST stage of every real pretraining pipeline (CCNet / RefinedWeb
start at WARC/WET: boilerplate-stripped block text long before any dedup
or quality operator downstream of here runs). Dependency-free by design:
stdlib ``html.parser`` only, packaged as an Arrow-batched ``mapInPandas``
stage exactly like the media codecs (multimodal.py), so the Spark side —
schema, batching, partition parallelism — is the real production shape
and any faster native extractor can replace the pure-Python core later
without touching the plan.

Semantics (deliberately small, fully specified, oracle-replayable):

- ``script`` / ``style`` / ``template`` subtrees and comments are dropped
  (HTMLParser gives script/style content as raw CDATA — never emitted).
- Block-level tags (``p div h1..h6 li ul ol br hr table tr blockquote
  pre section article header footer nav aside main figure figcaption
  dl dt dd form title body``) flush the pending text run as one LINE;
  inline tags (``a b i em strong span code small sub sup u``) do not
  split lines.
- Character/entity references decode (``convert_charrefs``); whitespace
  inside a line collapses to single spaces and is trimmed (``pre`` is
  NOT special-cased — documented simplification).
- ``<title>`` text is extracted separately as document metadata, not a
  body line.
- Per line, ``link_density_milli`` = floor(1000 × non-whitespace chars
  inside ``<a>`` / non-whitespace chars total) — the classic boilerplate
  signal (nav/footer link walls score ~1000, prose ~0); collapse-
  invariant because whitespace is excluded from both counts. Feed it to
  the existing line_dedup / quality gates as a pre-filter.

100 TB story: extraction is embarrassingly parallel — one Arrow map-only
stage, no shuffle, no model, bounded memory per batch row (the parser is
a streaming event handler, not a DOM). Downstream line-level ops consume
the exploded (doc, line_no, line, density) frame exactly like
line_dedup's input.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Tags whose entire content is dropped.
_DROP_TAGS = {"script", "style", "template"}

#: Tags that terminate the pending text run (open OR close).
_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "br", "hr", "table", "tr", "blockquote", "pre", "section", "article",
    "header", "footer", "nav", "aside", "main", "figure", "figcaption",
    "dl", "dt", "dd", "form", "title", "body", "html", "head",
}


class _BlockExtractor(HTMLParser):
    """Streaming extractor: accumulates text runs, flushes a line at every
    block boundary, counts non-whitespace chars inside <a> for the link-
    density signal. Event-driven — malformed nesting degrades gracefully
    (an unclosed tag just never decrements its depth counter, it cannot
    corrupt already-flushed lines)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.lines: list[tuple[str, int]] = []
        self.title: str | None = None
        self._parts: list[str] = []
        self._link_nonws = 0
        self._total_nonws = 0
        self._drop_depth = 0
        self._a_depth = 0
        self._in_title = False
        self._title_parts: list[str] = []

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            total = self._total_nonws
            dens = (1000 * self._link_nonws) // total if total else 0
            self.lines.append((text, dens))
        self._parts = []
        self._link_nonws = 0
        self._total_nonws = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if tag == "a":
            self._a_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag == "title":
                self._in_title = True

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in _BLOCK_TAGS:
            if tag == "title":
                if self._in_title and self.title is None:
                    self.title = " ".join(
                        "".join(self._title_parts).split()
                    )
                self._in_title = False
            self._flush()

    def handle_startendtag(self, tag, attrs):
        # <br/>, <hr/> — block boundary, no depth bookkeeping needed.
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        if self._in_title:
            self._title_parts.append(data)
            return
        self._parts.append(data)
        nonws = sum(1 for c in data if not c.isspace())
        self._total_nonws += nonws
        if self._a_depth:
            self._link_nonws += nonws

    def close(self):
        super().close()
        self._flush()


def html_text_blocks(html: str) -> tuple[str | None, list[tuple[str, int]]]:
    """Pure-Python core: (title, [(line, link_density_milli), ...]) in
    document order. Safe on malformed input — HTMLParser never raises on
    bad nesting; a None/empty document yields (None, [])."""
    if not html:
        return None, []
    p = _BlockExtractor()
    p.feed(html)
    p.close()
    return p.title, p.lines


#: Output struct for the per-document extraction stage.
EXTRACTED_TYPE = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("lines", T.ArrayType(T.StructType([
        T.StructField("line", T.StringType()),
        T.StructField("link_density_milli", T.IntegerType()),
    ]))),
])


def extract_html_text(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted"
) -> DataFrame:
    """Add ``out_col`` = struct(title, lines[(line, link_density_milli)])
    extracted from ``html_col``. Arrow-batched mapInPandas (the codec
    stage shape, multimodal.py:149) — all input columns pass through."""
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(out_col, EXTRACTED_TYPE)]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            extracted = []
            for h in pdf[html_col]:
                title, lines = html_text_blocks(h)
                extracted.append({
                    "title": title,
                    "lines": [
                        {"line": ln, "link_density_milli": d}
                        for ln, d in lines
                    ],
                })
            pdf = pdf.copy()
            pdf[out_col] = extracted
            yield pdf

    return df.mapInPandas(_batches, out_schema)


def explode_html_lines(
    df: DataFrame,
    html_col: str = "html",
    max_link_density_milli: int | None = None,
) -> DataFrame:
    """Exploded line frame: input columns (minus the html) + ``title``,
    ``line_no`` (1-based document order), ``line``,
    ``link_density_milli``. Optionally drop boilerplate lines above a
    link-density threshold — the CCNet-style pre-filter feeding
    line_dedup / quality gates."""
    ex = extract_html_text(df, html_col, "_extracted")
    keep = [c for c in df.columns if c != html_col]
    out = ex.select(
        *keep,
        F.col("_extracted.title").alias("title"),
        F.posexplode("_extracted.lines").alias("_pos", "_line"),
    ).select(
        *keep,
        "title",
        (F.col("_pos") + F.lit(1)).cast("int").alias("line_no"),
        F.col("_line.line").alias("line"),
        F.col("_line.link_density_milli").alias("link_density_milli"),
    )
    if max_link_density_milli is not None:
        out = out.filter(
            F.col("link_density_milli") <= max_link_density_milli
        )
    return out
