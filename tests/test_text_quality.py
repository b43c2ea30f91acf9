"""Within-document repetition signals (Gopher-style filters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from storage_spark.functions.text import (
    duplicate_line_fraction,
    duplicate_ngram_fraction,
)


def test_duplicate_ngram_fraction_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # heavy 2-gram repetition
            (2, "all words unique here now"),
            (3, "x"),                   # shorter than n -> NULL
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            duplicate_ngram_fraction(F.col("text"), 2).alias("d2"),
        ).collect()
    }
    # doc 1 2-grams: [a b, b a, a b, b a, a b] -> 5 total, 2 distinct
    assert abs(out[1].d2 - 3 / 5) < 1e-9
    assert out[2].d2 == 0.0
    assert out[3].d2 is None
    assert out[4].d2 is None


def test_duplicate_line_fraction_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "menu\ncontent one\nmenu\ncontent two\nmenu"),
            (2, "a\n\n  \nb"),   # blank lines ignored
            (3, "\n \n"),        # only blanks -> NULL
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            duplicate_line_fraction(F.col("text")).alias("dl"),
        ).collect()
    }
    # doc 1: 5 lines, 3 distinct -> 2/5 duplicated occurrences
    assert abs(out[1].dl - 2 / 5) < 1e-9
    assert out[2].dl == 0.0
    assert out[3].dl is None


def test_repetition_is_map_only(spark):
    """The scoring must not shuffle: a 100 TB repetition pass is scan +
    project only."""
    docs = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    plan = (
        docs.select(duplicate_ngram_fraction(F.col("text"), 2))
        ._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    )
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode either
