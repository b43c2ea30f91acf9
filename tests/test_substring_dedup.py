"""Exact substring dedup (Lee et al. 2022): planted verbatim spans must be
found with exact token boundaries; sub-threshold and within-doc-only repeats
must not."""

from __future__ import annotations

from storage_spark.operators.dedup import (
    exact_substring_spans,
    strip_duplicate_spans,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_span_found_with_exact_boundaries(spark):
    shared = _words("dup", 7)  # 7 shared tokens, k=5
    docs = _mk(
        spark,
        [
            (1, _words("a", 4) + " " + shared + " " + _words("b", 3)),
            (2, _words("c", 10) + " " + shared + " " + _words("d", 6)),
        ],
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in exact_substring_spans(docs, k=5).collect()
    }
    # doc 1: shared run occupies tokens 5..11 (1-based), span_end exclusive 12
    # doc 2: tokens 11..17, span_end 18
    assert spans == {(1, 5, 12), (2, 11, 18)}


def test_run_shorter_than_k_not_reported(spark):
    shared = _words("dup", 4)  # 4 < k=5
    docs = _mk(
        spark,
        [
            (1, _words("a", 6) + " " + shared),
            (2, _words("c", 9) + " " + shared),
        ],
    )
    assert exact_substring_spans(docs, k=5).count() == 0


def test_within_doc_repeat_alone_does_not_count(spark):
    run = _words("r", 6)
    docs = _mk(
        spark,
        [
            (1, run + " x0 x1 " + run),  # repeats only within doc 1
            (2, _words("z", 12)),
        ],
    )
    assert exact_substring_spans(docs, k=5).count() == 0


def test_adjacent_matches_merge_into_one_span(spark):
    # identical docs: every position matches; must merge to ONE full span
    text = _words("w", 20)
    docs = _mk(spark, [(1, text), (2, text)])
    out = exact_substring_spans(docs, k=5).collect()
    assert {(r.doc_id, r.span_start, r.span_end) for r in out} == {
        (1, 1, 21),
        (2, 1, 21),
    }


def test_two_disjoint_spans_stay_separate(spark):
    s1, s2 = _words("p", 5), _words("q", 5)
    docs = _mk(
        spark,
        [
            (1, s1 + " " + _words("a", 8) + " " + s2),
            (2, s1 + " " + _words("b", 9) + " " + s2),
        ],
    )
    out = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in exact_substring_spans(docs, k=5).collect()
    )
    assert out == [(1, 1, 6), (1, 14, 19), (2, 1, 6), (2, 15, 20)]


def test_strip_removes_all_copies_and_keeps_rest(spark):
    shared = _words("dup", 6)
    d1 = _words("a", 3) + " " + shared + " " + _words("b", 2)
    d2 = shared + " " + _words("c", 5)
    d3 = _words("z", 7)  # untouched doc, no span row
    docs = _mk(spark, [(1, d1), (2, d2), (3, d3)])
    spans = exact_substring_spans(docs, k=5)
    out = {r.doc_id: r for r in strip_duplicate_spans(docs, spans).collect()}
    assert out[1].text == _words("a", 3) + " " + _words("b", 2)
    assert out[1].n_tokens_removed == 6
    assert out[2].text == _words("c", 5)
    assert out[2].n_tokens_removed == 6
    assert out[3].text == d3 and out[3].n_tokens_removed == 0


def test_short_docs_produce_no_shingles(spark):
    docs = _mk(spark, [(1, "one two"), (2, "one two")])
    assert exact_substring_spans(docs, k=5).count() == 0
