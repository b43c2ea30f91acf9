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


# --------------------------------------------------------------------------
# Incremental substring dedup (batch vs persisted shingle-stats index)
# --------------------------------------------------------------------------

from pyspark.sql import functions as F

from storage_spark.operators.dedup import (
    incremental_substring_spans,
    merge_substring_stats,
    substring_shingle_stats,
)


def _span_set(df):
    return {(r.doc_id, r.span_start, r.span_end) for r in df.collect()}


def test_incremental_equals_recompute_restricted_to_batch(spark):
    shared = _words("dup", 8)
    corpus = _mk(spark, [
        (1, _words("a", 6) + " " + shared),
        (2, _words("b", 12)),
    ])
    batch = _mk(spark, [
        (10, shared + " " + _words("c", 4)),       # matches corpus doc 1
        (11, _words("x", 9) + " " + _words("y", 3)),
        (12, _words("x", 9)),                       # matches doc 11 within batch
    ])
    idx = substring_shingle_stats(corpus, k=5)
    spans, bstats = incremental_substring_spans(idx, batch, k=5)
    from storage_spark.operators.dedup import exact_substring_spans

    full = exact_substring_spans(corpus.unionByName(batch), k=5).filter(
        F.col("doc_id") >= 10
    )
    assert _span_set(spans) == _span_set(full)
    # the batch stats absorb into the index: a SECOND batch re-matching
    # batch-1 content sees it through the index alone
    idx2 = merge_substring_stats(idx.unionByName(bstats))
    batch2 = _mk(spark, [(20, _words("x", 9) + " tail0")])
    spans2, _ = incremental_substring_spans(idx2, batch2, k=5)
    full2 = exact_substring_spans(
        corpus.unionByName(batch).unionByName(batch2), k=5
    ).filter(F.col("doc_id") == 20)
    assert _span_set(spans2) == _span_set(full2)


def test_compaction_is_lossless_and_idempotent(spark):
    docs = _mk(spark, [(1, _words("p", 7)), (2, _words("p", 7)), (3, _words("q", 6))])
    a = substring_shingle_stats(docs.filter("doc_id <= 1"), k=5)
    b = substring_shingle_stats(docs.filter("doc_id = 2"), k=5)
    c = substring_shingle_stats(docs.filter("doc_id = 3"), k=5)
    appended = a.unionByName(b).unionByName(c)
    merged = merge_substring_stats(appended)
    direct = substring_shingle_stats(docs, k=5)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    again = merge_substring_stats(merged)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, merged.collect()))


def test_reingested_doc_does_not_self_match(spark):
    doc = _mk(spark, [(1, _words("s", 9))])
    idx = substring_shingle_stats(doc, k=5)
    spans, _ = incremental_substring_spans(idx, doc, k=5)  # same doc_id
    assert spans.count() == 0
    # but a DIFFERENT doc with the same text does match
    other = _mk(spark, [(2, _words("s", 9))])
    spans2, _ = incremental_substring_spans(idx, other, k=5)
    assert _span_set(spans2) == {(2, 1, 10)}
