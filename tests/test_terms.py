"""term_stats / top_terms (storage_spark/operators/pipeline.py) — TF-IDF
keyword extraction with the integer-exact ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

from storage_spark.operators.pipeline import term_stats, top_terms


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "Alpha beta beta gamma"),
            (2, "alpha   alpha gamma"),  # runs of whitespace = one split
            (3, "gamma delta"),
        ],
        "doc_id long, text string",
    )


def test_term_stats_counts(spark):
    tf, df_ = term_stats(_docs(spark))
    tfm = {(r["doc_id"], r["term"]): r["tf"] for r in tf.collect()}
    assert tfm[(1, "beta")] == 2
    assert tfm[(2, "alpha")] == 2  # lowercased: 'Alpha' == 'alpha'
    assert tfm[(1, "alpha")] == 1
    dfm = {r["term"]: r["df"] for r in df_.collect()}
    # df counts DOCUMENTS containing the term, not occurrences
    assert dfm == {"alpha": 2, "beta": 1, "gamma": 3, "delta": 1}


def test_top_terms_ranking_and_tiebreaks(spark):
    out = top_terms(_docs(spark), k=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["rnk"], r["term"], r["tf"], r["df"])
        )
    # doc 1: beta tf=2 first; then alpha vs gamma tie on tf=1 → lower df
    # (alpha df=2 < gamma df=3) wins rank 2
    assert sorted(by_doc[1]) == [(1, "beta", 2, 1), (2, "alpha", 1, 2)]
    # doc 3: delta (df=1) outranks gamma (df=3) at equal tf=1
    assert sorted(by_doc[3]) == [(1, "delta", 1, 1), (2, "gamma", 1, 3)]


def test_top_terms_k_cap_and_empty_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "  x  "), (2, "")], "doc_id long, text string"
    )
    rows = top_terms(docs, k=5).collect()
    # doc 2 yields no terms at all; doc 1's surrounding whitespace is dropped
    assert {(r["doc_id"], r["term"]) for r in rows} == {(1, "x")}


def test_top_terms_broadcast_plan(spark):
    plan = (
        top_terms(_docs(spark), k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # shuffle-vocab mode: no broadcast forced
    plan2 = (
        top_terms(_docs(spark), k=2, broadcast_vocab=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan2
