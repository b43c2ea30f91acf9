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


def test_term_cooccurrence_counts_and_symmetry(spark):
    from storage_spark.operators.pipeline import term_cooccurrence

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple banana"),
            (3, "banana cherry"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["term_a"], r["term_b"]): r["n_docs"]
        for r in term_cooccurrence(docs).collect()
    }
    assert out[("apple", "banana")] == 2
    assert out[("banana", "cherry")] == 2
    assert out[("apple", "cherry")] == 1
    # canonical orientation only — no (b, a) mirror rows
    assert ("banana", "apple") not in out


def test_term_cooccurrence_cap_bounds_fanout(spark):
    from storage_spark.operators.pipeline import term_cooccurrence

    # one doc with 10 distinct terms; cap at 3 → C(3,2)=3 pairs max
    docs = spark.createDataFrame(
        [(1, " ".join(" ".join([f"t{i}"] * (10 - i)) for i in range(10)))],
        "doc_id long, text string",
    )
    rows = term_cooccurrence(docs, max_terms_per_doc=3).collect()
    assert len(rows) == 3
    # kept terms are the top-3 by tf (t0, t1, t2)
    kept = {t for r in rows for t in (r["term_a"], r["term_b"])}
    assert kept == {"t0", "t1", "t2"}


def test_numeric_histogram_log2_and_linear(spark):
    from storage_spark.operators.aggregates import numeric_histogram

    df = spark.createDataFrame(
        [(0,), (1,), (2,), (3,), (4,), (7,), (8,), (1024,)], "v long"
    )
    log2 = {r["bucket"]: (r["n"], r["min_value"], r["max_value"])
            for r in numeric_histogram(df, "v", mode="log2").collect()}
    assert log2[0] == (1, 0, 0)      # zero → bucket 0
    assert log2[1] == (1, 1, 1)      # 1 = '1' (1 digit)
    assert log2[2] == (2, 2, 3)      # 2,3 = 2 digits
    assert log2[3] == (2, 4, 7)      # 4 and 7 = 3 digits
    assert log2[4] == (1, 8, 8)
    assert log2[11] == (1, 1024, 1024)
    lin = {r["bucket"]: r["n"]
           for r in numeric_histogram(df, "v", mode="linear", lo=0, width=4).collect()}
    assert lin[0] == 4  # 0,1,2,3
    assert lin[1] == 2  # 4,7
    assert lin[2] == 1  # 8
    assert lin[256] == 1

    import pytest

    with pytest.raises(ValueError):
        numeric_histogram(df, "v", mode="sqrt")


def test_column_stats_exact_and_approx(spark):
    from storage_spark.operators.catalog import column_stats

    df = spark.createDataFrame(
        [(i % 100, None if i % 10 == 0 else f"v{i % 7}") for i in range(1000)],
        "a long, b string",
    )
    exact = {r["col_name"]: r for r in column_stats(df, ["a", "b"]).collect()}
    assert exact["a"]["n_rows"] == 1000
    assert exact["a"]["n_distinct"] == 100
    assert exact["a"]["n_nulls"] == 0
    assert exact["b"]["n_nulls"] == 100
    assert exact["b"]["n_distinct"] == 7  # countDistinct ignores nulls
    assert exact["a"]["min_value"] == "0" and exact["a"]["max_value"] == "99"
    approx = {
        r["col_name"]: r["n_distinct"]
        for r in column_stats(df, ["a", "b"], exact_ndv=False).collect()
    }
    # HLL default rsd = 5%: generous 15% acceptance band
    assert abs(approx["a"] - 100) <= 15
    assert abs(approx["b"] - 7) <= 2
