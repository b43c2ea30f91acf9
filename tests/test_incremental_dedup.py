"""Incremental MinHash LSH: batch-vs-index candidate generation must
equal a full-corpus recompute, and the returned band rows must be
exactly the index append — the monotonic-ingest maintenance contract.
Plus the exact token-percentile profile vs numpy's linear interpolation
(the percentile_cont definition DuckDB's quantile_cont also uses)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from storage_spark.operators.dedup import (
    incremental_minhash_pairs,
    minhash_band_index,
    minhash_lsh_pairs,
)
from storage_spark.operators.pipeline import token_percentiles

KW = dict(n=3, n_hashes=4, band_size=2)


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 120")
        .select("doc_id", "text")
    )


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_incremental_equals_full_recompute(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = docs.filter("doc_id % 5 != 0")
    batch = docs.filter("doc_id % 5 = 0")
    index = minhash_band_index(corpus, **KW)
    got, new_rows = incremental_minhash_pairs(index, batch, **KW)

    full = _pairs(minhash_lsh_pairs(docs, **KW))
    corpus_only = _pairs(minhash_lsh_pairs(corpus, **KW))
    assert _pairs(got) == full - corpus_only
    # appended rows are exactly the batch's band index
    want_rows = minhash_band_index(batch, **KW)
    assert new_rows.exceptAll(want_rows).count() == 0
    assert want_rows.exceptAll(new_rows).count() == 0


def test_index_append_reproduces_full_index(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = docs.filter("doc_id % 5 != 0")
    batch = docs.filter("doc_id % 5 = 0")
    index = minhash_band_index(corpus, **KW)
    _, new_rows = incremental_minhash_pairs(index, batch, **KW)
    merged = index.unionByName(new_rows)
    full = minhash_band_index(docs, **KW)
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_token_percentiles_match_numpy_linear(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probs = (0.25, 0.5, 0.9)
    got = {
        r.lang: r
        for r in token_percentiles(docs, probs=probs).collect()
    }
    from storage_spark.functions.text import lang_id, token_count

    base = docs.select(
        lang_id(F.col("text")).alias("lang"),
        token_count(F.col("text")).alias("t"),
    ).collect()
    by_lang: dict[str, list[int]] = {}
    for r in base:
        by_lang.setdefault(r.lang, []).append(r.t)
    assert set(got) == set(by_lang)
    for lang, vals in by_lang.items():
        want = np.percentile(np.array(vals, dtype=float), [25, 50, 90],
                             method="linear")
        row = got[lang]
        assert row.n_docs == len(vals)
        for col, w in zip(("p25", "p50", "p90"), want):
            assert abs(row[col] - w) < 1e-9, (lang, col, row[col], w)


def test_approx_percentiles_within_rank_tolerance(spark, sf_dir):
    """The 100 TB path: approx_percentile's sketch must land within its
    documented rank error of the exact answer."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probs = (0.5,)
    exact = {
        r.lang: r.p50
        for r in token_percentiles(docs, probs=probs, exact=True).collect()
    }
    approx = {
        r.lang: r.p50
        for r in token_percentiles(docs, probs=probs, exact=False).collect()
    }
    from storage_spark.functions.text import lang_id, token_count

    rows = docs.select(
        lang_id(F.col("text")).alias("lang"),
        token_count(F.col("text")).alias("t"),
    ).collect()
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.t)
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        # accuracy=10000 => rank error <= n/10000; allow one extra rank
        tol = max(1, n // 10000 + 1)
        lo = vals[max(0, n // 2 - tol - 1)]
        hi = vals[min(n - 1, n // 2 + tol + 1)]
        assert lo <= approx[lang] <= hi, (lang, approx[lang], exact[lang])
