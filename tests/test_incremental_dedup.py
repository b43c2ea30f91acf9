"""Incremental MinHash LSH: batch-vs-index candidate generation must
equal a full-corpus recompute, and the returned band rows must be
exactly the index append — the monotonic-ingest maintenance contract.
Plus the exact token-percentile profile vs numpy's linear interpolation
(the percentile_cont definition DuckDB's quantile_cont also uses)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from storage_spark.operators.dedup import (
    band_pair_volume,
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


def test_band_pair_volume_matches_join_pre_distinct(spark, sf_dir):
    """The audit's per-band Σ C(size, 2) must equal the number of
    candidate pairs the (band, sig) self-join emits BEFORE distinct —
    the exact volume the shuffle carries."""
    bands = minhash_band_index(_docs(spark, sf_dir), **KW)
    a = bands.select(F.col("doc").alias("doc_a"), "band", "sig")
    b = bands.select(F.col("doc").alias("doc_b"), "band", "sig")
    want = (
        a.join(b, ["band", "sig"]).filter(F.col("doc_a") < F.col("doc_b")).count()
    )
    vol = band_pair_volume(bands)
    assert vol.agg(F.sum("candidates")).collect()[0][0] == want
    # per-band geometry: n_bands rows, buckets partition the docs
    rows = {r.band: r for r in vol.collect()}
    assert set(rows) == {0, 1}  # n_hashes=4, band_size=2
    n_docs_with_sig = bands.select("doc").distinct().count()
    for r in rows.values():
        assert 1 <= r.max_bucket <= n_docs_with_sig
        assert r.n_buckets <= n_docs_with_sig


def test_band_pair_volume_hand_fixture(spark):
    """Known buckets: band 0 has sizes {3, 2, 1} -> 3+1+0 = 4 candidate
    pairs, max bucket 3; band 1 has one size-4 bucket -> 6 pairs."""
    rows = (
        [("d%d" % i, 0, "x") for i in range(3)]
        + [("e%d" % i, 0, "y") for i in range(2)]
        + [("f", 0, "z")]
        + [("g%d" % i, 1, "w") for i in range(4)]
    )
    bands = spark.createDataFrame(rows, "doc string, band int, sig string")
    got = {r.band: r for r in band_pair_volume(bands).collect()}
    assert (got[0].n_buckets, got[0].max_bucket, got[0].candidates) == (3, 3, 4)
    assert (got[1].n_buckets, got[1].max_bucket, got[1].candidates) == (1, 4, 6)


def test_band_pair_volume_custom_bucket_cols(spark):
    """Generic over the media fingerprint-band shape ((key, band_id,
    band_val) style frames) via bucket_cols."""
    bands = spark.createDataFrame(
        [("a", 7, "s"), ("b", 7, "s"), ("c", 7, "t")],
        "key string, b int, v string",
    )
    [row] = band_pair_volume(bands, bucket_cols=["b", "v"]).collect()
    assert (row.b, row.n_buckets, row.max_bucket, row.candidates) == (7, 2, 2, 1)


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
