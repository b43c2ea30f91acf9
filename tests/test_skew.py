"""AQE skew handling: a join with one pathologically hot key must finish
and, under AQE, split the skewed partition (the runtime analogue of the
salting strategy in aggregates.salted_usage)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_skewed_join_completes_and_aqe_splits(spark):
    n = 2_000_000
    # 95% of rows share one key — the hot-tenant shape
    skewed = spark.range(0, n, 1, 32).select(
        F.when(F.col("id") % 20 != 0, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id").cast("string"))
        ).alias("key"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i) for i in range(0, 200, 20)],
        "key string, weight int",
    )
    # force a shuffle join (no broadcast) so skew handling is exercised
    joined = skewed.hint("merge").join(dim.hint("merge"), "key")
    assert joined.count() == 1900000 + 10

    # runtime plan after AQE re-optimization
    plan = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "AdaptiveSparkPlan" in plan

    # the salted aggregation gives identical results on the same skew
    agg = skewed.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    salted = (
        skewed.groupBy("key", F.pmod(F.xxhash64("v"), F.lit(16)).alias("_s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("key")
        .agg(F.sum("n").alias("n"))
    )
    a = {r.key: r.n for r in agg.collect()}
    b = {r.key: r.n for r in salted.collect()}
    assert a == b and a["hot"] == 1900000


def test_salted_distinct_equals_plain(spark):
    """salted_distinct_usage must be EXACTLY distinct_usage: the salt is
    derived from the distinct column, so per-salt distinct counts sum to
    the true per-group count (each value lives in one salt bucket)."""
    from storage_spark.operators.aggregates import (
        distinct_usage,
        salted_distinct_usage,
    )

    n = 200_000
    objects = spark.range(0, n, 1, 16).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot")).otherwise(
            F.concat(F.lit("b"), (F.col("id") % 97).cast("string"))
        ).alias("bucket_id"),
        # duplicate names on purpose: distinct != count
        F.concat(F.lit("n"), (F.col("id") % 50_000).cast("string")).alias(
            "name"
        ),
    )
    plain = {
        r.bucket_id: r.n_distinct for r in distinct_usage(objects).collect()
    }
    for buckets in (1, 16, 32):
        salted = {
            r.bucket_id: r.n_distinct
            for r in salted_distinct_usage(
                objects, salt_buckets=buckets
            ).collect()
        }
        assert salted == plain
    # hot bucket = even ids; even id % 50_000 stays even -> 25_000 values
    assert plain["hot"] == 25_000


def test_sig_bits_for_sizing_rule():
    """Width scales with corpus so banded-join buckets stay bounded —
    the sf1-probe cliff (NOTES_r5) encoded as a function."""
    from storage_spark.operators.dedup import sig_bits_for

    assert sig_bits_for(1_000) == 24
    assert sig_bits_for(50_000) == 48           # the probe's fix
    assert sig_bits_for(10**9) == 60            # BIGINT packing cap
    # bucket target: 50k docs / 2^(48/4 = 12 bits per band) ≈ 12 ≤ 16
    assert 50_000 / 2 ** (48 // 4) <= 16
    # more permitted hamming distance → more (narrower) bands → wider sig
    assert sig_bits_for(50_000, max_hamming=5) >= sig_bits_for(50_000, max_hamming=3)


def test_simhash_default_path_is_corpus_sized(spark):
    """The DEFAULT path (no n_bits) sizes the signature from the corpus —
    the verdict-r5 closure: a 50k-doc corpus must pick >= 48 bits, and
    simhash_near_pairs must band at that width without being told."""
    import pytest

    from storage_spark.operators.dedup import simhash, simhash_near_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(6)],
        "doc_id bigint, text string",
    )
    # n_docs supplied: no count job, width from the rule
    sim = simhash(docs, n_docs=50_000)
    assert sim.schema["simhash"].metadata["sig_bits"] == 48
    # near_pairs reads the width off the column metadata
    pairs = simhash_near_pairs(sim, max_hamming=3)
    assert pairs.columns == ["doc_a", "doc_b", "hamming"]
    pairs.collect()  # plan executes at the derived width

    # n_docs omitted: one cheap count derives the floor width for 6 docs
    sim_small = simhash(docs)
    assert sim_small.schema["simhash"].metadata["sig_bits"] == 16

    # a hand-built signature column has no width metadata -> explicit only
    bare = sim.select("doc", F.col("simhash").cast("bigint").alias("simhash"))
    with pytest.raises(ValueError, match="sig_bits"):
        simhash_near_pairs(bare)
    simhash_near_pairs(bare, sig_bits=48).collect()

    # pinning a width >2x under the rule warns (the measured cliff config)
    with pytest.warns(UserWarning, match="sizing rule"):
        simhash(docs, n_bits=16, n_docs=50_000)


def test_embedding_default_path_is_corpus_sized(spark):
    """embedding_near_dup_pairs' default geometry derives from the corpus:
    small corpora reproduce the old (8, 4); 50k docs pick the measured
    (16, 8); explicit cliff configs warn; half-pinned configs raise."""
    import pytest

    from storage_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_planes_for,
    )

    assert embedding_planes_for(150) == (8, 4)      # old default shape
    assert embedding_planes_for(50_000) == (16, 8)  # the probe's fix
    assert embedding_planes_for(10**9) == (32, 16)  # clamp

    v = spark.createDataFrame(
        [(str(i), [float(i), 1.0, 0.5, float(i % 3)]) for i in range(40)],
        "key string, embedding array<double>",
    )
    derived = embedding_near_dup_pairs(v, max_distance=0.3, dim=4)
    pinned = embedding_near_dup_pairs(
        v, max_distance=0.3, dim=4, n_planes=8, band_size=4
    )
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, pinned.collect())
    )
    with pytest.raises(ValueError, match="BOTH"):
        embedding_near_dup_pairs(v, dim=4, n_planes=8)
    with pytest.warns(UserWarning, match="sizing rule"):
        embedding_near_dup_pairs(
            v, dim=4, n_planes=8, band_size=4, n_docs=50_000
        )


def test_sizing_rules_properties():
    """Property sweep over the two corpus-sizing rules: monotone in
    corpus size, bucket-occupancy bound holds whenever the rule is not
    clamped, and the clamps are exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from storage_spark.operators.dedup import embedding_planes_for, sig_bits_for

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=1, max_value=10**12))
    def check_sig(n):
        bits = sig_bits_for(n)
        assert 16 <= bits <= 60 and bits % 4 == 0
        assert sig_bits_for(n + max(1, n // 7)) >= bits  # monotone
        if bits < 60:  # not clamped -> occupancy bound holds
            # floor division in the rule (n // target) admits up to
            # target + (target-1)/quotient slack -> bound is 2x target
            assert n / 2 ** (bits // 4) <= 2 * 16 or bits == 16

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=1, max_value=10**12))
    def check_planes(n):
        planes, band = embedding_planes_for(n)
        assert planes == 2 * band and 4 <= band <= 16
        assert embedding_planes_for(n + max(1, n // 7))[1] >= band
        if band < 16:  # not clamped -> occupancy bound holds
            assert n / 2**band <= 2 * 200 or band == 4

    check_sig()
    check_planes()
