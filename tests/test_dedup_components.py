"""Connected-components dedup: transitive closure over pair chains,
singleton handling, and convergence beyond one propagation round."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storage_spark.operators.dedup import dedup_components

ALGOS = ["label", "star"]


def _components(spark, pairs, nodes=None, algorithm="label", **kw):
    pdf = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    ndf = (
        spark.createDataFrame([(n,) for n in nodes], "doc bigint")
        if nodes is not None
        else None
    )
    out = dedup_components(pdf, nodes=ndf, algorithm=algorithm, **kw)
    return {r["doc"]: r["component"] for r in out.collect()}


@pytest.mark.parametrize("algo", ALGOS)
def test_path_graph_needs_multiple_rounds(spark, algo):
    # 1-2, 2-3, 3-4, 4-5: a path — label 1 must travel 4 hops
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], algorithm=algo)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


@pytest.mark.parametrize("algo", ALGOS)
def test_disjoint_clusters_and_singletons(spark, algo):
    got = _components(
        spark,
        [(10, 11), (11, 12), (20, 21)],
        nodes=[10, 11, 12, 20, 21, 30],
        algorithm=algo,
    )
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30}


@pytest.mark.parametrize("algo", ALGOS)
def test_orientation_does_not_matter(spark, algo):
    # pair order reversed relative to min: closure still finds min id
    got = _components(spark, [(5, 9), (2, 9)], algorithm=algo)
    assert got == {2: 2, 5: 2, 9: 2}


def test_star_matches_label_on_random_graphs(spark):
    """Property: large-star/small-star contraction and min-label propagation
    produce identical component labels on arbitrary graphs (mix of chains,
    cliques, singletons). Fixed seed keeps it deterministic."""
    import random

    rng = random.Random(20260813)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 45))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        nodes = list(range(n))
        got_label = _components(spark, edges or [(0, 1)], nodes=nodes)
        got_star = _components(spark, edges or [(0, 1)], nodes=nodes, algorithm="star")
        assert got_star == got_label, f"trial {trial}: {edges}"


def test_long_chain_exhaustion_raises_not_silently_wrong(spark):
    """A path longer than max_iterations hops must RAISE under label
    propagation (unconverged labels silently split clusters); the star
    path converges in O(log n) rounds on the same budget."""
    chain = [(i, i + 1) for i in range(1, 9)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _components(spark, chain, max_iterations=2)
    got = _components(spark, chain, algorithm="star", max_iterations=6)
    assert set(got.values()) == {1}


def test_unknown_algorithm_rejected(spark):
    with pytest.raises(ValueError, match="unknown algorithm"):
        _components(spark, [(1, 2)], algorithm="bogus")


def test_hot_band_bucket_cap(spark):
    """max_band_df drops degenerate band buckets (quadratic-join guard):
    many near-identical docs share one band value; capping removes their
    pairs while unrelated-but-similar pairs in small buckets survive."""
    from storage_spark.operators.dedup import minhash_lsh_pairs

    clones = [(i, "common boilerplate text repeated in every document") for i in range(20)]
    pair = [
        (100, "a unique sentence about distributed query planning"),
        (101, "a unique sentence about distributed query planning too"),
    ]
    docs = spark.createDataFrame(clones + pair, "doc_id long, text string")
    uncapped = minhash_lsh_pairs(docs, n=3, n_hashes=8, band_size=2)
    capped = minhash_lsh_pairs(docs, n=3, n_hashes=8, band_size=2, max_band_df=10)
    assert uncapped.count() > capped.count()
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (100, 101) in got  # small-bucket pair survives the cap
    assert not any(a < 20 and b < 20 for a, b in got)  # clone cluster dropped


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing's core property: two documents sharing a run of at least
    n + window - 1 = 6 words have at least one common fingerprint; short
    docs yield none."""
    from storage_spark.functions.text import winnowing_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "prefix words alpha beta gamma delta epsilon zeta suffix"),
            (3, "entirely unrelated content with no overlap whatsoever here"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    fps = {
        r.doc_id: set(r.fps)
        for r in docs.select(
            "doc_id",
            winnowing_fingerprints(F.col("text"), n=3, window=4).alias("fps"),
        ).collect()
    }
    assert fps[1] & fps[2]  # shared 7-word run -> common fingerprint
    assert not (fps[1] & fps[3])
    assert fps[4] == set()  # < n + window - 1 words


def test_banding_sweep(spark):
    from storage_spark.operators.dedup import band_threshold, banding_sweep

    # analytic S-curve: more bands -> lower threshold; wider bands -> higher
    assert band_threshold(8, 2) < band_threshold(8, 4)
    assert abs(band_threshold(16, 4) - (1 / 4) ** (1 / 4)) < 1e-9
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    sweep = banding_sweep(docs, [(8, 2), (8, 4)])
    assert [s["n_bands"] for s in sweep] == [4, 2]
    # the looser config (more bands, lower threshold) finds >= as many pairs
    assert sweep[0]["candidate_pairs"] >= sweep[1]["candidate_pairs"]
    # the near-identical pair is caught by the loose config
    assert sweep[0]["candidate_pairs"] >= 1


def test_decontaminate_flags_benchmark_overlap(spark):
    """Docs sharing >= min_hits distinct n-grams with the benchmark are
    flagged; clean docs and sub-n docs get n_hits = 0."""
    from storage_spark.operators.pipeline import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence with no overlap at all"),
            (3, "quick brown fox but only this fragment matches here"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in decontaminate(docs, bench, n=3, min_hits=2).collect()
    }
    # doc 1 shares 'the quick brown','quick brown fox','brown fox jumps'
    assert got[1][0] == 3 and got[1][1]
    assert got[2] == (0, False)
    assert got[3] == (1, False)  # one hit < min_hits
    assert got[4] == (0, False)
    # hot-shingle guard drops boilerplate shingles before the join
    boiler = spark.createDataFrame(
        [(i, "shared boilerplate trigram line") for i in range(10)],
        "doc_id long, text string",
    )
    bench2 = spark.createDataFrame(
        [(0, "shared boilerplate trigram line")], "doc_id long, text string"
    )
    guarded = decontaminate(boiler, bench2, n=3, min_hits=1, max_shingle_df=5)
    assert guarded.filter("contaminated").count() == 0


# --------------------------------------------------------------------------
# resolve_canonical — election on top of the closure
# --------------------------------------------------------------------------


def _resolve(spark, docs, pairs, **kw):
    ddf = spark.createDataFrame(docs, "doc_id bigint, text string")
    pdf = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    from storage_spark.operators.dedup import resolve_canonical

    out = resolve_canonical(ddf, pdf, **kw)
    return {
        r["doc"]: (r["component"], r["canonical"], r["is_canonical"])
        for r in out.collect()
    }


def test_resolve_longest_doc_wins(spark):
    got = _resolve(
        spark,
        [(1, "a b"), (2, "a b c d"), (3, "a"), (9, "solo doc")],
        [(1, 2), (2, 3)],
    )
    # cluster {1,2,3}: doc 2 has most tokens; 9 is a singleton
    assert got[1] == (1, 2, False)
    assert got[2] == (1, 2, True)
    assert got[3] == (1, 2, False)
    assert got[9] == (9, 9, True)


def test_resolve_tie_breaks_to_min_doc(spark):
    got = _resolve(
        spark,
        [(5, "x y z"), (6, "p q r")],
        [(5, 6)],
    )
    assert got[5] == (5, 5, True)
    assert got[6] == (5, 5, False)


def test_resolve_custom_preference(spark):
    # prefer = doc id itself → highest id wins
    got = _resolve(
        spark,
        [(5, "x"), (6, "p q")],
        [(5, 6)],
        prefer=F.col("doc_id"),
    )
    assert got[6] == (5, 6, True)
    assert got[5] == (5, 6, False)


def test_resolve_exactly_one_canonical_per_component(spark):
    docs = [(i, "w " * (i % 7 + 1)) for i in range(30)]
    pairs = [(i, i + 1) for i in range(0, 28, 2)]  # 15 two-doc clusters
    got = _resolve(spark, docs, pairs)
    by_comp: dict[int, int] = {}
    for _doc, (comp, canon, is_c) in got.items():
        assert (canon in got) and got[canon][2]  # canonical flagged
        by_comp.setdefault(comp, 0)
        by_comp[comp] += int(is_c)
    assert all(n == 1 for n in by_comp.values())


# --------------------------------------------------------------------------
# incremental_exact_dedup — batch vs fingerprint index
# --------------------------------------------------------------------------


def test_incremental_dedup_within_and_cross(spark):
    from storage_spark.operators.dedup import incremental_exact_dedup

    corpus = spark.createDataFrame(
        [(1, "already here"), (2, "also here")], "doc_id bigint, text string"
    )
    from storage_spark.functions.text import fingerprint

    index = corpus.select(fingerprint(F.col("text")).alias("fp")).distinct()
    batch = spark.createDataFrame(
        [
            (10, "Already   HERE"),   # normalizes to a corpus dup → dropped
            (11, "fresh one"),
            (12, "fresh one"),        # within-batch dup of 11 → dropped
            (13, "another fresh"),
        ],
        "doc_id bigint, text string",
    )
    kept, new_rows = incremental_exact_dedup(batch, index)
    assert sorted(r["doc_id"] for r in kept.collect()) == [11, 13]
    rows = {r["fp"]: r["first_doc_id"] for r in new_rows.collect()}
    assert sorted(rows.values()) == [11, 13]
    # appending new_rows to the index absorbs the batch: rerun drops all
    grown = index.unionByName(new_rows.select("fp"))
    kept2, new2 = incremental_exact_dedup(batch, grown)
    assert kept2.count() == 0 and new2.count() == 0


def test_curate_components_keeps_one_per_cluster(spark):
    """Chain a~b~c (no a~c pair): greedy drops both b and c leaving only
    a; components resolution also keeps one — but guarantees it even
    when the chain would orphan clusters, and elects the LONGEST doc."""
    from storage_spark.operators.pipeline import curate_corpus

    # three docs sharing enough 3-gram shingles to pair up in a chain
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, base + " one"),
            (2, base + " one two"),          # pairs with 1 and 3
            (3, base + " one two three"),    # longest → components winner
            (9, "completely different words nothing shared here at all"),
        ],
        "doc_id bigint, text string",
    )
    greedy = sorted(
        r["doc_id"]
        for r in curate_corpus(docs, min_jaccard=0.5, resolution="greedy").collect()
    )
    comp = sorted(
        r["doc_id"]
        for r in curate_corpus(docs, min_jaccard=0.5, resolution="components").collect()
    )
    assert greedy == [1, 9]   # 2 and 3 each lose some pair
    assert comp == [3, 9]     # one canonical per cluster, longest wins


def test_curate_unknown_resolution_raises(spark):
    from storage_spark.operators.pipeline import curate_corpus

    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="resolution"):
        curate_corpus(docs, resolution="nope").collect()
