"""Persistent ANN index (storage_spark/sources/annindex.py): a query
against the persisted index must equal the full recompute, per kind —
the index is the corpus-side encode stored, nothing else."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storage_spark.sources.annindex import (
    ann_index_search,
    build_ann_index,
    load_config,
)

DIM = 64


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            F.col("vec_id").cast("string").alias("key"),
            F.col("embedding"),
        )
        .filter(F.col("vec_id") < 300)
    )
    df = df.localCheckpoint(eager=True)
    return df


@pytest.fixture(scope="module")
def queries(corpus):
    return (
        corpus.filter(F.col("key").cast("bigint") < 10)
        .select(F.col("key").alias("q_key"), F.col("embedding").alias("q_vec"))
        .localCheckpoint(eager=True)
    )


def _rows(df):
    return sorted(
        (r[0], r[1], round(float(r[2]), 9), r[3]) for r in df.collect()
    )


def test_lsh_index_query_equals_recompute(spark, corpus, queries, tmp_path):
    from storage_spark.functions.vectors import lsh_ann_join

    path = str(tmp_path / "lsh_idx")
    cfg = build_ann_index(
        corpus, path, kind="lsh", dim=DIM, n_planes=4, n_tables=2
    )
    assert load_config(path) == cfg
    got = ann_index_search(spark, path, queries, k=5, probe_radius=1)
    want = lsh_ann_join(
        queries, corpus, k=5, dim=DIM, n_planes=4, n_tables=2,
        probe_radius=1,
    )
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0


def test_ivf_index_query_equals_recompute(spark, corpus, queries, tmp_path):
    from storage_spark.functions.vectors import (
        ivf_assign,
        ivf_centroids_kmeans,
        ivf_search,
    )

    path = str(tmp_path / "ivf_idx")
    build_ann_index(
        corpus, path, kind="ivf", dim=DIM, n_cells=4, kmeans_iterations=1
    )
    got = ann_index_search(spark, path, queries, k=5, n_probe=2)
    cents = ivf_centroids_kmeans(corpus, 4, iterations=1)
    want = ivf_search(queries, ivf_assign(corpus, cents), cents, 5, n_probe=2)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) == 50  # 10 queries x k


def test_ivf_probe_is_partition_pruned(spark, corpus, queries, tmp_path):
    """The assigned table is partitioned by cell, so a probe's scan reads
    only the probed cells' files — the inverted-list seek as partition
    pruning (visible as a partition filter count in the scan node)."""
    path = str(tmp_path / "ivf_prune")
    build_ann_index(
        corpus, path, kind="ivf", dim=DIM, n_cells=4, kmeans_iterations=1
    )
    plan = (
        ann_index_search(spark, path, queries.limit(2), k=3, n_probe=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_pq_index_query_equals_recompute(spark, corpus, queries, tmp_path):
    from storage_spark.functions.vectors import (
        pq_adc_topk,
        pq_codebooks_kmeans,
        pq_encode,
        pq_search_rerank,
    )

    path = str(tmp_path / "pq_idx")
    cfg = build_ann_index(
        corpus, path, kind="pq", dim=DIM, m=8, k_codes=16,
        kmeans_iterations=1,
    )
    books = pq_codebooks_kmeans(corpus, m=8, k=16, iterations=1, dim=DIM)
    assert cfg["codebooks"] == books  # JSON float round-trip is exact
    codes = pq_encode(corpus, books)
    got_adc = ann_index_search(spark, path, queries, k=5)
    want_adc = pq_adc_topk(queries, codes, books, 5)
    assert _rows(got_adc) == _rows(want_adc)
    got_rr = ann_index_search(spark, path, queries, k=5, refine_factor=4)
    want_rr = pq_search_rerank(queries, codes, corpus, books, 5, refine_factor=4)
    assert _rows(got_rr) == _rows(want_rr)


def test_bad_kind_raises(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="kind"):
        build_ann_index(corpus, str(tmp_path / "x"), kind="hnsw", dim=DIM)


def test_lsh_append_equals_rebuild(spark, corpus, queries, tmp_path):
    """Monotonic ingest: encode only the batch, append its postings —
    query results equal a full rebuild over the unioned corpus (the LSH
    encode is row-local, so append ≡ rebuild exactly)."""
    from storage_spark.sources.annindex import ann_index_append

    old = corpus.filter(F.col("key").cast("bigint") < 200)
    new = corpus.filter(F.col("key").cast("bigint") >= 200)
    path = str(tmp_path / "lsh_app")
    build_ann_index(old, path, kind="lsh", dim=DIM, n_planes=4, n_tables=2)
    ann_index_append(new, path)
    full = str(tmp_path / "lsh_full")
    build_ann_index(corpus, full, kind="lsh", dim=DIM, n_planes=4, n_tables=2)
    got = ann_index_search(spark, path, queries, k=5, probe_radius=1)
    want = ann_index_search(spark, full, queries, k=5, probe_radius=1)
    assert _rows(got) == _rows(want)


def test_pq_append_equals_rebuild_with_same_codebooks(
    spark, corpus, queries, tmp_path
):
    """PQ append keeps the trained codebooks fixed (codes are row-local),
    so append == encoding the union with the ORIGINAL books. A rebuild
    would also retrain the books — that's the REINDEX path, not append."""
    from storage_spark.functions.vectors import pq_adc_topk, pq_encode
    from storage_spark.sources.annindex import ann_index_append, load_config

    old = corpus.filter(F.col("key").cast("bigint") < 200)
    new = corpus.filter(F.col("key").cast("bigint") >= 200)
    path = str(tmp_path / "pq_app")
    build_ann_index(
        old, path, kind="pq", dim=DIM, m=8, k_codes=16, kmeans_iterations=1
    )
    ann_index_append(new, path)
    books = load_config(path)["codebooks"]
    got = ann_index_search(spark, path, queries, k=5)
    want = pq_adc_topk(queries, pq_encode(corpus, books), books, 5)
    assert _rows(got) == _rows(want)


def test_ivf_append_assigns_to_existing_centroids(
    spark, corpus, queries, tmp_path
):
    from storage_spark.functions.vectors import ivf_assign, ivf_search
    from storage_spark.sources.annindex import ann_index_append, load_config

    old = corpus.filter(F.col("key").cast("bigint") < 200)
    new = corpus.filter(F.col("key").cast("bigint") >= 200)
    path = str(tmp_path / "ivf_app")
    build_ann_index(
        old, path, kind="ivf", dim=DIM, n_cells=4, kmeans_iterations=1
    )
    cfg = load_config(path)
    ann_index_append(new, path)
    cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cfg["centroids"])],
        "cell int, centroid array<float>",
    )
    got = ann_index_search(spark, path, queries, k=5, n_probe=2)
    want = ivf_search(queries, ivf_assign(corpus, cents), cents, 5, n_probe=2)
    assert _rows(got) == _rows(want)


def test_ivf_cell_stats_flags_growth(spark, corpus, tmp_path):
    from storage_spark.sources.annindex import ann_index_append, ivf_cell_stats

    old = corpus.filter(F.col("key").cast("bigint") < 200)
    new = corpus.filter(F.col("key").cast("bigint") >= 200)
    path = str(tmp_path / "ivf_stats")
    build_ann_index(old, path, kind="ivf", dim=DIM, n_cells=4,
                    kmeans_iterations=1)
    before = {r["cell"]: r["n_vectors"]
              for r in ivf_cell_stats(spark, path).collect()}
    assert sum(before.values()) == 200
    ann_index_append(new, path)
    after = {r["cell"]: r["n_vectors"]
             for r in ivf_cell_stats(spark, path).collect()}
    assert sum(after.values()) == 300  # appended rows visible per cell
    with pytest.raises(ValueError, match="ivf"):
        lsh_path = str(tmp_path / "lsh_for_stats")
        build_ann_index(old, lsh_path, kind="lsh", dim=DIM, n_planes=4)
        ivf_cell_stats(spark, lsh_path)


def test_ivf_iterations0_double_corpus_persisted_equals_recomputed(
    spark, tmp_path
):
    """ADVICE r5: with kmeans_iterations=0 the centroids are raw corpus
    vectors — on a DOUBLE-typed corpus those were doubles at build time
    but float32 after the config.json round-trip, so assignments near
    cell boundaries could diverge between build and append/search. The
    build now pins centroids to float32 BEFORE the build-time assign:
    re-assigning the same rows with the reloaded centroids must land in
    the same cells the build recorded."""
    from storage_spark.functions.vectors import ivf_assign
    from storage_spark.sources.annindex import load_config

    # doubles with no exact float32 representation, near-tied cells
    rows = [
        (str(i), [0.1 + i * 1e-9, 0.2, 0.3, 0.4 + (i % 2) * 1e-9])
        for i in range(50)
    ]
    corpus = spark.createDataFrame(rows, "key string, embedding array<double>")
    path = str(tmp_path / "ivf_d0")
    build_ann_index(corpus, path, kind="ivf", dim=4, n_cells=3,
                    kmeans_iterations=0)
    cfg = load_config(path)
    cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cfg["centroids"])],
        "cell int, centroid array<float>",
    )
    stored = {
        r["key"]: r["cell"]
        for r in spark.read.parquet(f"{path}/assigned").collect()
    }
    recomputed = {
        r["key"]: r["cell"]
        for r in ivf_assign(corpus, cents, cfg["metric"]).collect()
    }
    assert stored == recomputed


def test_pq_explicit_non_l2_metric_raises(spark, tmp_path):
    """ADVICE r5: kind='pq' silently pinned metric='l2'; an explicit
    cosine request must fail loudly instead of ranking by squared-L2."""
    corpus = spark.createDataFrame(
        [(str(i), [float(i), 1.0]) for i in range(4)],
        "key string, embedding array<float>",
    )
    with pytest.raises(ValueError, match="pq"):
        build_ann_index(corpus, str(tmp_path / "pqm"), kind="pq", dim=2,
                        metric="cosine")
    # the per-kind defaults still resolve
    cfg = build_ann_index(corpus, str(tmp_path / "pq_ok"), kind="pq", dim=2,
                          m=2, k_codes=2, kmeans_iterations=1)
    assert cfg["metric"] == "l2"


def test_compact_preserves_results_and_packs_files(
    spark, corpus, queries, tmp_path
):
    """VERDICT r5 #4: append accumulates one-plus small files per batch;
    compaction re-packs them and must leave query results byte-for-byte
    identical (row-preserving read->repartition->write)."""
    from storage_spark.sources.annindex import ann_index_append, ann_index_compact

    path = str(tmp_path / "lsh_cpt")
    old = corpus.filter(F.col("key").cast("bigint") < 150)
    build_ann_index(old, path, kind="lsh", dim=DIM, n_planes=4, n_tables=2)
    for lo, hi in ((150, 200), (200, 250), (250, 300)):
        vid = F.col("key").cast("bigint")
        ann_index_append(corpus.filter((vid >= lo) & (vid < hi)), path)
    before = _rows(ann_index_search(spark, path, queries, k=5, probe_radius=1))
    report = ann_index_compact(spark, path, n_files=2)
    assert report["postings"]["files_after"] < report["postings"]["files_before"]
    assert report["postings"]["files_after"] <= 2
    after = _rows(ann_index_search(spark, path, queries, k=5, probe_radius=1))
    assert after == before


def test_ivf_compact_keeps_partition_layout_and_results(
    spark, corpus, queries, tmp_path
):
    from storage_spark.sources.annindex import ann_index_append, ann_index_compact

    path = str(tmp_path / "ivf_cpt")
    old = corpus.filter(F.col("key").cast("bigint") < 200)
    build_ann_index(old, path, kind="ivf", dim=DIM, n_cells=4,
                    kmeans_iterations=1)
    vid = F.col("key").cast("bigint")
    ann_index_append(corpus.filter((vid >= 200) & (vid < 250)), path)
    ann_index_append(corpus.filter((vid >= 250) & (vid < 300)), path)
    before = _rows(ann_index_search(spark, path, queries, k=5, n_probe=2))
    ann_index_compact(spark, path)
    # layout survives: still cell-partitioned (probe stays pruned)
    import os as _os
    cells = [d for d in _os.listdir(str(tmp_path / "ivf_cpt" / "assigned"))
             if d.startswith("cell=")]
    assert len(cells) == 4
    assert _rows(ann_index_search(spark, path, queries, k=5, n_probe=2)) == before


def test_ivf_reindex_policy_triggers(spark):
    from storage_spark.sources.annindex import ivf_reindex_policy

    balanced = [
        {"n_vectors": 25, "mean_distance": 0.1} for _ in range(16)
    ]
    assert ivf_reindex_policy(balanced, 16)["rebuild"] is False
    # one cell holds most of the corpus: 385 vs share 25 -> > 4x share
    hot = [{"n_vectors": 385, "mean_distance": 0.1}] + [
        {"n_vectors": 1, "mean_distance": 0.1} for _ in range(15)
    ]
    d = ivf_reindex_policy(hot, 16)
    assert d["rebuild"] is True
    assert "hot cell" in d["reason"]
    drifted = [{"n_vectors": 25, "mean_distance": 0.9} for _ in range(16)]
    d2 = ivf_reindex_policy(drifted, 16, build_mean_distance=0.1)
    assert d2["rebuild"] is True
    assert "mean distance" in d2["reason"]
    assert ivf_reindex_policy(drifted, 16)["rebuild"] is False  # no baseline
    assert ivf_reindex_policy([], 16)["rebuild"] is False


def test_ann_index_maintain_compacts_then_rebuilds_on_skew(
    spark, corpus, queries, tmp_path
):
    """Maintenance tick: balanced appends -> compaction; a pathological
    append concentrating mass in one cell trips the occupancy policy ->
    rebuild with FRESH centroids (the REINDEX motion), after which the
    persisted index still answers queries with the stored-parameter
    ranking code."""
    from storage_spark.functions.vectors import ivf_assign
    from storage_spark.sources.annindex import (
        ann_index_append,
        ann_index_maintain,
        load_config,
    )

    path = str(tmp_path / "ivf_mnt")
    old = corpus.filter(F.col("key").cast("bigint") < 200)
    build_ann_index(old, path, kind="ivf", dim=DIM, n_cells=4,
                    kmeans_iterations=1)
    base_cfg = load_config(path)
    vid = F.col("key").cast("bigint")
    ann_index_append(corpus.filter((vid >= 200) & (vid < 300)), path)
    out1 = ann_index_maintain(spark, path)
    assert out1["action"] == "compacted"
    # skew-bomb: 400 copies of ONE existing vector -> one cell goes hot
    one = corpus.filter(F.col("key") == "0").select("embedding").first()
    bomb = spark.createDataFrame(
        [(str(10_000 + i), one["embedding"]) for i in range(400)],
        "key string, embedding array<float>",
    )
    ann_index_append(bomb, path)
    # factor 1.5: the bomb cell holds >400 of 700 vs share 175 — the
    # occupancy trigger fires deterministically (n_cells=4 is too few
    # for the default factor 4, where hot <= total = 4x share always)
    out2 = ann_index_maintain(spark, path, max_occupancy_factor=1.5)
    assert out2["action"] == "rebuilt"
    assert "hot cell" in out2["policy"]["reason"]
    cfg = load_config(path)
    assert cfg["n_cells"] == base_cfg["n_cells"]
    # post-rebuild: persisted == recomputed against the NEW centroids
    cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cfg["centroids"])],
        "cell int, centroid array<float>",
    )
    indexed = spark.read.parquet(f"{path}/assigned").select("key", "embedding")
    assert indexed.count() == 700  # 300 originals + 400 bombs
    stored = {
        (r["key"], r["cell"])
        for r in spark.read.parquet(f"{path}/assigned").collect()
    }
    recomputed = {
        (r["key"], r["cell"])
        for r in ivf_assign(indexed, cents, cfg["metric"]).collect()
    }
    assert stored == recomputed


def test_keys_only_lsh_index_equals_inline_mode(spark, corpus, queries, tmp_path):
    """VERDICT r5 #5: store_vectors=False posting rows carry (key, norm,
    sig) — the xn_tables duplication shrinks from the embedding to the
    key — and ranking joins the single full-precision vectors table per
    deduped candidate. Results must equal the inline mode exactly,
    through build, append, and compaction."""
    from storage_spark.sources.annindex import (
        ann_index_append,
        ann_index_compact,
        load_config,
    )

    old = corpus.filter(F.col("key").cast("bigint") < 200)
    new = corpus.filter(F.col("key").cast("bigint") >= 200)
    inline, keys = str(tmp_path / "lsh_in"), str(tmp_path / "lsh_keys")
    build_ann_index(old, inline, kind="lsh", dim=DIM, n_planes=4, n_tables=2)
    build_ann_index(old, keys, kind="lsh", dim=DIM, n_planes=4, n_tables=2,
                    store_vectors=False)
    assert load_config(keys)["store_vectors"] is False
    # keys-only posting rows carry no embedding
    posting_cols = set(
        spark.read.parquet(f"{keys}/postings").limit(1).columns
    )
    assert "embedding" not in posting_cols
    assert posting_cols == {"key", "_cn", "_sig"}
    want = _rows(ann_index_search(spark, inline, queries, k=5, probe_radius=1))
    assert _rows(
        ann_index_search(spark, keys, queries, k=5, probe_radius=1)
    ) == want
    # append keeps both modes aligned
    ann_index_append(new, inline)
    ann_index_append(new, keys)
    want_full = _rows(
        ann_index_search(spark, inline, queries, k=5, probe_radius=1)
    )
    got_full = _rows(
        ann_index_search(spark, keys, queries, k=5, probe_radius=1)
    )
    assert got_full == want_full
    # compaction re-packs postings AND the vectors side table
    report = ann_index_compact(spark, keys, n_files=2)
    assert "vectors" in report
    assert _rows(
        ann_index_search(spark, keys, queries, k=5, probe_radius=1)
    ) == want_full


def test_geometry_sizing_rules():
    """VERDICT r6 #1: the sizing rules behind the corpus-sized defaults —
    monotone in corpus size, exact clamps, and at 20k vectors every
    derived knob exceeds the old static default (n_planes=8/n_tables=1/
    n_cells=16/k_codes=16 — the exact pattern that produced the r5 dedup
    cliff)."""
    from storage_spark.sources.annindex import (
        ivf_cells_for,
        ivf_probe_for,
        lsh_planes_for,
        lsh_tables_for,
        pq_codes_for,
        pq_m_for,
    )

    # monotone + clamps
    prev = 0
    for n in (10, 1_000, 20_000, 10**6, 10**9, 10**12):
        p, c, k = lsh_planes_for(n), ivf_cells_for(n), pq_codes_for(n)
        assert p >= prev
        prev = p
        assert 4 <= p <= 24
        assert 16 <= c <= 65536
        assert 16 <= k <= 256
    assert lsh_planes_for(10**12) == 24
    assert ivf_cells_for(10**12) == 65536  # broadcastability ceiling
    assert pq_codes_for(10**12) == 256
    # 20k vectors: derived > static, per VERDICT's done-criterion
    assert lsh_planes_for(20_000) > 8
    assert lsh_tables_for(lsh_planes_for(20_000)) > 1
    assert ivf_cells_for(20_000) > 16
    assert pq_codes_for(20_000) > 16
    # ivf probe guidance scales with cell count
    assert ivf_probe_for(16) == 2
    assert ivf_probe_for(4096) > ivf_probe_for(256) > 2
    # pq m divides dim exactly, prefers 8-dim subvectors
    for dim in (64, 768, 100, 6):
        assert dim % pq_m_for(dim) == 0
    assert pq_m_for(64) == 8
    assert pq_m_for(768) == 96


def test_default_build_derives_and_records_geometry(spark, corpus, tmp_path):
    """Omitted geometry derives from the corpus (n_vectors passed here to
    pin the claimed size without an extra count) and the derivation is
    recorded in config.json so maintenance can re-derive later."""
    from storage_spark.sources.annindex import ivf_probe_for, lsh_planes_for

    lsh_path = str(tmp_path / "lsh_derived")
    cfg = build_ann_index(
        corpus, lsh_path, kind="lsh", dim=DIM, n_vectors=20_000
    )
    assert cfg["n_planes"] == lsh_planes_for(20_000) > 8
    assert cfg["n_tables"] > 1
    assert cfg["n_vectors_at_build"] == 20_000
    assert sorted(cfg["derived_geometry"]) == ["n_planes", "n_tables"]
    ivf_path = str(tmp_path / "ivf_derived")
    cfg2 = build_ann_index(
        corpus, ivf_path, kind="ivf", dim=DIM, kmeans_iterations=0,
        n_vectors=20_000,
    )
    assert cfg2["n_cells"] > 16
    assert cfg2["suggested_n_probe"] == ivf_probe_for(cfg2["n_cells"])
    # without n_vectors the build counts the corpus itself
    cfg3 = build_ann_index(
        corpus.limit(50), str(tmp_path / "pq_derived"), kind="pq", dim=DIM,
        kmeans_iterations=0,
    )
    assert cfg3["n_vectors_at_build"] == 50
    assert cfg3["m"] == 8 and cfg3["k_codes"] == 16
    assert DIM % cfg3["m"] == 0


def test_undersized_explicit_geometry_warns(spark, corpus, tmp_path):
    """An explicit width >2x under the rule warns (same contract as
    dedup.simhash); adequately-sized explicit geometry stays silent."""
    import warnings as _w

    with pytest.warns(UserWarning, match="sizing rule"):
        build_ann_index(
            corpus, str(tmp_path / "u1"), kind="lsh", dim=DIM,
            n_planes=4, n_tables=1, n_vectors=10**6,
        )
    with pytest.warns(UserWarning, match="sizing rule"):
        build_ann_index(
            corpus, str(tmp_path / "u2"), kind="ivf", dim=DIM,
            kmeans_iterations=0, n_cells=16, n_vectors=10**6,
        )
    with _w.catch_warnings():
        _w.simplefilter("error")
        build_ann_index(
            corpus, str(tmp_path / "u3"), kind="lsh", dim=DIM,
            n_planes=12, n_tables=2, n_vectors=10**6,
        )


def test_search_defaults_to_suggested_n_probe(spark, corpus, queries, tmp_path):
    """ann_index_search with n_probe=None reads the build-time
    suggested_n_probe; configs that predate the rule fall back to 2."""
    import json
    import os

    path = str(tmp_path / "ivf_probe_default")
    cfg = build_ann_index(
        corpus, path, kind="ivf", dim=DIM, kmeans_iterations=0,
    )
    want = _rows(
        ann_index_search(spark, path, queries, k=5,
                         n_probe=cfg["suggested_n_probe"])
    )
    assert _rows(ann_index_search(spark, path, queries, k=5)) == want
    # legacy config: drop the suggestion -> default 2
    del cfg["suggested_n_probe"]
    with open(os.path.join(path, "config.json"), "w") as fh:
        json.dump(cfg, fh)
    assert _rows(ann_index_search(spark, path, queries, k=5)) == _rows(
        ann_index_search(spark, path, queries, k=5, n_probe=2)
    )


def test_parquet_centroid_store_equals_inline(spark, corpus, queries, tmp_path, monkeypatch):
    """Large quantizers keep their centroids in a parquet side table
    instead of config.json (the 65536-cell ceiling is broadcastability,
    not serialization). Forcing the parquet store at a small cell count
    must leave build/append/search/stats results IDENTICAL to the inline
    store — float32 round-trips exactly through both."""
    import os

    import storage_spark.sources.annindex as A
    from storage_spark.sources.annindex import ann_index_append, ivf_cell_stats

    old = corpus.filter(F.col("key").cast("bigint") < 200)
    new = corpus.filter(F.col("key").cast("bigint") >= 200)
    inline, pq_store = str(tmp_path / "ivf_in"), str(tmp_path / "ivf_pq")
    build_ann_index(old, inline, kind="ivf", dim=DIM, n_cells=4,
                    kmeans_iterations=1)
    monkeypatch.setattr(A, "_CENTROIDS_INLINE_MAX", 2)
    build_ann_index(old, pq_store, kind="ivf", dim=DIM, n_cells=4,
                    kmeans_iterations=1)
    cfg = load_config(pq_store)
    assert cfg["centroids_store"] == "parquet"
    assert "centroids" not in cfg
    assert os.path.isdir(os.path.join(pq_store, "centroids"))
    # both stores hold bit-identical float32 centroids
    inline_c = load_config(inline)["centroids"]
    stored_c = {
        r["cell"]: list(r["centroid"])
        for r in spark.read.parquet(f"{pq_store}/centroids").collect()
    }
    assert [stored_c[i] for i in range(4)] == inline_c
    for p in (inline, pq_store):
        ann_index_append(new, p)
    want = _rows(ann_index_search(spark, inline, queries, k=5, n_probe=2))
    assert _rows(
        ann_index_search(spark, pq_store, queries, k=5, n_probe=2)
    ) == want
    s_in = [tuple(r) for r in ivf_cell_stats(spark, inline).collect()]
    s_pq = [tuple(r) for r in ivf_cell_stats(spark, pq_store).collect()]
    assert s_in == s_pq


def test_maintain_rebuild_rederives_derived_geometry(spark, corpus, tmp_path):
    """A rebuild triggered on an index whose geometry was DERIVED at
    build re-derives from the grown corpus — pinning the old n_cells
    would re-create the under-sized index the policy just flagged.
    (Explicit geometry stays explicit: covered by
    test_ann_index_maintain_compacts_then_rebuilds_on_skew.)"""
    from storage_spark.sources.annindex import (
        ann_index_append,
        ann_index_maintain,
        ivf_cells_for,
    )

    path = str(tmp_path / "ivf_rederive")
    old = corpus.filter(F.col("key").cast("bigint") < 200)
    build_ann_index(old, path, kind="ivf", dim=DIM, kmeans_iterations=0)
    assert load_config(path)["n_cells"] == ivf_cells_for(200)
    one = corpus.filter(F.col("key") == "0").select("embedding").first()
    bomb = spark.createDataFrame(
        [(str(10_000 + i), one["embedding"]) for i in range(800)],
        "key string, embedding array<float>",
    )
    ann_index_append(bomb, path)
    out = ann_index_maintain(spark, path, max_occupancy_factor=1.5)
    assert out["action"] == "rebuilt"
    cfg = load_config(path)
    assert cfg["n_cells"] == ivf_cells_for(1000)  # 200 + 800, re-derived
    assert cfg["n_vectors_at_build"] == 1000


def test_compact_crash_windows_recover(spark, corpus, queries, tmp_path):
    """Review-r6: the two-rename swap must self-recover from BOTH crash
    windows on the next call — (a) died between renames: live dir
    missing, __old holds the table; (b) died after the swap: stale
    __old sibling blocks the next rename. Results identical either
    way."""
    import os
    import shutil

    from storage_spark.sources.annindex import ann_index_compact

    path = str(tmp_path / "lsh_crash")
    build_ann_index(corpus, path, kind="lsh", dim=DIM, n_planes=4, n_tables=2)
    want = _rows(ann_index_search(spark, path, queries, k=5, probe_radius=1))
    src = os.path.join(path, "postings")
    # (a) crash between renames: src gone, __old is the live table
    os.rename(src, src + "__old")
    ann_index_compact(spark, path, n_files=2)
    assert _rows(ann_index_search(spark, path, queries, k=5, probe_radius=1)) == want
    assert not os.path.isdir(src + "__old")
    # (b) crash after swap: stale __old sibling present alongside src
    shutil.copytree(src, src + "__old")
    ann_index_compact(spark, path, n_files=2)
    assert _rows(ann_index_search(spark, path, queries, k=5, probe_radius=1)) == want
    assert not os.path.isdir(src + "__old")


def test_sq8_index_query_equals_recompute_and_append(
    spark, corpus, queries, tmp_path
):
    """kind='sq8': persisted reconstruction ranking equals the direct
    sq_topk recompute; with refine_factor it equals sq_search_rerank —
    which equals full-precision knn_join at the default refine; and
    append ≡ rebuild (the per-row-scale encode is row-local)."""
    from storage_spark.functions.vectors import (
        knn_join,
        sq_encode,
        sq_search_rerank,
        sq_topk,
    )
    from storage_spark.sources.annindex import ann_index_append

    path = str(tmp_path / "sq_idx")
    cfg = build_ann_index(corpus, path, kind="sq8", dim=DIM)
    assert cfg["bits"] == 8 and cfg["metric"] == "cosine"
    sq = sq_encode(corpus)
    got = ann_index_search(spark, path, queries, k=5)
    want = sq_topk(queries, sq, k=5)
    assert _rows(got) == _rows(want)
    got_rr = ann_index_search(spark, path, queries, k=5, refine_factor=4)
    want_rr = sq_search_rerank(queries, sq, corpus, k=5, refine_factor=4)
    assert _rows(got_rr) == _rows(want_rr)
    # the SQ8 rerank recovers exact full-precision top-k
    assert _rows(got_rr) == _rows(knn_join(queries, corpus, k=5))
    # append ≡ rebuild
    old = corpus.filter(F.col("key").cast("bigint") < 200)
    new = corpus.filter(F.col("key").cast("bigint") >= 200)
    app = str(tmp_path / "sq_app")
    build_ann_index(old, app, kind="sq8", dim=DIM)
    ann_index_append(new, app)
    assert _rows(ann_index_search(spark, app, queries, k=5)) == _rows(want)


def test_sq8_bad_bits_raises(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="bits"):
        build_ann_index(corpus, str(tmp_path / "xb"), kind="sq8", dim=DIM, bits=16)


def _jl_recompute(corpus, queries, cfg, k, refine_factor=6, probe_radius=0):
    """The hand-composed fat-embedding recipe the jl_lsh index manages:
    project both sides with the stored planes, LSH-rank in projected L2,
    exact-rerank originals under the stored metric."""
    from storage_spark.functions.vectors import (
        _exact_rerank,
        _lsh_rank_against_postings,
        lsh_corpus_postings,
        project_embeddings,
    )

    proj = project_embeddings(
        corpus, cfg["out_dim"], cfg["dim"], vector_col="embedding",
        out_col="_proj", seed=cfg["jl_seed"],
    ).select("key", F.col("_proj").alias("embedding"))
    postings = lsh_corpus_postings(
        proj, cfg["out_dim"], cfg["n_planes"], cfg["n_tables"],
        store_vectors=True,
    )
    projq = project_embeddings(
        queries.select("q_key", "q_vec"), cfg["out_dim"], cfg["dim"],
        vector_col="q_vec", out_col="_pq", seed=cfg["jl_seed"],
    ).select("q_key", F.col("_pq").alias("q_vec"))
    cands = _lsh_rank_against_postings(
        postings, projq, refine_factor * k, cfg["out_dim"],
        cfg["n_planes"], metric="l2", probe_radius=probe_radius,
        n_tables=cfg["n_tables"],
    ).select("q_key", "key")
    return _exact_rerank(
        cands, queries, corpus, k, cfg["metric"],
        "q_key", "q_vec", "key", "embedding",
    )


def test_jl_lsh_index_query_equals_recompute(spark, corpus, queries, tmp_path):
    """kind='jl_lsh' (VERDICT r7 #5): persisted ≡ the hand-composed
    project → LSH-candidate → exact-rerank recipe, at radius 0 and 1."""
    path = str(tmp_path / "jl_idx")
    cfg = build_ann_index(
        corpus, path, kind="jl_lsh", dim=DIM, out_dim=16, n_planes=4,
        n_tables=2,
    )
    assert cfg["metric"] == "cosine" and cfg["out_dim"] == 16
    for radius in (0, 1):
        got = ann_index_search(spark, path, queries, k=5, probe_radius=radius)
        want = _jl_recompute(corpus, queries, cfg, k=5, probe_radius=radius)
        assert _rows(got) == _rows(want)
    # final distances are FULL-precision: every returned pair's distance
    # equals the exact metric on the originals (never the projected one)
    from storage_spark.functions.vectors import cosine_distance

    got = ann_index_search(spark, path, queries, k=5, probe_radius=1)
    joined = (
        got.join(corpus, "key")
        .join(
            queries.select("q_key", "q_vec"), "q_key"
        )
        .select(
            (F.abs(
                F.col("distance")
                - cosine_distance(F.col("embedding"), F.col("q_vec"))
            ) < 1e-12).alias("ok")
        )
    )
    assert all(r["ok"] for r in joined.collect())


def test_jl_lsh_append_equals_rebuild(spark, corpus, queries, tmp_path):
    """Projection and LSH encode are both row-local: append ≡ rebuild."""
    from storage_spark.sources.annindex import ann_index_append

    old = corpus.filter(F.col("key").cast("bigint") < 200)
    new = corpus.filter(F.col("key").cast("bigint") >= 200)
    full = str(tmp_path / "jl_full")
    app = str(tmp_path / "jl_app")
    build_ann_index(
        corpus, full, kind="jl_lsh", dim=DIM, out_dim=16, n_planes=4
    )
    build_ann_index(
        old, app, kind="jl_lsh", dim=DIM, out_dim=16, n_planes=4
    )
    ann_index_append(new, app)
    a = ann_index_search(spark, full, queries, k=5, probe_radius=1)
    b = ann_index_search(spark, app, queries, k=5, probe_radius=1)
    assert _rows(a) == _rows(b)


def test_jl_lsh_derives_geometry_and_warns_undersized(
    spark, corpus, tmp_path
):
    """Omitted out_dim/n_planes/n_tables derive from the corpus
    (jl_out_dim_for binds at dim/4 here) and are recorded; an explicit
    out_dim >2x under the rule warns."""
    import warnings as _w

    from storage_spark.sources.annindex import jl_out_dim_for

    path = str(tmp_path / "jl_derived")
    cfg = build_ann_index(corpus, path, kind="jl_lsh", dim=DIM)
    assert cfg["derived_geometry"] == ["n_planes", "n_tables", "out_dim"]
    assert cfg["out_dim"] == jl_out_dim_for(DIM, cfg["n_vectors_at_build"])
    assert cfg["out_dim"] == DIM // 4  # 300 vectors: the dim/4 term binds
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        build_ann_index(
            corpus, str(tmp_path / "jl_small"), kind="jl_lsh", dim=DIM,
            out_dim=4, n_planes=4, n_tables=1, n_vectors=300,
        )
    assert any("out_dim" in str(w.message) for w in rec)


def test_jl_lsh_compact_and_maintain_preserve_results(
    spark, corpus, queries, tmp_path
):
    from storage_spark.sources.annindex import (
        ann_index_append,
        ann_index_maintain,
    )

    path = str(tmp_path / "jl_cmp")
    build_ann_index(
        corpus.filter(F.col("key").cast("bigint") < 200), path,
        kind="jl_lsh", dim=DIM, out_dim=16, n_planes=4,
    )
    for lo in (200, 250):
        ann_index_append(
            corpus.filter(
                (F.col("key").cast("bigint") >= lo)
                & (F.col("key").cast("bigint") < lo + 50)
            ),
            path,
        )
    before = _rows(ann_index_search(spark, path, queries, k=5, probe_radius=1))
    out = ann_index_maintain(spark, path)
    assert out["action"] == "compacted"
    assert set(out["compaction"]) == {"postings", "vectors"}
    after = _rows(ann_index_search(spark, path, queries, k=5, probe_radius=1))
    assert before == after


def test_jl_refine_for_sizes_to_admitted_volume():
    """NOTES_r9 probe: the rerank window must cover the expected admitted
    candidates (n/2^planes x Hamming ball x tables) / k — the 1M x 768
    operating point (14 planes, 2 tables, radius 1) derives 184, where the
    r8 constant 6 measured recall@10 0.358 vs the 0.968 admission ceiling."""
    from storage_spark.sources.annindex import jl_refine_for

    assert jl_refine_for(1_000_000, 10, 14, 2, 1) == 184
    # floor preserves the r8 behavior for tiny corpora
    assert jl_refine_for(300, 5, 4, 2, 1) == max(
        6, -(-300 * 5 * 2 // (16 * 5))
    )
    assert jl_refine_for(10, 10, 10, 1, 0) == 6
