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
