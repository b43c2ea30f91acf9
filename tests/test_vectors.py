"""Vector operators: LSH recall vs exact brute force; segment covering."""

from __future__ import annotations

from pyspark.sql import functions as F

from storage_spark.functions.vectors import knn_join, list_vectors, lsh_ann_join
from storage_spark.tables import load_all


def _vectors(spark, sf_dir):
    t = load_all(spark, sf_dir)
    return t["embeddings"].select(
        F.col("vec_id").cast("string").alias("key"), "embedding", "label"
    )


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    v = _vectors(spark, sf_dir).cache()
    queries = v.filter(F.col("key").cast("bigint") < 30).select(
        F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
    )
    exact = knn_join(queries, v, k=5).select("q_key", "key").collect()
    approx = lsh_ann_join(queries, v, k=5, dim=64, n_planes=4).select(
        "q_key", "key"
    ).collect()
    exact_set = {(r.q_key, r.key) for r in exact}
    approx_set = {(r.q_key, r.key) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 4 hyperplanes → 16 buckets over 500 vectors: generous buckets, recall
    # should be well above chance; this guards the plumbing, not the tuning.
    assert recall > 0.3, f"LSH recall suspiciously low: {recall:.2f}"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from storage_spark.functions.vectors import ivf_assign, ivf_centroids, ivf_search

    v = _vectors(spark, sf_dir).cache()
    cents = ivf_centroids(v, n_cells=8).cache()
    assigned = ivf_assign(v, cents)
    queries = v.filter(F.col("key").cast("bigint") < 30).select(
        F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
    )
    exact = knn_join(queries, v, k=5).select("q_key", "key").collect()
    approx = ivf_search(queries, assigned, cents, k=5, n_probe=3).select(
        "q_key", "key"
    ).collect()
    exact_set = {(r.q_key, r.key) for r in exact}
    approx_set = {(r.q_key, r.key) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall > 0.3, f"IVF recall suspiciously low: {recall:.2f}"
    # every corpus vector lands in exactly one cell
    assert assigned.count() == v.count()


def test_segments_disjoint_and_covering(spark, sf_dir):
    v = _vectors(spark, sf_dir)
    total = v.count()
    seen = 0
    for i in range(4):
        seen += list_vectors(v, segment_count=4, segment_index=i).count()
    assert seen == total
