"""ANN recall@k sweep — measures every operating point against the exact
brute-force top-k on the sf embeddings corpus.

Usage: python tools/ann_recall.py [sf_dir]   (default /root/testdata/sf0.1)
Prints a markdown table for NOTES_r{N}.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
K = 10
N_QUERIES = 50
DIM = 64

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.driver.memory", "12g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from storage_spark.functions.vectors import (  # noqa: E402
    ivf_assign,
    ivf_centroids_kmeans,
    ivf_search,
    knn_join,
    lsh_ann_join,
)

corpus = (
    spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    .select(F.col("vec_id").cast("string").alias("key"), "embedding")
    .cache()
)
queries = (
    corpus.orderBy("key")
    .limit(N_QUERIES)
    .select(F.col("key").alias("q_key"), F.col("embedding").alias("q_vec"))
    .cache()
)
n_corpus = corpus.count()
queries.count()

exact = knn_join(queries, corpus, k=K, metric="cosine", exclude_self=True)
truth = {}
for r in exact.collect():
    truth.setdefault(r["q_key"], set()).add(r["key"])


def recall(df) -> float:
    got = {}
    for r in df.collect():
        got.setdefault(r["q_key"], set()).add(r["key"])
    scores = [
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    ]
    return sum(scores) / len(scores)


rows = []


def run(label: str, fn):
    t0 = time.time()
    r = recall(fn())
    rows.append((label, r, time.time() - t0))
    print(f"  {label}: recall@{K} = {r:.3f} ({time.time() - t0:.1f}s)", flush=True)


for planes, radius, tables in [
    (4, 0, 1), (4, 1, 1), (4, 2, 1),
    (8, 0, 1), (8, 1, 1), (8, 2, 1),
    (8, 1, 4), (8, 2, 4), (8, 2, 8),
    (4, 1, 4), (4, 2, 4),
]:
    run(
        f"LSH planes={planes} radius={radius} tables={tables}",
        lambda p=planes, r=radius, L=tables: lsh_ann_join(
            queries, corpus, k=K, dim=DIM, n_planes=p,
            probe_radius=r, n_tables=L,
        ),
    )

cents = ivf_centroids_kmeans(corpus, 16, iterations=3).cache()
cents.count()
assigned = ivf_assign(corpus, cents).cache()
assigned.count()
for n_probe in [4, 6, 8, 10, 12]:
    run(
        f"IVF cells=16 kmeans3 probe={n_probe}",
        lambda np_=n_probe: ivf_search(
            queries, assigned, cents, k=K, n_probe=np_
        ),
    )

# --- PQ (ADC ranks by squared L2, so its truth set is the exact L2 top-k)
from storage_spark.functions.vectors import (  # noqa: E402
    pq_adc_topk,
    pq_codebooks,
    pq_codebooks_kmeans,
    pq_encode,
)

exact_l2 = knn_join(queries, corpus, k=K, metric="l2", exclude_self=True)
truth_l2 = {}
for r in exact_l2.collect():
    truth_l2.setdefault(r["q_key"], set()).add(r["key"])


def recall_l2(df) -> float:
    got = {}
    for r in df.collect():
        got.setdefault(r["q_key"], set()).add(r["key"])
    scores = [
        len(got.get(q, set()) & t) / len(t) for q, t in truth_l2.items()
    ]
    return sum(scores) / len(scores)


from storage_spark.functions.vectors import pq_search_rerank  # noqa: E402

for m, kc, iters, rf in [
    (8, 16, 0, 0), (8, 16, 2, 0), (16, 16, 2, 0),
    (16, 16, 2, 10), (16, 16, 2, 20),
    (32, 16, 2, 10), (32, 16, 2, 20), (32, 16, 2, 30),
]:
    books = (
        pq_codebooks(DIM, m, kc)
        if iters == 0
        else pq_codebooks_kmeans(corpus, m=m, k=kc, iterations=iters, dim=DIM)
    )
    codes = pq_encode(corpus, books).cache()
    codes.count()
    t0 = time.time()
    if rf:
        out = pq_search_rerank(
            queries, codes, corpus, books, k=K, refine_factor=rf
        )
        label = f"PQ m={m} k={kc} kmeans{iters} rerank{rf}x"
    else:
        out = pq_adc_topk(queries, codes, books, K)
        label = f"PQ m={m} k={kc} kmeans{iters} raw-ADC"
    r = recall_l2(out)
    rows.append((label, r, time.time() - t0))
    print(f"  {label}: recall@{K} = {r:.3f}", flush=True)
    codes.unpersist()

# --- IVFPQ composite (L2 truth, like PQ)
from storage_spark.functions.vectors import ivfpq_search  # noqa: E402

cents_l2 = ivf_centroids_kmeans(corpus, 16, iterations=3, metric="l2").localCheckpoint()
assigned_l2 = ivf_assign(corpus, cents_l2, metric="l2").localCheckpoint()
books32 = pq_codebooks_kmeans(corpus, m=32, k=16, iterations=2, dim=DIM)
coded32 = (
    pq_encode(corpus, books32)
    .join(assigned_l2.select("key", "cell"), "key")
    .localCheckpoint()
)
for n_probe, rf in [(8, 20), (12, 30), (16, 30)]:
    t0 = time.time()
    r = recall_l2(
        ivfpq_search(
            queries, coded32, cents_l2, books32, corpus,
            k=K, n_probe=n_probe, refine_factor=rf, metric="l2", arrow=True,
        )
    )
    label = f"IVFPQ cells=16 probe={n_probe} m=32 rerank{rf}x"
    rows.append((label, r, time.time() - t0))
    print(f"  {label}: recall@{K} = {r:.3f}", flush=True)

print(f"\ncorpus={n_corpus} dim={DIM} queries={N_QUERIES} k={K} ({sf_dir})")
print("| path | config | recall@10 | wall s |")
print("|---|---|---|---|")
for label, r, w in rows:
    path, _, cfg = label.partition(" ")
    print(f"| {path} | {cfg} | {r:.3f} | {w:.1f} |")
