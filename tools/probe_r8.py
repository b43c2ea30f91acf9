"""Round-8 sf1 probes (VERDICT r7 #6 — run ad hoc, results recorded in
NOTES_r8.md):

1. incremental_minhash_pairs batch cadence: 10 batches of 5k docs
   probed against a growing band index (0 -> 45k docs indexed) vs the
   one-shot minhash_lsh_pairs over all 50k — per-batch wall as the
   index grows confirms (or refutes) "cost = batch x occupancy, never
   corpus".
2. incremental_semantic_dedup batch cadence: 10 batches of 2k vectors
   against a growing cell index (quantizer fixed from the full corpus,
   as a production ingest pipeline would train it once) vs the one-shot
   semantic_dedup over all 20k.
3. dedup_ingest_batch fixed overhead: one gate tick at epoch sizes
   50 / 500 / 2000 / 5000 against a ~10k-doc index — where does the
   ~6-jobs/tick fixed cost stop dominating wall?

Usage: python tools/probe_r8.py [1|2|3 ...]  (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF1 = os.environ.get("SF1_DIR", "/tmp/sf1")


def get_spark():
    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def probe_incremental_minhash(spark):
    from storage_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )

    from pyspark.sql import Window

    # sf1 ids are SPARSE (0..905k for 50k docs) — batch by rank, not id
    docs = (
        spark.read.parquet(f"{SF1}/documents.parquet")
        .select("doc_id", "text")
        .withColumn(
            "_rk", F.row_number().over(Window.orderBy("doc_id")) - 1
        )
        .localCheckpoint(eager=True)
    )
    n_total = docs.count()
    print(f"probe 1: incremental minhash cadence over {n_total} docs")
    batch_sz = 5000
    index = None
    total_inc = 0.0
    for b in range(n_total // batch_sz):
        lo, hi = b * batch_sz, (b + 1) * batch_sz
        batch = docs.filter(
            (F.col("_rk") >= lo) & (F.col("_rk") < hi)
        ).drop("_rk")
        t0 = time.time()
        if index is None:
            # epoch 0: nothing to probe — the batch indexes itself
            from storage_spark.operators.dedup import minhash_band_index

            pairs_n = minhash_lsh_pairs(batch).count()
            new_bands = minhash_band_index(batch)
        else:
            pairs, new_bands = incremental_minhash_pairs(index, batch)
            pairs_n = pairs.count()
        new_bands = new_bands.localCheckpoint(eager=True)
        index = new_bands if index is None else index.unionByName(new_bands)
        index = index.localCheckpoint(eager=True)
        dt = time.time() - t0
        total_inc += dt
        print(
            f"  batch {b}: indexed={lo} wall={dt:.1f}s pairs={pairs_n}",
            flush=True,
        )
    t0 = time.time()
    one_shot = minhash_lsh_pairs(docs, materialize=True).count()
    dt = time.time() - t0
    print(f"  one-shot over {n_total}: wall={dt:.1f}s pairs={one_shot}")
    print(f"  incremental total: {total_inc:.1f}s")


def probe_incremental_semantic(spark):
    from storage_spark.functions.vectors import ivf_assign, ivf_centroids_kmeans
    from storage_spark.operators.dedup import (
        incremental_semantic_dedup,
        semantic_cells_for,
        semantic_dedup,
    )

    from pyspark.sql import Window

    # sf1 vec_ids are sparse (0..92k for 20k rows) — batch by rank
    vecs = (
        spark.read.parquet(f"{SF1}/embeddings.parquet")
        .select(F.col("vec_id").cast("string").alias("key"), "embedding")
        .withColumn(
            "_rk",
            F.row_number().over(Window.orderBy(F.col("key").cast("bigint")))
            - 1,
        )
        .localCheckpoint(eager=True)
    )
    n_total = vecs.count()
    cells = semantic_cells_for(n_total)
    print(
        f"probe 2: incremental semantic cadence over {n_total} vectors "
        f"({cells} cells, quantizer trained once on the full corpus)"
    )
    cents = (
        ivf_centroids_kmeans(vecs, cells, iterations=2, metric="cosine")
        .select("cell", F.col("centroid").cast("array<float>").alias("centroid"))
        .localCheckpoint(eager=True)
    )
    batch_sz = 2000
    index = None
    total_inc = 0.0
    for b in range(n_total // batch_sz):
        lo, hi = b * batch_sz, (b + 1) * batch_sz
        batch = vecs.filter(
            (F.col("_rk") >= lo) & (F.col("_rk") < hi)
        ).drop("_rk")
        t0 = time.time()
        if index is None:
            new_rows = ivf_assign(batch, cents, "cosine")
            kept_n = new_rows.count()
        else:
            kept, new_rows = incremental_semantic_dedup(
                batch, index, cents, eps=0.65
            )
            kept_n = kept.count()
        new_rows = new_rows.localCheckpoint(eager=True)
        index = new_rows if index is None else index.unionByName(new_rows)
        index = index.localCheckpoint(eager=True)
        dt = time.time() - t0
        total_inc += dt
        print(
            f"  batch {b}: indexed={lo} wall={dt:.1f}s kept={kept_n}",
            flush=True,
        )
    t0 = time.time()
    one_shot = (
        semantic_dedup(vecs, eps=0.65, n_docs=n_total)
        .filter(F.col("kept"))
        .count()
    )
    dt = time.time() - t0
    print(f"  one-shot over {n_total}: wall={dt:.1f}s kept={one_shot}")
    print(f"  incremental total: {total_inc:.1f}s")


def probe_ingest_overhead(spark):
    import shutil
    import tempfile

    from storage_spark.streaming.ingest import dedup_ingest_batch

    docs = (
        spark.read.parquet(f"{SF1}/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    print("probe 3: ingest-gate wall vs epoch size (10k-doc settled index)")
    for size in (50, 500, 2000, 5000):
        d = tempfile.mkdtemp(prefix="probe_ingest_")
        ix, acc = os.path.join(d, "ix"), os.path.join(d, "acc")
        # settle a 10k-doc index first (one big epoch), then time a tick
        dedup_ingest_batch(
            docs.filter(F.col("doc_id") < 10_000), 0, ix, acc
        )
        batch = docs.filter(
            (F.col("doc_id") >= 10_000) & (F.col("doc_id") < 10_000 + size)
        )
        t0 = time.time()
        dedup_ingest_batch(batch, 1, ix, acc)
        dt = time.time() - t0
        print(
            f"  epoch={size}: wall={dt:.2f}s  per-doc={dt / size * 1000:.2f}ms",
            flush=True,
        )
        shutil.rmtree(d, ignore_errors=True)


PROBES = {
    "1": probe_incremental_minhash,
    "2": probe_incremental_semantic,
    "3": probe_ingest_overhead,
}

if __name__ == "__main__":
    which = sys.argv[1:] or sorted(PROBES)
    spark = get_spark()
    for w in which:
        PROBES[w](spark)
