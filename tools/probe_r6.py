"""Round-6 sf1 probes (run ad hoc, results recorded in NOTES_r6.md):

1. DEFAULT-path dedup at 50k docs / 20k vectors — the verdict-r5 #1
   closure: simhash() with no width derives 48 bits via sig_bits_for;
   embedding_near_dup_pairs() with no geometry derives via
   embedding_planes_for. r5 measured the old static defaults at
   391 s / 244 s on this exact corpus.
2. asof_nearest at sf1 after the single-window change (r5: 10 s vs
   0.7 s for asof_latest).
3. curate_corpus materialization A/B: checkpoint vs cache vs disk vs
   off at 50k docs.

Usage: python tools/probe_r6.py [1|2|3 ...]  (default: all)
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
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.1f}s  ({out})", flush=True)
    return dt


def probe_dedup_defaults(spark):
    from storage_spark.operators.dedup import (
        embedding_near_dup_pairs,
        simhash,
        simhash_near_pairs,
    )

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    vecs = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        F.col("vec_id").cast("string").alias("key"), "embedding"
    )
    print("probe 1: default-path dedup at sf1", flush=True)

    def run_simhash():
        sim = simhash(docs)  # derives width from the 50k count
        bits = sim.schema["simhash"].metadata["sig_bits"]
        n = simhash_near_pairs(sim, max_hamming=3, materialize=True).count()
        return f"{bits} bits, {n} pairs"

    timed("simhash default path", run_simhash)

    def run_emb():
        n = embedding_near_dup_pairs(
            vecs, max_distance=0.2, materialize=True
        ).count()
        return f"{n} pairs"

    timed("embedding_near_dup default path", run_emb)


def probe_asof_nearest(spark):
    from storage_spark.operators.temporal import asof_join

    print("probe 2: asof nearest single-window at sf1", flush=True)
    raw = spark.read.parquet(f"{SF1}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev = raw.select(
        "event_id",
        F.concat(F.lit("user-"), (F.col("user_id") % 10).cast("string")).alias(
            "owner"
        ),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
    )
    obj = raw.select(
        F.concat(F.lit("user-"), (F.col("user_id") % 10).cast("string")).alias(
            "owner"
        ),
        F.unix_millis(F.col("ts")).alias("created_at_ms"),
        F.col("event_id").alias("obj_id"),
    )
    for direction in ("backward", "nearest"):
        timed(
            f"asof {direction} (no tiebreak)",
            lambda d=direction: asof_join(
                ev, obj, on="owner", left_ts="ts_ms",
                right_ts="created_at_ms", right_cols=["obj_id"], direction=d,
            ).count(),
        )


def probe_curate_ab(spark):
    from storage_spark.operators.pipeline import curate_corpus

    print("probe 3: curate_corpus materialization A/B at sf1", flush=True)
    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    for strategy in (False, "checkpoint", "cache", "disk"):
        timed(
            f"materialize={strategy!r}",
            lambda s=strategy: curate_corpus(
                docs, min_quality=0.5, min_jaccard=0.01, materialize=s
            ).count(),
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"1", "2", "3"}
    spark = get_spark()
    if "1" in which:
        probe_dedup_defaults(spark)
    if "2" in which:
        probe_asof_nearest(spark)
    if "3" in which:
        probe_curate_ab(spark)
    spark.stop()
