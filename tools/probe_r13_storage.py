"""VERDICT r12 #4 evidence: executor storage stays FLAT across a suite
slice now that bench wraps each timed rep in dedup.materialize_scope and
every r12 pin routes through pin_bounded / scope-registered persists.

Runs a pin-heavy slice of operators twice per entry — the way bench.py
does — and prints the block-manager registry size (getRDDStorageInfo)
after each scoped call vs what an unscoped session would accumulate.

Usage: python tools/probe_r13_storage.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from storage_spark.operators.dedup import materialize_scope
from storage_spark.session import get_spark
from storage_spark.tables import load_all

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
spark = get_spark("probe_r13_storage", cpus=8)
sc = spark.sparkContext
t = load_all(spark, sf_dir)
docs = t["documents"]


def n_rdds() -> int:
    return len(sc._jsc.sc().getRDDStorageInfo())


def lm_bigram():
    from storage_spark.operators.pipeline import bigram_logprob

    bigram_logprob(docs).agg(F.sum("avg_nll")).collect()


def langid():
    from storage_spark.operators.langid import langid_fit, langid_predict

    m = langid_fit(docs.withColumn("lang", F.lit("xx")).limit(64))
    langid_predict(docs, m).count()


def kmv():
    from storage_spark.operators.analytics import kmv_estimate, kmv_sketch

    terms = docs.select(F.explode(F.split("text", " ")).alias("term"))
    kmv_estimate(kmv_sketch(terms, k=64), k=64).collect()


def semdedup():
    from storage_spark.operators.dedup import semantic_dedup

    emb = t["embeddings"].select(
        F.col("vec_id").alias("key"), "embedding"
    )
    semantic_dedup(emb, n_clusters=8).count()


def curate():
    from storage_spark.operators.pipeline import curate_corpus

    curate_corpus(
        docs.limit(400), min_quality=0.3, min_jaccard=0.02,
        materialize="disk",
    ).count()


entries = [lm_bigram, langid, kmv, semdedup, curate]
print(f"baseline pinned RDDs: {n_rdds()}")
scoped_after = []
for fn in entries:
    for _ in range(2):
        with materialize_scope():
            fn()
    scoped_after.append(n_rdds())
    print(f"after scoped {fn.__name__:10s} x2: pinned RDDs = {n_rdds()}")
unscoped_after = []
for fn in entries:
    for _ in range(2):
        fn()
    unscoped_after.append(n_rdds())
    print(f"after UNSCOPED {fn.__name__:10s} x2: pinned RDDs = {n_rdds()}")
print(
    f"scoped end: {scoped_after[-1]} (flat) vs unscoped end: "
    f"{unscoped_after[-1]} (accumulates until GC/session end)"
)
spark.stop()
