"""Dump .explain("formatted") for the r13-touched bench queries.

Usage: python tools/dump_plans_r13.py <suffix> [name,name,...]
Writes plans/r13/<name>_<suffix>.txt
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

suffix = sys.argv[1]
only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from storage_spark.session import get_spark
from storage_spark.tables import load_all

spark = get_spark("dump_plans_r13", cpus=8)
t = load_all(spark, sf_dir)


def fmt(df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


builders = {}


def reg(name):
    def deco(fn):
        builders[name] = fn
        return fn
    return deco


@reg("fat_jl_index_query")
def _fat_jl():
    from storage_spark.sources.annindex import ann_index_search, build_ann_index

    corpus = (
        spark.range(0, 4096, 1, 8)
        .select(
            F.col("id").cast("string").alias("key"),
            F.transform(
                F.sequence(F.lit(0), F.lit(767)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id"), i, F.lit(7)), F.lit(1000))
                    .cast("double") / 500.0 - 1.0
                ),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    qs = corpus.filter(F.col("key").cast("bigint") < 50).select(
        F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
    )
    d = tempfile.mkdtemp(prefix="plandump_jl_") + "/idx"
    build_ann_index(corpus, d, kind="jl_lsh", dim=768, out_dim=64,
                    n_vectors=4096, encode_arrow=True)
    return ann_index_search(spark, d, qs, k=10, probe_radius=1)


@reg("ann_multiprobe")
def _ann_mp():
    from storage_spark.functions.vectors import lsh_ann_join

    vectors = t["embeddings"].select(
        F.col("vec_id").cast("string").alias("key"), "embedding"
    )
    qs = vectors.filter(F.col("key").cast("bigint") % 500 == 0).select(
        F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
    )
    return lsh_ann_join(qs, vectors, k=10, dim=64, probe_radius=1,
                        n_corpus=vectors.count())


@reg("global_ids_10m")
def _gid():
    from storage_spark.operators.ordering import assign_global_ids

    big = spark.range(0, 10_000_000, 1, 32).select(
        F.concat(F.lit("f"), (F.col("id") % 1000).cast("string")).alias("folder"),
        F.concat(F.lit("obj-"), F.col("id").cast("string")).alias("name"),
    )
    return assign_global_ids(big, [F.col("folder"), F.col("name")],
                             group_col="folder")


@reg("semdedup")
def _sd():
    from storage_spark.operators.dedup import semantic_dedup

    vectors = t["embeddings"].select(
        F.col("vec_id").cast("string").alias("key"), "embedding"
    )
    return semantic_dedup(vectors, eps=0.65, n_docs=vectors.count()).filter(
        ~F.col("kept")
    )


@reg("lm_kn")
def _lmkn():
    from storage_spark.operators.pipeline import kn_bigram_score

    return kn_bigram_score(t["documents"]).agg(F.sum("score_milli"))


@reg("lm_unigram")
def _lmu():
    from storage_spark.operators.pipeline import unigram_logprob

    return unigram_logprob(t["documents"]).agg(
        F.sum("avg_nll"), F.sum("n_tokens")
    )


os.makedirs("plans/r13", exist_ok=True)
for name, fn in builders.items():
    if only and name not in only:
        continue
    df = fn()
    path = f"plans/r13/{name}_{suffix}.txt"
    with open(path, "w") as fh:
        fh.write(fmt(df))
    print(f"wrote {path}", flush=True)
spark.stop()
