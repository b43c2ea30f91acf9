"""r13 probe: fat_jl_index_query / ann_multiprobe — DataFrame build wall
vs execute wall, matching the bench entries' construction exactly.

Run: python tools/probe_r13_fatjl.py [cpus]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from storage_spark.session import get_spark
from storage_spark.tables import load_all

spark = get_spark("probe_fatjl", cpus=cpus)
t = load_all(spark, sf_dir)

from storage_spark.sources.annindex import ann_index_search, build_ann_index

corpus = (
    spark.range(0, 4096, 1, cpus)
    .select(
        F.col("id").cast("string").alias("key"),
        F.transform(
            F.sequence(F.lit(0), F.lit(767)),
            lambda i: (
                F.pmod(
                    F.xxhash64(F.col("id"), i, F.lit(7)), F.lit(1000)
                ).cast("double") / 500.0 - 1.0
            ),
        ).alias("embedding"),
    )
    .localCheckpoint(eager=True)
)
queries = corpus.filter(F.col("key").cast("bigint") < 50).select(
    F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
)

d = tempfile.mkdtemp(prefix="probe_jlidx_") + "/idx"
build_ann_index(corpus, d, kind="jl_lsh", dim=768, out_dim=64,
                n_vectors=4096, encode_arrow=True)

for rep in range(3):
    t0 = time.time()
    df = ann_index_search(spark, d, queries, k=10, probe_radius=1)
    t1 = time.time()
    n = df.count()
    t2 = time.time()
    print(f"fat_jl rep{rep}: build={t1-t0:.3f} execute={t2-t1:.3f} "
          f"total={t2-t0:.3f} rows={n}", flush=True)

# ann_multiprobe entry shape (dim 64 embeddings table)
from storage_spark.functions.vectors import lsh_ann_join

vectors = t["embeddings"].select(
    F.col("vec_id").cast("string").alias("key"), "embedding"
)
qs = vectors.filter(F.col("key").cast("bigint") % 500 == 0).select(
    F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
)
n_corpus = vectors.count()
for rep in range(3):
    t0 = time.time()
    df = lsh_ann_join(qs, vectors, k=10, dim=64, probe_radius=1,
                      n_corpus=n_corpus)
    t1 = time.time()
    n = df.count()
    t2 = time.time()
    print(f"ann_multiprobe-ish rep{rep}: build={t1-t0:.3f} "
          f"execute={t2-t1:.3f} total={t2-t0:.3f} rows={n}", flush=True)

import shutil

shutil.rmtree(os.path.dirname(d), ignore_errors=True)
spark.stop()
