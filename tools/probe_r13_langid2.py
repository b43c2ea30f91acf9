"""r13 probe 2: dissect the langid fit-pin cost and the predict job.

Variants measured (steady, after warmup):
- pin      : m.localCheckpoint(eager=True)            (current)
- collect  : m.collect() wall (fit job alone, no checkpoint write)
- persistN : m.persist(DISK_ONLY); first consumer fills it
- predict phases with a PRE-pinned model: matched agg vs full job
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from storage_spark.session import get_spark
from storage_spark.tables import load_all

spark = get_spark("probe_langid2", cpus=cpus)
sc = spark.sparkContext
t = load_all(spark, sf_dir)
docs = t["documents"]

from storage_spark.operators.langid import (
    langid_feature_count,
    langid_features,
    langid_fit,
)

lex = {
    "en": ["the", "and", "house", "water", "light", "with", "from", "night"],
    "de": ["der", "und", "haus", "wasser", "licht", "mit", "von", "nacht"],
    "fr": ["le", "et", "maison", "eau", "lumiere", "avec", "de", "nuit"],
    "es": ["el", "y", "casa", "agua", "luz", "con", "de", "noche"],
}


def make_train():
    return spark.createDataFrame(
        [(lang, " ".join(ws[(s * 3 + j) % 8] for j in range(6)))
         for lang, ws in lex.items() for s in range(8)],
        "lang string, text string",
    )


train = make_train()

# warm up JVM paths
langid_fit(train).collect()

for rep in range(3):
    m = langid_fit(make_train())
    t0 = time.time(); rows = m.collect(); t1 = time.time()
    m2 = langid_fit(make_train())
    t2 = time.time(); mp = m2.localCheckpoint(eager=True); t3 = time.time()
    print(f"rep{rep}: fit.collect={t1-t0:.3f} ({len(rows)} rows)  "
          f"fit.localCheckpoint={t3-t2:.3f}", flush=True)

# jobs in the fit: count via status tracker
st = sc.statusTracker()
before = len(st.getJobIdsForGroup() or [])

# predict-job decomposition with a PRE-pinned model (pin outside timing)
mp = langid_fit(make_train()).localCheckpoint(eager=True)
n = 3
id_col, text_col = "doc_id", "text"
grams = docs.select(
    F.col(id_col).alias("doc_id"),
    F.explode(langid_features(F.col(text_col), n)).alias("gram"),
)
nd = docs.select(
    F.col(id_col).alias("doc_id"),
    langid_feature_count(F.col(text_col), n).cast("bigint").alias("n_grams"),
).filter(F.col("n_grams") > 0)
matched = (
    grams.join(mp.filter(F.col("gram") != ""), "gram")
    .groupBy("doc_id", "lang")
    .agg(F.sum("w_milli").alias("mw"), F.count(F.lit(1)).alias("mk"))
)
langs = mp.filter(F.col("gram") == "").select("lang", F.col("w_milli").alias("oov"))
z = F.lit(0)
scores = (
    nd.crossJoin(F.broadcast(langs))
    .join(matched, ["doc_id", "lang"], "left")
    .select(
        "doc_id", "lang",
        (F.coalesce(F.col("mw"), z)
         + (F.col("n_grams") - F.coalesce(F.col("mk"), z)) * F.col("oov")
         ).cast("long").alias("score_milli"),
        F.col("n_grams").cast("long").alias("n_grams"),
    )
)
preds = scores.groupBy("doc_id").agg(
    F.min_by("lang", F.struct((-F.col("score_milli")).alias("ns"),
                              F.col("lang").alias("l"))).alias("lang")
)
final = (
    docs.select(F.col(id_col).alias("doc_id"))
    .join(preds, "doc_id", "left")
    .select("doc_id", F.coalesce(F.col("lang"), F.lit("und")).alias("lang"))
)

def timeit(tag, df):
    for r in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"  {tag} rep{r}: {time.time()-t0:.3f}", flush=True)

timeit("grams-explode only", grams)
timeit("matched agg", matched)
timeit("scores", scores)
timeit("preds (argmax)", preds)
timeit("final (join docs)", final)
t0 = time.time()
final.groupBy("lang").count().count()
print(f"  bench-tail groupBy(lang).count: {time.time()-t0:.3f}", flush=True)
spark.stop()
