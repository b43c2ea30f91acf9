"""r13 probe: where does langid_predict_docs spend its wall at 32 cores?

Splits the bench entry into phases: train-df build, fit plan build,
model pin (the eager localCheckpoint inside langid_score), predict plan
build, and the final job. Run: python tools/probe_r13_langid.py [cpus]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from storage_spark.session import get_spark
from storage_spark.tables import load_all

spark = get_spark("probe_langid", cpus=cpus)
t = load_all(spark, sf_dir)

from storage_spark.operators.langid import langid_fit, langid_predict, langid_score

lex = {
    "en": ["the", "and", "house", "water", "light", "with", "from", "night"],
    "de": ["der", "und", "haus", "wasser", "licht", "mit", "von", "nacht"],
    "fr": ["le", "et", "maison", "eau", "lumiere", "avec", "de", "nuit"],
    "es": ["el", "y", "casa", "agua", "luz", "con", "de", "noche"],
}


def one_rep(tag):
    t0 = time.time()
    train = spark.createDataFrame(
        [(lang, " ".join(ws[(s * 3 + j) % 8] for j in range(6)))
         for lang, ws in lex.items() for s in range(8)],
        "lang string, text string",
    )
    t1 = time.time()
    m = langid_fit(train)
    t2 = time.time()
    # phase: the eager pin langid_score does internally
    spark.sparkContext.setJobDescription(f"{tag}: model pin")
    mp = m.localCheckpoint(eager=True)
    t3 = time.time()
    pred = langid_predict(t["documents"], mp)
    out = pred.groupBy("lang").count()
    t4 = time.time()
    spark.sparkContext.setJobDescription(f"{tag}: predict job")
    out.count()
    t5 = time.time()
    spark.sparkContext.setJobDescription(None)
    print(
        f"{tag}: train_df={t1-t0:.3f} fit_build={t2-t1:.3f} pin={t3-t2:.3f} "
        f"plan_build={t4-t3:.3f} job={t5-t4:.3f} total={t5-t0:.3f}",
        flush=True,
    )


for i in range(4):
    one_rep(f"rep{i}")

# and the bench entry verbatim for the reference wall
for i in range(2):
    t0 = time.time()
    train = spark.createDataFrame(
        [(lang, " ".join(ws[(s * 3 + j) % 8] for j in range(6)))
         for lang, ws in lex.items() for s in range(8)],
        "lang string, text string",
    )
    m = langid_fit(train)
    langid_predict(t["documents"], m).groupBy("lang").count().count()
    print(f"bench-entry rep{i}: {time.time()-t0:.3f}", flush=True)

spark.stop()
