"""r13 probe 3: why does a 32-row langid fit cost 1.2 s?

Times: (a) trivial one-shuffle micro jobs for per-stage overhead;
(b) the fit with default confs; (c) fit with fewer createDataFrame
partitions; (d) a window-based weights derivation (fewer stages).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32

from pyspark.sql import Window
from pyspark.sql import functions as F

from storage_spark.session import get_spark

spark = get_spark("probe_langid3", cpus=cpus)
sc = spark.sparkContext

from storage_spark.functions.bpe import _qlog2_milli
from storage_spark.operators.langid import langid_fit, langid_fit_stats

lex = {
    "en": ["the", "and", "house", "water", "light", "with", "from", "night"],
    "de": ["der", "und", "haus", "wasser", "licht", "mit", "von", "nacht"],
    "fr": ["le", "et", "maison", "eau", "lumiere", "avec", "de", "nuit"],
    "es": ["el", "y", "casa", "agua", "luz", "con", "de", "noche"],
}
rows = [(lang, " ".join(ws[(s * 3 + j) % 8] for j in range(6)))
        for lang, ws in lex.items() for s in range(8)]


def make_train(npart=None):
    df = spark.createDataFrame(rows, "lang string, text string")
    if npart:
        df = df.coalesce(npart)
    return df


# warmup
langid_fit(make_train()).collect()

def bench(tag, fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time(); fn(); ts.append(time.time() - t0)
    print(f"{tag}: {' '.join(f'{x:.3f}' for x in ts)}", flush=True)

bench("micro: createDF(32).collect", lambda: make_train().collect())
bench("micro: one groupBy shuffle", lambda: make_train().groupBy("lang").count().collect())
bench("fit.collect (current)", lambda: langid_fit(make_train()).collect())
bench("fit.collect coalesce(1) input", lambda: langid_fit(make_train(1)).collect())


def fit_window(train):
    stats = langid_fit_stats(train)
    # per-lang totals + global distinct-gram count via windows over the
    # BOUNDED stats table (no joins, no second aggregation pass)
    wl = Window.partitionBy("lang")
    wg = Window.orderBy("gram").rowsBetween(Window.unboundedPreceding,
                                            Window.unboundedFollowing)
    st = (
        stats
        .withColumn("tot", F.sum("c").over(wl))
        .withColumn("_dr", F.dense_rank().over(Window.orderBy("gram")))
        .withColumn("g_sz", F.max("_dr").over(wg))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("lang").orderBy("gram")))
    )
    denom = _qlog2_milli(F.col("tot") + F.col("g_sz"))
    w = st.select(
        "lang", "gram",
        (_qlog2_milli(F.col("c") + F.lit(1)) - denom).alias("w_milli"),
        "_rn",
    )
    oov = st.filter(F.col("_rn") == 1).select(
        "lang", F.lit("").alias("gram"), (-denom).alias("w_milli"),
        F.col("_rn"),
    )
    return w.unionByName(oov).select("lang", "gram", "w_milli")


bench("fit_window.collect", lambda: fit_window(make_train()).collect())
bench("fit_window.collect coalesce(1)", lambda: fit_window(make_train(1)).collect())

# equality check
a = sorted(map(tuple, langid_fit(make_train()).collect()))
b = sorted(map(tuple, fit_window(make_train()).collect()))
print("window fit equal:", a == b, len(a), len(b), flush=True)
spark.stop()
