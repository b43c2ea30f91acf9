"""sf1-scale probes for the r10 operators (langid / trigram KN /
quantile sketch): wall-clock at 50k docs on a 16g driver — the
"does the plan bend at 10x" check every round runs on its new
operators. Needs /tmp/sf1 (tools/make_sf1.py) and
PYSPARK_SUBMIT_ARGS="--driver-memory 16g pyspark-shell"."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from storage_spark.session import get_spark  # noqa: E402
from storage_spark.tables import load_all  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark("probe_r10_sf1")
    t = load_all(spark, sf_dir)
    docs = t["documents"]
    n = docs.count()
    print(f"docs: {n}")

    def wall(name, fn, reps=2):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            walls.append(round(time.time() - t0, 2))
        print(f"{name:28s} {walls} -> {out}")

    from storage_spark.operators.pipeline import kn_trigram_score

    wall("kn_trigram (fit+score)", lambda: kn_trigram_score(docs).agg(
        F.sum("score_milli"), F.count(F.lit(1))
    ).collect()[0][1])

    from storage_spark.operators.analytics import (
        histogram_quantiles,
        qlog_histogram,
    )

    wall("qlog_quantiles (len)", lambda: histogram_quantiles(
        qlog_histogram(docs.select(F.length("text").alias("v")), "v"),
        [500, 900, 990],
    ).count())
    wall("qlog_quantiles per lang", lambda: histogram_quantiles(
        qlog_histogram(
            docs.select("lang", F.length("text").alias("v")), "v",
            group_cols=["lang"],
        ),
        [500, 990], group_cols=["lang"],
    ).count())

    # langid: fit on the fixture lexicons (bounded), PREDICT over all
    # sf1 docs — the scoring side is the corpus-scale path
    from storage_spark.operators.langid import langid_fit, langid_predict

    lex = {
        "en": ["the", "and", "house", "water", "light", "with", "from",
               "night"],
        "de": ["der", "und", "haus", "wasser", "licht", "mit", "von",
               "nacht"],
        "fr": ["le", "et", "maison", "eau", "lumiere", "avec", "de",
               "nuit"],
        "es": ["el", "y", "casa", "agua", "luz", "con", "de", "noche"],
    }
    train = spark.createDataFrame(
        [(lang, " ".join(ws[(s * 3 + j) % 8] for j in range(6)))
         for lang, ws in lex.items() for s in range(8)],
        "lang string, text string",
    )
    m = langid_fit(train).localCheckpoint(eager=True)
    wall("langid_predict (all docs)", lambda: langid_predict(
        docs, m
    ).groupBy("lang").count().count())


if __name__ == "__main__":
    main()
