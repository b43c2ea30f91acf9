"""r11 probe: the corpus-scale COST of the word-boundary langid profile
(word_ns=(1, 2)) vs char-only — the throughput-ceiling delta for the
COVERAGE.md table. Predict over all sf1 docs (50k, ~700 chars each) on
a 16g driver; the word features add ~|tokens| + |tokens−1| occurrences
per doc on top of ~|chars| char trigrams, so the per-occurrence model
join grows ~+35 %% in rows — the probe measures what that costs in
walls. Needs /tmp/sf1 (tools/make_sf1.py) and
PYSPARK_SUBMIT_ARGS="--driver-memory 16g pyspark-shell"."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from storage_spark.operators.langid import (  # noqa: E402
    langid_fit,
    langid_predict,
)
from storage_spark.session import get_spark  # noqa: E402
from storage_spark.tables import load_all  # noqa: E402

LEX = {
    "en": ["the", "and", "house", "water", "light", "with", "from", "night"],
    "de": ["der", "und", "haus", "wasser", "licht", "mit", "von", "nacht"],
    "fr": ["le", "et", "maison", "eau", "lumiere", "avec", "de", "nuit"],
    "es": ["el", "y", "casa", "agua", "luz", "con", "de", "noche"],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark("probe_r11_langid_words")
    t = load_all(spark, sf_dir)
    docs = t["documents"]
    print(f"docs: {docs.count()}")

    train = spark.createDataFrame(
        [(lang, " ".join(ws[(s * 3 + j) % 8] for j in range(6)))
         for lang, ws in LEX.items() for s in range(8)],
        "lang string, text string",
    )
    for word_ns in [(), (1, 2)]:
        m = langid_fit(train, word_ns=word_ns).localCheckpoint(eager=True)
        walls = []
        for _ in range(2):
            t0 = time.time()
            langid_predict(
                docs, m, word_ns=word_ns
            ).groupBy("lang").count().count()
            walls.append(round(time.time() - t0, 1))
        print(f"word_ns={word_ns}: predict walls {walls}")

    spark.stop()


if __name__ == "__main__":
    main()


def prune_probe(sf_dir: str = "/tmp/sf1") -> None:
    """Corpus-scale cost/agreement of langid_prune (the fastText-style
    quantized-pruning lever): fit on the sf1 corpus's OWN lang labels
    (a dense, real-gram-distribution model — the fixture lexicons are
    too sparse to exercise the matched-occurrence amplification), then
    predict with the full vs pruned model and measure wall + label
    agreement. Run: python -c "import sys; sys.path.insert(0, '.');
    from tools.probe_r11_langid_words import prune_probe; prune_probe()"
    """
    from pyspark.sql import functions as F

    from storage_spark.operators.langid import (
        langid_fit,
        langid_predict,
        langid_prune,
    )

    spark = get_spark("probe_r11_langid_prune")
    t = load_all(spark, sf_dir)
    docs = t["documents"]
    m = langid_fit(docs, lang_col="lang").localCheckpoint(eager=True)
    n_rows = m.count()
    print(f"full model rows: {n_rows:,}")

    def run(model, tag):
        walls = []
        for _ in range(2):
            t0 = time.time()
            langid_predict(docs, model).groupBy("lang").count().count()
            walls.append(round(time.time() - t0, 1))
        print(f"{tag}: predict walls {walls}")

    run(m, "full")
    preds_full = langid_predict(docs, m).withColumnRenamed("lang", "lf")
    for k in (20000, 5000, 1000):
        pm = langid_prune(m, keep_top=k).localCheckpoint(eager=True)
        print(f"keep_top={k}: model rows {pm.count():,}")
        run(pm, f"pruned@{k}")
        agree = (
            preds_full.join(langid_predict(docs, pm), "doc_id")
            .filter(F.col("lf") == F.col("lang")).count()
        )
        print(f"  agreement with full: {agree}/{docs.count()}")
    spark.stop()
