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


@reg("langid_predict_docs")
def _langid():
    from storage_spark.operators.langid import langid_fit, langid_predict

    lex = {
        "en": ["the", "and", "house", "water", "light", "with",
               "from", "night"],
        "de": ["der", "und", "haus", "wasser", "licht", "mit",
               "von", "nacht"],
        "fr": ["le", "et", "maison", "eau", "lumiere", "avec",
               "de", "nuit"],
        "es": ["el", "y", "casa", "agua", "luz", "con", "de",
               "noche"],
    }
    train = spark.createDataFrame(
        [(lang, " ".join(ws[(s * 3 + j) % 8] for j in range(6)))
         for lang, ws in lex.items() for s in range(8)],
        "lang string, text string",
    )
    m = langid_fit(train)
    return langid_predict(t["documents"], m).groupBy("lang").count()


@reg("lm_kn3")
def _lmkn3():
    from storage_spark.operators.pipeline import kn_trigram_score

    return kn_trigram_score(t["documents"]).agg(F.sum("score_milli"))


@reg("dsir_select")
def _dsir_sel():
    from storage_spark.operators.pipeline import dsir_sample

    docs = t["documents"]
    return dsir_sample(
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
        k=100,
        num_buckets=10_000,
    )


@reg("dsir_score")
def _dsir_score():
    import tempfile

    from storage_spark.operators.pipeline import dsir_model, dsir_sample
    from storage_spark.sources.textmodels import (
        load_text_model,
        save_text_model,
    )

    docs = t["documents"]
    d = tempfile.mkdtemp(prefix="plandump_dsir_")
    save_text_model(
        dsir_model(
            docs.filter(F.col("doc_id") % 5 != 0),
            docs.filter(F.col("doc_id") % 5 == 0),
            num_buckets=10_000,
        ),
        f"{d}/dsir", "dsir", {"num_buckets": 10_000},
    )
    m = load_text_model(spark, f"{d}/dsir")[0]
    return dsir_sample(
        docs.filter(F.col("doc_id") % 5 != 0),
        None, k=100, num_buckets=10_000, model=m,
    )


@reg("substring_spans")
def _spans():
    from storage_spark.operators.dedup import exact_substring_spans

    return exact_substring_spans(t["documents"], k=10)


@reg("line_dedup")
def _ld():
    from storage_spark.operators.dedup import line_dedup

    toks = F.split(F.col("text"), " ")
    nl = F.ceil(F.size(toks) / F.lit(5)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.array_join(F.slice(toks, i * 5 + 1, 5), " "),
    )
    docs = t["documents"].select(
        "doc_id", F.array_join(lines, "\n").alias("text")
    )
    return line_dedup(docs).agg(F.sum("n_lines_removed"))


@reg("embedding_neardup")
def _emb_nd():
    from storage_spark.operators.dedup import embedding_near_dup_pairs

    vectors = t["embeddings"].select(
        F.col("vec_id").cast("string").alias("key"), "embedding"
    )
    return embedding_near_dup_pairs(vectors, max_distance=0.2)


@reg("unigram_tok")
def _utok():
    from storage_spark.functions.bpe import unigram_tokenize, unigram_vocab

    v = unigram_vocab(t["documents"], max_size=400, max_len=4)
    return unigram_tokenize(t["documents"], v).agg(F.sum("n_pieces"))


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
