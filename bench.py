"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headliners are the scale-stressing plans (SURVEY §6 derived targets):
- full-namespace hierarchical listing as ONE job (vs the reference's
  28 ms/page × N pages skip-scan serving loop — 0050:54-56);
- orphan reconciliation as two anti-joins in one pass (vs 1000-key probe
  batches — scanner.ts:147-215);
- usage aggregation, exact vector top-k, banded MinHash dedup sweep,
  event-time rollup, metadata-DSL filtering, and a wide lineitem
  aggregation as the large-scan proxy.
"""

from __future__ import annotations

import json
import os
import sys
import time


#: entries that run in a FRESH second session (VERDICT r9 #2): a long
#: single-session suite accumulates 40+ entries' shuffle files + JVM
#: pressure by the time these late heavy entries run, inflating their
#: MEDIANS 2-4x over isolated cost (min-of-N stays honest — the stalls
#: are additive — but the published median then misrepresents the
#: engine). Isolated min-of-4 re-probes reproduced the record values
#: (NOTES_r9), so the fix is session isolation, not plan work.
_FRESH_SESSION = {
    "lm_bigram", "lm_bigram_skew", "dsir_select", "lm_bigram_score",
    "dsir_score", "bpe_train_merges", "bpe_merge_score",
    "fat_jl_index_query", "fat_lsh_keysonly_query",
}


def _run(
    sf_dir: str,
    cpus: int,
    only: set[str] | None,
    repeats: int,
    heavy_reps: int,
    skip: set[str] = frozenset(),
    stall_reruns: dict[str, int] | None = None,
    stall_suspect: list[str] | None = None,
) -> tuple[dict, dict]:
    """One SparkSession's worth of the suite: build the session, run the
    entries in ``only`` (None = all) minus ``skip``, stop the session,
    return (min_timings, median_timings). ``stall_reruns`` (if given)
    accumulates per-entry counts of stall-guard re-runs (VERDICT r10 #1b)."""
    from pyspark.sql import functions as F

    from storage_spark.session import get_spark
    from storage_spark.tables import load_all

    spark = get_spark("storage_spark_bench", cpus=cpus)
    t = load_all(spark, sf_dir)

    from storage_spark.functions.jsonmeta import compile_filter
    from storage_spark.functions.vectors import query_vectors
    from storage_spark.operators.aggregates import bucket_usage
    from storage_spark.operators.dedup import minhash_lsh_pairs
    from storage_spark.operators.listing import list_objects_with_delimiter
    from storage_spark.operators.reconcile import consistency_report

    vectors = t["embeddings"].select(
        F.col("vec_id").cast("string").alias("key"), "embedding"
    )

    def full_listing():
        # every level-1 folder + root leaves across every bucket, one job
        return list_objects_with_delimiter(t["objects"], prefix="").count()

    def deep_listing():
        # nested listing inside one bucket/prefix (level-2 folders + leaves)
        return list_objects_with_delimiter(
            t["objects"], bucket_id="Brand#13", prefix="ECONOMY/"
        ).count()

    def reconcile():
        return consistency_report(t["objects"], t["s3_keys"]).count()

    def reconcile_10m():
        # orphan scan over 10M keys each side (vs the reference's 1000-key
        # probe pages — 10k round trips, scanner.ts:147-215): one full-outer
        # pass finds all orphans in both directions.
        n = 10_000_000
        db = spark.range(0, n, 1, cpus * 2).select(
            F.concat(F.lit("b/k"), F.col("id").cast("string"), F.lit("/v1")).alias("key")
        )
        s3 = (
            spark.range(0, n, 1, cpus * 2)
            .filter(F.col("id") % 1000 != 0)
            .select(
                F.concat(F.lit("b/k"), F.col("id").cast("string"), F.lit("/v1")).alias(
                    "key"
                )
            )
            .unionByName(
                spark.range(0, 5000, 1, 4).select(
                    F.concat(F.lit("b/extra"), F.col("id").cast("string")).alias("key")
                )
            )
        )
        # consistency_report derives keys from (bucket,name,version); feed
        # pre-built keys through the same full-outer plan
        j = db.select("key", F.lit(1).alias("_db")).join(
            s3.select("key", F.lit(1).alias("_s3")), "key", "full"
        )
        return j.filter(F.col("_db").isNull() | F.col("_s3").isNull()).count()

    def usage():
        return bucket_usage(t["objects"]).count()

    def vector_topk():
        return query_vectors(vectors, [1.0] * 64, top_k=10).count()

    def minhash_sweep():
        return minhash_lsh_pairs(t["documents"], n=3, n_hashes=8, band_size=2, materialize=True).count()

    def simhash_pairs():
        # banded pigeonhole pairing over the whole documents table —
        # the plan that replaced the O(N^2) crossJoin. simhash16 PINS the
        # 16-bit width to stay r2-comparable; the operator DEFAULT
        # (simhash(df), n_bits=None) now sizes the signature from the
        # corpus via sig_bits_for — at 50k docs it picks 48 bits (6.5 s)
        # where this pinned 16-bit config measured 391 s (NOTES_r5).
        from storage_spark.operators.dedup import simhash16, simhash_near_pairs

        sim = simhash16(t["documents"])
        return simhash_near_pairs(sim, max_hamming=3, materialize=True).count()

    def embedding_neardup():
        # banded hyperplane-LSH near-dup over the full embeddings table,
        # on the operator's DEFAULT path: geometry derives from the
        # corpus (embedding_planes_for) — ~2k vectors at sf0.1 derive the
        # r2-comparable (8 planes, 4-bit bands); at sf1's 20k vectors the
        # rule widens to (14, 7) instead of the 244 s static-default
        # cliff NOTES_r5 measured. arrow=False (the default JVM
        # expression path) since the r4 hyperplane fix: candidate volume
        # dropped 5x and at this volume Arrow batch transfer costs more
        # than it saves (NOTES_r4 §6).
        from storage_spark.operators.dedup import embedding_near_dup_pairs

        return embedding_near_dup_pairs(
            vectors, max_distance=0.2, materialize=True
        ).count()

    # counted once at setup: semdedup's n_docs hint (the corpus-size
    # derivation input, not part of the operator's measured work)
    n_vectors = vectors.count()

    def semdedup():
        # cluster-scoped semantic dedup over the full embeddings table on
        # the DEFAULT corpus-sized cluster count (semantic_cells_for's
        # balanced sqrt(n/2) rule: ~2k vectors at sf0.1 derive 32 cells,
        # splitting cost evenly between the n x cells assignment scan and
        # the within-cell pairing — the r7 sf1 probe's operating point).
        from storage_spark.operators.dedup import semantic_dedup

        return (
            semantic_dedup(vectors, eps=0.65, n_docs=n_vectors)
            .filter(~F.col("kept"))
            .count()
        )

    def gopher_rules():
        # Gopher quality audit over the full documents table (VERDICT r7
        # #8: the text-quality stack enters the suite) — map-only, one
        # scan; the filter on `passes` forces every rule column
        from storage_spark.operators.pipeline import gopher_rules as _gr

        return _gr(t["documents"]).filter(F.col("passes")).count()

    def curate_gated():
        # end-to-end composed curation (VERDICT r11 #7): trained NB gate
        # → heuristic quality gate → exact dedup → near-dup removal as
        # ONE declarative plan — the user-facing composition cost the
        # per-operator entries can't see (gate selectivity feeding the
        # shingle joins, one shared scan). Same composition the driver
        # grades for correctness (q_curate_corpus_gated), fit included:
        # the gate model is corpus-derived, so a fresh corpus pays it.
        from storage_spark.operators.pipeline import (
            curate_corpus,
            nb_quality_model,
        )

        docs = t["documents"]
        model = nb_quality_model(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        )
        # materialize="disk" — the operator's documented at-scale
        # sharing setting (same flag the driver-graded q_curate_corpus
        # rows use as of r12); results identical, shared stages persist
        # lazily instead of re-planning per consumer
        return curate_corpus(
            docs, min_quality=0.5, min_jaccard=0.01,
            classifier=model, min_logit_1e4=0, materialize="disk",
        ).count()

    def lm_unigram():
        # CCNet-style LM scoring, broadcast vocab join (the default
        # path); the agg over avg_nll forces the ordered per-doc fold
        from storage_spark.operators.pipeline import unigram_logprob

        return (
            unigram_logprob(t["documents"])
            .agg(F.sum("avg_nll"), F.sum("n_tokens"))
            .collect()[0][0]
        )

    def lm_bigram():
        # conditional-fluency upgrade, pair vocabulary broadcast
        from storage_spark.operators.pipeline import bigram_logprob

        return (
            bigram_logprob(t["documents"])
            .agg(F.sum("avg_nll"), F.sum("n_tokens"))
            .collect()[0][0]
        )

    def lm_bigram_skew():
        # the 100 TB pair-vocabulary path (r8: skew_split on the
        # (prev, tok) key): head_size 1000 forces a REAL tail shuffle at
        # this sf — the broadcast/skew pair quantifies the strategy cost
        # when the pair table is small enough that broadcast still wins
        from storage_spark.operators.pipeline import bigram_logprob

        return (
            bigram_logprob(
                t["documents"], model_join="skew_split", head_size=1000
            )
            .agg(F.sum("avg_nll"), F.sum("n_tokens"))
            .collect()[0][0]
        )

    def dsir_select():
        # hashed-n-gram importance resampling (r8): two bucket-model
        # fits + the per-doc fold + Gumbel-top-k cut, on the documents
        # table's deterministic target/raw split — the model is bounded
        # by num_buckets at any corpus size (the op's scale property)
        from storage_spark.operators.pipeline import dsir_sample

        docs = t["documents"]
        return dsir_sample(
            docs.filter(F.col("doc_id") % 5 != 0),
            docs.filter(F.col("doc_id") % 5 == 0),
            k=100,
            num_buckets=10_000,
        ).count()

    # -- persisted-model scoring pair (r9): the production shape fits
    # once and scores many times; these entries measure the SCORE side
    # alone against the fit-included lm_bigram / dsir_select entries --
    _tm: dict = {"dir": None, "bi": None, "uni": None, "dsir": None}

    def _text_models():
        if _tm["dir"] is None:
            import tempfile

            from storage_spark.operators.pipeline import (
                bigram_model,
                dsir_model,
                unigram_model,
            )
            from storage_spark.sources.textmodels import (
                load_text_model,
                save_text_model,
            )

            d = tempfile.mkdtemp(prefix="bench_textmodels_")
            docs = t["documents"]
            save_text_model(unigram_model(docs), f"{d}/uni", "unigram")
            save_text_model(bigram_model(docs), f"{d}/bi", "bigram")
            save_text_model(
                dsir_model(
                    docs.filter(F.col("doc_id") % 5 != 0),
                    docs.filter(F.col("doc_id") % 5 == 0),
                    num_buckets=10_000,
                ),
                f"{d}/dsir", "dsir", {"num_buckets": 10_000},
            )
            _tm["dir"] = d
            _tm["uni"] = load_text_model(spark, f"{d}/uni")[0]
            _tm["bi"] = load_text_model(spark, f"{d}/bi")[0]
            _tm["dsir"] = load_text_model(spark, f"{d}/dsir")[0]
        return _tm

    def lm_bigram_score():
        # score-only wall under persisted models — the delta vs
        # lm_bigram is what fit-once amortizes away per scoring job
        from storage_spark.operators.pipeline import bigram_logprob

        m = _text_models()
        return (
            bigram_logprob(t["documents"], m["bi"], m["uni"])
            .agg(F.sum("avg_nll"), F.sum("n_tokens"))
            .collect()[0][0]
        )

    def dsir_score():
        # selection under a persisted (b, lw) table: one explode + one
        # broadcast join + TakeOrdered — no fit anywhere in the window
        from storage_spark.operators.pipeline import dsir_sample

        m = _text_models()
        return dsir_sample(
            t["documents"].filter(F.col("doc_id") % 5 != 0),
            None, k=100, num_buckets=10_000, model=m["dsir"],
        ).count()

    _bpe: dict = {"merges": None}

    def bpe_train_merges():
        # true merge-frequency BPE training (r9): 12 rounds of
        # pair-count -> argmax -> one replace over the distinct-word
        # state (localCheckpoint-ed per round — N linear passes)
        from storage_spark.functions.bpe import bpe_learn_merges

        m = bpe_learn_merges(t["documents"], num_merges=12)
        if _bpe["merges"] is None:
            _bpe["merges"] = m
        return m.count()

    def bpe_merge_score():
        # apply-side wall under a fixed merge table: a pure chained-
        # replace EXPRESSION per doc, map-only, no UDF and no join
        from storage_spark.functions.bpe import bpe_merge_tokenize

        if _bpe["merges"] is None:
            bpe_train_merges()
        return (
            bpe_merge_tokenize(t["documents"], _bpe["merges"])
            .agg(F.sum("n_subwords"))
            .collect()[0][0]
        )

    def substring_spans():
        # exact substring dedup (Lee et al. 2022, r9): rolling k=10
        # shingle inverted index over the full documents table → cross-doc
        # hash filter → per-doc span merge; one content-keyed shuffle +
        # one per-doc window
        from storage_spark.operators.dedup import exact_substring_spans

        return exact_substring_spans(t["documents"], k=10).count()

    def lm_kn():
        # Kneser-Ney bigram scoring incl. the continuation-count fit
        # (r9): explode + three model joins + 1-row totals cross
        from storage_spark.operators.pipeline import kn_bigram_score

        return kn_bigram_score(t["documents"]).agg(
            F.sum("score_milli")
        ).collect()[0][0]

    def langid_predict_docs():
        # trained language-ID over the whole documents table (r10):
        # fit on the bounded fixture lexicons, PREDICT corpus-wide —
        # one explode + broadcast model join + groupBy(doc, lang)
        from storage_spark.operators.langid import (
            langid_fit,
            langid_predict,
        )

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
        return langid_predict(t["documents"], m).groupBy("lang").count().count()

    def lm_kn3():
        # trigram Kneser-Ney (r10): the 3→2→1 backoff chain — one
        # posexplode + five model equi-joins + 1-row totals cross
        from storage_spark.operators.pipeline import kn_trigram_score

        return kn_trigram_score(t["documents"]).agg(
            F.sum("score_milli")
        ).collect()[0][0]

    def unigram_tok():
        # Unigram-LM Viterbi segmentation incl. the lattice fit (r9):
        # one count + TakeOrdered for the vocab, memoized map-only DP
        from storage_spark.functions.bpe import (
            unigram_tokenize,
            unigram_vocab,
        )

        v = unigram_vocab(t["documents"], max_size=400, max_len=4)
        return unigram_tokenize(t["documents"], v).agg(
            F.sum("n_pieces")
        ).collect()[0][0]

    def media_render():
        # mixed-format render canary (r9): PNG / baseline JPEG /
        # progressive JPEG / GIF / lossless WebP blobs through the
        # magic-dispatching pixel codec (decode → cover 16x16 →
        # re-encode), Arrow map-only; guards all five codec paths.
        # r11: the WebP re-encode leg now emits the color cache —
        # palette-heavy streams measure 0.58-0.75x the r10 cache-off
        # bytes (test_webpcodec pins the shrink); wall impact here is
        # noise-level (the cache tokenizer is one dict pass)
        import numpy as np
        import pandas as pd

        from storage_spark.functions.imagecodec import (
            gif_encode,
            jpeg_encode,
            jpeg_encode_progressive,
            png_encode,
        )
        from storage_spark.functions.webpcodec import webp_encode
        from storage_spark.operators.multimodal import transform_images

        base = spark.range(300).select(F.col("id").cast("long").alias("k"))

        def _gen(it):
            for pdf in it:
                out = []
                for k in pdf["k"].to_numpy():
                    k = int(k)
                    yy, xx = np.mgrid[0:24, 0:32]
                    img = np.stack(
                        [(xx * 5 + k) % 256, (yy * 3) % 256,
                         np.full((24, 32), k % 256)], axis=2
                    ).astype(np.uint8)
                    m = k % 5
                    if m == 0:
                        b = png_encode(img)
                    elif m == 1:
                        b = jpeg_encode(img, quality=90, subsampling="420")
                    elif m == 2:
                        b = jpeg_encode_progressive(img, quality=90)
                    elif m == 3:
                        # GIF is palette-bound (≤256 colors): posterize
                        b = gif_encode([(img // 64) * 64])
                    else:
                        b = webp_encode(img)
                    out.append((str(k), b))
                yield pd.DataFrame(out, columns=["key", "content"])

        blobs = base.mapInPandas(_gen, "key string, content binary")
        return transform_images(blobs, 16, 16, resize="cover",
                                quality=90).count()

    def sketch_stats():
        # CMS heavy hitters + HLL cardinality over the full documents
        # token stream (r9) + qlog quantile sketch over doc lengths
        # (r10): three bounded-output aggregations — the corpus-stats
        # pass a 100 TB pipeline runs before curation
        from storage_spark.operators.analytics import (
            heavy_hitters_cms,
            histogram_quantiles,
            hll_estimate,
            hll_sketch,
            qlog_histogram,
        )

        toks = t["documents"].select(
            F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        hh = heavy_hitters_cms(t["documents"], k=20).count()
        est = hll_estimate(hll_sketch(toks)).collect()[0].est_x1000
        lens = t["documents"].select(F.length("text").alias("v"))
        qn = histogram_quantiles(
            qlog_histogram(lens, "v"), [500, 990]
        ).count()
        return hh + est + qn

    def line_dedup():
        # CCNet line dedup (r9): 5-word derived lines, keep-first winners
        # via ONE min-struct aggregation (no window/join on the line
        # table); cost = one line-hash shuffle + one per-doc rebuild
        from storage_spark.operators.dedup import line_dedup as _ld

        toks = F.split(F.col("text"), " ")
        nl = F.ceil(F.size(toks) / F.lit(5)).cast("int")
        lines = F.transform(
            F.sequence(F.lit(0), nl - 1),
            lambda i: F.array_join(F.slice(toks, i * 5 + 1, 5), " "),
        )
        docs = t["documents"].select(
            "doc_id", F.array_join(lines, "\n").alias("text")
        )
        return _ld(docs).agg(F.sum("n_lines_removed")).collect()[0][0]

    # -- fat-embedding (dim-768) index pair: jl_lsh vs keys-only lsh --
    _fat: dict = {"df": None, "jl": None, "ko": None}

    def _fat_corpus(n: int):
        # deterministic 768-dim pseudorandom corpus (uncompressible, the
        # r7 keys-only probe's shape at bench-friendly n)
        return (
            spark.range(n)
            .select(
                F.col("id").cast("string").alias("key"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(767)),
                    lambda i: (
                        F.pmod(
                            F.xxhash64(
                                F.concat_ws(
                                    ":",
                                    F.col("id").cast("string"),
                                    i.cast("string"),
                                )
                            ),
                            F.lit(1000),
                        ).cast("double")
                        / 500.0
                        - 1.0
                    ),
                ).alias("embedding"),
            )
            .localCheckpoint(eager=True)
        )

    def _fat_vectors():
        if _fat["df"] is None:
            _fat["df"] = _fat_corpus(4096)
        return _fat["df"]

    def _fat_queries_of(df):
        return df.filter(F.col("key").cast("bigint") < 50).select(
            F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
        )

    def _fat_queries():
        return _fat_queries_of(_fat_vectors())

    def _fat_jl_path():
        import tempfile

        from storage_spark.sources.annindex import build_ann_index

        if _fat["jl"] is None:
            d = tempfile.mkdtemp(prefix="bench_jlidx_") + "/idx"
            # encode_arrow: bitwise-identical projection, vectorized —
            # 59 s -> ~5 s build at this shape (the expression fold is
            # out_dim x dim interpreted steps per row; NOTES_r8)
            build_ann_index(
                _fat_vectors(), d, kind="jl_lsh", dim=768, out_dim=64,
                n_vectors=4096, encode_arrow=True,
            )
            _fat["jl"] = d
        return _fat["jl"]

    def fat_jl_index_query():
        # the managed jl_lsh index (r8) at dim 768: postings live in the
        # 64-dim projection (the VERDICT recipe), candidates rank there,
        # exact rerank on originals — per-candidate distance math and
        # posting scan bytes both shrink 12x vs raw dim. The index build
        # happens OUTSIDE the timing windows (r10): with capped repeats,
        # a first-repeat build lands in the median.
        from storage_spark.sources.annindex import ann_index_search

        return ann_index_search(
            spark, _fat_jl_path(), _fat_queries(), k=10, probe_radius=1
        ).count()

    def _fat_ko_path():
        import tempfile

        from storage_spark.sources.annindex import build_ann_index

        if _fat["ko"] is None:
            d = tempfile.mkdtemp(prefix="bench_jlko_") + "/idx"
            build_ann_index(
                _fat_vectors(), d, kind="lsh", dim=768,
                store_vectors=False, n_vectors=4096,
            )
            _fat["ko"] = d
        return _fat["ko"]

    def fat_lsh_keysonly_query():
        # the r7 alternative for fat embeddings: keys-only postings at
        # FULL dim — candidate ranking pays 768-dim distance math (the
        # r7 probe: at this dim the distance math dominates query wall);
        # built outside the timing windows, like the jl pair
        from storage_spark.sources.annindex import ann_index_search

        return ann_index_search(
            spark, _fat_ko_path(), _fat_queries(), k=10, probe_radius=1
        ).count()

    def events_rollup():
        return (
            t["events"]
            .groupBy(F.date_trunc("hour", F.col("ts")), F.col("event_type"))
            .agg(F.count(F.lit(1)), F.sum("value"))
            .count()
        )

    def meta_filter():
        ast = {"$and": [{"k": {"$gte": 30}}, {"k": {"$lt": 60}}]}
        return t["events"].filter(compile_filter(ast, "props")).count()

    def lineitem_agg():
        return (
            t["lineitem"]
            .filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                F.count(F.lit(1)),
            )
            .count()
        )

    # materialized production layout: bucket-partitioned, name-sorted files —
    # the shape where prefix pushdown + partition pruning actually bite.
    # Built lazily (and pre-built OUTSIDE the timing windows below) so a
    # session that runs no mat_* entry never pays the write.
    import tempfile

    _mat: dict = {"dir": None, "df": None}

    def _mat_df():
        if _mat["dir"] is None:
            from storage_spark.sources.layout import write_listing_layout

            d = tempfile.mkdtemp(prefix="bench_objects_")
            write_listing_layout(t["objects"], d + "/objects")
            _mat["dir"] = d
            _mat["df"] = spark.read.parquet(d + "/objects")
        return _mat["df"]

    def mat_prefix_listing():
        return list_objects_with_delimiter(
            _mat_df(), bucket_id="Brand#13", prefix="ECONOMY/"
        ).count()

    def mat_usage():
        return bucket_usage(_mat_df()).count()

    def listing_10m():
        # the reference's own benchmark dataset shape: 10M rows, 1000
        # folders (0050-search-v2-optimised.sql:54-56). Page-at-a-time
        # skip-scan serves this at ~28 ms/page -> >=280 s for all 10k
        # pages; one distributed common-prefix job lists it whole.
        big = spark.range(0, 10_000_000, 1, cpus * 4).select(
            F.concat(
                F.lit("f"),
                (F.col("id") % 1000).cast("string"),
                F.lit("/obj-"),
                F.col("id").cast("string"),
                F.lit(".bin"),
            ).alias("name"),
            F.col("id").cast("string").alias("id"),
            (F.col("id") % 97_000).alias("size"),
            (F.lit(1704067200000) + F.col("id")).alias("created_at_ms"),
            (F.lit(1704067200000) + F.col("id")).alias("updated_at_ms"),
            F.lit("application/octet-stream").alias("mimetype"),
        )
        return list_objects_with_delimiter(big, prefix="").count()

    def search_v1_10m():
        # search-v1's case-insensitive hybrid page over the same 10M-row
        # reference benchmark shape: lower(name) range filter + folder
        # groupBy with case-preserving min-struct representative + merged
        # offset page — the dashboard search box as ONE distributed job
        # (names generated mixed-case so the lower() path is real work)
        from storage_spark.operators.listing import search_objects_v1

        big = spark.range(0, 10_000_000, 1, cpus * 4).select(
            F.concat(
                F.when(F.col("id") % 2 == 0, F.lit("F")).otherwise(F.lit("f")),
                (F.col("id") % 1000).cast("string"),
                F.lit("/Obj-"),
                F.col("id").cast("string"),
                F.lit(".bin"),
            ).alias("name"),
            F.col("id").cast("string").alias("id"),
            (F.col("id") % 97_000).alias("size"),
            (F.lit(1704067200000) + F.col("id")).alias("created_at_ms"),
            (F.lit(1704067200000) + F.col("id")).alias("updated_at_ms"),
            F.lit("application/octet-stream").alias("mimetype"),
            F.lit("b").alias("bucket_id"),
        )
        return search_objects_v1(
            big, "b", search="f1", levels=1, limit=100, offset=10
        ).count()

    def _skewed_objects():
        # 10M rows, ONE bucket holding ~50% of them (hot-tenant shape):
        # the worst aggregation skew a storage namespace produces.
        n = 10_000_000
        return spark.range(0, n, 1, cpus * 4).select(
            F.when(F.col("id") % 2 == 0, F.lit("hot-bucket"))
            .otherwise(F.concat(F.lit("b"), (F.col("id") % 997).cast("string")))
            .alias("bucket_id"),
            F.concat(F.lit("k/"), F.col("id").cast("string")).alias("name"),
            (F.col("id") % 97_000).alias("size"),
        )

    def skewed_usage_plain():
        return bucket_usage(_skewed_objects()).count()

    def skewed_usage_salted():
        from storage_spark.operators.aggregates import salted_usage

        return salted_usage(_skewed_objects(), salt_buckets=32).count()

    def skewed_distinct_plain():
        # distinct names per bucket: the shuffle carries the hot key's
        # VALUE SET to one reducer — the skew partial-agg can't fix
        from storage_spark.operators.aggregates import distinct_usage

        return distinct_usage(_skewed_objects()).count()

    def skewed_distinct_salted():
        from storage_spark.operators.aggregates import salted_distinct_usage

        return salted_distinct_usage(
            _skewed_objects(), salt_buckets=32
        ).count()

    def ann_multiprobe():
        # the recommended ANN operating point (NOTES_r4: recall@10 = 0.92):
        # multi-probe Hamming-1 x 4 tables, 50 queries over the corpus
        from storage_spark.functions.vectors import lsh_ann_join

        queries = (
            vectors.orderBy("key")
            .limit(50)
            .select(F.col("key").alias("q_key"), F.col("embedding").alias("q_vec"))
        )
        return lsh_ann_join(
            queries, vectors, k=10, dim=64, n_planes=4,
            probe_radius=1, n_tables=4,
        ).count()

    _ann_idx: dict = {"path": None}

    def ann_index_query():
        # the SAME operating point as ann_multiprobe, but against the
        # PERSISTED index (sources/annindex.py): the corpus-side encode
        # is built once (first repeat; min-of-N reports the steady-state
        # query-only cost) — the pair quantifies what persistence
        # amortizes away per query
        import tempfile

        from storage_spark.sources.annindex import (
            ann_index_search,
            build_ann_index,
        )

        if _ann_idx["path"] is None:
            d = tempfile.mkdtemp(prefix="bench_annidx_") + "/idx"
            build_ann_index(
                vectors, d, kind="lsh", dim=64, n_planes=4, n_tables=4
            )
            _ann_idx["path"] = d
        queries = (
            vectors.orderBy("key")
            .limit(50)
            .select(F.col("key").alias("q_key"), F.col("embedding").alias("q_vec"))
        )
        return ann_index_search(
            spark, _ann_idx["path"], queries, k=10, probe_radius=1
        ).count()

    _ann_idx_ko: dict = {"path": None}

    def ann_index_keysonly():
        # the bench pair for store_vectors=False (VERDICT r5 #5): same
        # operating point as ann_index_query, but posting rows carry
        # (key, norm, sig) instead of duplicating the embedding
        # xn_tables (4x here) — the probe pays one extra equi-join
        # against the single full-precision vectors table per DEDUPED
        # candidate. The entry quantifies that storage-for-join trade on
        # the query side; storage shrink is n_tables x vector bytes.
        import tempfile

        from storage_spark.sources.annindex import (
            ann_index_search,
            build_ann_index,
        )

        if _ann_idx_ko["path"] is None:
            d = tempfile.mkdtemp(prefix="bench_annidx_ko_") + "/idx"
            build_ann_index(
                vectors, d, kind="lsh", dim=64, n_planes=4, n_tables=4,
                store_vectors=False,
            )
            _ann_idx_ko["path"] = d
        queries = (
            vectors.orderBy("key")
            .limit(50)
            .select(F.col("key").alias("q_key"), F.col("embedding").alias("q_vec"))
        )
        return ann_index_search(
            spark, _ann_idx_ko["path"], queries, k=10, probe_radius=1
        ).count()

    def snapshot_commit():
        # table-format commit path: create v1 from the object catalog,
        # copy-on-write upsert one bucket into v2 (untouched partitions
        # carried by reference), read the committed snapshot
        import shutil
        import tempfile

        from storage_spark.sources.snapshots import SnapshotTable

        d = tempfile.mkdtemp(prefix="bench_snap_")
        try:
            tbl = SnapshotTable(spark, d + "/t")
            tbl.create(t["objects"])
            updates = (
                t["objects"]
                .filter(F.col("bucket_id") == "Brand#13")
                .withColumn("size", F.col("size") + 1)
            )
            tbl.merge_upsert(updates, ["bucket_id", "name"])
            return tbl.read(partitions=["Brand#13"]).count()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    # PQ index build (one-time indexing cost, like the materialized layout
    # above): deterministic codebooks + encoded corpus, kept hot — the
    # bench measures QUERY cost over the compressed codes
    from storage_spark.functions.vectors import (
        pq_codebooks,
        pq_encode,
        pq_search_rerank,
    )

    pq_books = pq_codebooks(64, 8, 16)
    _pq: dict = {"codes": None}

    def _pq_codes():
        if _pq["codes"] is None:
            _pq["codes"] = pq_encode(vectors, pq_books).localCheckpoint(
                eager=True
            )
        return _pq["codes"]

    def pq_rerank():
        queries_df = (
            vectors.orderBy("key")
            .limit(50)
            .select(F.col("key").alias("q_key"), F.col("embedding").alias("q_vec"))
        )
        # arrow=True: vectorized ADC gather (bitwise-equal to the
        # expression fold, test_vectors) — ~30% faster at this pair
        # volume, and the gap widens with corpus size
        return pq_search_rerank(
            queries_df, _pq_codes(), vectors, pq_books, k=10,
            refine_factor=20, arrow=True,
        ).count()

    # SQ8 index (same one-time-build/hot-query split as PQ above): the
    # bench pair {pq_rerank, sq8_rerank} contrasts the two compressed
    # tiers at the same query shape — PQ scans m=8 bytes/vector with a
    # 20x refine, SQ8 scans dim bytes/vector with a 4x refine (its
    # reconstructions rank near-exactly). Locally both are CPU-bound on
    # the candidate math; the at-scale difference is scan bytes.
    from storage_spark.functions.vectors import sq_encode, sq_search_rerank

    _sq: dict = {"codes": None}

    def _sq_codes():
        if _sq["codes"] is None:
            _sq["codes"] = sq_encode(vectors).localCheckpoint(eager=True)
        return _sq["codes"]

    def sq8_rerank():
        queries_df = (
            vectors.orderBy("key")
            .limit(50)
            .select(F.col("key").alias("q_key"), F.col("embedding").alias("q_vec"))
        )
        return sq_search_rerank(
            queries_df, _sq_codes(), vectors, k=10, refine_factor=4
        ).count()

    def sessionization():
        from storage_spark.operators.sessions import session_stats

        return session_stats(t["events"], gap_seconds=1800).count()

    def asof_10m():
        # 10M-event backward as-of join against a 100k-row versioned
        # dimension over 10k keys: union + running last(ignorenulls) —
        # ONE shuffle on the key, no per-event range probe. The naive
        # plan (non-equi join + argmax) is quadratic in rows-per-key.
        from storage_spark.operators.temporal import asof_join

        left = spark.range(0, 10_000_000, 1, cpus * 4).select(
            (F.col("id") % 10_000).alias("k"),
            (F.col("id") * 7 % 1_000_000_000).alias("t"),
            F.col("id").alias("event_id"),
        )
        right = spark.range(0, 100_000, 1, cpus * 2).select(
            (F.col("id") % 10_000).alias("k"),
            (F.col("id") * 9973 % 1_000_000_000).alias("vt"),
            F.col("id").alias("version_id"),
        )
        out = asof_join(
            left, right, on="k", left_ts="t", right_ts="vt",
            right_cols=["version_id"], tiebreak="version_id",
        )
        return out.agg(
            F.count("version_id"), F.sum("version_id")
        ).collect()[0][0]

    def _asof_hot_inputs():
        left = spark.range(0, 5_000_000, 1, cpus * 4).select(
            F.lit("hot").alias("k"),
            (F.col("id") * 7 % 1_000_000_000).alias("t"),
            F.col("id").alias("eid"),
        )
        right = spark.range(0, 100_000, 1, cpus * 2).select(
            F.lit("hot").alias("k"),
            (F.col("id") * 9973 % 1_000_000_000).alias("vt"),
            F.col("id").alias("vid"),
        )
        return left, right

    def asof_skew_plain():
        # ONE hot key: the whole 5M-row partition sorts in a single
        # window task — the hazard asof_join's docstring warns about
        from storage_spark.operators.temporal import asof_join

        left, right = _asof_hot_inputs()
        # bucketed=False: this entry deliberately measures the hazard
        # plan the tolerance auto-routing now avoids
        return asof_join(
            left, right, on="k", left_ts="t", right_ts="vt",
            right_cols=["vid"], tiebreak="vid", tolerance=50_000_000,
            bucketed=False,
        ).agg(F.count("vid")).collect()[0][0]

    def asof_skew_bucketed():
        # same inputs through (key, time-bucket) windows — 20 partitions
        # instead of 1; results proven identical (test_asof_pandas_equiv)
        from storage_spark.operators.temporal import asof_join_bucketed

        left, right = _asof_hot_inputs()
        return asof_join_bucketed(
            left, right, on="k", left_ts="t", right_ts="vt",
            right_cols=["vid"], tiebreak="vid", tolerance=50_000_000,
        ).agg(F.count("vid")).collect()[0][0]

    def interval_10m():
        # 10M points against 100k half-open windows (5k wide) through the
        # bin-bucketed equi-join (10k bins) — the plan a naive inequality
        # join would run as BroadcastNestedLoop over 10^12 pairs
        from storage_spark.operators.temporal import interval_join

        pts = spark.range(0, 10_000_000, 1, cpus * 4).select(
            (F.col("id") * 13 % 1_000_000_000).alias("t"),
            F.col("id").alias("pid"),
        )
        ivs = spark.range(0, 100_000, 1, cpus * 2).select(
            F.col("id").alias("wid"),
            (F.col("id") * 9973 % 1_000_000_000).alias("s"),
        ).withColumn("e", F.col("s") + 5_000)
        return interval_join(
            pts, ivs, "t", "s", "e", bin_width=10_000
        ).count()

    def global_ids_10m():
        # contiguous ids over 10M rows in (folder, name) total order via
        # the grouped prefix-sum plan — 1000 parallel per-group windows +
        # a broadcast offset table; the row_number()-OVER-(ORDER BY) it
        # replaces would drag all 10M rows through ONE task
        from storage_spark.operators.ordering import assign_global_ids

        big = spark.range(0, 10_000_000, 1, cpus * 4).select(
            F.concat(F.lit("f"), (F.col("id") % 1000).cast("string")).alias("folder"),
            F.concat(F.lit("obj-"), F.col("id").cast("string")).alias("name"),
        )
        out = assign_global_ids(
            big, [F.col("folder"), F.col("name")], group_col="folder"
        )
        return out.select(F.max("global_id")).collect()[0][0]

    queries = {
        "full_listing": full_listing,
        "listing_10m": listing_10m,
        "search_v1_10m": search_v1_10m,
        "mat_prefix_listing": mat_prefix_listing,
        "mat_usage": mat_usage,
        "deep_listing": deep_listing,
        "reconcile": reconcile,
        "reconcile_10m": reconcile_10m,
        "usage": usage,
        "skewed_usage_plain": skewed_usage_plain,
        "skewed_usage_salted": skewed_usage_salted,
        "skewed_distinct_plain": skewed_distinct_plain,
        "skewed_distinct_salted": skewed_distinct_salted,
        "ann_multiprobe": ann_multiprobe,
        "ann_index_query": ann_index_query,
        "ann_index_keysonly": ann_index_keysonly,
        "pq_rerank": pq_rerank,
        "sq8_rerank": sq8_rerank,
        "snapshot_commit": snapshot_commit,
        "sessionization": sessionization,
        "global_ids_10m": global_ids_10m,
        "asof_10m": asof_10m,
        "interval_10m": interval_10m,
        "asof_skew_plain": asof_skew_plain,
        "asof_skew_bucketed": asof_skew_bucketed,
        "vector_topk": vector_topk,
        "minhash_sweep": minhash_sweep,
        "simhash_pairs": simhash_pairs,
        "embedding_neardup": embedding_neardup,
        "semdedup": semdedup,
        "events_rollup": events_rollup,
        "meta_filter": meta_filter,
        "lineitem_agg": lineitem_agg,
        "gopher_rules": gopher_rules,
        "curate_gated": curate_gated,
        "lm_unigram": lm_unigram,
        "lm_bigram": lm_bigram,
        "lm_bigram_skew": lm_bigram_skew,
        "dsir_select": dsir_select,
        "lm_bigram_score": lm_bigram_score,
        "dsir_score": dsir_score,
        "bpe_train_merges": bpe_train_merges,
        "bpe_merge_score": bpe_merge_score,
        "substring_spans": substring_spans,
        "line_dedup": line_dedup,
        "sketch_stats": sketch_stats,
        "media_render": media_render,
        "lm_kn": lm_kn,
        "lm_kn3": lm_kn3,
        "langid_predict_docs": langid_predict_docs,
        "unigram_tok": unigram_tok,
        "fat_jl_index_query": fat_jl_index_query,
        "fat_lsh_keysonly_query": fat_lsh_keysonly_query,
    }

    if only is not None:
        queries = {k: v for k, v in queries.items() if k in only}
    if skip:
        queries = {k: v for k, v in queries.items() if k not in skip}

    # one-time index/layout builds for the session's entries, OUTSIDE
    # the timing windows (the mat/pq/sq entries have never included
    # their build cost — keep it that way across the session split)
    if {"mat_prefix_listing", "mat_usage"} & queries.keys():
        _mat_df()
    if "pq_rerank" in queries:
        _pq_codes()
    if "sq8_rerank" in queries:
        _sq_codes()
    # persisted-model and fat-index builds likewise stay out of the
    # timing windows: the score-only / query-only entries measure the
    # amortized production shape, and with capped repeats a first-run
    # build would land in the MEDIAN (r10 — the last med>>min source
    # after the session split)
    if {"lm_bigram_score", "dsir_score"} & queries.keys():
        _text_models()
    if "fat_jl_index_query" in queries:
        _fat_jl_path()
    if "fat_lsh_keysonly_query" in queries:
        _fat_ko_path()

    # warm the JVM + file listings once (steady-state timing, not cold-start)
    t["objects"].count()
    # ...and the Arrow/pandas-UDF worker pool: a session's FIRST pandas
    # UDF pays Python-worker spawn + Arrow init — measured 5.5 s vs
    # 1.3 s steady on pq_rerank's trial walls (NOTES_r7 probe 4, the
    # bench's first arrow entry and the r6 "bimodal median" finding).
    # One tiny vectorized eval moves that cost out of the timing windows.
    from storage_spark.functions.vectors import l2_distance_arrow

    spark.range(1).select(
        l2_distance_arrow(
            F.array(F.lit(0.0)), F.array(F.lit(0.0))
        ).alias("_warm")
    ).count()

    # Repeat each query and report the MIN: this VM's shuffle-cleanup stalls
    # (NOTES_r1.md §2: identical plans swing 2 s -> 400 s with 80% kernel
    # time) are strictly additive noise, so the fastest repeat is the
    # engine's real cost and the statistic is reproducible across harness
    # runs. GC-settle between repeats keeps the cleanup out of the next
    # timing window.
    def settle() -> None:
        spark._jvm.System.gc()  # noqa: SLF001
        time.sleep(0.5)

    import statistics

    # NOTES_r8 #2: the driver's bench budget is finite — per-entry repeat
    # caps on the heavy LM/fat entries (>4 s steady, whose first repeat
    # also absorbs a cached build) keep the wall inside the budget
    # without removing coverage. 2 reps still yields one post-build
    # steady run for the min.
    _HEAVY = {
        "lm_bigram", "lm_bigram_skew", "dsir_select", "lm_bigram_score",
        "dsir_score", "fat_jl_index_query", "fat_lsh_keysonly_query",
        "bpe_train_merges", "langid_predict_docs", "curate_gated",
    }
    # the fat pair gets a third repeat: with query-only ~7 s walls a
    # single VM shuffle-stall outlier dominates a 2-rep MEDIAN (r10:
    # one 20.7 s rep vs 6.6-7.5 s isolated min-of-4); median-of-3
    # sheds one outlier for ~14 s of extra suite wall
    _REPS_OVERRIDE = {"fat_jl_index_query": 3, "fat_lsh_keysonly_query": 3}
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    # Release scope per rep (r13, VERDICT r12 #4): every pin an operator
    # makes inside the timed fn (model tables, batch bands, sketches,
    # DISK_ONLY assignment persists) is registered with the scope and
    # freed AFTER the rep's wall is captured — the pin's creation cost
    # stays inside the timed region (nothing is shaved), but entry N no
    # longer runs against N-1 entries' leaked executor-storage blocks.
    # tools/probe_r13_storage.py demonstrates flat storage across a
    # suite slice with this in place.
    from storage_spark.operators.dedup import materialize_scope

    def _timed(f) -> float:
        t0 = time.time()
        with materialize_scope():
            f()
            return time.time() - t0

    for name, fn in queries.items():
        n_reps = _REPS_OVERRIDE.get(
            name, min(repeats, heavy_reps) if name in _HEAVY else repeats
        )
        n_reps = min(n_reps, repeats)
        runs: list[float] = []
        for _ in range(max(1, n_reps)):
            runs.append(_timed(fn))
            settle()
        # Stall guard (VERDICT r10 #1b): this VM's shuffle-cleanup stalls
        # are additive and transient (NOTES_r1 §2 — identical plans swing
        # 2 s -> 400 s with 80% kernel time), so a median/min spread > 2x
        # on a non-trivial entry means a stalled rep landed in the
        # median, not that the engine regressed. Re-run once after an
        # extra GC settle and let the fresh rep displace the outlier.
        if (
            stall_reruns is not None
            and len(runs) >= 2
            and min(runs) > 0.3
            and statistics.median(runs) / min(runs) > 2.0
        ):
            settle()
            time.sleep(1.0)
            fresh = _timed(fn)
            runs.append(fresh)
            settle()
            runs.sort()
            # Only displace the outlier when the fresh rep CONFIRMS it was
            # a stall (fresh itself inside the 2x spread of the fastest
            # rep). A genuinely bimodal regression keeps all reps and the
            # entry is flagged stall-suspect instead of shaved.
            if fresh / min(runs) <= 2.0:
                runs = runs[:-1]  # drop the worst rep; median over the rest
                stall_reruns[name] = stall_reruns.get(name, 0) + 1
            elif stall_suspect is not None:
                stall_suspect.append(name)
        timings[name] = round(min(runs), 3)
        medians[name] = round(statistics.median(runs), 3)

    import shutil

    if _mat["dir"]:
        shutil.rmtree(_mat["dir"], ignore_errors=True)  # no full copy leak
    if _ann_idx["path"]:
        shutil.rmtree(os.path.dirname(_ann_idx["path"]), ignore_errors=True)
    if _ann_idx_ko["path"]:
        shutil.rmtree(os.path.dirname(_ann_idx_ko["path"]), ignore_errors=True)
    for _k in ("jl", "ko"):
        if _fat[_k]:
            shutil.rmtree(os.path.dirname(_fat[_k]), ignore_errors=True)
    if _tm["dir"]:
        shutil.rmtree(_tm["dir"], ignore_errors=True)
    spark.stop()
    return timings, medians


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    heavy_reps = int(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_REPEATS", "2"))
    single = os.environ.get("SPARK_GRAFT_BENCH_SINGLE_SESSION") == "1"

    stall_reruns: dict[str, int] = {}
    stall_suspect: list[str] = []
    if single:
        timings, medians = _run(
            sf_dir, cpus, None, repeats, heavy_reps,
            stall_reruns=stall_reruns, stall_suspect=stall_suspect,
        )
    else:
        # VERDICT r9 #2: the heavy text-model/fat-embedding entries run
        # in a FRESH second session, after the 40+ light entries' shuffle
        # files and JVM pressure are gone with the first session — their
        # medians then measure the engine, not the harness's litter.
        timings, medians = _run(
            sf_dir, cpus, None, repeats, heavy_reps,
            skip=_FRESH_SESSION, stall_reruns=stall_reruns,
            stall_suspect=stall_suspect,
        )
        t2, m2 = _run(
            sf_dir, cpus, set(_FRESH_SESSION), repeats, heavy_reps,
            stall_reruns=stall_reruns, stall_suspect=stall_suspect,
        )
        timings.update(t2)
        medians.update(m2)

    full = {
        "metric": "storage_spark headline suite wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        # min stays the headline (comparable with prior rounds; the VM's
        # additive shuffle-cleanup stalls make it the reproducible engine
        # cost) — the median column keeps round-over-round deltas honest
        # when the noise itself changes.
        "value_median": round(sum(medians.values()), 3),
        "queries_median": medians,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "repeats": repeats,
        "stat": "min (queries) + median (queries_median)",
        "sessions": 1 if single else 2,
        "stall_reruns": stall_reruns,
        "stall_suspect": stall_suspect,
    }
    # VERDICT r10 #1a: the driver keeps only the last ~2,000 chars of
    # stdout, and the full per-query dump outgrew that at ~50 entries in
    # r8 — so rounds 8-10 recorded "parsed": null. The full dump now goes
    # to BENCH_full.json (and stderr for log readers); the FINAL stdout
    # line is a compact summary — suite walls, counts, and the ~10
    # heaviest entries — that stays well under the tail window.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json"
    )
    with open(full_path, "w") as fh:
        json.dump(full, fh)
    print(json.dumps(full), file=sys.stderr)

    top = dict(
        sorted(medians.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "queries": top,
        "queries_stat": "median of the 10 heaviest (full dump: BENCH_full.json)",
        "value_median": full["value_median"],
        "n_queries": len(timings),
        "sf": full["sf"],
        "repeats": repeats,
        "sessions": full["sessions"],
        "stall_reruns": sum(stall_reruns.values()),
        "stall_suspect": len(stall_suspect),
    }
    # The driver keeps only the last ~2,000 chars of stdout, so the final
    # line MUST fit. Never raise after the suite has run (that would lose
    # the whole record) and never rely on `assert` (stripped under -O):
    # shrink the heavy-entry table until the line fits.
    line = json.dumps(compact)
    while len(line) >= 1900 and compact["queries"]:
        compact["queries"].popitem()
        compact["queries_stat"] = (
            f"median of the {len(compact['queries'])} heaviest "
            "(truncated to fit; full dump: BENCH_full.json)"
        )
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
