"""End-to-end corpus curation — the composed training-data pipeline.

One declarative plan chains the extension operators: quality gate →
exact-duplicate removal → near-duplicate removal (inverted-index Jaccard,
drop the higher doc_id of each close pair). Every stage is a pure
DataFrame transform, so Catalyst fuses the quality filter into the scan and
the whole pipeline is a handful of shuffles regardless of corpus size.

At 100 TB the same plan holds: the Jaccard candidate join is
shingle-bucketed (never all-pairs), the hot-shingle guard caps skew, and
swapping `ngram_jaccard_pairs` for `minhash_lsh_pairs` + verification drops
candidate volume further without touching the surrounding pipeline.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storage_spark.functions.partitioning import spread_small_input
from storage_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from storage_spark.operators.dedup import ngram_jaccard_pairs


def _pin_model(df: DataFrame) -> DataFrame:
    """Materialize a BOUNDED model/type table that the surrounding plan
    references more than once (the langid_score pattern). Catalyst plans
    every reference to an unpersisted frame separately — no
    cross-reference reuse for broadcast builds — so a fitted-model
    subplan re-runs its full corpus aggregation once PER reference:
    ``bigram_logprob``'s inline fit planned 10 corpus scans / 10
    explodes, ``kn_trigram_score`` 18, ``lm_bigram_skew`` 18 (r12
    formatted-plan counts, plans/r12/*_before.txt). One eager
    ``localCheckpoint`` of each model table collapses that to one fit
    pass per model. Tables pinned here are vocabulary/type-table sized
    (model-bounded, never corpus-sized), so the checkpoint itself is
    small; skipped when the caller already persisted the frame.

    Release (r13): delegates to ``dedup.pin_bounded``, which registers
    the pinned blocks with the active ``materialize_scope`` so a session
    composing many fits can free them (VERDICT r12 #4)."""
    from storage_spark.operators.dedup import pin_bounded

    return pin_bounded(df)


def corpus_stats(
    docs: DataFrame,
    text_col: str = "text",
    quality_threshold: float = 0.5,
) -> DataFrame:
    """One-pass corpus profile: per-language doc counts, token totals, and
    the high-quality share — the daily health report a corpus pipeline
    publishes. One scan; every aggregate is map-side partial before the
    single shuffle on the (tiny-cardinality) language key."""
    col = F.col(text_col)
    enriched = docs.select(
        lang_id(col).alias("lang"),
        token_count(col).alias("_toks"),
        quality_score(col).alias("_q"),
    )
    return enriched.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_toks").alias("total_tokens"),
        F.sum(
            F.when(F.col("_q") >= quality_threshold, 1).otherwise(0)
        ).alias("n_high_quality"),
    )


def token_percentiles(
    docs: DataFrame,
    text_col: str = "text",
    probs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-language token-count distribution — the percentile table a
    corpus report prints next to ``corpus_stats``'s totals.

    ``exact=True`` uses the exact ``percentile`` aggregate (sorts each
    group's values inside the agg buffer — fine up to ~10^7 docs per
    language, and oracle-comparable bit-for-bit). At 100 TB flip
    ``exact=False`` for ``approx_percentile`` (t-digest-style sketch,
    constant memory per group, mergeable map-side — the only version
    that survives 10^10-row groups; rank error <= 1/accuracy)."""
    col = F.col(text_col)
    pcts = F.array(*[F.lit(p) for p in probs])
    agg = (
        F.percentile(F.col("_toks"), pcts)
        if exact
        else F.approx_percentile(F.col("_toks"), pcts, F.lit(10000))
    )
    enriched = docs.select(
        lang_id(col).alias("lang"), token_count(col).alias("_toks")
    )
    out = enriched.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), agg.alias("_p")
    )
    return out.select(
        "lang",
        "n_docs",
        *[
            F.element_at("_p", i + 1).alias(f"p{int(p * 100):02d}")
            for i, p in enumerate(probs)
        ],
    )


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    shingle_n: int = 3,
    min_jaccard: float = 0.5,
    max_shingle_df: int | None = None,
    materialize: bool | str = False,
    resolution: str = "greedy",
    classifier: DataFrame | None = None,
    min_logit_1e4: int | None = None,
) -> DataFrame:
    """Returns the kept rows (id + quality score, scaled integral).

    Removal rules (deterministic):
    - (optional, FIRST) trained-classifier gate: pass a
      ``nb_quality_model``-shaped ``(tok, w)`` table as ``classifier``
      and docs whose ``classifier_score`` logit — integer-quantized to
      1e-4, the quality_quantile_filter trick that absorbs ln's
      cross-engine ulps before the comparison — falls below
      ``min_logit_1e4`` are dropped before the heuristic gate (the
      fastText-then-heuristics order of the GPT-3/CCNet recipe);
    - quality_score < min_quality → dropped;
    - exact content duplicates (same normalized fingerprint) → keep the
      lowest doc_id of each group;
    - near-duplicates (Jaccard >= min_jaccard), by ``resolution``:
      * ``"greedy"`` (default): drop the higher doc_id of each pair
        (the transitive greedy pass of MinHashLSH-style dedup — can
        over-delete: a kept doc may survive only via a dropped
        middleman);
      * ``"components"``: close pairs into clusters and keep exactly ONE
        canonical doc per cluster — the longest, ties to min id
        (dedup.resolve_canonical). Guarantees one survivor per
        connected near-dup family.

    ``materialize`` picks how the scored/exact-kept stage and the shingle
    index — each feeding several subplans (keeper agg, semi-join, index
    a/b sides, final anti-join) — are shared across consumers, since
    Catalyst re-plans shared subtrees per consumer: ``False`` recomputes,
    ``True``/``"checkpoint"`` eagerly localCheckpoints (an extra SERIAL
    job per stage — measured dominating at 50k docs, NOTES_r5), and
    ``"cache"``/``"disk"`` lazily persist so the first consumer fills the
    cache inside its own job (see dedup._materialize for the trade).
    Measured at 50k docs (sf1 A/B, NOTES_r6): disk 38.7 s < checkpoint
    43.3 s < cache 53.0 s < off 60.0 s — ``"disk"`` is the recommended
    at-scale setting; the default stays ``False`` (pure transform).
    Per-batch callers: wrap the call AND its consuming action in
    ``dedup.materialize_scope()`` so the pinned blocks are released on
    exit instead of accumulating for the session.
    """
    from storage_spark.operators.dedup import _materialize

    if classifier is not None:
        if min_logit_1e4 is None:
            raise ValueError("classifier= needs min_logit_1e4=")
        # pinned: the gate is a DECISION table (id-width — guide §8's
        # "decide with small rows") read by every downstream consumer of
        # the gated corpus; unpinned, the classifier's corpus explode +
        # model join replayed once per consumer (the r12 sweep counted
        # 20 corpus scans in q_curate_corpus_gated's plan);
        # scope-releasable via pin_bounded (r13)
        from storage_spark.operators.dedup import pin_bounded

        ok = pin_bounded(
            classifier_score(docs, classifier, id_col=id_col, text_col=text_col)
            .filter(
                F.round(F.col("logit") * 10000).cast("bigint")
                >= int(min_logit_1e4)
            )
            .select(id_col)
        )
        docs = docs.join(ok, id_col, "left_semi")
    scored = docs.select(
        F.col(id_col).alias("doc"),
        F.col(text_col).alias("text"),
        quality_score(F.col(text_col)).alias("_q"),
        fingerprint(F.col(text_col)).alias("_fp"),
    ).filter(F.col("_q") >= min_quality)
    scored = _materialize(scored, materialize)

    keepers = scored.groupBy("_fp").agg(F.min("doc").alias("doc"))
    exact_kept = _materialize(
        scored.join(keepers, ["doc", "_fp"], "left_semi"), materialize
    )

    pairs = ngram_jaccard_pairs(
        exact_kept,
        text_col="text",
        id_col="doc",
        n=shingle_n,
        min_jaccard=min_jaccard,
        max_shingle_df=max_shingle_df,
        materialize=materialize,
    )
    if resolution == "components":
        from storage_spark.operators.dedup import resolve_canonical

        resolved = resolve_canonical(
            exact_kept.select(F.col("doc").alias(id_col), "text"),
            pairs,
            id_col=id_col,
        )
        survivors = resolved.filter(F.col("is_canonical")).select("doc")
        kept = exact_kept.join(survivors, "doc", "left_semi")
    elif resolution == "greedy":
        losers = pairs.select(F.col("doc_b").alias("doc")).distinct()
        kept = exact_kept.join(losers, "doc", "left_anti")
    else:
        raise ValueError(
            f"unknown resolution {resolution!r}; use 'greedy' or 'components'"
        )
    return kept.select(
        F.col("doc").alias(id_col),
        F.round(F.col("_q") * 1000).cast("bigint").alias("score_1e3"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
    max_shingle_df: int | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share at
    least ``min_hits`` distinct word ``n``-grams with an evaluation
    benchmark corpus — the standard train/test-overlap scrub a
    training-data pipeline runs before every release (13-gram overlap in
    GPT-3's appendix; n is a parameter here).

    Plan: the benchmark's distinct shingle set (tiny — eval suites are
    MBs while the corpus is TBs) is broadcast against the corpus's
    inverted shingle index, so the only shuffle over corpus-scale data is
    the per-doc hit count's partial aggregation. ``max_shingle_df`` drops
    degenerate boilerplate shingles from the corpus side before the join
    (same hot-key guard as the Jaccard path).

    Returns every input doc row's id plus ``n_hits`` (distinct
    contaminating shingles) and ``contaminated``. Callers drop flagged
    rows with one filter; keeping the full classification makes the
    decision auditable.
    """
    from storage_spark.functions.text import word_shingles
    from storage_spark.operators.dedup import _doc_shingles

    bench_sh = benchmark.select(
        F.explode(
            F.array_distinct(word_shingles(F.col(bench_text_col), n))
        ).alias("sh")
    ).distinct()
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    doc_sh = _doc_shingles(docs, text_col, id_col, n, max_shingle_df)
    hits = (
        doc_sh.join(bench_sh, "sh")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def _hash_threshold(rate: float) -> str:
    """32-hex-char threshold whose lexicographic compare against an md5
    digest implements P(keep) = rate. Hex strings of equal length compare
    like the numbers they encode, so the cut is exact to 16^-8 granularity
    and identical in ANY engine that can md5 + compare strings."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    scaled = int(rate * 16**8)
    if scaled >= 16**8:  # rate == 1.0: must sort after EVERY hex digest —
        return "g" * 32  # 'g' > 'f', same length, keeps the compare exact
    return format(scaled, "08x") + "0" * 24


def sample_corpus(
    docs: DataFrame,
    rate: float | None = None,
    stratum_col: str | None = None,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    seed: str = "corpus-sample",
) -> DataFrame:
    """Deterministic (reproducible, engine-portable) corpus sampling.

    Each row's fate is a pure function of ``(seed, key)``: keep iff
    ``md5(seed || ':' || key) < threshold(rate)``. No RNG state, no
    partition sensitivity — the same sample falls out on ANY cluster
    layout, any retry, any engine (unlike ``DataFrame.sample``, whose
    output depends on partitioning). That reproducibility is what makes a
    training-data cut auditable and diffable between pipeline runs.

    Two modes:
    - uniform: ``rate=0.1`` keeps ~10% of rows;
    - stratified: ``stratum_col='lang', rates={'en': 0.1, 'de': 0.5}``
      applies a per-stratum rate (``default_rate`` for unlisted strata) —
      the standard language/source rebalancing knob.

    The predicate is a pure Column expression → Catalyst pushes it into
    the scan; sampling 1% of 100 TB reads all rows but shuffles none.
    """
    h = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(key_col).cast("string"))
    )
    if rate is not None:
        return docs.filter(h < F.lit(_hash_threshold(rate)))
    if stratum_col is None or rates is None:
        raise ValueError("need either rate= or (stratum_col= and rates=)")
    thr = F.lit(_hash_threshold(default_rate))
    for value, r in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(_hash_threshold(r))
        ).otherwise(thr)
    return docs.filter(h < thr)


def remove_repeated_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    segment_words: int | None = None,
    sep: str | None = "\n",
    min_df: int = 2,
) -> DataFrame:
    """Intra-corpus boilerplate scrub: drop text segments that recur across
    ``min_df`` or more documents (site headers/footers/navigation, license
    blocks, template chrome) and reassemble each document from its
    surviving segments in original order.

    Segmentation: ``sep`` splits on a literal separator (paragraphs);
    ``segment_words=k`` instead chunks the normalized token stream into
    fixed k-word windows (for corpora without structural separators).

    Plan: posexplode(segments) → segment document-frequency (one partial
    agg on the segment hash) → anti-join hot segments → groupBy doc with
    ``sort_array(collect_list(struct(pos, seg)))`` to restore order. Two
    shuffles total, both keyed on high-cardinality columns — no skew,
    no driver round-trips; the df-side agg is map-side combined.

    Output: one row per input doc — ``(id, text_clean, n_kept,
    n_removed)``; a fully-boilerplate doc survives as an empty string so
    downstream joins see every id.
    """
    from storage_spark.functions.text import normalized_text, tokens

    if (segment_words is None) == (sep is None):
        raise ValueError("exactly one of segment_words / sep must be set")
    if sep is not None:
        # F.split's pattern is a Java regex; sep is documented as a
        # LITERAL separator, so escape it ('.', '|', '+' would otherwise
        # silently mis-segment every document).
        segs = F.split(F.col(text_col), F.lit(re.escape(sep)), -1)
        base = docs.select(F.col(id_col).alias("doc"), segs.alias("_segs"))
    else:
        k = segment_words
        base = docs.select(
            F.col(id_col).alias("doc"),
            tokens(normalized_text(F.col(text_col))).alias("_toks"),
        ).select(
            "doc",
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("_toks") / F.lit(k)).cast("int") - 1,
                ),
                lambda i: F.array_join(
                    F.slice(F.col("_toks"), i * k + 1, k), " "
                ),
            ).alias("_segs"),
        )
    exploded = base.select(
        "doc", F.posexplode_outer("_segs").alias("pos", "seg")
    ).filter(F.col("seg").isNotNull() & (F.col("seg") != ""))
    hot = (
        exploded.groupBy("seg")
        .agg(F.count_distinct("doc").alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("seg")
    )
    kept = exploded.join(hot, "seg", "left_anti")
    totals = exploded.groupBy("doc").agg(F.count(F.lit(1)).alias("_total"))
    rebuilt = kept.groupBy("doc").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            " " if sep is None else sep,
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(totals, "doc", "left")
        .join(rebuilt, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            (
                F.coalesce(F.col("_total"), F.lit(0))
                - F.coalesce(F.col("n_kept"), F.lit(0))
            ).alias("n_removed"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap_tokens: int = 0,
) -> DataFrame:
    """Split documents into fixed token windows with optional overlap —
    the context-window chunking step that turns long documents into
    trainable sequences (``pack_sequences`` is its complement: it packs
    SHORT docs up, this cuts LONG docs down).

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap_tokens``; the chunk count is
    ``max(1, ceil((n - overlap) / stride))``, so every document emits at
    least one chunk and every token belongs to at least one chunk.

    Pure Column expressions end-to-end (tokens → start sequence →
    transform slice+join → posexplode): no UDF, no shuffle — chunking
    100 TB is a map-only pass that fuses into the scan.

    Output: ``(id, chunk_id, text_chunk, n_chunk_tokens)``.
    """
    from storage_spark.functions.text import tokens

    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("overlap_tokens must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap_tokens
    base = docs.select(
        F.col(id_col).alias("doc"),
        tokens(F.trim(F.col(text_col))).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(
            (F.col("_n") - F.lit(overlap_tokens)) / F.lit(stride)
        ).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("_toks"), i * stride + 1, chunk_tokens),
    )
    return (
        base.select(
            "doc", F.posexplode(chunks).alias("chunk_id", "_chunk")
        )
        .select(
            F.col("doc").alias(id_col),
            "chunk_id",
            F.array_join(F.col("_chunk"), " ").alias("text_chunk"),
            F.size("_chunk").alias("n_chunk_tokens"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    group_col: str = "lang",
    max_tokens: int = 512,
) -> DataFrame:
    """Next-fit sequence packing: assign documents to fixed token-budget
    bins (the pre-tokenization step that turns a document corpus into
    training sequences with minimal padding). Deterministic contract:
    within each ``group_col`` partition, docs are walked in ``id_col``
    order; a doc that would overflow the current bin closes it and opens
    the next (an oversize doc gets a bin of its own).

    Plan: one ``applyInPandas`` per group — the packing walk is inherently
    sequential PER GROUP, so the group key is the parallelism unit. At
    100 TB the caller picks group granularity (language, source shard, or
    ``hash(id) % N``) so each group fits one task; across groups the job
    scales linearly. Arrow moves each group as columnar batches — the
    Python loop touches one int per row, not row objects.

    Output: ``(group, id, n_tokens, bin)`` — join ``bin`` back to the
    corpus or aggregate it for packing-efficiency stats.
    """
    toks = (
        F.col(token_col)
        if token_col is not None
        else token_count(F.col(text_col))
    )
    base = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc"),
        toks.cast("long").alias("n_tokens"),
    )

    def _pack(pdf):
        pdf = pdf.sort_values("doc").reset_index(drop=True)
        bins = []
        bin_id, acc, first = 0, 0, True
        for t in pdf["n_tokens"]:
            if not first and acc + int(t) > max_tokens:
                bin_id += 1
                acc = 0
            acc += int(t)
            first = False
            bins.append(bin_id)
        pdf["bin"] = bins
        return pdf

    # Build a FRESH StructType: StructType.add mutates in place, and
    # DataFrame.schema hands back the plan's cached schema object —
    # mutating it makes the input claim a phantom column and breaks
    # resolution (the round-3 pack_sequences AnalysisException).
    out_schema = T.StructType(
        list(base.schema.fields) + [T.StructField("bin", T.LongType())]
    )
    return base.groupBy("grp").applyInPandas(_pack, out_schema)


def packing_efficiency(
    packed: DataFrame,
    max_tokens: int,
    group_col: str = "grp",
    bin_col: str = "bin",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Utilisation report over ``pack_sequences`` output — the number a
    training-data team actually reads off the packer: how full the bins
    are, i.e. how much padding the packed batches will carry.

    Per group: bin count, docs packed, token total, mean docs per bin,
    and ``util_1e4`` = total_tokens / (n_bins * max_tokens) scaled to an
    integral 1e4 basis (integral so the value hashes stably across
    engines). Oversize docs (> max_tokens alone in a bin) can push a
    single bin above 1.0 utilisation; the cap column counts them.

    Plan: two partial-aggregated shuffles — (group, bin) then group —
    both on bounded-cardinality keys; no Python, no skew at any scale.
    """
    per_bin = packed.groupBy(group_col, bin_col).agg(
        F.sum(token_col).alias("_bin_tokens"),
        F.count(F.lit(1)).alias("_bin_docs"),
    )
    return (
        per_bin.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("_bin_docs").alias("n_docs"),
            F.sum("_bin_tokens").alias("total_tokens"),
            F.sum(
                F.when(F.col("_bin_tokens") > max_tokens, 1).otherwise(0)
            ).alias("n_oversize_bins"),
            F.round(
                F.sum("_bin_tokens")
                / (F.count(F.lit(1)) * F.lit(max_tokens))
                * 10000
            )
            .cast("bigint")
            .alias("util_1e4"),
        )
    )


def quality_quantile_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quantile: float = 0.25,
    approx: bool = False,
) -> DataFrame:
    """Drop each language's weakest ``quantile`` share of documents —
    adaptive quality gating (a fixed global threshold over-prunes
    low-resource languages whose score distribution sits lower).

    Determinism contract: ranking happens on the INTEGER score
    ``round(quality*1000)`` so any engine derives identical thresholds
    (double-precision tails never flip membership at the boundary).
    Per-language thresholds are an exact interpolated percentile by
    default; ``approx=True`` switches to ``percentile_approx`` — at
    100 TB the exact percentile materializes per-group sorted value
    lists, while the approx sketch is a bounded-memory partial aggregate
    (the correct scale path; thresholds then differ from exact by the
    sketch's rank error, which a quality gate tolerates).

    Plan shape: one scan scoring every doc, one tiny aggregate (rows =
    languages) broadcast back onto the scored scan, filter. No sort, no
    window.
    """
    col = F.col(text_col)
    scored = docs.select(
        F.col(id_col),
        lang_id(col).alias("lang"),
        F.round(quality_score(col) * 1000).cast("bigint").alias("score_1e3"),
    )
    agg = (
        F.percentile_approx("score_1e3", quantile)
        if approx
        else F.percentile("score_1e3", quantile)
    )
    thresholds = scored.groupBy("lang").agg(agg.alias("thr"))
    return (
        scored.join(F.broadcast(thresholds), "lang")
        .filter(F.col("score_1e3") >= F.col("thr"))
        .select(id_col, "lang", "score_1e3")
    )


#: The Gopher stopword-presence list (Rae et al. 2021 §A1.1): a doc
#: must contain at least min_stop_hits of these to look like prose.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_fraction: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 §A1.1) as a per-rule AUDIT:
    one row per doc with every metric, every named rule verdict, and the
    conjunction ``passes`` — so curation can both filter AND explain why
    a doc fell (the composite ``quality_score`` can't say which rule
    fired). Defaults are the paper's published thresholds.

    Rules: word count in [min_words, max_words]; mean word length in
    [3, 10]; symbol-to-word ratio ≤ 0.1 for EITHER symbol separately —
    '#' (``r_hash_ratio``) and ellipsis (``r_ellipsis_sym_ratio``),
    per the paper's wording ("either the hash symbol or the
    ellipsis"), not their sum; ≤ 90% of lines bullet-led; ≤ 30% of
    lines ellipsis-terminated; ≥ 80% of words containing an alphabetic
    character; ≥ 2 distinct hits from the 8-word stop list.

    Determinism: every metric is a single division of INTEGER counts
    (token/line/char tallies) — no float summation order anywhere, so
    the audit replays exactly in any engine. Map-only: one scan, no
    shuffle, fused with whatever projection follows.
    """
    raw = F.trim(F.col(text_col))
    toks = F.split(raw, r"\s+")
    n_words = F.size(toks)
    nw = n_words.cast("double")
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = total_chars.cast("double") / nw
    n_hash = F.length(raw) - F.length(F.replace(raw, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(raw) - F.length(F.replace(raw, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    n_ell = n_ell + (
        F.length(raw) - F.length(F.replace(raw, F.lit("…"), F.lit("")))
    )
    hash_ratio = n_hash.cast("double") / nw
    ell_sym_ratio = n_ell.cast("double") / nw
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.ltrim(ln).rlike(r"^[-*•]"),
        )
    )
    ellipsis_ln = F.size(
        F.filter(
            lines,
            lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"),
        )
    )
    bullet_ratio = bullet.cast("double") / n_lines.cast("double")
    ellipsis_ratio = ellipsis_ln.cast("double") / n_lines.cast("double")
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_fraction = alpha.cast("double") / nw
    low = F.transform(toks, lambda t: F.lower(t))
    stop_hits = F.size(
        F.array_intersect(low, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    rules = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "r_hash_ratio": hash_ratio <= max_symbol_ratio,
        "r_ellipsis_sym_ratio": ell_sym_ratio <= max_symbol_ratio,
        "r_bullet_ratio": bullet_ratio <= max_bullet_ratio,
        "r_ellipsis_ratio": ellipsis_ratio <= max_ellipsis_ratio,
        "r_alpha_fraction": alpha_fraction >= min_alpha_fraction,
        "r_stopwords": stop_hits >= min_stop_hits,
    }
    passes = None
    for expr in rules.values():
        passes = expr if passes is None else (passes & expr)
    return docs.select(
        F.col(id_col),
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_wl * 10000).cast("bigint").alias("mean_word_len_1e4"),
        F.round(hash_ratio * 10000).cast("bigint").alias("hash_ratio_1e4"),
        F.round(ell_sym_ratio * 10000).cast("bigint").alias("ellipsis_sym_ratio_1e4"),
        F.round(bullet_ratio * 10000).cast("bigint").alias("bullet_ratio_1e4"),
        F.round(ellipsis_ratio * 10000).cast("bigint").alias("ellipsis_ratio_1e4"),
        F.round(alpha_fraction * 10000).cast("bigint").alias("alpha_fraction_1e4"),
        stop_hits.cast("int").alias("stop_hits"),
        *[expr.alias(name) for name, expr in rules.items()],
        passes.alias("passes"),
    )


def unigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fit a unigram LM on a corpus: one ``(tok, cnt)`` row per distinct
    normalized-whitespace token. This is the (tiny, vocabulary-sized)
    model table ``unigram_logprob`` scores against — fit it on TRAIN,
    persist it, score everything else under it (the CCNet recipe with a
    unigram proxy in place of the KenLM 5-gram). One map-side-combined
    shuffle on token."""
    from storage_spark.functions.text import normalized_text

    return (
        spread_small_input(docs)
        .select(
            F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_logprob(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
    model_join: str = "broadcast",
    head_size: int = 10_000,
) -> DataFrame:
    """Per-doc mean negative log-probability under an add-``smoothing``
    unigram LM — the SQL-replayable proxy for the LM-perplexity quality
    signal (CCNet, Wenzek et al. 2020: rank corpus by LM score, keep
    the fluent head / inspect the tail). High ``avg_nll`` = improbable
    token mix (gibberish, boilerplate soup, wrong-language shards);
    low = fluent, in-distribution text. Feed the score to
    ``quality_quantile_filter``-style gating or curriculum ordering.

    ``model=None`` fits on ``docs`` itself (self-perplexity — the
    within-corpus outlier detector); pass a ``unigram_model(train)``
    table to score under a held-out distribution. Unseen tokens get the
    smoothed floor ``a / (N + a*V)``.

    Determinism contract: per-doc summation is the ORDERED fold over
    token positions (floating addition is not associative), so scores
    are bit-stable across partition layouts; ``ln`` is the one
    cross-engine libm call, absorbed by driver-row rounding (same
    acceptance as ``temperature_sample``'s pow).

    Scale shape: explode + ONE equi-join on token against the
    vocabulary-sized model, then a map-side-combinable collect per doc.
    ``model_join`` picks the join strategy for the model's size:

    - ``"broadcast"`` (default): right for vocabularies up to ~10M rows.
      Hot tokens ('the' is ~7% of English instances) are handled
      map-side — no skewed shuffle exists at all.
    - ``"skew_split"``: the 100 TB path when the vocabulary itself is
      too big to broadcast (web-scale corpora reach 10^8-10^9 distinct
      tokens with typos/URLs). A plain shuffle join on token would be
      exactly the skewed-key hazard; instead the model splits by
      frequency — the ``head_size`` most frequent tokens (which carry
      ~all the skew AND most of the instance volume, by Zipf) join
      broadcast, and the rare tail joins via shuffle, which is
      skew-FREE by construction (a tail token is rare on both sides).
      Results are identical (tested); only the physical plan changes.

    Row contract: docs whose text is NULL (or tokenizes to an empty
    array) produce NO output row — ``posexplode`` eliminates them —
    so the score table can have fewer rows than the input, unlike
    ``gopher_rules`` which emits one row per doc. Audits composing
    the two should anti-join on ``id_col`` to surface unscored docs
    rather than expect equal counts.

    Returns ``(id_col, n_tokens, avg_nll)``.
    """
    from storage_spark.functions.text import normalized_text

    if model_join not in ("broadcast", "skew_split"):
        raise ValueError(
            f"model_join must be 'broadcast' or 'skew_split' (got {model_join!r})"
        )
    if model is None:
        # inline fit: the model table is referenced three times below
        # (totals + the join, and skew_split's head/tail derivation) —
        # pin it so the corpus-wide fit aggregation runs once, not once
        # per reference (guide §2.4/§5; see _pin_model)
        model = _pin_model(unigram_model(docs, text_col))
    totals = model.agg(
        F.sum("cnt").alias("_n"), F.count(F.lit(1)).alias("_v")
    )
    a = F.lit(float(smoothing))
    toks = spread_small_input(docs).select(
        F.col(id_col),
        F.posexplode(F.split(normalized_text(F.col(text_col)), " ")).alias(
            "pos", "tok"
        ),
    )
    if model_join == "broadcast":
        joined = toks.join(F.broadcast(model), "tok", "left")
    else:
        # frequency split via the shared helper: TakeOrdered head
        # broadcast, rare tail shuffled — no hot partitions to salt
        joined = _skew_split_left_join(toks, model, ["tok"], "cnt", head_size)
    scored = (
        joined
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "pos",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + a)
                / (F.col("_n") + a * F.col("_v"))
            ).alias("lp"),
        )
    )
    items = F.array_sort(
        F.collect_list(F.struct(F.col("pos").alias("p"), F.col("lp").alias("l")))
    )
    fold = F.aggregate(items, F.lit(0.0), lambda acc, it: acc + it["l"])
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-(fold / F.count(F.lit(1)))).alias("avg_nll"),
        )
    )


def bigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fit a bigram LM: one ``(prev, tok, cnt)`` row per distinct
    adjacent normalized-token pair. Pairs come straight off each doc's
    token ARRAY (``tok[i-1], tok[i]``) — no self-join, no shuffle beyond
    the one map-side-combined count. Companion to ``unigram_model``;
    ``bigram_logprob`` needs BOTH (the unigram supplies context counts
    and the first-token distribution)."""
    from storage_spark.functions.text import normalized_text

    tk = F.split(normalized_text(F.col(text_col)), " ")
    # zip_with over shifted slices, NOT transform with an element_at(tk,
    # i) lambda: a lambda body referencing the tokenization
    # subexpression re-evaluates it PER ELEMENT (the r10 lambda-capture
    # hazard char_ngrams documents — normalized_text's regex ran once
    # per token per row here). zip_with's array arguments evaluate once
    # per row; lambda bodies touch only their own variables. Pair values
    # and order are identical (kn_bigram_score's proven shape).
    pairs = F.when(
        F.size(tk) >= 2,
        F.zip_with(
            F.slice(tk, 1, F.size(tk) - 1),
            F.slice(tk, 2, F.size(tk) - 1),
            lambda a, b: F.struct(a.alias("prev"), b.alias("tok")),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,tok:string>>"))
    return (
        spread_small_input(docs)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok"))
        .groupBy("prev", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _skew_split_left_join(
    left: DataFrame,
    model: DataFrame,
    keys: list[str],
    cnt_col: str,
    head_size: int,
) -> DataFrame:
    """Left-join ``left`` against a frequency-keyed ``model`` without
    ever shuffling a hot key: the ``head_size`` most frequent model
    rows (deterministic ties by key) join broadcast — absorbing the
    Zipf head that would skew a shuffle — and the rare tail joins via
    shuffle, skew-free by construction (a tail key is rare on both
    sides). Result rows are identical to ``left.join(model, keys,
    "left")``; only the physical plan differs. Shared by
    ``unigram_logprob`` and ``bigram_logprob``'s pair join."""
    # head is bounded (<= head_size rows) and referenced three times
    # (hot join + two anti-join key probes) — pin it so the TakeOrdered
    # over the model runs once (see _pin_model)
    head = _pin_model(
        model.orderBy(
            F.col(cnt_col).desc(), *[F.col(k).asc() for k in keys]
        ).limit(head_size)
    )
    tail = model.join(F.broadcast(head.select(*keys)), keys, "left_anti")
    hot = left.join(F.broadcast(head), keys)
    cold = left.join(
        F.broadcast(head.select(*keys)), keys, "left_anti"
    ).join(tail, keys, "left")
    return hot.unionByName(cold)


def bigram_logprob(
    docs: DataFrame,
    bigrams: DataFrame | None = None,
    unigrams: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
    model_join: str = "broadcast",
    head_size: int = 10_000,
) -> DataFrame:
    """Per-doc mean negative log-probability under an add-``smoothing``
    BIGRAM LM — the conditional-fluency upgrade over
    ``unigram_logprob``: word salad built from individually-common
    tokens ("the of and the to be") passes a unigram gate but scores
    terribly here, because every CONDITIONAL ``p(tok | prev) =
    (c(prev,tok) + a) / (c(prev) + a·V)`` is near the smoothed floor.
    The first token is scored under the unigram distribution (no BOS
    sentinel is injected into the vocabulary). Fit both models on TRAIN
    (``bigram_model`` / ``unigram_model``) and score everything under
    them; ``None`` fits on ``docs`` itself.

    Determinism contract as ``unigram_logprob``: ordered per-token fold,
    one ``ln`` per token absorbed by driver-row rounding. Row contract
    as ``unigram_logprob`` too: NULL/empty-text docs produce no output
    row (``posexplode`` drops them) — anti-join against the input to
    surface unscored docs.

    Scale shape: explode + THREE model joins (bigram pairs on
    (prev, tok), context counts on prev, first-token counts on tok) +
    the totals cross. ``model_join`` picks the PAIR join's strategy:

    - ``"broadcast"`` (default): all three joins broadcast — right
      while the pair table fits (~10M rows).
    - ``"skew_split"``: the 100 TB path. The pair vocabulary is the
      one that explodes (10^9+ distinct pairs on a web corpus vs 10^8
      tokens), and a plain shuffle on (prev, tok) skews exactly on
      stop-word-prefixed pairs ('the *' is ~7% of all pair
      instances). The ``head_size`` most frequent pairs join
      broadcast; the rare tail shuffles skew-free (same head/tail
      construction as ``unigram_logprob`` — shared helper
      ``_skew_split_left_join``). The context/first-token joins stay
      broadcast: the unigram vocabulary is orders smaller than the
      pair table, and broadcasting it is precisely what keeps the hot
      ``prev`` keys (stopwords) off any shuffle; a corpus whose
      UNIGRAM vocab also outgrows broadcast applies the same split to
      those two joins. Results identical (tested: head/tail/unseen
      mixes); only the physical plan changes.

    Returns ``(id_col, n_tokens, avg_nll)``.
    """
    from storage_spark.functions.text import normalized_text

    if model_join not in ("broadcast", "skew_split"):
        raise ValueError(
            f"model_join must be 'broadcast' or 'skew_split' (got {model_join!r})"
        )
    if unigrams is None:
        # referenced 3x below (totals, ctx, uni) — pin the inline fit
        # so the corpus aggregation runs once (see _pin_model)
        unigrams = _pin_model(unigram_model(docs, text_col))
    if bigrams is None:
        # referenced once on the broadcast path but 3x via skew_split's
        # head/tail derivation — same pin
        bigrams = _pin_model(bigram_model(docs, text_col))
    totals = unigrams.agg(
        F.sum("cnt").alias("_n"), F.count(F.lit(1)).alias("_v")
    )
    a = F.lit(float(smoothing))
    tk = F.split(normalized_text(F.col(text_col)), " ")
    # two selects: posexplode's `pos` only exists after the first, and
    # `prev` needs it (element_at is 1-indexed, so for 0-based pos the
    # previous token is element_at(tk, pos); pos 0 has none)
    # materialize the token array into a column FIRST, then explode the
    # column: a single select evaluating both `tk.alias("_tk")` and
    # `posexplode(tk)` plans the Generate over the raw expression, so
    # normalized_text's regex + split ran twice per row (r12 plan read)
    toks = spread_small_input(docs).select(F.col(id_col), tk.alias("_tk")).select(
        F.col(id_col), "_tk", F.posexplode(F.col("_tk")).alias("pos", "tok")
    ).select(
        id_col, "pos", "tok",
        F.when(F.col("pos") > 0, F.element_at(F.col("_tk"), F.col("pos")))
        .alias("prev"),
    )
    bi = bigrams.select("prev", "tok", F.col("cnt").alias("_bc"))
    ctx = unigrams.select(F.col("tok").alias("prev"), F.col("cnt").alias("_pc"))
    uni = unigrams.select("tok", F.col("cnt").alias("_uc"))
    if model_join == "broadcast":
        pair_joined = toks.join(F.broadcast(bi), ["prev", "tok"], "left")
    else:
        pair_joined = _skew_split_left_join(
            toks, bi, ["prev", "tok"], "_bc", head_size
        )
    scored = (
        pair_joined
        .join(F.broadcast(ctx), "prev", "left")
        .join(F.broadcast(uni), "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "pos",
            F.when(
                F.col("pos") == 0,
                F.log(
                    (F.coalesce(F.col("_uc"), F.lit(0)) + a)
                    / (F.col("_n") + a * F.col("_v"))
                ),
            )
            .otherwise(
                F.log(
                    (F.coalesce(F.col("_bc"), F.lit(0)) + a)
                    / (F.coalesce(F.col("_pc"), F.lit(0)) + a * F.col("_v"))
                )
            )
            .alias("lp"),
        )
    )
    items = F.array_sort(
        F.collect_list(F.struct(F.col("pos").alias("p"), F.col("lp").alias("l")))
    )
    fold = F.aggregate(items, F.lit(0.0), lambda acc, it: acc + it["l"])
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-(fold / F.count(F.lit(1)))).alias("avg_nll"),
        )
    )


#: Scheme-qualified URL host extractor — Java∩RE2 dialect so the SQL
#: oracle replays it verbatim (group 1 = the host).
URL_HOST_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def extract_domains(text: Column) -> Column:
    """Distinct, lowercased URL hosts mentioned in a document (empty
    array when none). Map-only regexp; feeds the blocklist filter and
    per-domain corpus stats."""
    return F.array_distinct(
        F.transform(
            F.regexp_extract_all(text, F.lit(URL_HOST_PATTERN), F.lit(1)),
            F.lower,
        )
    )


def filter_blocked_domains(
    docs: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "domain",
) -> DataFrame:
    """C4-style URL filtering: drop every document that cites ANY
    blocklisted domain. The blocklist arrives as a DataFrame (real
    blocklists run to millions of hosts — a literal in-predicate would
    not scale), so matching is set-oriented: explode each doc's distinct
    domains, equi-join the blocklist, anti-join the hit set back.

    Scale shape: the join keys on domain (bounded cardinality,
    power-law — but the HIT SET is only doc ids, and the final anti-join
    keys on id). With AQE the blocklist side broadcasts when small."""
    mentions = docs.select(
        F.col(id_col),
        F.explode(extract_domains(F.col(text_col))).alias("_dom"),
    )
    hits = mentions.join(
        blocklist.select(F.lower(F.col(domain_col)).alias("_dom")), "_dom"
    ).select(id_col).distinct()
    return docs.join(hits, id_col, "left_anti")


def token_budget_filter(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    per_lang: bool = True,
    tokenizer=None,
) -> DataFrame:
    """Quality-greedy selection under a token budget: per language, take
    documents in (quality desc, id asc) order while the RUNNING token
    total stays within ``budget_tokens`` — the "we can afford N tokens
    of this source" curation step. A document that would overflow the
    budget is skipped along with everything after it (prefix rule, not
    knapsack — deterministic and single-pass).

    Ordering ranks on the integer-scaled score (engine-exact ties, same
    convention as quality_quantile_filter). Returns
    ``(id, lang, score_1e3, n_tokens, cum_tokens)``.

    Scale shape: one window (sort within each language partition;
    Spark's external sort spills — no driver state). At true 100 TB you
    first coarse-prune with quality_quantile_filter so the sorted set is
    the plausible candidates, not the raw corpus.

    ``tokenizer=`` budgets in SUBWORD units instead of regex tokens:
    pass a ``functions.bpe.build_subword_vocab(...)`` table (greedy
    longest-prefix counts, map-only pandas UDF) or a
    ``functions.bpe.bpe_learn_merges(...)`` merge table (rank-order merge
    replay, pure expression chain) — dispatched by the table's columns —
    and ``n_tokens`` becomes the unit a training run actually spends.
    A prebuilt ``text -> count`` Column callable also works (e.g.
    ``bpe_merge_token_counter(m, byte_level=True)`` — table dispatch
    can't see the byte_level the model was fit with)."""
    col = F.col(text_col)
    if tokenizer is not None:
        from storage_spark.functions.bpe import (
            bpe_merge_token_counter,
            bpe_token_counter,
        )

        if callable(tokenizer):
            n_tok = tokenizer(col)
        elif "merge_rank" in tokenizer.columns:
            n_tok = bpe_merge_token_counter(tokenizer)(col)
        else:
            n_tok = bpe_token_counter(tokenizer)(col)
    else:
        n_tok = token_count(col)
    scored = docs.select(
        F.col(id_col),
        (lang_id(col) if per_lang else F.lit("all")).alias("lang"),
        F.round(quality_score(col) * 1000).cast("bigint").alias("score_1e3"),
        n_tok.cast("bigint").alias("n_tokens"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("score_1e3").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return out.filter(F.col("cum_tokens") <= budget_tokens)


def term_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Whitespace-tokenize and return ``(tf, df)``: per-(doc, term)
    frequency and per-term document frequency. Both are pure groupBys with
    map-side partial aggregation; ``df`` is derived from ``tf`` (not the
    raw token stream) so it shuffles one row per DISTINCT (doc, term), not
    one per token occurrence."""
    tokens = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("term"),
    ).where(F.col("term") != "")
    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return tf, df_


def top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document top-k distinctive terms — TF-IDF keyword extraction
    with an integer-only ranking: (tf DESC, df ASC, term ASC). That order
    is monotone in tf/df exactly like tf·idf for any decreasing idf, and
    it keeps the ranking engine-exact (no float log whose last-ulp can
    differ between JVM Math.log and libm — the DuckDB oracle replays the
    identical integer sort). Consumers wanting a score compute their
    preferred idf flavor from the returned (tf, df, rnk).

    Plan: two partial-agg shuffles (tf, df) + one term join + one window
    on the doc key. ``broadcast_vocab=True`` broadcasts the df table —
    right for natural-language vocabularies (≤ tens of millions of rows);
    flip it off for adversarial/id-heavy corpora where the vocabulary is
    corpus-sized and a shuffle join on term is the honest plan.
    """
    from pyspark.sql import Window

    tf, df_ = term_stats(docs, id_col=id_col, text_col=text_col)
    vocab = F.broadcast(df_) if broadcast_vocab else df_
    joined = tf.join(vocab, "term")
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df", "rnk")
    )


def leakage_free_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    doc_a: str = "doc_a",
    doc_b: str = "doc_b",
    train: float = 0.8,
    val: float = 0.1,
    seed: str = "split-v1",
) -> DataFrame:
    """Group-aware train/val/test split: near-duplicate documents NEVER
    straddle a split boundary. Assigning splits per-document leaks — a
    train doc's near-dup twin lands in test and the eval is contaminated.
    Here the unit of assignment is the connected component of the
    near-dup graph (``pairs``): every doc resolves to its component
    (dedup_components — min reachable id), and the whole component is
    hashed into train/val/test with the same engine-portable
    md5-threshold predicate as ``sample_corpus``. Reproducible across
    runs, engines, and cluster layouts; singletons (no pairs) form their
    own component.

    Cost on top of the component labels: one join docs⋈components on the
    doc id and a pure-Column split expression — no extra shuffle beyond
    the components computation itself.
    """
    if not (0.0 <= train and 0.0 <= val and train + val <= 1.0):
        raise ValueError(f"need train, val >= 0 and train+val <= 1, got {train}, {val}")
    from storage_spark.operators.dedup import dedup_components

    comps = dedup_components(
        pairs,
        doc_a=doc_a,
        doc_b=doc_b,
        nodes=docs.select(F.col(id_col).alias("doc")),
    )
    h = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col("component").cast("string"))
    )
    split = (
        F.when(h < F.lit(_hash_threshold(train)), F.lit("train"))
        .when(h < F.lit(_hash_threshold(train + val)), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.join(comps, docs[id_col] == comps["doc"], "inner")
        .drop("doc")
        .withColumn("split", split)
    )


def split_overlap_report(
    docs: DataFrame,
    assignments: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    n: int = 3,
    min_jaccard: float = 0.5,
    max_shingle_df: int | None = None,
    materialize: bool | str = False,
) -> DataFrame:
    """Cross-split contamination audit: the near-duplicate pairs
    (n-gram Jaccard >= ``min_jaccard``) whose two documents landed in
    DIFFERENT splits — exactly the leakage a naive per-document split
    produces, and the evidence behind ``leakage_free_split``'s
    guarantee (on its output this report is EMPTY for the pairs it
    split on, tested). Run it after ANY split — including one inherited
    from upstream — before trusting the eval numbers.

    Returns ``(doc_a, split_a, doc_b, split_b, jaccard)``, doc_a <
    doc_b. Plan: the same inverted-index shingle equi-join as
    ``ngram_jaccard_pairs`` (never all-pairs), then two equi-joins
    against the assignment table on the doc id and a split-inequality
    filter — nothing here is new shuffle shape at 100 TB.
    """
    pairs = ngram_jaccard_pairs(
        docs,
        text_col=text_col,
        id_col=id_col,
        n=n,
        min_jaccard=min_jaccard,
        max_shingle_df=max_shingle_df,
        materialize=materialize,
    )
    a = assignments.select(
        F.col(id_col).alias("doc_a"), F.col(split_col).alias("split_a")
    )
    b = assignments.select(
        F.col(id_col).alias("doc_b"), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "split_a", "doc_b", "split_b", "jaccard")
    )


def mix_corpora(
    docs: DataFrame,
    weights: dict[str, int],
    source_col: str = "source",
    order_by: str = "doc_id",
    default_weight: int = 0,
) -> DataFrame:
    """Deterministic weighted interleave of corpus sources — the "data
    mixture" a training run consumes (e.g. web:3, code:1, books:1).

    Every kept row gets an integer ``mix_key``; reading in ``mix_key``
    order yields source ``s`` with long-run frequency ∝ ``weights[s]``
    and near-uniform local spacing (stride scheduling: the i-th doc of a
    source with weight w lands at virtual time (2i+1)/(2w); scaled by
    lcm(weights) it stays INTEGER, so the order is engine-exact — no
    float accumulation, same order in the DuckDB oracle). Sources not in
    ``weights`` get ``default_weight`` (0 = dropped).

    Scale shape: per-source positions come from the grouped prefix-sum
    global order (``assign_global_ids`` — parallel windows, broadcast
    offsets) minus each source's start offset (tiny aggregate, broadcast
    back). No single-partition window; one shuffle on the order key, two
    broadcast joins. Feed the result straight to ``assign_shards(order_by=
    [mix_key, ...])`` to cut curriculum-preserving training shards.
    """
    from math import lcm

    from storage_spark.operators.ordering import assign_global_ids

    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("weights must be non-negative integers")
    kept = [w for w in weights.values() if w > 0]
    if default_weight > 0:
        kept.append(default_weight)
    scale = lcm(*kept) if kept else 1

    # stride = scale // w computed in PYTHON ints per branch: a runtime
    # double division scale/w would lose exactness once lcm(weights)
    # exceeds 2^53, breaking the engine-exact ordering contract
    w_expr = F.lit(default_weight)
    stride_expr = F.lit(scale // default_weight if default_weight > 0 else 0)
    for s, w in sorted(weights.items()):
        w_expr = F.when(F.col(source_col) == s, F.lit(w)).otherwise(w_expr)
        stride_expr = F.when(
            F.col(source_col) == s, F.lit(scale // w if w > 0 else 0)
        ).otherwise(stride_expr)

    kept = (
        docs.withColumn("_w", w_expr)
        .withColumn("_stride", stride_expr)
        .filter(F.col("_w") > 0)
    )
    ordered = assign_global_ids(
        kept,
        [F.col(source_col), F.col(order_by)],
        group_col=source_col,
    )
    starts = ordered.groupBy(source_col).agg(
        F.min("global_id").alias("_start")
    )
    return (
        ordered.join(F.broadcast(starts), source_col)
        .withColumn("src_pos", F.col("global_id") - F.col("_start"))
        .withColumn(
            "mix_key",
            (2 * F.col("src_pos") + 1) * F.col("_stride"),
        )
        .drop("global_id", "_start", "_w", "_stride")
    )


def term_cooccurrence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_terms_per_doc: int = 64,
    min_pair_count: int = 1,
) -> DataFrame:
    """Within-document term co-occurrence counts — the word2vec/PMI-style
    preprocessing table (pair → number of docs where both terms appear).

    The naive formulation self-joins the full (doc, term) table: a doc
    with t distinct terms contributes t² pairs, so one pathological
    10^5-term doc emits 10^10 rows. The cap is therefore load-bearing,
    not cosmetic: each doc keeps only its ``max_terms_per_doc`` top
    terms (by tf DESC, term ASC — same deterministic ranking as
    ``top_terms``) before pairing, bounding per-doc fan-out at
    cap·(cap-1)/2 regardless of input shape. Pair counts then shuffle
    once on the (term_a, term_b) key.

    Returns (term_a, term_b, n_docs) with term_a < term_b and
    ``n_docs >= min_pair_count``.
    """
    from pyspark.sql import Window

    tf, _ = term_stats(docs, id_col=id_col, text_col=text_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("term").asc()
    )
    capped = (
        tf.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= max_terms_per_doc)
        .select(id_col, "term")
    )
    a = capped.select(F.col(id_col).alias("_d"), F.col("term").alias("term_a"))
    b = capped.select(F.col(id_col).alias("_d"), F.col("term").alias("term_b"))
    pairs = a.join(b, "_d").where(F.col("term_a") < F.col("term_b"))
    return (
        pairs.groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_pair_count)
    )


def sample_k_per_group(
    docs: DataFrame,
    group_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: str = "kpg-v1",
) -> DataFrame:
    """Exactly-k-per-group deterministic sample — the balanced eval-set
    builder (k docs per language/source, never k±noise). Rows are ranked
    inside each group by ``md5(seed || ':' || key)`` — a uniform,
    engine-portable pseudo-random order — and the first ``k`` kept.
    Same auditability story as ``sample_corpus``: a pure function of
    (seed, key), identical on any engine, cluster layout, or retry;
    changing the seed redraws the sample.

    Plan: one shuffle on the group key; WindowGroupLimit (Spark 3.5+)
    pushes the ``<= k`` bound below the shuffle so each map task forwards
    at most k rows per group it sees (same shape as ``top_n_per_group``).
    Groups smaller than k are returned whole.
    """
    from storage_spark.operators.ordering import top_n_per_group

    h = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(key_col).cast("string"))
    )
    out = top_n_per_group(
        docs,
        [group_col],
        [h.asc(), F.col(key_col).asc()],
        k,
        rank_col="_rk",
    )
    return out.drop("_rk")


def _largest_remainder_quotas(
    counts: DataFrame,
    group_col: str,
    total_k: int,
    weight_col: str,
    size_col: str,
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of ``total_k`` slots
    over groups, proportional to ``weight_col``, capped at ``size_col``
    (a group can never owe more rows than it has): ``floor(k·w_g / W)``
    each, short-fall slots to the largest remainders (ties → group asc).
    ALL integer arithmetic on the weights — callers quantize any float
    weighting into integers first, so the oracle replays the allocation
    exactly. The lazy assert guards ``total_k <= Σ size`` (over-budget
    would silently under-deliver). Every window here is over #groups
    rows, never data rows.

    For weights == sizes the cap is a mathematical no-op
    (``floor(k·n/N) + 1 <= n`` whenever ``k <= N``); for boosted weights
    (``temperature_sample``) a saturated group returns whole and the
    short-fall is NOT redistributed — see that operator's contract.
    """
    counts = counts.withColumn(
        "_wtot", F.sum(weight_col).over(Window.partitionBy(F.lit(1)))
    ).withColumn(
        "_tot", F.sum(size_col).over(Window.partitionBy(F.lit(1)))
    )
    counts = counts.withColumn(
        # integer DIV, not double-divide-then-truncate: k*w_g must floor
        # EXACTLY even past 2^53 where doubles lose unit precision
        "_base", F.expr(f"({total_k} * {weight_col}) DIV _wtot")
    ).withColumn(
        "_rem", (F.lit(total_k) * F.col(weight_col)) % F.col("_wtot")
    )
    short = F.lit(total_k) - F.sum("_base").over(Window.partitionBy(F.lit(1)))
    wr = Window.partitionBy(F.lit(1)).orderBy(
        F.col("_rem").desc(), F.col(group_col).asc()
    )
    return (
        counts.withColumn("_short", short)
        .withColumn("_pos", F.row_number().over(wr))
        .withColumn(
            "quota",
            # the assert_true wrap is the lazy over-budget guard: folded
            # INTO the quota expression (a dropped side column would be
            # pruned unevaluated). assert_true is NULL on success, so the
            # when() always takes the otherwise-free branch after it.
            F.when(
                F.assert_true(
                    F.lit(total_k) <= F.col("_tot"),
                    F.lit("sample quota: total_k exceeds corpus size"),
                ).isNull(),
                F.least(
                    F.col("_base")
                    + F.when(F.col("_pos") <= F.col("_short"), 1).otherwise(0),
                    F.col(size_col),
                ),
            ),
        )
        .select(group_col, "quota")
    )


def proportional_sample(
    docs: DataFrame,
    group_col: str,
    total_k: int,
    key_col: str = "doc_id",
    seed: str = "prop-v1",
) -> DataFrame:
    """Downsample to EXACTLY ``total_k`` rows while preserving the group
    mix (language/source proportions) — the corpus-shrink a training run
    does when the token budget is a fraction of the corpus.

    Per-group quotas are largest-remainder apportionment (Hamilton's
    method) of ``total_k`` by group size: ``floor(k·n_g / N)`` each, the
    short-fall slots going to the largest integer remainders
    ``(k·n_g) mod N`` (ties → group asc). ALL integer arithmetic — no
    float proportions, so the oracle replays the allocation exactly.
    Within each group the quota is filled by the ``md5(seed:key)`` rank
    (the engine-portable draw every sampler here uses). Requires
    ``total_k <= N``; quotas then never exceed group sizes. Rows with a
    NULL group value are excluded up front (they could never reach a
    quota) — group ungrouped rows under an explicit sentinel first if
    they should participate.

    Plan: the quota table is one tiny aggregate over #groups rows
    (broadcast back); the data pays ONE shuffle on the group key, with a
    foldable ``rank <= total_k`` bound that WindowGroupLimit pushes
    below the shuffle (plan-asserted) — the exact per-group quota
    column filters after. An empty input (or one whose every group
    value is NULL) returns empty without tripping the over-budget
    guard: the lazy check lives on the quota rows, and there are none
    to evaluate.
    """
    # null group values cannot join back to their quota row — they would
    # inflate the totals while their slots stay unreachable, silently
    # under-delivering. Exclude them from BOTH sides and say so.
    docs = docs.filter(F.col(group_col).isNotNull())
    counts = docs.groupBy(group_col).agg(F.count("*").alias("_gn"))
    # the quota table is #groups rows; its single-partition windows are
    # bounded by the group count, never the data (helper docstring)
    quotas = _largest_remainder_quotas(
        counts, group_col, total_k, weight_col="_gn", size_col="_gn"
    )
    return _fill_group_quotas(docs, quotas, group_col, total_k, key_col, seed)


def _fill_group_quotas(
    docs: DataFrame,
    quotas: DataFrame,
    group_col: str,
    total_k: int,
    key_col: str,
    seed: str,
) -> DataFrame:
    """Fill per-group quotas by the engine-portable ``md5(seed:key)``
    rank. The literal ``total_k`` bound comes FIRST: no quota exceeds
    it, and a foldable rank filter is what InferWindowGroupLimit pushes
    below the shuffle (each map task forwards at most total_k rows per
    group) — the joined-column quota filter alone is not foldable and
    would rank every row of a 10^9-row corpus."""
    h = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        docs.join(F.broadcast(quotas), group_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.lit(int(total_k)))
        .filter(F.col("_rk") <= F.col("quota"))
        .drop("_rk", "quota")
    )


def temperature_sample(
    docs: DataFrame,
    group_col: str,
    total_k: int,
    temperature: float = 2.0,
    key_col: str = "doc_id",
    seed: str = "temp-v1",
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-reweighted downsample to ``total_k`` rows: group
    quotas are apportioned proportional to ``n_g^(1/temperature)`` — the
    standard multilingual/data-mixing reweighting (Conneau & Lample
    2019's smoothed sampling; T5 / XLM-R style). ``temperature=1``
    degenerates to ``proportional_sample`` exactly (asserted in tests);
    larger T flattens the mix toward uniform (``float('inf')`` gives
    equal quotas); T < 1 sharpens toward the head. Rare groups gain
    share, dominant groups shed it — without the head group drowning
    the tail the way raw proportions do.

    Exactness contract: the float weight ``n^(1/T)`` is quantized ONCE
    to an integer (``round(w * weight_scale)``) and everything after is
    the integer Hamilton apportionment — the only cross-engine float op
    is one ``pow`` whose sub-ulp variation is absorbed by the rounding
    (a flip needs the scaled weight within 1 ulp of a .5 boundary).
    Headroom: ``total_k * Σ(scaled weights)`` must fit int64 — at the
    default scale that is ~9e18 / (1e6·Σ n^(1/T)), generous for any real
    mix; lower ``weight_scale`` if a billion-group corpus (or a
    sharpening T << 1 on a huge head group) ever hits it. Exceeding it
    fails LOUDLY — the engine runs ANSI mode, so the weight cast and
    the ``total_k * w`` product raise ArithmeticException rather than
    wrap (an ANSI-off deployment would need an explicit guard here).

    Saturation: a boosted quota is capped at the group's actual size
    (the group returns whole) and the short-fall is NOT redistributed —
    redistribution is iterative water-filling, and silent re-boosting of
    the next-rarest group is usually NOT what a mixing recipe wants.
    Callers comparing ``count()`` to ``total_k`` see the deficit; raise
    ``temperature`` toward 1 (or lower total_k) to clear it.

    Plan shape: identical to ``proportional_sample`` — a #groups-row
    quota table broadcast back, ONE data shuffle on the group key with
    the WindowGroupLimit-foldable rank bound.
    """
    if not temperature > 0:
        raise ValueError(f"temperature must be > 0 (got {temperature})")
    inv_t = 1.0 / temperature
    docs = docs.filter(F.col(group_col).isNotNull())
    counts = docs.groupBy(group_col).agg(F.count("*").alias("_gn"))
    counts = counts.withColumn(
        "_wgt",
        F.round(
            F.pow(F.col("_gn").cast("double"), F.lit(inv_t))
            * F.lit(float(weight_scale))
        ).cast("long"),
    )
    quotas = _largest_remainder_quotas(
        counts, group_col, total_k, weight_col="_wgt", size_col="_gn"
    )
    return _fill_group_quotas(docs, quotas, group_col, total_k, key_col, seed)


def decontaminate_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    top_k: int = 5,
    max_shingle_df: int | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """The auditable half of ``decontaminate``: for each contaminated doc,
    WHICH benchmark n-grams hit — the evidence a release review reads
    before dropping training documents (a bare flag is unactionable; the
    overlapping spans are the decision input).

    Returns ``(doc_id, hit_rank, shingle)`` — the first ``top_k``
    contaminating shingles per doc in deterministic (shingle asc) order,
    so output is reproducible and the oracle replays it exactly. Plan:
    the same broadcast benchmark-shingle join as ``decontaminate``; the
    per-doc cap is a WindowGroupLimit-pushed rank (each map task
    forwards at most top_k rows per doc it sees).
    """
    from storage_spark.functions.text import word_shingles
    from storage_spark.operators.dedup import _doc_shingles
    from storage_spark.operators.ordering import top_n_per_group

    bench_sh = benchmark.select(
        F.explode(
            F.array_distinct(word_shingles(F.col(bench_text_col), n))
        ).alias("sh")
    ).distinct()
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    doc_sh = _doc_shingles(docs, text_col, id_col, n, max_shingle_df)
    hits = doc_sh.join(bench_sh, "sh")
    ranked = top_n_per_group(
        hits, ["doc"], [F.col("sh").asc()], top_k, rank_col="hit_rank"
    )
    return ranked.select(
        F.col("doc").alias(id_col),
        F.col("hit_rank").cast("int").alias("hit_rank"),
        F.col("sh").alias("shingle"),
    )


def nb_quality_model(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Fit a Naive-Bayes log-odds quality classifier in ONE aggregation
    pass per class — the trainable stage of the fastText-style quality
    filter every large LLM pipeline runs (Joulin et al. 2016,
    arXiv:1607.01759, as deployed in the GPT-3/CCNet-style "classify
    against a high-quality reference corpus" recipe; the NB log-count
    ratio form is Wang & Manning 2012's NBSVM feature). Unlike
    iterative logistic regression, the NB fit is a closed form over
    token counts, so training is ONE map-side-combined groupBy over the
    class-tagged union — and the ENTIRE fit replays in SQL, keeping the
    classifier under the same oracle bar as every other operator.

    Returns one ``(tok, w)`` row per token in the JOINT vocabulary:
    ``w = ln((c_pos+a)/(N_pos+a·V)) − ln((c_neg+a)/(N_neg+a·V))`` with
    ``V`` the joint vocabulary size — positive weights vote
    high-quality. Persist it like ``unigram_model``: fit once on
    labeled reference corpora, score everything under it with
    ``classifier_score``. A token absent from one class gets the
    smoothed floor on that side (never -inf)."""
    from storage_spark.functions.text import normalized_text

    def _toks(df: DataFrame, cls: int) -> DataFrame:
        return spread_small_input(df).select(
            F.explode(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("tok"),
            F.lit(cls).alias("_cls"),
        )

    # joint vocabulary in ONE aggregation over the class-tagged union
    # (r13, guide §2.4): the old shape ran one groupBy PER class and a
    # full-outer join of the two vocab tables — two token-keyed
    # exchanges plus a sort-merge join; the union form pays one
    # map-side-combined exchange and no join. Counts are identical:
    # conditional count over the tagged stream = per-class count, and a
    # token missing from one class counts 0 on that side (the
    # full-outer's coalesce). The table is referenced twice (totals +
    # the weight select) and re-planned by every consumer that
    # broadcasts the model — pinned so the corpus pass runs exactly
    # once (see _pin_model).
    joint = _pin_model(
        _toks(pos, 1)
        .unionByName(_toks(neg, 0))
        .groupBy("tok")
        .agg(
            F.count(F.when(F.col("_cls") == 1, F.lit(1))).alias("_cp"),
            F.count(F.when(F.col("_cls") == 0, F.lit(1))).alias("_cn"),
        )
    )
    totals = joint.agg(
        F.sum("_cp").alias("_np"),
        F.sum("_cn").alias("_nn"),
        F.count(F.lit(1)).alias("_v"),
    )
    a = F.lit(float(smoothing))
    return (
        joint.crossJoin(F.broadcast(totals))
        .select(
            "tok",
            (
                F.log((F.col("_cp") + a) / (F.col("_np") + a * F.col("_v")))
                - F.log((F.col("_cn") + a) / (F.col("_nn") + a * F.col("_v")))
            ).alias("w"),
        )
    )


def classifier_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: float = 0.0,
    model_join: str = "broadcast",
    head_size: int = 10_000,
) -> DataFrame:
    """Score documents under a linear bag-of-words model ``(tok, w)`` —
    the scoring half of the fastText-style quality filter:
    ``logit = bias + (Σ w_tok) / n_tokens`` (mean pooling, fastText's
    form; the sigmoid is monotone so gates threshold the logit
    directly and the oracle never replays ``exp``). Unseen tokens
    contribute 0 (coalesce), the standard open-vocabulary treatment.

    Determinism contract as ``unigram_logprob``: the per-doc sum is the
    ORDERED fold over token positions, bit-stable across partition
    layouts and engines. Only NULL text (or a genuinely empty token
    array) produces no output row — an empty STRING tokenizes to the
    single token ``''`` and scores one row (n_tokens=1, logit=bias):
    audits anti-joining to find unscored docs see NULL-text docs only.

    Scale shape: explode + ONE equi-join on token against the
    vocabulary-sized model. ``model_join='skew_split'`` is the
    too-big-to-broadcast path — but unlike the LM scorers, a weight
    table carries no frequencies (weight magnitude says nothing about
    hotness: 'the' is the hottest key and its weight is ~0), so the
    head is derived from the SCORED CORPUS itself: one
    map-side-combined count per distinct token (cheap next to the
    scoring join) picks the ``head_size`` hottest keys, those join
    broadcast, and the rare tail shuffles skew-free. Results identical
    (tested); only the physical plan changes.
    Returns ``(id_col, n_tokens, logit)``."""
    from storage_spark.functions.text import normalized_text

    if model_join not in ("broadcast", "skew_split"):
        raise ValueError(
            f"model_join must be 'broadcast' or 'skew_split' (got {model_join!r})"
        )
    toks = spread_small_input(docs).select(
        F.col(id_col),
        F.posexplode(F.split(normalized_text(F.col(text_col)), " ")).alias(
            "pos", "tok"
        ),
    )
    m = model.select("tok", F.col("w").alias("_w"))
    if model_join == "broadcast":
        joined = toks.join(F.broadcast(m), "tok", "left")
    else:
        # head = the corpus's hottest tokens (frequency lives in the
        # DATA here, not the model); hot keys join broadcast — LEFT,
        # since a hot token may be unseen by the model — and the tail
        # shuffles on rare keys only
        # bounded (<= head_size rows) and referenced four times below —
        # pinned so the corpus-wide frequency TakeOrdered runs once
        # (see _pin_model)
        head_keys = _pin_model(
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("_f"))
            .orderBy(F.col("_f").desc(), F.col("tok").asc())
            .limit(head_size)
            .select("tok")
        )
        head = m.join(F.broadcast(head_keys), "tok")
        tail = m.join(F.broadcast(head_keys), "tok", "left_anti")
        hot = toks.join(F.broadcast(head_keys), "tok").join(
            F.broadcast(head), "tok", "left"
        )
        cold = toks.join(F.broadcast(head_keys), "tok", "left_anti").join(
            tail, "tok", "left"
        )
        joined = hot.unionByName(cold)
    scored = joined.select(
        id_col, "pos", F.coalesce(F.col("_w"), F.lit(0.0)).alias("_w")
    )
    items = F.array_sort(
        F.collect_list(F.struct(F.col("pos").alias("p"), F.col("_w").alias("v")))
    )
    fold = F.aggregate(items, F.lit(0.0), lambda acc, it: acc + it["v"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.lit(float(bias)) + fold / F.count(F.lit(1))).alias("logit"),
    )


def hashed_ngram_buckets(
    text: Column,
    num_buckets: int = 10_000,
    use_bigrams: bool = True,
    seed: str = "dsir",
) -> Column:
    """Hashed n-gram feature buckets for a document (DSIR, Xie et al.
    2023, arXiv:2302.03169 §2: unigrams + bigrams hashed into a FIXED
    number of buckets). Returns the array of bucket ids in token order
    (unigram buckets first, then bigram buckets — a deterministic
    layout so downstream ordered folds are reproducible). The hash is
    the engine-portable md5-hex form every sampler here uses: the
    first 6 hex digits of ``md5(seed:term)`` mod ``num_buckets`` —
    replayable digit-by-digit in any engine with md5 + string ops.

    The bucket-hashing is what makes DSIR scale-clean: the feature
    space is ``num_buckets`` REGARDLESS of corpus vocabulary, so the
    fitted models are always broadcastable — no skew_split escape
    hatch needed, by construction."""
    from storage_spark.functions.text import normalized_text

    tk = F.split(normalized_text(text), " ")

    def _bucket(term: Column) -> Column:
        h = F.md5(F.concat(F.lit(f"{seed}:"), term))
        return F.pmod(
            F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint"),
            F.lit(int(num_buckets)),
        ).cast("int")

    uni = F.transform(tk, _bucket)
    if not use_bigrams:
        return uni
    # zip_with over shifted slices, not transform + element_at(tk, i):
    # the captured-subexpression lambda re-evaluated normalized_text's
    # regex once PER TOKEN per row (the r10 lambda-capture hazard —
    # see bigram_model). Same "prev tok" strings in the same token
    # order, so the downstream ordered fold is untouched.
    pairs = F.when(
        F.size(tk) >= 2,
        F.zip_with(
            F.slice(tk, 1, F.size(tk) - 1),
            F.slice(tk, 2, F.size(tk) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(uni, F.transform(pairs, _bucket))


def dsir_model(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    num_buckets: int = 10_000,
    use_bigrams: bool = True,
    smoothing: float = 1.0,
) -> DataFrame:
    """The persistable half of DSIR: fit hashed-n-gram models on TARGET
    and RAW and return the merged per-bucket log-weight table
    ``(b, lw)`` — ≤ num_buckets rows at ANY corpus size, so it always
    broadcasts. Persist with ``sources.textmodels.save_text_model(...,
    kind='dsir', params={'num_buckets':…, 'use_bigrams':…})`` (the
    scoring side must hash features with the SAME parameters) and feed
    it back via ``dsir_weights(model=…)``."""
    buckets = hashed_ngram_buckets(
        F.col(text_col), num_buckets=num_buckets, use_bigrams=use_bigrams
    )

    def _feats(df: DataFrame, cls: int) -> DataFrame:
        return spread_small_input(df).select(
            F.explode(buckets).alias("b"), F.lit(cls).alias("_cls")
        )

    # both distributions fit in ONE aggregation over the class-tagged
    # union (r13, guide §2.4) — one bucket-keyed exchange instead of
    # two groupBys + a full-outer join; conditional counts reproduce
    # the per-side counts and the missing-side zeros exactly (see the
    # same restructure in nb_quality_model). merged is <= num_buckets
    # rows and referenced twice (totals + the final select) — pinned,
    # so the corpus fit explode runs once per side (see _pin_model).
    merged = _pin_model(
        _feats(target, 1)
        .unionByName(_feats(raw, 0))
        .groupBy("b")
        .agg(
            F.count(F.when(F.col("_cls") == 1, F.lit(1))).alias("_ct"),
            F.count(F.when(F.col("_cls") == 0, F.lit(1))).alias("_cr"),
        )
    )
    totals = merged.agg(
        F.sum("_ct").alias("_nt"), F.sum("_cr").alias("_nr")
    )
    a = F.lit(float(smoothing))
    v = F.lit(int(num_buckets))
    return merged.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("_ct") + a) / (F.col("_nt") + a * v))
            - F.log((F.col("_cr") + a) / (F.col("_nr") + a * v))
        ).alias("lw"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
    use_bigrams: bool = True,
    smoothing: float = 1.0,
    model: DataFrame | None = None,
) -> DataFrame:
    """Per-doc DSIR importance log-weight: fit hashed-n-gram unigram
    models on the TARGET distribution (the high-quality reference) and
    the RAW distribution (the corpus being selected from), then
    ``log w(doc) = Σ_features (ln p_target[b] − ln p_raw[b])`` — docs
    whose feature profile looks more target-like than raw-like score
    high (Xie et al. 2023: importance resampling corrects the raw
    corpus TOWARD the target distribution, where a discriminative
    filter like ``classifier_score`` merely ranks). Add-``smoothing``
    on both models over the fixed ``num_buckets`` space.

    Determinism: per-doc summation is the ORDERED fold over the
    deterministic bucket-array layout; both model fits are exact
    integer counts. Scale shape: explode + two map-side-combined
    groupBys (each ≤ num_buckets rows) + ONE broadcast join of the
    merged model against the raw corpus's exploded buckets — the model
    is bounded by construction, so this operator has no
    too-big-to-broadcast regime at any corpus size.

    Returns ``(id_col, n_features, log_w)``; NULL/empty-text docs
    produce no row (same contract as the LM scorers).

    ``model=`` is the fit-once/score-many path: pass a persisted
    ``dsir_model(...)`` table ``(b, lw)`` — ``num_buckets`` /
    ``use_bigrams`` must match the fit (they shape the scoring side's
    feature hash too; ``sources.textmodels`` round-trips them in the
    model config)."""
    buckets = hashed_ngram_buckets(
        F.col(text_col), num_buckets=num_buckets, use_bigrams=use_bigrams
    )
    if model is None:
        if target is None:
            raise ValueError("dsir_weights needs either target= or model=")
        model = dsir_model(
            raw, target, text_col, num_buckets, use_bigrams, smoothing
        )
    weighted = model.select("b", F.col("lw").alias("_lw"))
    feats = spread_small_input(raw).select(
        F.col(id_col), F.posexplode(buckets).alias("pos", "b")
    )
    scored = feats.join(F.broadcast(weighted), "b", "left").select(
        id_col, "pos", F.col("_lw").alias("_lw")
    )
    items = F.array_sort(
        F.collect_list(F.struct(F.col("pos").alias("p"), F.col("_lw").alias("v")))
    )
    fold = F.aggregate(items, F.lit(0.0), lambda acc, it: acc + it["v"])
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_features"),
        fold.alias("log_w"),
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame | None,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
    use_bigrams: bool = True,
    smoothing: float = 1.0,
    seed: int = 42,
    model: DataFrame | None = None,
) -> DataFrame:
    """DSIR selection: ``k`` docs sampled without replacement with
    probability ∝ importance weight, via the Gumbel-top-k trick —
    ``key = log_w + Gumbel(md5-uniform)`` and take the k largest
    (Gumbel-max is the standard exact reduction of weighted sampling
    to a top-k; the noise is the DETERMINISTIC md5 uniform every
    sampler here uses, so selection replays in any engine — no RNG
    state). Ties (measure-zero but md5 is discrete) break by id.

    One TakeOrdered over the weighted table — no shuffle beyond
    ``dsir_weights``'s own. Returns the selected
    ``(id_col, n_features, log_w, gumbel_key)`` rows."""
    w = dsir_weights(
        raw, target, id_col, text_col, num_buckets, use_bigrams, smoothing,
        model=model,
    )
    # md5-uniform in (0,1): 12 hex digits / 16^12, +1 to dodge exact 0
    h = F.md5(F.concat(F.lit(f"dsir-gumbel:{seed}:"), F.col(id_col).cast("string")))
    u = (F.conv(F.substring(h, 1, 12), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(16 ** 12 + 1)
    )
    g = -F.log(-F.log(u))
    return (
        w.withColumn("gumbel_key", F.col("log_w") + g)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def dsir_sample_per_group(
    raw: DataFrame,
    target: DataFrame | None,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
    use_bigrams: bool = True,
    smoothing: float = 1.0,
    seed: int = 42,
    model: DataFrame | None = None,
) -> DataFrame:
    """DSIR selection with a PER-GROUP quota — the paper's per-domain
    form (Xie et al. 2023 select within each source/domain so a small
    domain is not drowned by the global cut; same motivation as
    ``perplexity_buckets(per_language=True)``): ``k`` docs per
    ``group_col`` value, sampled without replacement ∝ importance
    weight via the identical md5-uniform Gumbel keys ``dsir_sample``
    uses. One weights plan + one PER-GROUP window rank (groups
    partition the window — no global ordering anywhere). Returns
    ``(group_col, id_col, n_features, log_w, gumbel_key)``."""
    from pyspark.sql.window import Window

    w = dsir_weights(
        raw, target, id_col, text_col, num_buckets, use_bigrams, smoothing,
        model=model,
    )
    scored = w.join(raw.select(id_col, group_col), id_col)
    h = F.md5(
        F.concat(F.lit(f"dsir-gumbel:{seed}:"), F.col(id_col).cast("string"))
    )
    u = (F.conv(F.substring(h, 1, 12), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(16 ** 12 + 1)
    )
    g = -F.log(-F.log(u))
    win = Window.partitionBy(group_col).orderBy(
        F.col("gumbel_key").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("gumbel_key", F.col("log_w") + g)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= int(k))
        .select(group_col, id_col, "n_features", "log_w", "gumbel_key")
    )


def perplexity_buckets(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bounds: tuple = (1.0 / 3.0, 2.0 / 3.0),
    per_language: bool = False,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §3: rank the
    corpus by LM score, cut at percentiles — train mostly on the head,
    inspect the tail): label every doc ``head`` (most fluent, lowest
    avg NLL), ``middle``, or ``tail`` by exact percentile thresholds of
    the ``unigram_logprob`` score. Feed a ``bounds``-tuned split to
    ``mix_corpora`` / samplers for quality-curriculum mixing.

    ``per_language=True`` is the paper's actual form: thresholds are
    computed WITHIN each ``lang_id`` group (a small language never
    lands wholesale in the tail just because its tokens are rare under
    a mixed-corpus LM); the threshold table is #languages rows,
    broadcast back like ``quality_quantile_filter``'s. The default
    stays global (one corpus, one LM — the self-perplexity shape the
    driver row grades).

    Cross-engine exactness: thresholds are computed on the INTEGER
    quantization ``round(avg_nll·1e4)`` (the quality_quantile_filter
    trick) — ``ln``'s last-ulp engine differences are absorbed before
    the percentile, so bucket membership never flips at the boundary.
    Scale shape: the scoring plan + one tiny threshold aggregate
    (1 row, or #languages rows) broadcast back (no sort, no window).
    Returns ``(id_col, n_tokens, nll_1e4, bucket)`` (+ ``lang`` when
    per-language)."""
    lo, hi = float(bounds[0]), float(bounds[1])
    if not 0.0 < lo < hi < 1.0:
        raise ValueError(f"bounds must satisfy 0 < lo < hi < 1 (got {bounds})")
    s = unigram_logprob(docs, model, id_col, text_col).select(
        id_col,
        "n_tokens",
        F.round(F.col("avg_nll") * 10000).cast("bigint").alias("nll_1e4"),
    )
    label = (
        F.when(F.col("nll_1e4") <= F.col("_t1"), F.lit("head"))
        .when(F.col("nll_1e4") <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket")
    )
    if per_language:
        from storage_spark.functions.text import lang_id

        langs = docs.select(
            F.col(id_col), lang_id(F.col(text_col)).alias("lang")
        )
        s = s.join(langs, id_col)
        thr = s.groupBy("lang").agg(
            F.percentile("nll_1e4", lo).alias("_t1"),
            F.percentile("nll_1e4", hi).alias("_t2"),
        )
        return s.join(F.broadcast(thr), "lang").select(
            id_col, "lang", "n_tokens", "nll_1e4", label
        )
    thr = s.agg(
        F.percentile("nll_1e4", lo).alias("_t1"),
        F.percentile("nll_1e4", hi).alias("_t2"),
    )
    return s.crossJoin(F.broadcast(thr)).select(
        id_col, "n_tokens", "nll_1e4", label
    )


def kn_bigram_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount_x4: int = 3,
) -> DataFrame:
    """Per-doc interpolated Kneser-Ney bigram score (Kneser & Ney 1995;
    Chen & Goodman 1999's interpolated form) — THE canonical n-gram
    smoothing, next to the add-a ``bigram_logprob``. KN's insight is
    the continuation count: a token's backoff mass comes from how many
    DISTINCT contexts it follows ("Francisco" is frequent but follows
    almost only "San" — KN backs it off hard; add-a can't).

    Engine-portable by construction: the discount is the rational
    ``discount_x4/4`` (default 3/4, the textbook value), so every
    interpolated probability is ONE integer ratio::

        p(tok|prev) = [max(4c-3,0)·(T+V) + 3·N1(prev,·)·(N1(·,tok)+1)]
                      / [4·c(prev)·(T+V)]

    (T = distinct bigram types, V = vocab size; the +1/+V Laplace floor
    on the continuation distribution covers tokens that never occur in
    second position — documented deviation, needed for a total score).
    The score is Σ qlog2(num) − qlog2(den) in MILLI-BITS via Mitchell's
    approximation (``bpe._qlog2_milli`` — bit length + one IEEE divide,
    no libm), so a SQL oracle replays the fit AND every doc's score
    exactly. First tokens are unscored (pairs only), matching the
    "adjacent pairs" contract; docs with < 2 tokens emit no row.

    Scale shape: one explode + three model equi-joins (pair, context,
    continuation) + a 1-row totals cross — the bigram_logprob plan with
    KN's extra distinct-count aggregations, all map-side combinable.
    """
    from storage_spark.functions.bpe import _qlog2_milli

    if not (1 <= discount_x4 <= 3):
        raise ValueError("discount_x4 must be in [1, 3] (D = x/4 ∈ (0,1))")
    # the tokenize+pair work fuses into the doc scan stage; a one-file
    # input would serialize it on one core (r13, guide §2/§6)
    docs = spread_small_input(docs)
    toks = F.split(F.col(text_col), " ")
    pairs = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.when(
                    F.size(toks) >= 2,
                    F.zip_with(
                        F.slice(toks, 1, F.size(toks) - 1),
                        F.slice(toks, 2, F.size(toks) - 1),
                        lambda a, b: F.struct(
                            a.alias("prev"), b.alias("tok")
                        ),
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<prev:string,tok:string>>"
                )),
            ).alias("pos", "pr"),
        )
        .select("doc_id", "pos", "pr.prev", "pr.tok")
    )
    # the bigram TYPE table feeds four consumers (ctx, cont, totals and
    # the scored join) — pin it so the corpus pair aggregation runs
    # once, not four times (see _pin_model)
    big = _pin_model(
        pairs.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("c"))
    )
    ctx = big.groupBy("prev").agg(
        F.sum("c").alias("cprev"),
        F.count(F.lit(1)).alias("n1_prev"),  # distinct followers
    )
    cont = big.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n1_cont")   # distinct predecessors
    )
    vocab = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).agg(F.count_distinct("w").alias("v"))
    totals = big.agg(F.count(F.lit(1)).alias("t")).crossJoin(
        F.broadcast(vocab)
    )

    d4 = int(discount_x4)
    # No broadcast hints on the model tables: big/ctx/cont grow with the
    # corpus's distinct-bigram count (unbounded at 100 TB), so the join
    # strategy is left to AQE — it broadcasts them when they fit and
    # falls back to a shuffle join when they don't. Only the 1-row
    # totals table is hinted (bounded by construction).
    scored = (
        pairs.join(big, ["prev", "tok"], "left")
        .join(ctx, "prev", "left")
        .join(cont, "tok", "left")
        .crossJoin(F.broadcast(totals))
    )
    tv = F.col("t") + F.col("v")
    num = (
        F.greatest(
            F.lit(4) * F.coalesce(F.col("c"), F.lit(0)) - F.lit(d4),
            F.lit(0),
        ) * tv
        + F.lit(d4) * F.coalesce(F.col("n1_prev"), F.lit(0))
        * (F.coalesce(F.col("n1_cont"), F.lit(0)) + F.lit(1))
    )
    den = F.lit(4) * F.coalesce(F.col("cprev"), F.lit(0)) * tv
    # prev unseen cannot happen when scoring the fitted corpus (every
    # pair was counted); a zero num/den would be a fit bug — keep the
    # division total by construction and let tests pin it
    lp = _qlog2_milli(num) - _qlog2_milli(den)
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(lp).cast("long").alias("score_milli"),
        )
    )


def kn_trigram_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount_x4: int = 3,
) -> DataFrame:
    """Per-doc interpolated Kneser-Ney TRIGRAM score — the standard
    3-gram form of ``kn_bigram_score``, one more continuation level in
    the backoff chain 3→2→1 (Chen & Goodman 1999 §3):

    - level 1 (continuation unigram, Laplace-floored as in the bigram
      op): ``p1(w) = (N1(·w)+1) / (T+V)`` with T = distinct bigram
      types, V = vocab;
    - level 2 (continuation bigram — counts come from TRIGRAM TYPES,
      the defining KN move): ``p2(w|v) = [max(4·N1(·vw)−3, 0)·(T+V)
      + 3·N1(v·)·(N1(·w)+1)] / [4·N1(·v·)·(T+V)]`` where N1(·vw) =
      distinct u with uvw seen, N1(·v·) = distinct (u,w) around v,
      N1(v·) = distinct bigram followers of v;
    - level 3 (observed trigrams): ``p3(w|u,v) = [max(4·c3(uvw)−3, 0)
      + 3·N1(uv·)·p2(w|v)] / c3(uv·)``.

    Clearing denominators keeps every probability ONE integer ratio::

        num = max(4·c3−3,0)·4·N1pv·(T+V)
              + 3·n1a·(max(4·N1pvw−3,0)·(T+V) + 3·Nfv·(n1c+1))
        den = 16·c3ctx·N1pv·(T+V)

    scored as Σ qlog2(num) − qlog2(den) milli-bits (Mitchell, no libm)
    so a SQL oracle replays fit AND scores exactly. First two tokens of
    each doc are unscored (triples only); docs with < 3 tokens emit no
    row. Scoring the fitted corpus keeps the ratio total (every factor
    ≥ 1 by construction).

    Scale shape: one posexplode + five model equi-joins + a 1-row
    totals cross, all model tables built by map-side-combinable
    aggregations over trigram/bigram TYPE tables; no broadcast hints
    (AQE sizes the joins — the kn_bigram lesson, ADVICE r9). Integer
    bound: ``den = 16·c3ctx·N1pv·(T+V)`` must stay under 2^63 —
    c3ctx·N1pv·(T+V) < 5.7e17, ample for any single-tenant corpus this
    fixture scale exercises and checkable from the fitted stats; past
    it, rescale the totals term (the score is shift-invariant per doc
    count) before scoring."""
    from storage_spark.functions.bpe import _qlog2_milli

    if not (1 <= discount_x4 <= 3):
        raise ValueError("discount_x4 must be in [1, 3] (D = x/4 ∈ (0,1))")
    docs = spread_small_input(docs)  # see kn_bigram_score (r13)
    toks = F.split(F.col(text_col), " ")
    tri = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.when(
                    F.size(toks) >= 3,
                    F.zip_with(
                        F.zip_with(
                            F.slice(toks, 1, F.size(toks) - 2),
                            F.slice(toks, 2, F.size(toks) - 2),
                            lambda a, b: F.struct(
                                a.alias("u"), b.alias("v")
                            ),
                        ),
                        F.slice(toks, 3, F.size(toks) - 2),
                        lambda uv, c: F.struct(
                            uv["u"].alias("u"), uv["v"].alias("v"),
                            c.alias("w"),
                        ),
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<u:string,v:string,w:string>>"
                )),
            ).alias("pos", "tr"),
        )
        .select("doc_id", "pos", "tr.u", "tr.v", "tr.w")
    )
    # trigram counts + the type table every continuation stat reads —
    # pinned: four consumers (ctx3, cont2, mid, scored) would otherwise
    # each replay the corpus trigram explode+count (see _pin_model)
    tri3 = _pin_model(
        tri.groupBy("u", "v", "w").agg(F.count(F.lit(1)).alias("c3"))
    )
    ctx3 = tri3.groupBy("u", "v").agg(
        F.sum("c3").alias("c3ctx"),
        F.count(F.lit(1)).alias("n1a"),      # distinct w after (u,v)
    )
    cont2 = tri3.groupBy("v", "w").agg(
        F.count(F.lit(1)).alias("n1pvw")     # distinct u before (v,w)
    )
    mid = tri3.groupBy("v").agg(
        F.count(F.lit(1)).alias("n1pv")      # distinct (u,w) around v
    )
    # bigram-level stats (pairs over the SAME corpus)
    pairs = (
        docs.select(
            F.posexplode(
                F.when(
                    F.size(toks) >= 2,
                    F.zip_with(
                        F.slice(toks, 1, F.size(toks) - 1),
                        F.slice(toks, 2, F.size(toks) - 1),
                        lambda a, b: F.struct(
                            a.alias("prev"), b.alias("tok")
                        ),
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<prev:string,tok:string>>"
                )),
            ).alias("pos", "pr"),
        )
        .select("pr.prev", "pr.tok")
    )
    # bigram TYPE table, three consumers (nfv, cont1, totals) — pinned
    # so the corpus pair explode+count runs once (see _pin_model)
    big = _pin_model(
        pairs.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("cb"))
    )
    nfv = big.groupBy("prev").agg(F.count(F.lit(1)).alias("nfv")) \
        .withColumnRenamed("prev", "v")
    cont1 = big.groupBy("tok").agg(F.count(F.lit(1)).alias("n1c")) \
        .withColumnRenamed("tok", "w")
    vocab = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("wd")
    ).agg(F.count_distinct("wd").alias("v_sz"))
    totals = big.agg(F.count(F.lit(1)).alias("t")).crossJoin(
        F.broadcast(vocab)
    )

    d4 = int(discount_x4)
    scored = (
        tri.join(tri3, ["u", "v", "w"], "left")
        .join(ctx3, ["u", "v"], "left")
        .join(cont2, ["v", "w"], "left")
        .join(mid, "v", "left")
        .join(nfv, "v", "left")
        .join(cont1, "w", "left")
        .crossJoin(F.broadcast(totals))
    )
    tv = F.col("t") + F.col("v_sz")
    z = F.lit(0)
    p2num = (
        F.greatest(F.lit(4) * F.coalesce(F.col("n1pvw"), z) - F.lit(d4), z)
        * tv
        + F.lit(d4) * F.coalesce(F.col("nfv"), z)
        * (F.coalesce(F.col("n1c"), z) + F.lit(1))
    )
    num = (
        F.greatest(F.lit(4) * F.coalesce(F.col("c3"), z) - F.lit(d4), z)
        * F.lit(4) * F.coalesce(F.col("n1pv"), z) * tv
        + F.lit(d4) * F.coalesce(F.col("n1a"), z) * p2num
    )
    den = (
        F.lit(16) * F.coalesce(F.col("c3ctx"), z)
        * F.coalesce(F.col("n1pv"), z) * tv
    )
    lp = _qlog2_milli(num) - _qlog2_milli(den)
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.sum(lp).cast("long").alias("score_milli"),
        )
    )


def kn_quadgram_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount_x4: int = 3,
) -> DataFrame:
    """Per-doc interpolated Kneser-Ney 4-GRAM score — the backoff chain
    of ``kn_trigram_score`` grown one continuation level, 4→3→2→1
    (Chen & Goodman 1999 §3; the mechanical growth the trigram
    docstring promised generalizes):

    - levels 1-2 are the trigram op's, verbatim (continuation unigram
      Laplace-floored over T+V; continuation bigram from trigram
      types);
    - level 3 becomes a CONTINUATION level: raw trigram counts are
      replaced by 4-gram-type continuation counts — ``N1(·uvw)`` =
      distinct s with suvw seen, context total ``N1(·uv·)`` = distinct
      (s, w) around (u, v) — while the interpolation weight keeps the
      house convention of counting followers in the one-lower-order
      type table (``N1(uv·)`` = distinct trigram followers of (u, v),
      the trigram op's n1a);
    - level 4 (observed 4-grams): ``p4(w|s,u,v) = [max(4·c4(suvw)−3,0)
      + 3·N1(suv·)·p3cont(w|u,v)] / c4(suv·)``.

    Clearing denominators keeps ONE integer ratio per position::

        p2num = max(4·N1(·vw)−3,0)·(T+V) + 3·N1(v·)·(N1(·w)+1)
        p3num = max(4·N1(·uvw)−3,0)·4·N1(·v·)·(T+V) + 3·N1(uv·)·p2num
        num   = max(4·c4−3,0)·16·N1(·uv·)·N1(·v·)·(T+V) + 3·N1(suv·)·p3num
        den   = 64·c4(suv·)·N1(·uv·)·N1(·v·)·(T+V)

    scored as Σ qlog2(num) − qlog2(den) milli-bits. First three tokens
    of each doc are unscored; docs with < 4 tokens emit no row. Integer
    bound (one factor tighter than the trigram's): ``c4ctx·mid3·mid·
    (T+V) < 2^63/64 ≈ 1.4e17`` — checkable from the fitted stats; past
    it, rescale the totals term before scoring.

    Scale shape: one posexplode + EIGHT model equi-joins + the 1-row
    totals cross; every model table is a map-side-combinable
    aggregation over 4-gram/trigram/bigram TYPE tables; no broadcast
    hints on corpus-sized tables (AQE sizes the joins — the kn_bigram
    ADVICE lesson). Staged r11 WITHOUT a driver row (the 50-slot
    recording window was exactly full); its oracle is the trigram CTE
    chain grown one level, queued for the r12 window."""
    from storage_spark.functions.bpe import _qlog2_milli

    if not (1 <= discount_x4 <= 3):
        raise ValueError("discount_x4 must be in [1, 3] (D = x/4 ∈ (0,1))")
    docs = spread_small_input(docs)  # see kn_bigram_score (r13)
    toks = F.split(F.col(text_col), " ")
    quad = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.when(
                    F.size(toks) >= 4,
                    F.zip_with(
                        F.zip_with(
                            F.zip_with(
                                F.slice(toks, 1, F.size(toks) - 3),
                                F.slice(toks, 2, F.size(toks) - 3),
                                lambda a, b: F.struct(
                                    a.alias("s"), b.alias("u")
                                ),
                            ),
                            F.slice(toks, 3, F.size(toks) - 3),
                            lambda su, c: F.struct(
                                su["s"].alias("s"), su["u"].alias("u"),
                                c.alias("v"),
                            ),
                        ),
                        F.slice(toks, 4, F.size(toks) - 3),
                        lambda suv, d: F.struct(
                            suv["s"].alias("s"), suv["u"].alias("u"),
                            suv["v"].alias("v"), d.alias("w"),
                        ),
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<s:string,u:string,v:string,w:string>>"
                )),
            ).alias("pos", "q"),
        )
        .select("doc_id", "pos", "q.s", "q.u", "q.v", "q.w")
    )
    # 4-gram counts + the type-derived continuation stats
    # 4-gram TYPE table, four consumers (ctx4, cont3, mid3, scored) —
    # pinned so the corpus 4-gram explode+count runs once (_pin_model)
    q4 = _pin_model(
        quad.groupBy("s", "u", "v", "w").agg(F.count(F.lit(1)).alias("c4"))
    )
    ctx4 = q4.groupBy("s", "u", "v").agg(
        F.sum("c4").alias("c4ctx"),
        F.count(F.lit(1)).alias("n4a"),      # distinct w after (s,u,v)
    )
    cont3 = q4.groupBy("u", "v", "w").agg(
        F.count(F.lit(1)).alias("n1puvw")    # distinct s before (u,v,w)
    )
    mid3 = q4.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("n1buv")     # distinct (s,w) around (u,v)
    )
    # trigram TYPES: the level-3 interpolation weight (house convention:
    # followers counted in the one-lower-order type table)
    tri = (
        docs.select(
            F.explode(
                F.when(
                    F.size(toks) >= 3,
                    F.zip_with(
                        F.zip_with(
                            F.slice(toks, 1, F.size(toks) - 2),
                            F.slice(toks, 2, F.size(toks) - 2),
                            lambda a, b: F.struct(
                                a.alias("u"), b.alias("v")
                            ),
                        ),
                        F.slice(toks, 3, F.size(toks) - 2),
                        lambda uv, c: F.struct(
                            uv["u"].alias("u"), uv["v"].alias("v"),
                            c.alias("w"),
                        ),
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<u:string,v:string,w:string>>"
                )),
            ).alias("tr"),
        )
        .select("tr.u", "tr.v", "tr.w")
    )
    # trigram TYPE table, three consumers (folw3, cont2, mid) — pinned
    # (see _pin_model)
    tri3 = _pin_model(
        tri.groupBy("u", "v", "w").agg(F.count(F.lit(1)).alias("c3"))
    )
    folw3 = tri3.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("n1a")       # distinct trigram followers
    )
    cont2 = tri3.groupBy("v", "w").agg(
        F.count(F.lit(1)).alias("n1pvw")     # distinct u before (v,w)
    )
    mid = tri3.groupBy("v").agg(
        F.count(F.lit(1)).alias("n1pv")      # distinct (u,w) around v
    )
    # bigram-level stats (pairs over the SAME corpus)
    pairs = (
        docs.select(
            F.explode(
                F.when(
                    F.size(toks) >= 2,
                    F.zip_with(
                        F.slice(toks, 1, F.size(toks) - 1),
                        F.slice(toks, 2, F.size(toks) - 1),
                        lambda a, b: F.struct(
                            a.alias("prev"), b.alias("tok")
                        ),
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<prev:string,tok:string>>"
                )),
            ).alias("pr"),
        )
        .select("pr.prev", "pr.tok")
    )
    # bigram TYPE table, three consumers (nfv, cont1, totals) — pinned
    # so the corpus pair explode+count runs once (see _pin_model)
    big = _pin_model(
        pairs.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("cb"))
    )
    nfv = big.groupBy("prev").agg(F.count(F.lit(1)).alias("nfv")) \
        .withColumnRenamed("prev", "v")
    cont1 = big.groupBy("tok").agg(F.count(F.lit(1)).alias("n1c")) \
        .withColumnRenamed("tok", "w")
    vocab = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("wd")
    ).agg(F.count_distinct("wd").alias("v_sz"))
    totals = big.agg(F.count(F.lit(1)).alias("t")).crossJoin(
        F.broadcast(vocab)
    )

    d4 = int(discount_x4)
    scored = (
        quad.join(q4, ["s", "u", "v", "w"], "left")
        .join(ctx4, ["s", "u", "v"], "left")
        .join(cont3, ["u", "v", "w"], "left")
        .join(mid3, ["u", "v"], "left")
        .join(folw3, ["u", "v"], "left")
        .join(cont2, ["v", "w"], "left")
        .join(mid, "v", "left")
        .join(nfv, "v", "left")
        .join(cont1, "w", "left")
        .crossJoin(F.broadcast(totals))
    )
    tv = F.col("t") + F.col("v_sz")
    z = F.lit(0)
    p2num = (
        F.greatest(F.lit(4) * F.coalesce(F.col("n1pvw"), z) - F.lit(d4), z)
        * tv
        + F.lit(d4) * F.coalesce(F.col("nfv"), z)
        * (F.coalesce(F.col("n1c"), z) + F.lit(1))
    )
    p3num = (
        F.greatest(F.lit(4) * F.coalesce(F.col("n1puvw"), z) - F.lit(d4), z)
        * F.lit(4) * F.coalesce(F.col("n1pv"), z) * tv
        + F.lit(d4) * F.coalesce(F.col("n1a"), z) * p2num
    )
    num = (
        F.greatest(F.lit(4) * F.coalesce(F.col("c4"), z) - F.lit(d4), z)
        * F.lit(16) * F.coalesce(F.col("n1buv"), z)
        * F.coalesce(F.col("n1pv"), z) * tv
        + F.lit(d4) * F.coalesce(F.col("n4a"), z) * p3num
    )
    den = (
        F.lit(64) * F.coalesce(F.col("c4ctx"), z)
        * F.coalesce(F.col("n1buv"), z)
        * F.coalesce(F.col("n1pv"), z) * tv
    )
    lp = _qlog2_milli(num) - _qlog2_milli(den)
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_quadgrams"),
            F.sum(lp).cast("long").alias("score_milli"),
        )
    )
