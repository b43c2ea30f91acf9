"""Trained language identification — Naive Bayes over char n-grams,
optionally joined by tagged word n-gram features (``word_ns=(1, 2)`` —
TextCat's full profile; see ``word_ngrams``).

Replaces the stopword-argmax heuristic (``functions.text.lang_id``) as
the QUALITY bar for the per-language stack (CCNet buckets, per-language
DSIR, per-language line dedup all consume a lang label): a trained
char-n-gram model is the classical strong baseline (Cavnar & Trenkle
1994 rank profiles; Naive Bayes over char n-grams is its closed-form
probabilistic sibling and what fastText-class identifiers reduce to at
the feature level). Fit is closed-form counting — no iteration — and
scoring is integer milli-bit arithmetic (the ``bpe._qlog2_milli``
idiom), so BOTH halves replay exactly in a SQL oracle.

Model: for each language l and padded char n-gram g,

    w(l, g)  = qlog2(c(l,g) + 1) − qlog2(tot(l) + G)      (Laplace)
    oov(l)   =          0        − qlog2(tot(l) + G)

with c(l,g) = occurrences of g in l's training text, tot(l) = Σ_g
c(l,g), G = distinct grams across the whole training corpus. A doc with
gram counts {g: k_g} (N total) scores, per language,

    score(l) = Σ_matched k_g · w(l,g) + (N − Σ_matched k_g) · oov(l)

and the prediction is the deterministic argmax (score desc, lang asc).
Class priors are intentionally omitted (training corpora for langid are
curated roughly balanced; a prior term is one more qlog2 difference if
a caller wants it — documented deviation).

The model is ONE narrow table ``(lang, gram, w_milli)`` — the per-lang
OOV weight rides as the ``gram = ''`` row (the empty string can never
be a length-n gram) — so it persists under ``sources.textmodels`` kind
``langid`` and broadcasts at any corpus size: the table is bounded by
|langs| × |gram space| (≤ a few 100k rows for n=3), NOT by the corpus.

Scale shape: fit = one explode + two map-side-combinable groupBys over
the (bounded) training set; score = one explode + one groupBy(doc,
gram) + one equi-join against the broadcastable model + one
groupBy(doc, lang) + an |langs|-row broadcast cross — no per-row
Python, no window wider than one doc's languages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from storage_spark.functions.bpe import _qlog2_milli


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Padded char n-grams of the normalized text: lowercase, collapse
    whitespace, wrap in single spaces (so word boundaries are features —
    ' th' ≠ 'th '), then every length-``n`` substring. Empty array when
    the padded text is shorter than ``n``.

    Built as zip_with over shifted char arrays, NOT transform-over-
    sequence with a substring lambda: a lambda body referencing the
    normalization subexpression re-evaluates it PER ELEMENT (the
    ``text.word_shingles`` lambda-capture hazard) — measured ~90× at
    sf1 (184 s → ~2 s for the map-only gram count,
    tools/probe_r10_sf1.py). Lambda bodies here touch only their own
    variables; the char array is evaluated once per row per
    reference."""
    s = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "),
        F.lit(" "),
    )
    chars = F.filter(F.split(s, ""), lambda c: c != F.lit(""))
    sh = chars
    for j in range(1, n):
        shifted = F.slice(
            chars, j + 1, F.greatest(F.size(chars) - j, F.lit(0))
        )
        sh = F.zip_with(
            sh,
            shifted,
            lambda a, b: F.when(
                a.isNull() | b.isNull(), F.lit(None)
            ).otherwise(F.concat(a, b)),
        )
    return F.filter(sh, lambda x: x.isNotNull())


def word_ngrams(text: Column, n: int = 1) -> Column:
    """Tagged word n-grams of the normalized text (lowercase, collapsed
    whitespace): ``'w{n}:'`` + the space-joined run of ``n`` consecutive
    tokens — TextCat's word-boundary profile half (Cavnar & Trenkle
    1994 §4 keep word-level evidence beside the char grams; fastText's
    langid models likewise mix word and char-ngram features). The tag
    keeps the word features addressable next to char grams in ONE
    ``(lang, gram, w_milli)`` table; for the default char n = 3 the tag
    makes collisions impossible (every tagged gram is ≥ 4 chars), and
    any collision at other settings is symmetric feature aliasing (fit
    and score treat the colliding string identically on both sides),
    not model corruption.

    Same zip_with-over-shifted-arrays build as ``char_ngrams`` — the
    token array is evaluated once per row per reference; lambda bodies
    touch only their own variables (the r10 lambda-capture hazard)."""
    s = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    toks = F.filter(F.split(s, " "), lambda t: t != F.lit(""))
    sh = toks
    for j in range(1, n):
        shifted = F.slice(
            toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0))
        )
        sh = F.zip_with(
            sh,
            shifted,
            lambda a, b: F.when(
                a.isNull() | b.isNull(), F.lit(None)
            ).otherwise(F.concat(a, F.lit(" "), b)),
        )
    tag = f"w{n}:"
    return F.transform(
        F.filter(sh, lambda x: x.isNotNull()),
        lambda g: F.concat(F.lit(tag), g),
    )


def langid_features(
    text: Column, n: int = 3, word_ns: tuple[int, ...] = ()
) -> Column:
    """The full feature array one doc contributes: padded char n-grams
    plus (optionally) tagged word n-grams — ``word_ns=(1, 2)`` is
    TextCat's full profile. ``word_ns=()`` (default) is exactly the
    char-only model, byte-identical to the pre-r11 fit."""
    feats = char_ngrams(text, n)
    for wn in word_ns:
        feats = F.concat(feats, word_ngrams(text, wn))
    return feats


def langid_feature_count(
    text: Column, n: int = 3, word_ns: tuple[int, ...] = ()
) -> Column:
    """``F.size(langid_features(text, n, word_ns))`` computed
    ANALYTICALLY, without building the gram arrays — the r12 scoring
    optimization: the per-doc total pass pays only normalization +
    length/size, not the zip_with shifted-array chain (guide §1.2 —
    don't compute what you throw away; the totals pass discards every
    gram string).

    Equal by construction (pinned in tests on unicode + edge fixtures):

    - char n-grams count = max(len(padded) − (n−1), 0), and the padded
      char-array length IS ``F.length`` of the padded string — Spark's
      ``length`` counts code points, exactly what ``split(s, '')``
      splits into (Java regex zero-width matches advance by code
      point, so surrogate pairs never split);
    - each word-n level adds max(n_tokens − (wn−1), 0) tagged grams,
      with n_tokens the same filtered-split token count the gram
      builder uses.

    NULL text: arithmetic over NULL lengths falls through
    ``greatest(…, 0)`` to 0, which downstream ``> 0`` filters treat
    exactly like the built array's empty/NULL size."""
    s = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "),
        F.lit(" "),
    )
    cnt = F.greatest(F.length(s) - F.lit(n - 1), F.lit(0))
    if word_ns:
        s2 = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
        toks_cnt = F.size(F.filter(F.split(s2, " "), lambda t: t != F.lit("")))
        for wn in word_ns:
            cnt = cnt + F.greatest(toks_cnt - F.lit(wn - 1), F.lit(0))
    return cnt


def langid_fit_stats(
    labeled: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    word_ns: tuple[int, ...] = (),
) -> DataFrame:
    """The model's SUFFICIENT STATISTICS: ``(lang, gram, c)`` raw gram
    counts — plain sums, so the table is CLOSED UNDER MERGE
    (``merge_langid_stats``): fit each training shard/epoch
    independently, merge the stats, derive weights once. The sixth
    member of the incremental family (exact fp, MinHash bands,
    semantic cells, substring shingles, line stats, langid stats)."""
    return (
        labeled.select(
            F.col(lang_col).alias("lang"),
            F.explode(
                langid_features(F.col(text_col), n, word_ns)
            ).alias("gram"),
        )
        .groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def merge_langid_stats(*stats: DataFrame) -> DataFrame:
    """Lossless, idempotent-under-reassociation stats compaction:
    cell-wise sum over (lang, gram) — merge(fit(A), fit(B)) ≡
    fit(A ∪ B) exactly (counts are linear). Weights derived from
    merged stats equal a whole-corpus refit by construction
    (asserted in tests)."""
    if not stats:
        raise ValueError("need at least one stats frame")
    u = stats[0]
    for s in stats[1:]:
        u = u.unionByName(s)
    return u.groupBy("lang", "gram").agg(F.sum("c").alias("c"))


def langid_weights_from_stats(stats: DataFrame) -> DataFrame:
    """(lang, gram, c) counts → the ``(lang, gram, w_milli)`` model
    table (Laplace weights + per-lang OOV row at ``gram = ''``).

    Derivation is ONE window chain over the (model-bounded) stats table
    instead of the former two aggregations + two joins + two broadcast
    crosses (r13, guide §1.2): per-lang totals and the global
    distinct-gram count are windows — ``sum(c) over (lang)`` and
    ``max(dense_rank over (order by gram)) over ()`` — and the per-lang
    OOV row rides out of the same pass via a 2-element explode on each
    lang's first row. The single-partition windows are safe BECAUSE the
    stats table is model-bounded (|langs| × |gram space|), never
    corpus-sized; values are bit-identical (same integer qlog2 inputs,
    pinned by the incremental-merge test). A 32-row fit dropped from
    ~1.7 s to ~1.0 s of pure stage overhead on local[32] (r13 probe)."""
    wl = Window.partitionBy("lang")
    wg_ord = Window.orderBy("gram")
    wg_all = wg_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    st = (
        stats.withColumn("tot", F.sum("c").over(wl))
        .withColumn("_dr", F.dense_rank().over(wg_ord))
        .withColumn("g_sz", F.max("_dr").over(wg_all))
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("lang").orderBy("gram")),
        )
    )
    denom = _qlog2_milli(F.col("tot") + F.col("g_sz"))
    pair = F.struct(
        F.col("gram").alias("gram"),
        (_qlog2_milli(F.col("c") + F.lit(1)) - denom).alias("w_milli"),
    )
    oov_pair = F.struct(
        F.lit("").alias("gram"), (-denom).alias("w_milli")
    )
    rows = F.when(
        F.col("_rn") == 1, F.array(pair, oov_pair)
    ).otherwise(F.array(pair))
    return st.select(
        "lang", F.explode(rows).alias("_e")
    ).select("lang", F.col("_e.gram").alias("gram"), F.col("_e.w_milli").alias("w_milli"))


def langid_fit(
    labeled: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    word_ns: tuple[int, ...] = (),
) -> DataFrame:
    """Fit the NB n-gram model from a labeled corpus. Returns the
    ``(lang, gram, w_milli)`` model table (OOV row per lang at
    ``gram = ''``). Closed-form: two aggregations, no iteration —
    ``langid_weights_from_stats(langid_fit_stats(...))``.
    ``word_ns=(1, 2)`` adds TextCat's word-boundary features into the
    same table (see ``word_ngrams``); the default is char-only."""
    return langid_weights_from_stats(
        langid_fit_stats(labeled, lang_col, text_col, n, word_ns)
    )


def _langid_doc_table(
    docs: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    materialize: bool,
    word_ns: tuple[int, ...],
    keep_empty: bool,
) -> DataFrame:
    """Shared score machinery (r13, guide §1.2/§2.4): ONE corpus pass,
    one linear plan chain — ``(doc_id, n_grams, _ml, _la)`` with
    ``_ml`` the doc's matched-language sums ``array<struct<lang, mw,
    mk>>`` and ``_la`` the (broadcast, 1-row cross) model language
    array ``array<struct<lang, oov>>``. Score and argmax then both
    derive as ARRAY expressions over this frame, so neither needs a
    second corpus scan, a per-(doc, lang) grid join, nor another
    shuffle — the former shape scanned the corpus twice, shuffled the
    gram explosion by gram through an un-hinted SortMergeJoin, and
    joined the corpus back once more for predict's default labels.

    Mechanics: posexplode the grams (``keep_empty=True`` uses the
    outer form so gram-less docs keep one null-gram row — the predict
    path's default-label anchor), LEFT-join the explicitly broadcast
    weight rows (the model is geometry-bounded by contract), aggregate
    (doc, lang), then fold the langs into one row per doc. The per-doc
    total rides as max(pos)+1 of the SAME posexplode (== the gram
    array's size by construction), NOT as a per-row expression next to
    the generator: Catalyst hoists scalar projections above Generate,
    so an expression column would re-run the normalization regex once
    per OCCURRENCE (measured 17 s vs 2 s at sf0.1 — the r10
    lambda-capture hazard in project-over-generate form)."""
    # the model is geometry-bounded and referenced twice below (weight
    # rows and the OOV/langs rows) — materialize once so an unpersisted
    # fit plan isn't re-run per reference (the histogram_quantiles
    # pattern). Skipped when the caller already persisted the model
    # (is_cached) or opted out (materialize=False) — composing a query
    # should not re-trigger a Spark job per score/predict call. Routed
    # through pin_bounded so an active materialize_scope can release the
    # blocks (r13).
    if materialize and not model.is_cached:
        from storage_spark.operators.dedup import pin_bounded

        model = pin_bounded(model)
    # the normalization+gram work below fuses into the doc scan stage;
    # a one-file input would serialize it on one core (r13, guide §2/§6)
    from storage_spark.functions.partitioning import spread_small_input

    docs = spread_small_input(docs)
    feats = langid_features(F.col(text_col), n, word_ns)
    exploder = F.posexplode_outer if keep_empty else F.posexplode
    # per-OCCURRENCE join, not a (doc, gram) pre-aggregation: summing
    # w over matched occurrences equals Σ k·w over distinct grams, and
    # skipping the pre-agg removes a corpus-sized (doc, gram) shuffle —
    # the only corpus shuffle is groupBy(doc, lang), which the map-side
    # combiner collapses to ≤ |langs|+1 rows per doc per task (measured
    # ~200 s → ~20 s at sf1, tools/probe_r10_sf1.py)
    ex = docs.select(
        F.col(id_col).alias("doc_id"),
        exploder(feats).alias("pos", "gram"),
    )
    weights = model.filter(F.col("gram") != "")
    occ = ex.join(F.broadcast(weights), "gram", "left")
    g1 = occ.groupBy("doc_id", "lang").agg(
        F.sum("w_milli").alias("mw"),
        # matched-occurrence count: w_milli is non-null exactly on the
        # rows the former inner join kept, so count(w) == count(*) of
        # that join per (doc, lang); the null-lang group counts 0
        F.count("w_milli").alias("mk"),
        F.max("pos").alias("_p"),
    )
    # one row per doc: total grams + the matched-language sums folded
    # into a bounded array (≤ |langs| entries — collect_list skips the
    # null-lang group's null entry); order-insensitive consumers only
    g2 = g1.groupBy("doc_id").agg(
        F.coalesce(F.max("_p") + 1, F.lit(0)).cast("bigint")
        .alias("n_grams"),
        F.collect_list(
            F.when(
                F.col("lang").isNotNull(),
                F.struct(
                    F.col("lang").alias("lang"),
                    F.col("mw").alias("mw"),
                    F.col("mk").alias("mk"),
                ),
            )
        ).alias("_ml"),
    )
    langs_arr = model.filter(F.col("gram") == "").agg(
        F.collect_list(
            F.struct(F.col("lang").alias("lang"), F.col("w_milli").alias("oov"))
        ).alias("_la")
    )
    return g2.join(F.broadcast(langs_arr), how="cross")


def _langid_scored_arr() -> Column:
    """``array<struct<lang, score_milli>>`` over a ``_langid_doc_table``
    row: per model language, Σ matched w + (N − matched k) · oov — the
    same long arithmetic as the former per-(doc, lang) grid, as one
    array transform (the lookup into ``_ml`` is ≤ |langs| entries).
    Long sums are order-independent, so the collect_list orders never
    reach the result."""
    z = F.lit(0).cast("long")

    def per_lang(entry: Column) -> Column:
        m = F.get(
            F.filter(
                F.col("_ml"), lambda ml: ml["lang"] == entry["lang"]
            ),
            0,
        )
        score = (
            F.coalesce(m["mw"], z)
            + (F.col("n_grams") - F.coalesce(m["mk"], z)) * entry["oov"]
        ).cast("long")
        return F.struct(
            entry["lang"].alias("lang"), score.alias("score_milli")
        )

    return F.transform(F.col("_la"), per_lang)


def langid_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    materialize: bool = True,
    word_ns: tuple[int, ...] = (),
) -> DataFrame:
    """Per-(doc, language) NB scores: ``(doc_id, lang, score_milli,
    n_grams)``. Docs whose normalized text yields no n-gram emit no
    rows (see ``langid_predict`` for the default label). ``word_ns``
    must match the fit's setting — the scored feature space has to be
    the trained one."""
    # keep_empty=False: a doc appears iff its gram array is non-empty,
    # i.e. exactly the former ``n_grams > 0`` filter
    t = _langid_doc_table(
        docs, model, id_col, text_col, n, materialize, word_ns,
        keep_empty=False,
    )
    return t.select(
        "doc_id", "n_grams", F.explode(_langid_scored_arr()).alias("_s")
    ).select(
        "doc_id",
        F.col("_s.lang").alias("lang"),
        F.col("_s.score_milli").alias("score_milli"),
        F.col("n_grams").cast("long").alias("n_grams"),
    )


def langid_predict(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    default: str = "und",
    materialize: bool = True,
    word_ns: tuple[int, ...] = (),
) -> DataFrame:
    """Argmax language per doc — ``(doc_id, lang)`` with the
    deterministic (score desc, lang asc) tie-break; docs with no
    n-grams get ``default`` (one row per distinct doc id). The drop-in
    producer for any per-language operator's lang/group column
    (line_dedup's ``group_col``, ``dsir_sample_per_group``, CCNet
    buckets): join this frame on the doc id."""
    t = _langid_doc_table(
        docs, model, id_col, text_col, n, materialize, word_ns,
        keep_empty=True,
    )
    # argmax as an ARRAY sort over the per-doc language scores — no
    # per-doc window, no grid explode + re-aggregation: the comparator
    # is exactly rank-1 of (score desc, lang asc), a total order, so
    # the result is deterministic whatever order collect_list produced.
    # Gram-less docs (n_grams = 0) and the empty-model edge (no langs →
    # empty array → F.get returns null) both fall through to the
    # default label, exactly as the former docs-join shape did.
    best = F.get(
        F.array_sort(
            _langid_scored_arr(),
            lambda l, r: F.when(
                l["score_milli"] > r["score_milli"], F.lit(-1)
            )
            .when(l["score_milli"] < r["score_milli"], F.lit(1))
            .when(l["lang"] < r["lang"], F.lit(-1))
            .when(l["lang"] > r["lang"], F.lit(1))
            .otherwise(F.lit(0)),
        ),
        F.lit(0),
    )
    return t.select(
        "doc_id",
        F.coalesce(
            F.when(F.col("n_grams") > 0, best["lang"]), F.lit(default)
        ).alias("lang"),
    )


def langid_prune(model: DataFrame, keep_top: int = 10000) -> DataFrame:
    """Quantized model pruning — the scale lever for corpus-sized
    predict (fastText's prune/quantize move, Joulin et al. 2016):
    keep, per language, the ``keep_top`` grams whose weights deviate
    MOST from that language's OOV floor (|w − oov|, the gram's
    discriminative mass — a gram scoring at the floor contributes
    nothing over falling through to OOV), ties broken by gram asc.

    The pruned table is ITSELF a valid model — dropped grams simply
    fall to the OOV term at score time — so ``langid_score`` /
    ``langid_predict`` need no changes and the SQL-oracle story is
    untouched. This is an APPROXIMATION of the full model's scores
    (a dropped gram's (w − oov) mass is forfeited); predictions agree
    wherever the forfeited mass doesn't flip an argmax — measure the
    agreement on your corpus before adopting (the r11 sf1 probe:
    see NOTES_r11).

    What it buys at 100 TB: the matched-occurrence join's row count is
    Σ over corpus occurrences of |langs carrying that gram| — pruning
    caps the model at |langs| × (keep_top + 1) rows, shrinking both
    the broadcast and the post-join amplification. One bounded window
    over the geometry-bounded model table; never touches the corpus."""
    if keep_top < 1:
        raise ValueError("keep_top must be >= 1")
    oov = model.filter(F.col("gram") == "").select(
        "lang", F.col("w_milli").alias("_oov")
    )
    w = Window.partitionBy("lang").orderBy(
        F.abs(F.col("w_milli") - F.col("_oov")).desc(), F.col("gram").asc()
    )
    kept = (
        model.filter(F.col("gram") != "")
        .join(F.broadcast(oov), "lang")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= keep_top)
        .select("lang", "gram", "w_milli")
    )
    return kept.unionByName(
        oov.select("lang", F.lit("").alias("gram"),
                   F.col("_oov").alias("w_milli"))
    )
