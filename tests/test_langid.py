"""Trained language-ID (operators.langid): NB over char n-grams —
hand-checked integer math, deterministic prediction, and measured
accuracy against the stopword heuristic it upgrades."""

from __future__ import annotations

import pytest


def _qlog(c: int) -> int:
    import math

    bl = c.bit_length()
    return (bl - 1) * 1000 + math.floor((c / (1 << (bl - 1)) - 1) * 1000)


def test_char_ngrams_padding_and_short(spark):
    from pyspark.sql import functions as F

    from storage_spark.operators.langid import char_ngrams

    df = spark.createDataFrame(
        [(1, "Ab  c"), (2, ""), (3, "x")], "id long, text string"
    )
    got = {
        r.id: r.g
        for r in df.select("id", char_ngrams(F.col("text")).alias("g")).collect()
    }
    # normalized 'ab c' → padded ' ab c ' → 4 trigrams
    assert got[1] == [" ab", "ab ", "b c", " c "]
    assert got[2] == []          # padded '  ' has length 2 < 3
    assert got[3] == [" x "]


def test_langid_fit_and_score_hand_math(spark):
    from storage_spark.operators.langid import langid_fit, langid_score

    train = spark.createDataFrame(
        [("aa", "xy"), ("bb", "xz")], "lang string, text string"
    )
    # padded: ' xy ' / ' xz ' → grams per lang: aa: {' xy','xy '};
    # bb: {' xz','xz '}; tot(aa)=tot(bb)=2; G = 4 distinct grams
    m = langid_fit(train)
    rows = {(r.lang, r.gram): r.w_milli for r in m.collect()}
    d = _qlog(2 + 4)
    assert rows[("aa", " xy")] == _qlog(2) - d  # c=1 → qlog(2)
    assert rows[("aa", "")] == -d
    assert rows[("bb", "xz ")] == _qlog(2) - d

    probe = spark.createDataFrame([(1, "xy")], "doc_id long, text string")
    s = {
        (r.doc_id, r.lang): (r.score_milli, r.n_grams)
        for r in langid_score(probe, m).collect()
    }
    # doc grams ' xy','xy ' (N=2): aa matches both, bb none
    assert s[(1, "aa")] == (2 * (_qlog(2) - d), 2)
    assert s[(1, "bb")] == (2 * -d, 2)


def test_langid_score_materialize_opt_out_and_cached_skip(spark):
    """Regression (r11 ADVICE): composing a score/predict plan must not
    force a Spark job when the caller opts out (materialize=False) or
    already persisted the model (is_cached) — and the opt-out path must
    score identically to the default."""
    from storage_spark.operators.langid import langid_fit, langid_score

    train = spark.createDataFrame(
        [("aa", "xy"), ("bb", "xz")], "lang string, text string"
    )
    probe = spark.createDataFrame([(1, "xy")], "doc_id long, text string")
    m = langid_fit(train)

    want = sorted(map(tuple, langid_score(probe, m).collect()))
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    lazy = langid_score(probe, m, materialize=False)  # plan only
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "materialize=False still triggered a job"
    assert sorted(map(tuple, lazy.collect())) == want

    m_cached = m.cache()
    try:
        m_cached.count()
        got = sorted(map(tuple, langid_score(probe, m_cached).collect()))
        assert got == want
        # the model the caller persisted is untouched (not replaced by a
        # checkpoint frame): still reported cached
        assert m_cached.is_cached
    finally:
        m_cached.unpersist()


def test_langid_predict_tiebreak_and_default(spark):
    from storage_spark.operators.langid import langid_fit, langid_predict

    # identical training text for both langs → every score ties →
    # lang asc wins; empty doc → default
    train = spark.createDataFrame(
        [("aa", "same text"), ("bb", "same text")], "lang string, text string"
    )
    probe = spark.createDataFrame(
        [(1, "same"), (2, "")], "doc_id long, text string"
    )
    m = langid_fit(train)
    got = {r.doc_id: r.lang for r in langid_predict(probe, m).collect()}
    assert got[1] == "aa"
    assert got[2] == "und"


_LEX = {
    "en": ["the", "and", "house", "water", "light", "with", "from", "night"],
    "de": ["der", "und", "haus", "wasser", "licht", "mit", "von", "nacht"],
    "fr": ["le", "et", "maison", "eau", "lumiere", "avec", "de", "nuit"],
    "es": ["el", "y", "casa", "agua", "luz", "con", "de", "noche"],
}


def _doc(lang: str, seed: int, k: int = 6) -> str:
    words = _LEX[lang]
    return " ".join(words[(seed * 3 + j) % len(words)] for j in range(k))


def test_langid_accuracy_beats_stopword_heuristic(spark):
    """The measured upgrade (VERDICT r9 #5): on a held-out multilingual
    fixture the trained model must strictly beat the stopword-argmax
    heuristic (whose lists cover only 5 function words per language —
    content-word docs fall through to 'und' or collide on shared
    stopwords like de/es 'de')."""
    from pyspark.sql import functions as F

    from storage_spark.functions.text import lang_id
    from storage_spark.operators.langid import langid_fit, langid_predict

    train = spark.createDataFrame(
        [(lang, _doc(lang, s)) for lang in _LEX for s in range(8)],
        "lang string, text string",
    )
    # held-out: different composition stride than training
    probe = spark.createDataFrame(
        [
            (i * 10 + j, lang, " ".join(
                _LEX[lang][(i * 5 + j * 2 + p) % len(_LEX[lang])]
                for p in range(5)
            ))
            for i, lang in enumerate(_LEX)
            for j in range(5)
        ],
        "doc_id long, truth string, text string",
    )
    m = langid_fit(train)
    trained = langid_predict(probe, m)
    merged = probe.join(trained, "doc_id").withColumn(
        "heur", lang_id(F.col("text"))
    )
    rows = merged.collect()
    n = len(rows)
    acc_trained = sum(r.lang == r.truth for r in rows) / n
    acc_heur = sum(r.heur == r.truth for r in rows) / n
    assert acc_trained == 1.0
    assert acc_trained > acc_heur


def test_langid_incremental_stats_merge_equals_full_fit(spark):
    """merge(fit_stats(A), fit_stats(B)) ≡ fit_stats(A ∪ B), so
    weights from merged stats equal a whole-corpus refit — the
    incremental-family contract, proven row-for-row."""
    from storage_spark.operators.langid import (
        langid_fit,
        langid_fit_stats,
        langid_weights_from_stats,
        merge_langid_stats,
    )

    rows = [(lang, _doc(lang, s)) for lang in _LEX for s in range(6)]
    a = spark.createDataFrame(rows[:10], "lang string, text string")
    b = spark.createDataFrame(rows[10:], "lang string, text string")
    full = spark.createDataFrame(rows, "lang string, text string")

    merged = merge_langid_stats(langid_fit_stats(a), langid_fit_stats(b))
    got = {(r.lang, r.gram): r.c for r in merged.collect()}
    want = {(r.lang, r.gram): r.c for r in langid_fit_stats(full).collect()}
    assert got == want

    w_inc = {(r.lang, r.gram): r.w_milli
             for r in langid_weights_from_stats(merged).collect()}
    w_full = {(r.lang, r.gram): r.w_milli
              for r in langid_fit(full).collect()}
    assert w_inc == w_full


def test_langid_model_is_bounded_not_corpus_sized(spark):
    """The 100 TB property: model rows ≤ |langs| × |distinct grams| + L,
    independent of how many training DOCS repeat the same text."""
    from storage_spark.operators.langid import langid_fit

    one = spark.createDataFrame(
        [("en", "the water")], "lang string, text string"
    )
    many = spark.createDataFrame(
        [("en", "the water")] * 50, "lang string, text string"
    )
    assert langid_fit(one).count() == langid_fit(many).count()


#: Compound-morphology confusable fixture (the da/no class): both
#: languages share script, function words, AND morphemes — "no" only
#: ever uses the morphemes fused into compounds, "da" standalone. Char
#: trigrams MISLEAD on such probes (a standalone morpheme's trigrams
#: are frequent inside the other language's compounds); whole-word
#: features decide. Shared with the langid_word_confusables driver row.
CONFUSABLE_TRAIN = [
    ("da", "lys og hav"), ("da", "hus ved hav"), ("da", "vand og lys"),
    ("da", "hav og hus"), ("da", "bord ved vand"), ("da", "lys ved hus"),
    ("da", "vand ved bord"), ("da", "og hav og lys"),
    ("no", "lyshav og havlys"), ("no", "havhus ved bordlys"),
    ("no", "vandlys og lysbord"), ("no", "husbord ved havvand"),
    ("no", "bordhus og lyshus"), ("no", "husvand ved vandbord"),
    ("no", "havbord og bordvand"), ("no", "lysvand ved huslys"),
]
CONFUSABLE_PROBES = [
    ("da", "lys ved hav"), ("da", "hus og vand"), ("da", "bord og lys"),
    ("da", "hav ved bord"), ("da", "vand og hus"), ("da", "lys og bord"),
    ("no", "havlys ved lysbord"), ("no", "husbord og vandlys"),
    ("no", "lyshus ved bordvand"), ("no", "havvand og huslys"),
    ("no", "bordlys ved husvand"), ("no", "lysvand og havbord"),
]


def test_word_ngrams_tagging_and_shapes(spark):
    from pyspark.sql import functions as F

    from storage_spark.operators.langid import word_ngrams

    df = spark.createDataFrame(
        [(1, "  The   quick fox "), (2, "solo"), (3, "")],
        "id long, text string",
    )
    w1 = {r.id: r.g for r in df.select(
        "id", word_ngrams(F.col("text"), 1).alias("g")).collect()}
    assert w1[1] == ["w1:the", "w1:quick", "w1:fox"]
    assert w1[2] == ["w1:solo"] and w1[3] == []
    w2 = {r.id: r.g for r in df.select(
        "id", word_ngrams(F.col("text"), 2).alias("g")).collect()}
    assert w2[1] == ["w2:the quick", "w2:quick fox"]
    assert w2[2] == [] and w2[3] == []


def test_langid_word_ns_default_is_char_only_model(spark):
    """word_ns=() must fit a model byte-identical to the pre-r11 char
    fit (the langid_trained oracle depends on it)."""
    from storage_spark.operators.langid import langid_fit

    train = spark.createDataFrame(CONFUSABLE_TRAIN, "lang string, text string")
    a = sorted(map(tuple, langid_fit(train).collect()))
    b = sorted(map(tuple, langid_fit(train, word_ns=()).collect()))
    assert a == b


def test_langid_word_features_beat_char_only_on_confusables(spark):
    """The measured accuracy ladder on the shared-script compound-
    morphology fixture (VERDICT r10 #4): char trigrams alone MISLEAD
    when a standalone morpheme's trigrams are frequent inside the other
    language's compounds; word unigrams recover most of it and word
    bigrams the rest. Expected (hand-verified against the pure-python
    NB replay): char-only 9/12, +w1 11/12, +w1+w2 12/12."""
    from pyspark.sql import functions as F

    from storage_spark.operators.langid import langid_fit, langid_predict

    train = spark.createDataFrame(CONFUSABLE_TRAIN, "lang string, text string")
    probes = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(CONFUSABLE_PROBES)],
        "doc_id long, text string",
    )
    truth = {i: l for i, (l, _) in enumerate(CONFUSABLE_PROBES)}

    def acc(word_ns):
        m = langid_fit(train, word_ns=word_ns)
        got = {
            r.doc_id: r.lang
            for r in langid_predict(probes, m, word_ns=word_ns).collect()
        }
        return sum(got[i] == truth[i] for i in truth)

    a_char, a_w1, a_w12 = acc(()), acc((1,)), acc((1, 2))
    assert (a_char, a_w1, a_w12) == (9, 11, 12), (a_char, a_w1, a_w12)


def test_langid_prune_validity_and_exactness_bounds(spark):
    """langid_prune: (a) keep_top >= gram count is the IDENTITY (same
    rows); (b) the pruned table is a valid model — per-lang row count
    <= keep_top + 1 (the OOV row), OOV rows always survive; (c) on the
    confusables fixture a moderately pruned word-profile model predicts
    IDENTICALLY to the full one (the discriminative grams survive by
    construction)."""
    import pytest as _pytest

    from storage_spark.operators.langid import (
        langid_fit,
        langid_predict,
        langid_prune,
    )

    train = spark.createDataFrame(CONFUSABLE_TRAIN, "lang string, text string")
    m = langid_fit(train, word_ns=(1, 2))

    full = sorted(map(tuple, m.collect()))
    assert sorted(map(tuple, langid_prune(m, keep_top=10**6).collect())) == full

    pruned = langid_prune(m, keep_top=24)
    rows = pruned.collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.gram)
    for lang, grams in per_lang.items():
        assert "" in grams                      # OOV row survives
        assert len(grams) <= 25                 # keep_top + OOV

    probes = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(CONFUSABLE_PROBES)],
        "doc_id long, text string",
    )
    want = sorted(map(tuple, langid_predict(probes, m, word_ns=(1, 2)).collect()))
    # measured agreement curve on this fixture (model = 53 'da' / 95
    # 'no' rows): keep_top 24 -> 8/12, 32 -> 10/12, 64 -> 12/12 — a
    # 33% cut of the bigger profile predicts identically; over-pruning
    # degrades GRACEFULLY toward the char-only floor, never below und
    at64 = sorted(map(tuple, langid_predict(
        probes, langid_prune(m, keep_top=64), word_ns=(1, 2)).collect()))
    assert at64 == want
    at32 = {r[0]: r[1] for r in langid_predict(
        probes, langid_prune(m, keep_top=32), word_ns=(1, 2)).collect()}
    truth = {i: l for i, (l, _) in enumerate(CONFUSABLE_PROBES)}
    assert sum(at32[i] == truth[i] for i in truth) >= 10

    with _pytest.raises(ValueError):
        langid_prune(m, keep_top=0)


def test_feature_count_matches_built_array_size(spark):
    """langid_feature_count must equal F.size(langid_features(...)) for
    every (n, word_ns) config on unicode + edge fixtures — the r12
    scoring pass relies on the analytic count being exact."""
    from pyspark.sql import functions as F

    from storage_spark.operators.langid import (
        langid_feature_count,
        langid_features,
    )

    rows = [
        ("plain ascii text here",),
        ("  Weird   WHITESPACE\tand\ncase  ",),
        ("héllo wörld çedilla",),
        ("日本語のテキストです",),
        ("emoji 😀😀 pair and astral 𐍈 char",),
        ("combining é = é mark",),
        ("one",),
        ("ab",),
        ("a",),
        ("",),
        ("   ",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "text string")
    for n in (2, 3, 4):
        for word_ns in ((), (1,), (1, 2)):
            got = df.select(
                F.coalesce(
                    F.size(langid_features(F.col("text"), n, word_ns)),
                    F.lit(0),
                ).alias("built"),
                langid_feature_count(F.col("text"), n, word_ns).alias("calc"),
            ).collect()
            for r in got:
                assert max(r.built, 0) == r.calc, (n, word_ns, r)
