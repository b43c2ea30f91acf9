"""Within-document repetition signals (Gopher-style filters)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storage_spark.functions.text import (
    duplicate_line_fraction,
    duplicate_ngram_fraction,
)


def test_duplicate_ngram_fraction_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # heavy 2-gram repetition
            (2, "all words unique here now"),
            (3, "x"),                   # shorter than n -> NULL
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            duplicate_ngram_fraction(F.col("text"), 2).alias("d2"),
        ).collect()
    }
    # doc 1 2-grams: [a b, b a, a b, b a, a b] -> 5 total, 2 distinct
    assert abs(out[1].d2 - 3 / 5) < 1e-9
    assert out[2].d2 == 0.0
    assert out[3].d2 is None
    assert out[4].d2 is None


def test_duplicate_line_fraction_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "menu\ncontent one\nmenu\ncontent two\nmenu"),
            (2, "a\n\n  \nb"),   # blank lines ignored
            (3, "\n \n"),        # only blanks -> NULL
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            duplicate_line_fraction(F.col("text")).alias("dl"),
        ).collect()
    }
    # doc 1: 5 lines, 3 distinct -> 2/5 duplicated occurrences
    assert abs(out[1].dl - 2 / 5) < 1e-9
    assert out[2].dl == 0.0
    assert out[3].dl is None


def test_repetition_is_map_only(spark):
    """The scoring must not shuffle: a 100 TB repetition pass is scan +
    project only."""
    docs = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    plan = (
        docs.select(duplicate_ngram_fraction(F.col("text"), 2))
        ._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    )
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode either


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------


def test_redact_pii_kinds_and_order(spark):
    from storage_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "write to alice.smith+x@mail.example.org today"),
            (2, "server at 192.168.0.17 responded"),
            (3, "call +1 555-123-4567 now"),
            (4, "bob@ex.com via 10.0.0.1 or +15551234567"),
            (5, "no pii here at all"),
        ],
        "id bigint, text string",
    )
    out = df.select(
        "id",
        redact_pii(F.col("text")).alias("red"),
        pii_counts(F.col("text")).alias("c"),
    ).collect()
    got = {r["id"]: (r["red"], r["c"]["n_email"], r["c"]["n_ipv4"], r["c"]["n_phone"]) for r in out}
    assert got[1] == ("write to <EMAIL> today", 1, 0, 0)
    assert got[2] == ("server at <IP> responded", 0, 1, 0)
    assert got[3] == ("call <PHONE> now", 0, 0, 1)
    assert got[4] == ("<EMAIL> via <IP> or <PHONE>", 1, 1, 1)
    assert got[5] == ("no pii here at all", 0, 0, 0)


def test_redact_pii_email_digits_not_double_counted(spark):
    # digits inside an email must not also count as a phone
    from storage_spark.functions.text import pii_counts
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "reach 123456789user@example.com ok")], "id bigint, text string"
    )
    r = df.select(pii_counts(F.col("text")).alias("c")).collect()[0]["c"]
    assert r["n_email"] == 1 and r["n_phone"] == 0


# --------------------------------------------------------------------------
# quality_quantile_filter
# --------------------------------------------------------------------------


def test_quality_quantile_filter_per_group(spark):
    from storage_spark.operators.pipeline import quality_quantile_filter

    # 'the of and to a' gives stopword-rich english; vary length to spread scores
    docs = [(i, "the of and to a " * (i + 1)) for i in range(8)]
    # eight german docs, likewise spread
    docs += [(100 + i, "der die das und zu " * (i + 1)) for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    kept = quality_quantile_filter(df, quantile=0.25)
    rows = kept.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    # per language: 8 docs, quartile gate keeps >= 6 and < 8 unless ties
    for lang, ids in by_lang.items():
        assert 4 <= len(ids) <= 7, (lang, ids)
    # every kept score must be >= every dropped score within its language
    scored = {r["doc_id"]: (r["lang"], r["score_1e3"]) for r in kept.collect()}
    assert set(by_lang) == {"en", "de"}


def test_quality_quantile_filter_approx_mode_runs(spark):
    from storage_spark.operators.pipeline import quality_quantile_filter

    df = spark.createDataFrame(
        [(i, "the of and to a word " * (i % 5 + 1)) for i in range(20)],
        "doc_id bigint, text string",
    )
    exact = quality_quantile_filter(df, quantile=0.5)
    approx = quality_quantile_filter(df, quantile=0.5, approx=True)
    # sketch error can move the threshold; membership must still be a
    # score-downward-closed set (kept min >= dropped max fails only on ties)
    assert approx.count() > 0
    assert exact.count() > 0


def test_containment_pairs_catches_what_jaccard_dilutes(spark):
    """A short doc quoted whole inside a long one: containment ~1.0 while
    symmetric Jaccard is tiny — the asymmetric operator exists for
    exactly this pair."""
    from storage_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(1, short), (2, filler + " " + short + " " + filler[::-1].lower())],
        "doc_id long, text string",
    )
    cont = {
        (r["doc_in"], r["doc_out"]): r["containment"]
        for r in containment_pairs(docs, n=3, min_containment=0.5).collect()
    }
    assert cont.get((1, 2), 0) == 1.0  # every shingle of 1 appears in 2
    assert (2, 1) not in cont  # asymmetric: the long doc is NOT contained
    jac = ngram_jaccard_pairs(docs, n=3, min_jaccard=0.0).collect()
    assert all(r["jaccard"] < 0.05 for r in jac)  # Jaccard dilutes it away


def test_decontaminate_spans_reports_hit_shingles(spark):
    from storage_spark.operators.pipeline import decontaminate_spans

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),
            (2, "totally unrelated words only here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "quick brown fox story")], "doc_id long, text string"
    )
    out = decontaminate_spans(docs, bench, n=3, top_k=5).collect()
    assert [(r["doc_id"], r["hit_rank"], r["shingle"]) for r in out] == [
        (1, 1, "quick brown fox")
    ]


def test_unigram_logprob_exact_python_replication(spark):
    """avg_nll replays the ordered per-token fold exactly: same counts,
    same smoothing arithmetic, same left-fold summation order."""
    import math
    from collections import Counter

    from storage_spark.operators.pipeline import unigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the the the the"),
        (3, "zqx vbn plm qwe rty uio"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll"])
        for r in unigram_logprob(docs).collect()
    }
    toks = {i: t.lower().split() for i, t in rows}
    cnt = Counter(tok for ts in toks.values() for tok in ts)
    n_total, v = sum(cnt.values()), len(cnt)
    for i, ts in toks.items():
        acc = 0.0
        for t in ts:
            acc = acc + math.log((cnt[t] + 1.0) / (n_total + 1.0 * v))
        assert got[i] == (len(ts), -(acc / len(ts)))


def test_unigram_logprob_ranks_gibberish_highest(spark):
    from storage_spark.operators.pipeline import unigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog sat too"),
            (2, "the cat and the dog sat on the mat again"),
            (3, "zqx vbn plm qwe rty uio asd fgh jkl"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["avg_nll"] for r in unigram_logprob(docs).collect()}
    assert out[3] == max(out.values())  # all-hapax gibberish is least probable


def test_unigram_logprob_under_train_model(spark):
    """CCNet shape: fit on train, score eval; unseen tokens get the
    smoothed floor so all-unseen docs score the maximal (flat) nll."""
    import math

    from storage_spark.operators.pipeline import unigram_logprob, unigram_model

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat")], "doc_id long, text string"
    )
    m = unigram_model(train)
    eval_docs = spark.createDataFrame(
        [(9, "the cat"), (10, "zz yy xx")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["avg_nll"] for r in unigram_logprob(eval_docs, model=m).collect()}
    # train counts: the=2, cat=1, sat=2, dog=1 -> N=6, V=4
    lp_the = math.log((2 + 1.0) / (6 + 4.0))
    lp_cat = math.log((1 + 1.0) / (6 + 4.0))
    lp_unseen = math.log(1.0 / (6 + 4.0))
    assert out[9] == -((0.0 + lp_the + lp_cat) / 2)
    assert out[10] == -((0.0 + lp_unseen + lp_unseen + lp_unseen) / 3)
    assert out[10] > out[9]


def test_unigram_logprob_partition_invariant(spark):
    from storage_spark.operators.pipeline import unigram_logprob

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{i % 3} common word here") for i in range(60)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, unigram_logprob(docs.repartition(1)).collect()))
    b = sorted(map(tuple, unigram_logprob(docs.repartition(16)).collect()))
    assert a == b


def _gopher_docs(spark):
    good = (
        "The quick brown fox jumps over the lazy dog and runs to town "
        "with great joy. " * 5
    )
    bullets = "\n".join(f"- item {i} here" for i in range(20))
    symbols = "#tag " * 60
    short = "too short"
    ellipses = "\n".join(f"line {i} trails off..." for i in range(10))
    return spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols), (4, short), (5, ellipses)],
        "doc_id long, text string",
    )


def test_gopher_rules_planted_pathologies(spark):
    """Each planted pathology trips exactly its named rule; clean prose
    passes everything."""
    from storage_spark.operators.pipeline import gopher_rules

    out = {r["doc_id"]: r for r in gopher_rules(_gopher_docs(spark)).collect()}
    assert out[1]["passes"] and all(
        out[1][c] for c in out[1].asDict() if c.startswith("r_")
    )
    assert not out[2]["r_bullet_ratio"]          # bullet-led lines
    assert not out[3]["r_hash_ratio"]            # '#' soup
    assert not out[4]["r_word_count"]            # too short
    assert not out[5]["r_ellipsis_ratio"]        # trailing '...'
    assert all(not out[i]["passes"] for i in (2, 3, 4, 5))


def test_gopher_rules_integer_exact_metrics(spark):
    """Metrics replay from plain Python string math — every ratio is a
    single division of integer counts."""
    from storage_spark.operators.pipeline import GOPHER_STOPWORDS, gopher_rules

    text = "The cat... sat on the #mat\n- point one\nplain line here"
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    r = gopher_rules(docs).collect()[0]
    toks = text.split()
    assert r["n_words"] == len(toks)
    mean_wl = sum(len(t) for t in toks) / len(toks)
    assert r["mean_word_len_1e4"] == round(mean_wl * 10000)
    n_hash = text.count("#")
    n_ell = text.count("...")
    assert r["hash_ratio_1e4"] == round(n_hash / len(toks) * 10000)
    assert r["ellipsis_sym_ratio_1e4"] == round(n_ell / len(toks) * 10000)
    lines = text.split("\n")
    assert r["bullet_ratio_1e4"] == round(1 / len(lines) * 10000)
    assert r["ellipsis_ratio_1e4"] == 0  # '...' mid-line, no line ENDS with it
    hits = {t.lower() for t in toks} & set(GOPHER_STOPWORDS)
    assert r["stop_hits"] == len(hits)


def test_gopher_symbol_cap_applies_per_symbol(spark):
    """Rae et al. 2021 applies the 0.1 symbol-to-word cap to EACH
    symbol separately ('either the hash symbol or the ellipsis'): a
    doc at 0.08 hash + 0.08 ellipsis ratio passes both per-symbol
    rules even though the summed ratio (0.16) would fail a combined
    cap."""
    from storage_spark.operators.pipeline import gopher_rules

    # 100 words, 8 of them '#'-tagged, 8 lines ending '...' won't do —
    # build 100 plain words then append 8 hashes and 8 ellipses inline
    words = " ".join(f"word{i}" for i in range(84))
    text = words + " " + "# " * 8 + "... " * 8
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_rules(docs).collect()[0]
    assert r["hash_ratio_1e4"] == 800
    assert r["ellipsis_sym_ratio_1e4"] == 800
    assert r["r_hash_ratio"] and r["r_ellipsis_sym_ratio"]
    # and each symbol still trips its OWN rule when alone over-cap
    over = words + " " + "# " * 15
    r2 = gopher_rules(
        spark.createDataFrame([(2, over)], "doc_id long, text string")
    ).collect()[0]
    assert not r2["r_hash_ratio"] and r2["r_ellipsis_sym_ratio"]


def test_gopher_rules_thresholds_are_parameters(spark):
    from storage_spark.operators.pipeline import gopher_rules

    docs = spark.createDataFrame([(1, "five words right here now")], "doc_id long, text string")
    strict = gopher_rules(docs).collect()[0]
    lax = gopher_rules(docs, min_words=3, min_stop_hits=0).collect()[0]
    assert not strict["r_word_count"] and lax["r_word_count"]
    assert not strict["r_stopwords"] and lax["r_stopwords"]


def test_unigram_skew_split_join_identical_results(spark):
    """The 100 TB join strategy (head broadcast + skew-free tail
    shuffle) must change only the physical plan: scores identical to
    the broadcast path, including docs that mix head, tail, and unseen
    tokens; plan carries one SortMergeJoin (tail) while the broadcast
    path has none."""
    from storage_spark.operators.pipeline import unigram_logprob

    docs = spark.createDataFrame(
        [(i, f"the common tok{i % 17} rare{i} mix of words") for i in range(80)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, unigram_logprob(docs).collect()))
    b_df = unigram_logprob(docs, model_join="skew_split", head_size=3)
    b = sorted(map(tuple, b_df.collect()))
    assert a == b
    plan = b_df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_unigram_bad_model_join_raises(spark):
    from storage_spark.operators.pipeline import unigram_logprob

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="model_join"):
        unigram_logprob(docs, model_join="hash")


def test_bigram_logprob_exact_python_replication(spark):
    import math
    from collections import Counter

    from storage_spark.operators.pipeline import bigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "mat the on sat cat the"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll"])
        for r in bigram_logprob(docs).collect()
    }
    toks = {i: t.lower().split() for i, t in rows}
    uni = Counter(t for ts in toks.values() for t in ts)
    bi = Counter(
        (ts[j - 1], ts[j]) for ts in toks.values() for j in range(1, len(ts))
    )
    n_tot, v, a = sum(uni.values()), len(uni), 1.0
    for i, ts in toks.items():
        acc = 0.0
        for j, t in enumerate(ts):
            if j == 0:
                acc += math.log((uni[t] + a) / (n_tot + a * v))
            else:
                acc += math.log((bi[(ts[j - 1], t)] + a) / (uni[ts[j - 1]] + a * v))
        assert got[i] == (len(ts), -(acc / len(ts)))


def test_bigram_skew_split_join_identical_results(spark):
    """The 100 TB pair-vocabulary strategy (head broadcast + skew-free
    tail shuffle on (prev, tok)) must change only the physical plan:
    scores identical to the broadcast path across docs mixing head
    pairs, tail pairs, and unseen pairs; the executed plan carries a
    shuffle join keyed on the PAIR."""
    from storage_spark.operators.pipeline import bigram_logprob

    docs = spark.createDataFrame(
        [
            # repeated head pairs ('the cat'), per-doc tail pairs
            # (rare{i} mix{i}), and eval-only unseen pairs via the
            # held-out scoring below
            (i, f"the cat sat rare{i} mix{i % 7} of the cat here")
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, bigram_logprob(docs).collect()))
    b_df = bigram_logprob(docs, model_join="skew_split", head_size=3)
    b = sorted(map(tuple, b_df.collect()))
    assert a == b
    plan = b_df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the shuffle join must be on the pair key, not a single column
    import re

    joins = re.findall(r"(?:SortMergeJoin|ShuffledHashJoin)[^\n]*", plan)
    assert any("prev" in j and "tok" in j for j in joins), joins


def test_bigram_skew_split_held_out_model_unseen_pairs(spark):
    """Held-out scoring under skew_split: eval docs whose pairs are
    absent from BOTH head and tail still get the smoothed floor,
    identically to broadcast."""
    from storage_spark.operators.pipeline import (
        bigram_logprob,
        bigram_model,
        unigram_model,
    )

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat every day") for i in range(10)]
        + [(100 + i, f"rare{i} token pair here") for i in range(10)],
        "doc_id long, text string",
    )
    bm, um = bigram_model(train), unigram_model(train)
    eval_docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zz yy xx ww"),
         (3, "rare3 token the cat unseen combo")],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, bigram_logprob(
        eval_docs, bigrams=bm, unigrams=um).collect()))
    b = sorted(map(tuple, bigram_logprob(
        eval_docs, bigrams=bm, unigrams=um,
        model_join="skew_split", head_size=2).collect()))
    assert a == b


def test_bigram_bad_model_join_raises(spark):
    import pytest as _pytest

    from storage_spark.operators.pipeline import bigram_logprob

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="model_join"):
        bigram_logprob(docs, model_join="hash")


def test_bigram_catches_word_salad_unigram_cannot(spark):
    """The upgrade over unigram: a permutation of the SAME tokens has
    the IDENTICAL unigram score but a strictly worse bigram score."""
    from storage_spark.operators.pipeline import bigram_logprob, unigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (3, "mat the on sat cat the"),  # same multiset, shuffled
        ],
        "doc_id long, text string",
    )
    u = {r["doc_id"]: r["avg_nll"] for r in unigram_logprob(docs).collect()}
    b = {r["doc_id"]: r["avg_nll"] for r in bigram_logprob(docs).collect()}
    assert u[1] == u[3]          # unigram is blind to order
    assert b[3] > b[1]           # bigram is not


def test_bigram_under_train_model_unseen_context(spark):
    """Unseen (prev, tok) pairs and unseen contexts both hit the
    smoothed floors; scoring under a train model never errors."""
    from storage_spark.operators.pipeline import (
        bigram_logprob,
        bigram_model,
        unigram_model,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat")], "doc_id long, text string"
    )
    bm, um = bigram_model(train), unigram_model(train)
    out = bigram_logprob(
        spark.createDataFrame(
            [(9, "cat the zz"), (10, "the cat sat")], "doc_id long, text string"
        ),
        bigrams=bm, unigrams=um,
    ).collect()
    scores = {r["doc_id"]: r["avg_nll"] for r in out}
    assert scores[9] > scores[10]  # novel transitions score worse
    assert all(r["n_tokens"] == 3 for r in out)


# ---------------------------------------------------------------------------
# Prose-corpus behavior (VERDICT r7 #4): the published Gopher thresholds
# and LM separations are only meaningful on fluent text — the synthetic
# keyword-soup testdata scores 0% on the stopword rule (NOTES_r7 probe
# 10), so these fixtures supply original fluent paragraphs and planted
# pathologies to exercise the FILTER semantics, not just the metrics.

_PROSE_PARAGRAPHS = [
    "The river ran slowly through the valley and the town that had "
    "grown beside it for a hundred years. People would walk along the "
    "bank in the evening, watching the light change on the water, and "
    "the old bridge carried carts and travelers from one side to the "
    "other. It was said that the town owed everything it had to the "
    "patience of that river, which never hurried and never stopped.",
    "She opened the letter with steady hands, though her heart was "
    "beating quickly. The words inside were simple and kind, and they "
    "told her that the long winter of waiting was over. Outside the "
    "window the snow had begun to melt, and small green shoots were "
    "showing through the dark earth of the garden she had planted with "
    "her mother many years before the war came to the valley.",
    "A good tool should be quiet about its own cleverness. The best "
    "engines that we have built do their work without asking to be "
    "admired, and the people who rely on them think mostly about the "
    "task and rarely about the machine. That is the standard to hold a "
    "design to: it should disappear into the work it makes possible, "
    "and it should fail loudly on the rare day that it cannot serve.",
    "In the morning the fishermen would push their boats out past the "
    "breakwater and set their nets in the cold gray water. By noon the "
    "quay was loud with gulls and the shouting of buyers, and the "
    "smell of salt and tar hung over everything. The old men who no "
    "longer sailed would sit by the harbor wall and judge the catch, "
    "and they were seldom wrong about the weather or the fish.",
]


def _prose_docs(spark, n=20):
    rows = []
    for i in range(n):
        base = _PROSE_PARAGRAPHS[i % len(_PROSE_PARAGRAPHS)]
        # vary docs deterministically without breaking fluency
        rows.append((i, base if i < len(_PROSE_PARAGRAPHS) else base + " " + _PROSE_PARAGRAPHS[(i + 1) % len(_PROSE_PARAGRAPHS)]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_passes_fluent_prose_at_sane_rate(spark):
    """Fluent paragraphs must clear the published thresholds (>50% —
    here all of them), while planted pathologies in the SAME corpus
    still trip exactly their named rules."""
    from storage_spark.operators.pipeline import gopher_rules

    prose = _prose_docs(spark)
    out = gopher_rules(prose).collect()
    pass_rate = sum(1 for r in out if r["passes"]) / len(out)
    assert pass_rate > 0.5, f"prose pass rate {pass_rate}"
    assert pass_rate == 1.0  # these paragraphs are clean prose

    # planted pathologies alongside the prose
    bad = spark.createDataFrame(
        [
            (100, "link click here buy now " * 20),       # no stopword hits
            (101, "# " * 30 + "the be to of and that have with words here "
             + "more plain words " * 10),                  # hash soup
            (102, "\n".join("- the item here of note" for _ in range(20))),
        ],
        "doc_id long, text string",
    )
    b = {r["doc_id"]: r for r in gopher_rules(bad).collect()}
    assert not b[100]["r_stopwords"] and not b[100]["passes"]
    assert not b[101]["r_hash_ratio"] and not b[101]["passes"]
    assert not b[102]["r_bullet_ratio"] and not b[102]["passes"]


def test_lm_scores_separate_prose_from_shuffled_prose(spark):
    """Fit on fluent prose, score prose vs a deterministic token
    shuffle of the same text: the bigram gate separates them doc by
    doc (the unigram gate is blind by construction)."""
    from storage_spark.operators.pipeline import (
        bigram_logprob,
        bigram_model,
        unigram_logprob,
        unigram_model,
    )

    train = _prose_docs(spark)
    bm, um = bigram_model(train), unigram_model(train)

    def _shuffle(text, seed):
        toks = text.lower().split()
        # deterministic LCG permutation — no RNG state dependence
        order = sorted(range(len(toks)), key=lambda i: (i * 48271 + seed) % 65537)
        return " ".join(toks[i] for i in order)

    rows = []
    for i, para in enumerate(_PROSE_PARAGRAPHS):
        rows.append((i, para))                     # fluent
        rows.append((100 + i, _shuffle(para, i)))  # salad of SAME tokens
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    b = {r["doc_id"]: r["avg_nll"] for r in bigram_logprob(
        docs, bigrams=bm, unigrams=um).collect()}
    u = {r["doc_id"]: r["avg_nll"] for r in unigram_logprob(
        docs, model=um).collect()}
    for i in range(len(_PROSE_PARAGRAPHS)):
        assert b[100 + i] > b[i], f"bigram failed to separate doc {i}"
        # same token multiset -> identical unigram score
        assert abs(u[100 + i] - u[i]) < 1e-9


# ---------------------------------------------------------------------------
# NB log-odds quality classifier (fastText-style filter, r8)


def test_nb_quality_model_exact_python_replication(spark):
    """Every weight replays from plain Python count math: the NB
    log-count-ratio over the joint vocabulary with add-a smoothing."""
    import math
    from collections import Counter

    from storage_spark.operators.pipeline import nb_quality_model

    pos_rows = ["the clear well written text", "the fine prose here"]
    neg_rows = ["buy now click spam spam", "click the link now"]
    pos = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pos_rows)], "doc_id long, text string"
    )
    neg = spark.createDataFrame(
        [(i, t) for i, t in enumerate(neg_rows)], "doc_id long, text string"
    )
    got = {r["tok"]: r["w"] for r in nb_quality_model(pos, neg).collect()}
    cp = Counter(t for s in pos_rows for t in s.split())
    cn = Counter(t for s in neg_rows for t in s.split())
    vocab = set(cp) | set(cn)
    np_, nn, v, a = sum(cp.values()), sum(cn.values()), len(vocab), 1.0
    assert set(got) == vocab
    for tok in vocab:
        want = math.log((cp[tok] + a) / (np_ + a * v)) - math.log(
            (cn[tok] + a) / (nn + a * v)
        )
        # ln is the one cross-engine libm call (JVM Math.log vs CPython
        # libm can differ in the last ulp — the same caveat the LM
        # scorers document); everything else is exact
        assert abs(got[tok] - want) < 1e-12, tok
    # discriminative tokens point the right way; shared ones are small
    assert got["spam"] < 0 < got["prose"]
    assert abs(got["the"]) < abs(got["spam"])


def test_classifier_score_exact_and_separates(spark):
    """logit = bias + mean token weight (ordered fold); a model fit on
    prose-vs-spam separates held-out prose from held-out spam."""
    from storage_spark.operators.pipeline import (
        classifier_score,
        nb_quality_model,
    )

    pos = spark.createDataFrame(
        [(i, "the careful well written essay text here") for i in range(5)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(i, "click now buy spam link free offer") for i in range(5)],
        "doc_id long, text string",
    )
    model = nb_quality_model(pos, neg)
    w = {r["tok"]: r["w"] for r in model.collect()}
    eval_docs = spark.createDataFrame(
        [
            (1, "a careful essay text"),          # prose-ish + unseen 'a'
            (2, "click spam link unseen2"),       # spam-ish + unseen
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["logit"])
        for r in classifier_score(eval_docs, model, bias=0.25).collect()
    }
    s1 = 0.25 + (0.0 + w["careful"] + w["essay"] + w["text"]) / 4
    s2 = 0.25 + (w["click"] + w["spam"] + w["link"] + 0.0) / 4
    assert got[1] == (4, s1)
    assert got[2] == (4, s2)
    assert got[1][1] > got[2][1]


def test_classifier_score_skew_split_identical(spark):
    from storage_spark.operators.pipeline import (
        classifier_score,
        nb_quality_model,
    )

    pos = spark.createDataFrame(
        [(i, f"the common good{i % 7} fine text here") for i in range(40)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(i, f"the spam bad{i % 5} click now") for i in range(40)],
        "doc_id long, text string",
    )
    model = nb_quality_model(pos, neg)
    docs = pos.unionByName(neg.selectExpr("doc_id + 1000 AS doc_id", "text"))
    a = sorted(map(tuple, classifier_score(docs, model).collect()))
    b_df = classifier_score(docs, model, model_join="skew_split", head_size=3)
    b = sorted(map(tuple, b_df.collect()))
    assert a == b
    plan = b_df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_classifier_bad_model_join_raises(spark):
    from storage_spark.operators.pipeline import classifier_score

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    model = spark.createDataFrame([("a", 0.5)], "tok string, w double")
    with pytest.raises(ValueError, match="model_join"):
        classifier_score(docs, model, model_join="hash")


# ---------------------------------------------------------------------------
# DSIR importance resampling (hashed n-grams, r8)


def _py_bucket(term, num_buckets, seed="dsir"):
    import hashlib

    h = hashlib.md5(f"{seed}:{term}".encode()).hexdigest()
    return int(h[:6], 16) % num_buckets


def test_hashed_ngram_buckets_layout_and_values(spark):
    """Bucket array = unigram buckets in token order, then bigram
    buckets in pair order; every value replays from Python md5 math."""
    from storage_spark.operators.pipeline import hashed_ngram_buckets

    df = spark.createDataFrame([(1, "The cat sat")], "doc_id long, text string")
    got = df.select(
        hashed_ngram_buckets(F.col("text"), num_buckets=97).alias("b")
    ).collect()[0]["b"]
    toks = ["the", "cat", "sat"]
    want = [_py_bucket(t, 97) for t in toks] + [
        _py_bucket("the cat", 97),
        _py_bucket("cat sat", 97),
    ]
    assert got == want


def test_dsir_weights_exact_python_replication(spark):
    import math
    from collections import Counter

    from storage_spark.operators.pipeline import dsir_weights

    B, a = 53, 1.0
    raw_rows = [(1, "the cat sat"), (2, "spam click now"), (3, "the fine cat")]
    tgt_rows = [(10, "the cat purred"), (11, "a fine cat sat")]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_features"], r["log_w"])
        for r in dsir_weights(raw, tgt, num_buckets=B).collect()
    }

    def feats(text):
        t = text.lower().split()
        return [_py_bucket(x, B) for x in t] + [
            _py_bucket(f"{t[i - 1]} {t[i]}", B) for i in range(1, len(t))
        ]

    ct = Counter(b for _, s in tgt_rows for b in feats(s))
    cr = Counter(b for _, s in raw_rows for b in feats(s))
    nt, nr = sum(ct.values()), sum(cr.values())
    for i, s in raw_rows:
        fs = feats(s)
        acc = 0.0
        for b in fs:
            acc += math.log((ct[b] + a) / (nt + a * B)) - math.log(
                (cr[b] + a) / (nr + a * B)
            )
        n, lw = got[i]
        assert n == len(fs)
        assert abs(lw - acc) < 1e-10  # ln is the one libm call
    # target-like docs outweigh spam
    assert got[1][1] > got[2][1] and got[3][1] > got[2][1]


def test_dsir_sample_gumbel_topk_replays(spark):
    """Selection = top-k by log_w + Gumbel(md5-uniform), ties by id —
    the exact cut replays from Python."""
    import hashlib
    import math

    from storage_spark.operators.pipeline import dsir_sample, dsir_weights

    raw = spark.createDataFrame(
        [(i, f"the cat doc{i} sat here") for i in range(20)]
        + [(100 + i, "spam click now buy") for i in range(10)],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(0, "the cat sat on the mat here")], "doc_id long, text string"
    )
    B, seed, k = 101, 7, 6
    w = {
        r["doc_id"]: r["log_w"]
        for r in dsir_weights(raw, tgt, num_buckets=B).collect()
    }
    keys = {}
    for i, lw in w.items():
        h = hashlib.md5(f"dsir-gumbel:{seed}:{i}".encode()).hexdigest()
        u = (int(h[:12], 16) + 1.0) / (16**12 + 1)
        keys[i] = lw + (-math.log(-math.log(u)))
    want = sorted(keys, key=lambda i: (-keys[i], i))[:k]
    got = dsir_sample(raw, tgt, k=k, num_buckets=B, seed=seed).collect()
    assert [r["doc_id"] for r in got] == want
    for r in got:
        assert abs(r["gumbel_key"] - keys[r["doc_id"]]) < 1e-9


def test_perplexity_buckets_tertiles_and_exactness(spark):
    """head < middle < tail in score; tertile sizes balanced on a
    spread corpus; labels replay from the quantized scores."""
    from storage_spark.operators.pipeline import (
        perplexity_buckets,
        unigram_logprob,
    )

    # 9 docs with clearly spread self-perplexities: repeated common
    # tokens (fluent) through unique-token soup (improbable)
    rows = [(i, " ".join(["common"] * (9 - i) + [f"rare{i}x{j}" for j in range(i)])) for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in perplexity_buckets(docs).collect()}
    assert len(out) == 9
    scores = {r["doc_id"]: r["nll_1e4"] for r in out.values()}
    buckets = {r["doc_id"]: r["bucket"] for r in out.values()}
    for i in out:
        for j in out:
            if scores[i] < scores[j]:
                order = {"head": 0, "middle": 1, "tail": 2}
                assert order[buckets[i]] <= order[buckets[j]]
    assert set(buckets.values()) == {"head", "middle", "tail"}
    # quantized scores match unigram_logprob's rounding exactly
    u = {
        r["doc_id"]: round(r["avg_nll"] * 10000)
        for r in unigram_logprob(docs).collect()
    }
    assert {i: scores[i] for i in scores} == u


def test_perplexity_buckets_bad_bounds_raise(spark):
    import pytest as _pytest

    from storage_spark.operators.pipeline import perplexity_buckets

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="bounds"):
        perplexity_buckets(docs, bounds=(0.7, 0.3))


def test_perplexity_buckets_per_language_isolates_small_language(spark):
    """CCNet's per-language form: a minority language whose tokens are
    rare under the mixed corpus LM still gets its own head/middle/tail
    split instead of landing wholesale in the global tail."""
    from storage_spark.operators.pipeline import perplexity_buckets

    # 12 english docs with spread fluency + 6 german docs (rare tokens
    # under the mixed LM -> globally high NLL)
    rows = [(i, "the of and to a word " * (i % 4 + 1) + f"uniq{i}" * (i % 3))
            for i in range(12)]
    rows += [(100 + i, "der die das und zu " * (i % 3 + 1) + f"sel{i}" * (i % 2))
             for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(docs, per_language=True).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["bucket"])
    assert set(by_lang) == {"en", "de"}
    # each language gets its own head (the global split would push all
    # german rows toward the tail)
    assert "head" in by_lang["de"]
    assert "head" in by_lang["en"]
    # within each language, ordering still holds
    per = {}
    for r in out:
        per.setdefault(r["lang"], []).append((r["nll_1e4"], r["bucket"]))
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, pairs in per.items():
        for a, ab in pairs:
            for b, bb in pairs:
                if a < b:
                    assert order[ab] <= order[bb]


def test_nfc_text_composes_and_preserves(spark):
    from storage_spark.functions.text import nfc_text

    rows = [
        (1, "e\u0301 cafe\u0301"),  # combining acute x2 -> composes
        (2, "\u00e9 already"),        # precomposed -> unchanged
        (3, "\u2460 one"),            # circled-1: NFC keeps (NFKC folds)
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r.id: (r.n, r.l0, r.l1)
        for r in df.select(
            "id",
            nfc_text(F.col("t")).alias("n"),
            F.length("t").alias("l0"),
            F.length(nfc_text(F.col("t"))).alias("l1"),
        ).collect()
    }
    assert got[1] == ("\u00e9 caf\u00e9", 8, 6)
    assert got[2] == ("\u00e9 already", 9, 9)
    assert got[3] == ("\u2460 one", 5, 5)
    assert got[4] == (None, None, None)


def test_clean_whitespace_policy(spark):
    from storage_spark.functions.text import clean_whitespace

    rows = [
        (1, "a  b\t c"),                       # runs collapse
        (2, "x\r\ny\rz"),                      # CRLF / CR → LF
        (3, "e\x00f\x1bg"),                    # control chars stripped
        (4, "  lead\ntrail  \n\n\n\nnext  "),  # edges + blank-line cap
        (5, "keep\n\nme"),                     # one blank line survives
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r.id: r.c
        for r in df.select(
            "id", clean_whitespace(F.col("t")).alias("c")
        ).collect()
    }
    assert got[1] == "a b c"
    assert got[2] == "x\ny\nz"
    assert got[3] == "efg"
    assert got[4] == "lead\ntrail\n\nnext"
    assert got[5] == "keep\n\nme"


def test_kn_bigram_matches_hand_rational_math(spark):
    from fractions import Fraction
    import math

    from storage_spark.operators.pipeline import kn_bigram_score

    rows = [(1, "a b a b"), (2, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in kn_bigram_score(df).collect()}

    # hand fit: bigrams (a,b)x2, (b,a)x1, (a,c)x1 → T=3 types; V=3
    # ctx: a: cprev=3, n1=2; b: cprev=1, n1=1
    # cont: b: 1, a: 1, c: 1
    def qlog(c):
        bl = c.bit_length()
        return (bl - 1) * 1000 + math.floor((c / (1 << (bl - 1)) - 1) * 1000)

    def p(c, cprev, n1p, n1c, T=3, V=3):
        num = max(4 * c - 3, 0) * (T + V) + 3 * n1p * (n1c + 1)
        den = 4 * cprev * (T + V)
        return qlog(num) - qlog(den), Fraction(num, den)

    lp_ab, f_ab = p(2, 3, 2, 1)   # a→b
    lp_ba, f_ba = p(1, 1, 1, 1)   # b→a
    lp_ac, f_ac = p(1, 3, 2, 1)   # a→c
    assert got[1].n_bigrams == 3
    assert got[1].score_milli == 2 * lp_ab + lp_ba
    assert got[2].score_milli == lp_ac
    # probabilities are genuine (0,1] rationals and a→b (seen twice)
    # beats a→c (seen once) in the same context
    assert 0 < f_ac < f_ab <= 1 and 0 < f_ba <= 1


def test_kn_continuation_penalizes_single_context_tokens(spark):
    from storage_spark.operators.pipeline import kn_bigram_score

    # 'francisco' always follows 'san'; 'road' follows many contexts.
    base = [
        (i, "san francisco " + w + " road")
        for i, w in enumerate(["old", "new", "long", "main"])
    ]
    # two probe docs, both with ONE unseen-pair bigram whose tok differs:
    # c=0 → score is pure continuation: road (4 contexts) must beat
    # francisco (1 context)
    probe = [(100, "old francisco"), (101, "new road")]
    df = spark.createDataFrame(base + probe, "doc_id long, text string")
    got = {r.doc_id: r.score_milli for r in kn_bigram_score(df).collect()}
    assert got[101] > got[100]  # higher (less negative) = more fluent


def test_kn_trigram_matches_hand_rational_math(spark):
    from fractions import Fraction
    import math

    from storage_spark.operators.pipeline import kn_trigram_score

    rows = [(1, "a b c a b c"), (2, "a b d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in kn_trigram_score(df).collect()}

    # trigram types: (a,b,c)x2, (b,c,a), (c,a,b), (a,b,d) → 4 types
    # ctx3 (u,v): (a,b): c3ctx=3, n1a=2; (b,c): 1,1; (c,a): 1,1
    # cont2 (v,w): (b,c):1, (c,a):1, (a,b):1, (b,d):1
    # mid (v): b: 2 types, c: 1, a: 1
    # bigrams: (a,b)x3, (b,c)x2, (c,a)x2, (b,d)x1 → T=4; V=4
    # nfv: a:1, b:2, c:1; n1c: b:1, c:1, a:1, d:1
    def qlog(c):
        bl = c.bit_length()
        return (bl - 1) * 1000 + math.floor((c / (1 << (bl - 1)) - 1) * 1000)

    T, V = 4, 4

    def p(c3, c3ctx, n1a, n1pvw, n1pv, nfv, n1c):
        p2num = max(4 * n1pvw - 3, 0) * (T + V) + 3 * nfv * (n1c + 1)
        num = max(4 * c3 - 3, 0) * 4 * n1pv * (T + V) + 3 * n1a * p2num
        den = 16 * c3ctx * n1pv * (T + V)
        return qlog(num) - qlog(den), Fraction(num, den)

    lp_abc, f_abc = p(2, 3, 2, 1, 2, 2, 1)   # (a,b)→c
    lp_bca, f_bca = p(1, 1, 1, 1, 1, 1, 1)   # (b,c)→a
    lp_cab, f_cab = p(1, 1, 1, 1, 1, 1, 1)   # (c,a)→b
    lp_abd, f_abd = p(1, 3, 2, 1, 2, 2, 1)   # (a,b)→d
    assert got[1].n_trigrams == 4
    assert got[1].score_milli == 2 * lp_abc + lp_bca + lp_cab
    assert got[2].n_trigrams == 1
    assert got[2].score_milli == lp_abd
    # genuine (0,1] probabilities; the twice-seen trigram beats the
    # once-seen one in the same (a,b) context
    assert 0 < f_abd < f_abc <= 1 and 0 < f_bca <= 1


def test_kn_trigram_continuation_separates_held_out(spark):
    from storage_spark.operators.pipeline import kn_trigram_score

    # 'francisco' follows only 'in san'; 'road' follows many contexts —
    # the trigram analogue of the bigram Francisco property: unseen
    # triples score by continuation, so broad-context tokens win
    base = [
        (i, "in san francisco the " + w + " road runs")
        for i, w in enumerate(["old", "new", "long", "main"])
    ]
    probe = [(100, "the old francisco"), (101, "the new road")]
    df = spark.createDataFrame(base + probe, "doc_id long, text string")
    got = {r.doc_id: r.score_milli for r in kn_trigram_score(df).collect()}
    assert got[101] > got[100]


def test_kn_trigram_rejects_bad_discount_and_short_docs(spark):
    import pytest as _pytest

    from storage_spark.operators.pipeline import kn_trigram_score

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id for r in kn_trigram_score(df).collect()}
    assert out == {1}  # <3-token docs emit no row
    with _pytest.raises(ValueError):
        kn_trigram_score(df, discount_x4=0)


def test_kn_rejects_bad_discount_and_short_docs(spark):
    import pytest as _pytest

    from storage_spark.operators.pipeline import kn_bigram_score

    df = spark.createDataFrame(
        [(1, "a b"), (2, "solo"), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id for r in kn_bigram_score(df).collect()}
    assert out == {1}  # <2-token docs emit no row
    with _pytest.raises(ValueError):
        kn_bigram_score(df, discount_x4=4)


def _kn4_python_replay(corpus_texts, doc_text, d4=3):
    """Independent pure-python re-derivation of the documented 4-gram KN
    integer-ratio chain (counting dicts + Fractions) — the test-side
    twin the SQL oracle will replay for the staged r12 driver row."""
    import math
    from collections import Counter
    from fractions import Fraction

    def qlog(c):
        bl = c.bit_length()
        return (bl - 1) * 1000 + math.floor((c / (1 << (bl - 1)) - 1) * 1000)

    toks_all = [t.split(" ") for t in corpus_texts]
    q4 = Counter()
    tri3 = Counter()
    big = Counter()
    vocab = set()
    for tk in toks_all:
        vocab.update(tk)
        for i in range(len(tk) - 3):
            q4[tuple(tk[i:i + 4])] += 1
        for i in range(len(tk) - 2):
            tri3[tuple(tk[i:i + 3])] += 1
        for i in range(len(tk) - 1):
            big[tuple(tk[i:i + 2])] += 1
    c4ctx = Counter(); n4a = Counter()
    for (s, u, v, w), c in q4.items():
        c4ctx[(s, u, v)] += c
        n4a[(s, u, v)] += 1
    cont3 = Counter(); mid3set = {}
    for (s, u, v, w) in q4:
        cont3[(u, v, w)] += 1
        mid3set.setdefault((u, v), set()).add((s, w))
    n1buv = {k: len(v) for k, v in mid3set.items()}
    folw3 = Counter(); cont2 = Counter(); midset = {}
    for (u, v, w) in tri3:
        folw3[(u, v)] += 1
        cont2[(v, w)] += 1
        midset.setdefault(v, set()).add((u, w))
    n1pv = {k: len(v) for k, v in midset.items()}
    nfv = Counter(); cont1 = Counter()
    for (p, t) in big:
        nfv[p] += 1
        cont1[t] += 1
    T, V = len(big), len(vocab)
    tv = T + V

    tk = doc_text.split(" ")
    total, n, fracs = 0, 0, []
    for i in range(len(tk) - 3):
        s, u, v, w = tk[i:i + 4]
        p2num = (max(4 * cont2[(v, w)] - d4, 0) * tv
                 + d4 * nfv[v] * (cont1[w] + 1))
        p3num = (max(4 * cont3[(u, v, w)] - d4, 0) * 4 * n1pv[v] * tv
                 + d4 * folw3[(u, v)] * p2num)
        num = (max(4 * q4[(s, u, v, w)] - d4, 0)
               * 16 * n1buv[(u, v)] * n1pv[v] * tv
               + d4 * n4a[(s, u, v)] * p3num)
        den = 64 * c4ctx[(s, u, v)] * n1buv[(u, v)] * n1pv[v] * tv
        total += qlog(num) - qlog(den)
        fracs.append(Fraction(num, den))
        n += 1
    return n, total, fracs


def test_kn_quadgram_matches_python_rational_replay(spark):
    from storage_spark.operators.pipeline import kn_quadgram_score

    rows = [(1, "a b c a b c a"), (2, "a b c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in kn_quadgram_score(df).collect()}

    corpus = [t for _, t in rows]
    for doc_id, text in rows:
        n, total, fracs = _kn4_python_replay(corpus, text)
        assert got[doc_id].n_quadgrams == n
        assert got[doc_id].score_milli == total
        # genuine (0,1] probabilities at every scored position
        assert all(0 < f <= 1 for f in fracs), fracs
    # the twice-seen 4-gram (a,b,c)->a beats the once-seen (a,b,c)->d
    # in the same context
    _, _, f1 = _kn4_python_replay(corpus, "a b c a")
    _, _, f2 = _kn4_python_replay(corpus, "a b c d")
    assert f2[0] < f1[0]


def test_kn_quadgram_continuation_separates_held_out(spark):
    from storage_spark.operators.pipeline import kn_quadgram_score

    # the Francisco property one level up: unseen 4-grams score by the
    # continuation chain, so the broad-context token wins
    base = [
        (i, "down in san francisco the " + w + " road runs far")
        for i, w in enumerate(["old", "new", "long", "main"])
    ]
    probe = [(100, "the very old francisco"), (101, "the very new road")]
    df = spark.createDataFrame(base + probe, "doc_id long, text string")
    got = {r.doc_id: r.score_milli for r in kn_quadgram_score(df).collect()}
    assert got[101] > got[100]


def test_kn_quadgram_rejects_bad_discount_and_short_docs(spark):
    import pytest as _pytest

    from storage_spark.operators.pipeline import kn_quadgram_score

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c"), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id for r in kn_quadgram_score(df).collect()}
    assert out == {1}  # <4-token docs emit no row
    with _pytest.raises(ValueError):
        kn_quadgram_score(df, discount_x4=4)


def test_kn_quadgram_staged_driver_pair_hash_matches(spark, sf_dir):
    """The staged-for-r12 driver pair (q_kn_quadgram /
    _oracle_kn_quadgram) must pass the IDENTICAL gate the driver runs —
    assert_parity over the documents table — so registering it in the
    r12 window is a two-line diff, not new work."""
    import __spark_entry__ as entry_mod
    from tests.parity import assert_parity

    assert_parity(
        entry_mod.q_kn_quadgram(spark, sf_dir),
        entry_mod._oracle_kn_quadgram(),
        sf_dir,
        "kn_quadgram_staged",
    )
