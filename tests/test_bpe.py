"""Greedy subword tokenization: vocabulary determinism, exact greedy
counts against a hand-computed Python replica, and the budget hook."""

from __future__ import annotations

import pytest

from storage_spark.functions.bpe import (
    bpe_token_counter,
    bpe_tokenize,
    build_subword_vocab,
)

DOCS = [
    (1, "banana band bandana"),
    (2, "ana ban banana"),
    (3, "can cane candle"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def py_greedy(word, vocab, max_len):
    pos, n = 0, 0
    while pos < len(word):
        step = 1
        for width in range(min(max_len, len(word) - pos), 1, -1):
            if word[pos : pos + width] in vocab:
                step = width
                break
        pos += step
        n += 1
    return n


def test_vocab_contains_all_chars_and_respects_budget(spark, docs):
    v = build_subword_vocab(docs, max_size=5, max_len=4)
    toks = {r.tok for r in v.collect()}
    chars = {c for _, t in DOCS for c in t if c != " "}
    assert chars <= toks
    assert len([t for t in toks if len(t) >= 2]) == 5  # budget binds


def test_vocab_deterministic_tie_break(spark, docs):
    a = sorted(r.tok for r in build_subword_vocab(docs, max_size=7).collect())
    b = sorted(r.tok for r in build_subword_vocab(docs, max_size=7).collect())
    assert a == b


def test_counts_match_python_replica(spark, docs):
    v = build_subword_vocab(docs, max_size=10, max_len=4)
    vocab = {r.tok for r in v.collect()}
    out = {r.doc_id: r for r in bpe_tokenize(docs, v).collect()}
    for doc_id, text in DOCS:
        want = sum(py_greedy(w, vocab, 4) for w in text.split(" "))
        assert out[doc_id].n_bpe_tokens == want, (doc_id, text)
        assert out[doc_id].n_words == len(text.split(" "))


def test_unknown_chars_consume_one_each(spark, docs):
    v = build_subword_vocab(docs, max_size=10)
    extra = spark.createDataFrame([(9, "xyz banana")], "doc_id long, text string")
    out = bpe_tokenize(extra, v).first()
    vocab = {r.tok for r in v.collect()}
    assert out.n_bpe_tokens == 3 + py_greedy("banana", vocab, 4)


def test_longest_match_wins(spark):
    docs = spark.createDataFrame([(1, "abcd")], "doc_id long, text string")
    vocab = spark.createDataFrame(
        [("abcd",), ("ab",), ("a",), ("b",), ("c",), ("d",)], "tok string"
    )
    assert bpe_tokenize(docs, vocab).first().n_bpe_tokens == 1


def test_null_text_scores_null(spark):
    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    vocab = spark.createDataFrame([("a",)], "tok string")
    row = bpe_tokenize(docs, vocab).first()
    assert row.n_bpe_tokens is None


# ---------------------------------------------------------------------------
# True merge-frequency BPE (bpe_learn_merges / bpe_merge_tokenize)
# ---------------------------------------------------------------------------

MERGE_DOCS = [
    (0, "low lower lowest low low"),
    (1, "new newer newest new"),
    (2, "low new low"),
]


def sennrich_merges(texts, num_merges):
    """Reference BPE trainer: Sennrich et al. 2016's get_stats/merge loop
    (list-based, merges ALL occurrences of the argmax pair left-to-right,
    ties by pair text ascending)."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.split(" ") if w)
    state = {w: list(w) for w in words}
    out = []
    for rank in range(num_merges):
        c = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += words[w]
        if not c:
            break
        (a, b), cnt = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out.append((rank, a, b, a + b, cnt))
        for w, syms in state.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            state[w] = merged
    return out, state


@pytest.fixture(scope="module")
def merge_docs(spark):
    return spark.createDataFrame(MERGE_DOCS, "doc_id long, text string").cache()


def test_learn_merges_matches_sennrich_reference(spark, merge_docs):
    from storage_spark.functions.bpe import bpe_learn_merges

    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_learn_merges(merge_docs, num_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    want, _ = sennrich_merges([t for _, t in MERGE_DOCS], 6)
    assert got == want


def test_learn_merges_overlapping_run_is_left_to_right(spark):
    from storage_spark.functions.bpe import bpe_learn_merges

    # 'b b b' must merge to ('bb', 'b') — the non-overlapping left-to-right
    # scan of the reference implementation, not ('b', 'bb').
    docs = spark.createDataFrame([(0, "bbb bbb")], "doc_id long, text string")
    rows = bpe_learn_merges(docs, num_merges=2).orderBy("merge_rank").collect()
    assert (rows[0].lhs, rows[0].rhs) == ("b", "b")
    # round 2 state per word is [bb, b]: the only remaining pair
    assert (rows[1].lhs, rows[1].rhs) == ("bb", "b")


def test_learn_merges_stops_when_no_pairs_remain(spark):
    from storage_spark.functions.bpe import bpe_learn_merges

    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    rows = bpe_learn_merges(docs, num_merges=10).collect()
    assert len(rows) == 1  # after merging (a,b) every word is one symbol


def test_merge_tokenize_matches_reference_segmentation(spark, merge_docs):
    from storage_spark.functions.bpe import bpe_learn_merges, bpe_merge_tokenize

    merges = bpe_learn_merges(merge_docs, num_merges=6)
    got = {r.doc_id: r for r in bpe_merge_tokenize(merge_docs, merges).collect()}
    _, state = sennrich_merges([t for _, t in MERGE_DOCS], 6)
    for doc_id, text in MERGE_DOCS:
        want = sum(len(state[w]) for w in text.split(" ") if w)
        assert got[doc_id].n_subwords == want, (doc_id, text)
        assert got[doc_id].n_words == len([w for w in text.split(" ") if w])


def test_merge_tokenize_empty_and_null_text(spark, merge_docs):
    from storage_spark.functions.bpe import bpe_learn_merges, bpe_merge_tokenize

    merges = bpe_learn_merges(merge_docs, num_merges=2)
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "low")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bpe_merge_tokenize(docs, merges).collect()}
    assert 2 not in rows  # NULL text dropped
    assert rows[1].n_words == 0 and rows[1].n_subwords == 0
    assert rows[3].n_subwords >= 1


def byte_sennrich(texts, num_merges):
    """The reference loop over UTF-8 bytes (uppercase hex pairs)."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.split(" ") if w)

    def hexpairs(w):
        h = w.encode("utf-8").hex().upper()
        return [h[i : i + 2] for i in range(0, len(h), 2)]

    state = {w: hexpairs(w) for w in words}
    out = []
    for rank in range(num_merges):
        c = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += words[w]
        if not c:
            break
        (a, b), cnt = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out.append((rank, a, b, a + b, cnt))
        for w, syms in state.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            state[w] = merged
    return out, state


def test_byte_level_merges_match_reference_on_multibyte_text(spark):
    from storage_spark.functions.bpe import bpe_learn_merges, bpe_merge_tokenize

    texts = ["héllo héllo héllo wörld", "héllo wörld wörld"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    m = bpe_learn_merges(docs, num_merges=5, byte_level=True)
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in m.orderBy("merge_rank").collect()
    ]
    want, state = byte_sennrich(texts, 5)
    assert got == want
    # a 2-byte char starts as TWO symbols: the first merge glues bytes
    assert all(len(r[1]) % 2 == 0 and len(r[2]) % 2 == 0 for r in got)
    tk = {r.doc_id: r.n_subwords
          for r in bpe_merge_tokenize(docs, m, byte_level=True).collect()}
    for i, t in enumerate(texts):
        assert tk[i] == sum(len(state[w]) for w in t.split(" ") if w)


def test_byte_and_char_level_models_are_not_interchangeable(spark, merge_docs):
    from storage_spark.functions.bpe import (
        bpe_learn_merges,
        bpe_merge_token_counter,
    )
    from storage_spark.operators.pipeline import token_budget_filter

    mb = bpe_learn_merges(merge_docs, num_merges=4, byte_level=True)
    # a byte-level model applied at char level never fires a merge —
    # counts collapse to the raw char totals
    out_wrong = token_budget_filter(
        merge_docs, 10**6, per_lang=False, tokenizer=mb
    )
    out_right = token_budget_filter(
        merge_docs, 10**6, per_lang=False,
        tokenizer=bpe_merge_token_counter(mb, byte_level=True),
    )
    wrong = {r.doc_id: r.n_tokens for r in out_wrong.collect()}
    right = {r.doc_id: r.n_tokens for r in out_right.collect()}
    assert all(right[k] < wrong[k] for k in right)  # merges actually fired


def test_merges_persist_roundtrip(spark, merge_docs, tmp_path):
    from storage_spark.functions.bpe import bpe_learn_merges
    from storage_spark.sources.textmodels import load_text_model, save_text_model

    merges = bpe_learn_merges(merge_docs, num_merges=4)
    path = str(tmp_path / "merges_model")
    cfg = save_text_model(merges, path, "merges", params={"num_merges": 4})
    assert cfg["n_rows"] == 4
    back, cfg2 = load_text_model(spark, path)
    assert cfg2["params"]["num_merges"] == 4
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, merges.collect())
    )


def test_budget_filter_accepts_merge_tokenizer(spark, merge_docs):
    from storage_spark.functions.bpe import bpe_learn_merges, bpe_merge_tokenize
    from storage_spark.operators.pipeline import token_budget_filter

    merges = bpe_learn_merges(merge_docs, num_merges=6)
    out = token_budget_filter(
        merge_docs, 10**6, per_lang=False, tokenizer=merges
    )
    want = {
        r.doc_id: r.n_subwords
        for r in bpe_merge_tokenize(merge_docs, merges).collect()
    }
    got = {r.doc_id: r.n_tokens for r in out.collect()}
    assert got == want


def test_budget_filter_accepts_tokenizer(spark, docs):
    from storage_spark.operators.pipeline import token_budget_filter

    v = build_subword_vocab(docs, max_size=10)
    regex_side = token_budget_filter(docs, 10**6, per_lang=False)
    bpe_side = token_budget_filter(docs, 10**6, per_lang=False, tokenizer=v)
    # same docs selected under a huge budget, but the counted unit differs
    assert {r.doc_id for r in bpe_side.collect()} == {
        r.doc_id for r in regex_side.collect()
    }
    vocab = {r.tok for r in v.collect()}
    got = {r.doc_id: r.n_tokens for r in bpe_side.collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == sum(py_greedy(w, vocab, 4) for w in text.split(" "))
    # a budget that binds cuts the running total at the subword unit
    one = token_budget_filter(
        docs, bpe_side.agg({"n_tokens": "min"}).collect()[0][0],
        per_lang=False, tokenizer=v,
    )
    assert one.count() <= 1


# ---------------------------------------------------------------------------
# Unigram-LM Viterbi tokenizer (the SentencePiece family's other half)
# ---------------------------------------------------------------------------


def _py_qlog2_milli(c: int) -> int:
    bl = c.bit_length()
    import math

    return (bl - 1) * 1000 + math.floor((c / (1 << (bl - 1)) - 1.0) * 1000)


def test_unigram_vocab_scores_match_python_replay(spark):
    from pyspark.sql import functions as F

    from storage_spark.functions.bpe import unigram_vocab

    docs = spark.createDataFrame(
        [(1, "abab abc"), (2, "abab ab")], "doc_id long, text string"
    )
    got = {r.tok: r.lp_milli for r in unigram_vocab(docs, max_size=50).collect()}
    # python replay of counts
    words = ["abab", "abc", "abab", "ab"]
    from collections import Counter

    cnt = Counter()
    for w in words:
        for l in (2, 3, 4):
            for p in range(len(w) - l + 1):
                cnt[w[p : p + l]] += 1
        for ch in w:
            cnt[ch] += 1
    # top grams (len>=2) all fit in 50; chars merged by max (same counter)
    total = sum(cnt.values())
    exp = {
        t: _py_qlog2_milli(c) - _py_qlog2_milli(total) for t, c in cnt.items()
    }
    assert got == exp


def test_unigram_viterbi_prefers_high_frequency_pieces(spark):
    from pyspark.sql import functions as F

    from storage_spark.functions.bpe import unigram_tokenize, unigram_vocab

    # 'the' dominates → the word 'the' should segment as ONE piece
    docs = spark.createDataFrame(
        [(i, "the the the the xyz") for i in range(5)],
        "doc_id long, text string",
    )
    v = unigram_vocab(docs, max_size=50)
    out = {r.doc_id: r for r in unigram_tokenize(docs, v).collect()}
    r = out[0]
    assert r.n_words == 5
    # 4x 'the' as single pieces + 'xyz' (whatever it costs) ≤ 4 + 3
    assert r.n_pieces <= 4 + 3
    # deterministic across docs
    assert all(
        (out[i].n_pieces, out[i].score_milli)
        == (r.n_pieces, r.score_milli)
        for i in range(5)
    )


def test_unigram_tokenize_raises_on_oov_character(spark):
    import pytest as _pytest

    from storage_spark.functions.bpe import unigram_tokenize, unigram_vocab

    train = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    v = unigram_vocab(train, max_size=10)
    apply_df = spark.createDataFrame([(2, "zz")], "doc_id long, text string")
    with _pytest.raises(Exception, match="unsegmentable|OOV"):
        unigram_tokenize(apply_df, v).collect()


def test_unigram_empty_and_blank_docs(spark):
    from storage_spark.functions.bpe import unigram_tokenize, unigram_vocab

    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, ""), (3, "ab  ab")],  # double space → empty token
        "doc_id long, text string",
    )
    v = unigram_vocab(docs.filter("doc_id = 1"), max_size=10)
    out = {r.doc_id: r for r in unigram_tokenize(docs, v).collect()}
    assert out[2].n_words == 0 and out[2].n_pieces == 0
    assert out[3].n_words == 2  # empty tokens skipped, not counted


def test_learn_merges_releases_all_round_state(spark, merge_docs):
    """r13: per-round training checkpoints are LAZY (the pair-count job
    fills round r's blocks; no separate materialization job) and every
    round's blocks — including the final state's — are released before
    the function returns, so training leaks nothing into executor
    storage. The merge table must still match the Sennrich reference."""
    from storage_spark.functions.bpe import bpe_learn_merges

    sc = spark.sparkContext

    def pinned_ids():
        return {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}

    merge_docs.count()  # materialize the fixture's cache first
    base = pinned_ids()
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_learn_merges(merge_docs, num_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    want, _ = sennrich_merges([t for _, t in MERGE_DOCS], 6)
    assert got == want
    # no NEW blocks left behind (subset, not equality: the context
    # cleaner may concurrently evict OTHER tests' dereferenced caches)
    assert pinned_ids() <= base
