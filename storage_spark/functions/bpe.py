"""Subword tokenization with a broadcast vocabulary (extension surface).

The budget/packing operators count whitespace-regex tokens; real training
pipelines budget in SUBWORD units (BPE/WordPiece — Sennrich et al. 2016,
arXiv:1508.07909). This module provides the deterministic, engine-portable
core of that: a one-pass frequency-trained subword vocabulary and greedy
longest-prefix-match tokenization (WordPiece-style inference — the
iterative merge REPLAY of classic BPE reduces to exactly this once the
vocabulary is fixed, and greedy inference is what production tokenizers
execute per word). Everything replays in SQL: the vocabulary is two
aggregations, and the greedy matcher is a recursive scan the DuckDB oracle
runs verbatim — no RNG, no merge-order state.

Scale shape: training is one explode + one map-side-combined count + a
TakeOrdered (vocabulary-sized result). Tokenization is MAP-ONLY — the
vocabulary broadcasts to every worker once (a bounded driver-side collect,
same class as ANN centroids/codebooks) and each doc is scored in an
Arrow-batched pandas UDF; no join, no shuffle.

Conventions (identical in the engine and the SQL oracle):
- words = single-space split of the raw text ('' words contribute 0);
- a position consumes the LONGEST vocabulary token prefixing the
  remainder, else exactly 1 character (unknown bytes are their own token);
- vocabulary = the ``max_size`` most frequent character n-grams
  (2..max_len) by word-occurrence count (ties by token, ascending) plus
  ALL single characters (the closure fallback, always included).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F

#: Symbol separator for the merge trainer's string-encoded symbol
#: sequences. A control byte no tokenized corpus contains; words that DO
#: contain it are excluded from training/apply on both engine and oracle
#: sides (the same convention, so parity holds by construction).
BPE_SEP = "\x01"


def build_subword_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_size: int = 1000,
    max_len: int = 4,
) -> DataFrame:
    """Fit a subword vocabulary: one ``(tok)`` row per kept unit. Top
    ``max_size`` character n-grams (lengths 2..``max_len``) by frequency
    over word occurrences, deterministic ties, plus every single
    character seen (so tokenization never stalls on in-corpus text)."""
    if max_len < 2:
        raise ValueError(f"max_len must be >= 2 (got {max_len})")
    from storage_spark.functions.partitioning import spread_small_input

    words = spread_small_input(docs).select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.length("w") > 0)
    grams = F.flatten(
        F.transform(
            F.sequence(F.lit(2), F.lit(max_len)),
            lambda l: F.when(
                F.length(F.col("w")) >= l,
                F.transform(
                    F.sequence(F.lit(1), F.length(F.col("w")) - l + 1),
                    lambda p: F.col("w").substr(p, l),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    top = (
        words.select(F.explode(grams).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("tok").asc())
        .limit(int(max_size))
        .select("tok")
    )
    chars = (
        words.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(F.col("w"))),
                    lambda p: F.col("w").substr(p, F.lit(1)),
                )
            ).alias("tok")
        )
        .distinct()
    )
    # length-1 chars and length>=2 grams are disjoint sets
    return top.unionByName(chars)


def _word_syms(word: Column, byte_level: bool) -> Column:
    """A word's initial symbol array: characters, or — ``byte_level`` —
    its UTF-8 bytes as uppercase hex pairs ('é' → ['C3', 'A9']), the
    GPT-2-family convention that makes any Unicode corpus coverable by a
    256-symbol base alphabet. Spark's ``hex(encode(...))`` and DuckDB's
    ``hex(...)`` emit identical uppercase hex, so the oracle replays the
    byte path exactly."""
    if not byte_level:
        return F.split(word, "")
    hx = F.hex(F.encode(word, "UTF-8"))
    return F.transform(
        F.sequence(F.lit(1), (F.length(hx) / F.lit(2)).cast("int")),
        lambda i: F.substring(hx, i * 2 - 1, F.lit(2)),
    )


def _word_sym_state(word: Column, byte_level: bool = False) -> Column:
    """Encode a word as its initial BPE symbol string: every symbol
    (character, or hex byte pair when ``byte_level``) delimited — and
    the string bracketed — by ``BPE_SEP``; ``'cat'`` becomes
    ``'\\x01c\\x01a\\x01t\\x01'``. A merge of the adjacent pair (a, b)
    is then exactly one string ``replace`` of ``SEP a SEP b SEP`` with
    ``SEP ab SEP``: both Spark and DuckDB scan left-to-right without
    re-examining replaced text, which is precisely the reference BPE
    behavior for overlapping runs ('b b b' merges to 'bb b', not
    'b bb')."""
    return F.concat(
        F.lit(BPE_SEP),
        F.array_join(_word_syms(word, byte_level), BPE_SEP),
        F.lit(BPE_SEP),
    )


def bpe_learn_merges(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 12,
    min_count: int = 1,
    byte_level: bool = False,
) -> DataFrame:
    """True merge-frequency BPE training (Sennrich et al. 2016,
    arXiv:1508.07909 — the iterative algorithm, not the frequency-vocab
    shortcut of ``build_subword_vocab``): repeatedly count adjacent symbol
    pairs over the word-frequency table, merge the most frequent pair
    (ties broken by pair text ascending — deterministic), and re-count on
    the merged state. Returns the learned merge table
    ``(merge_rank int, lhs, rhs, merged, pair_count long)`` in rank order.

    Pair counts follow the reference implementation: every adjacent
    position counts, weighted by word frequency, including overlapping
    occurrences within a word ('aaa' contributes (a,a) twice).

    ``byte_level=True`` merges over UTF-8 BYTES (symbols are uppercase
    hex pairs — the GPT-2-family base alphabet): a multi-byte character
    starts as multiple symbols, and the learned ``merged`` strings are
    hex of the byte sequence. Char- and byte-level merge tables are NOT
    interchangeable at apply time; the persisted-model params record
    the choice.

    Scale shape: the state is the DISTINCT-WORD table (vocabulary-sized —
    millions of rows at 100 TB, not corpus-sized; the classic BPE
    preprocessing), built by ONE map-side-combined count over the corpus.
    Each merge round is one map-only ``replace`` + one pair aggregation +
    a 1-row argmax collect (the bounded driver-collect class), and the
    state is localCheckpoint-ed per round so round r never replays rounds
    0..r-1 — N rounds cost N linear passes over the word table, never
    touching the corpus again. The per-round checkpoints are LAZY
    (r13, guide §2.4/§5): round r's pair-aggregation job both fills
    round r's checkpoint blocks (its shuffle-map stage computes every
    state partition) and counts the pairs, so each round runs ONE job
    over the word table instead of two (the eager form paid a separate
    serial materialization job per round — measured 3.6–8.1 s → 3.0–3.2 s
    at sf0.1/32 cores for 12 rounds, identical merge tables). Round
    r−1's blocks are released only after round r's collect returns (the
    lazy fill of state r reads them), and both live states are released
    on return — training holds at most two rounds of vocabulary-sized
    state in executor storage and leaks nothing.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1 (got {num_merges})")
    from storage_spark.functions.partitioning import spread_small_input
    from storage_spark.operators.dedup import _CheckpointPin

    words = (
        spread_small_input(docs)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter((F.length("w") > 0) & ~F.contains(F.col("w"), F.lit(BPE_SEP)))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )
    state = words.select(
        F.col("wcnt"), _word_sym_state(F.col("w"), byte_level).alias("sym")
    ).localCheckpoint(eager=False)
    # the superseded round whose blocks round `state`'s lazy fill still
    # reads; releasable once `state` is materialized (the next collect)
    prev: DataFrame | None = None
    merges: list[Row] = []
    for rank in range(int(num_merges)):
        syms = F.filter(F.split(F.col("sym"), BPE_SEP), lambda x: x != "")
        pairs = state.select(
            F.col("wcnt"),
            F.explode(
                F.arrays_zip(
                    F.slice(syms, 1, F.size(syms) - 1).alias("lhs"),
                    F.slice(syms, 2, F.size(syms) - 1).alias("rhs"),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("wcnt").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(1)
            .collect()
        )
        # the collect's aggregation materialized `state` (a global count
        # computes every partition), so round r-1's blocks are now dead
        if prev is not None:
            _CheckpointPin(prev).unpersist()
            prev = None
        if not best or best[0]["cnt"] < min_count:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], int(best[0]["cnt"])
        merges.append(
            Row(
                merge_rank=rank,
                lhs=lhs,
                rhs=rhs,
                merged=lhs + rhs,
                pair_count=cnt,
            )
        )
        new_state = state.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(BPE_SEP + lhs + BPE_SEP + rhs + BPE_SEP),
                F.lit(BPE_SEP + lhs + rhs + BPE_SEP),
            ),
        ).localCheckpoint(eager=False)
        prev = state
        state = new_state
    # only the collected merges leave this function — release the final
    # round's blocks too (unpersist is a no-op if never materialized)
    if prev is not None:
        _CheckpointPin(prev).unpersist()
    _CheckpointPin(state).unpersist()
    return docs.sparkSession.createDataFrame(
        merges,
        schema="merge_rank int, lhs string, rhs string, merged string,"
        " pair_count long",
    )


def bpe_merge_token_counter(
    merges: DataFrame, byte_level: bool = False
) -> Callable[[Column], Column]:
    """Compile a learned merge table into a ``text -> subword count``
    Column function — PURE expressions, no UDF: the doc is encoded as one
    symbol string (words joined by a DOUBLE separator so no merge can
    cross a word boundary), the R merges are replayed in rank order as R
    chained ``replace`` calls, and the count is the surviving symbol
    total. The merge list is collected (bounded: num_merges rows, the
    ANN-centroid collect class) and folded into the plan as literals.

    Application semantics: each merge is applied exhaustively ONCE, in
    training order — identical to how the trainer itself evolves its
    state, so train-time and apply-time segmentations agree by
    construction. (The reference encoder's iterative min-rank loop can
    additionally re-apply an earlier merge that a later merge re-enables;
    that divergence requires a later merge to recreate an earlier pair,
    which rank order makes rare, and the single-pass form is what keeps
    the operator a map-only expression chain.)"""
    rows = sorted(
        merges.select("merge_rank", "lhs", "rhs").collect(),
        key=lambda r: r["merge_rank"],
    )

    def _count(text: Column) -> Column:
        words_arr = F.filter(
            F.split(text, " "),
            lambda w: (F.length(w) > 0) & ~F.contains(w, F.lit(BPE_SEP)),
        )
        state = F.concat(
            F.lit(BPE_SEP),
            F.array_join(
                F.transform(
                    words_arr,
                    lambda w: F.array_join(_word_syms(w, byte_level), BPE_SEP),
                ),
                BPE_SEP + BPE_SEP,
            ),
            F.lit(BPE_SEP),
        )
        for r in rows:
            state = F.replace(
                state,
                F.lit(BPE_SEP + r["lhs"] + BPE_SEP + r["rhs"] + BPE_SEP),
                F.lit(BPE_SEP + r["lhs"] + r["rhs"] + BPE_SEP),
            )
        return F.size(
            F.filter(F.split(state, BPE_SEP), lambda x: x != "")
        ).cast("long")

    return _count


def bpe_merge_tokenize(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    byte_level: bool = False,
) -> DataFrame:
    """Per-doc subword counts under a learned merge table:
    ``(id_col, n_words, n_subwords)``. NULL-text docs are dropped (the
    LM-scorer convention — there is nothing to segment); empty text
    yields 0/0. ``n_words`` counts non-empty words, matching the set the
    segmentation actually covers. ``byte_level`` must match the
    trainer's — hex-pair merges never fire on char symbols and vice
    versa, silently segmenting everything to the base alphabet."""
    counter = bpe_merge_token_counter(merges, byte_level)
    nz_words = F.filter(
        F.split(F.col(text_col), " "),
        lambda w: (F.length(w) > 0) & ~F.contains(w, F.lit(BPE_SEP)),
    )
    return docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.size(nz_words).cast("long").alias("n_words"),
        counter(F.col(text_col)).alias("n_subwords"),
    )


def bpe_token_counter(vocab: DataFrame) -> Callable[[Column], Column]:
    """Compile a vocabulary into a ``text -> subword count`` Column
    function. The vocabulary is collected (bounded: max_size + charset
    rows — the same documented-collect class as ANN centroids) and
    broadcast; counting runs in an Arrow-batched pandas UDF, map-only."""
    toks = [r[0] for r in vocab.select("tok").collect()]
    vs = frozenset(toks)
    ml = max((len(t) for t in toks), default=1)
    spark = vocab.sparkSession
    bc = spark.sparkContext.broadcast((vs, ml))

    @F.pandas_udf("long")
    def _n_bpe(texts: pd.Series) -> pd.Series:
        vset, max_len = bc.value

        def count_doc(t: str) -> int:
            n = 0
            for wd in t.split(" "):
                pos, ln = 0, len(wd)
                while pos < ln:
                    step = 1
                    for width in range(min(max_len, ln - pos), 1, -1):
                        if wd[pos : pos + width] in vset:
                            step = width
                            break
                    pos += step
                    n += 1
            return n

        return texts.map(lambda t: count_doc(t) if t is not None else None)

    return lambda col: _n_bpe(col)


def bpe_tokenize(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc subword counts under a fixed vocabulary:
    ``(id_col, n_words, n_bpe_tokens)``. NULL text scores NULL counts
    (kept, unlike the LM scorers' dropped rows — budgeting wants every
    doc visible)."""
    counter = bpe_token_counter(vocab)
    return docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_words"),
        counter(F.col(text_col)).alias("n_bpe_tokens"),
    )


def _qlog2_milli(c: Column) -> Column:
    """Piecewise-linear log2 (Mitchell's approximation), quantized to
    milli-units: ``(bitlen(c)-1)*1000 + floor(1000*(c/2^(bitlen-1)-1))``.
    Monotone in ``c`` with ≤ 0.086-bit error, and EXACTLY computable in
    any engine — bit length via ``bin()``, one IEEE divide (``c/2^k`` is
    a significand shift, exact for c < 2^53), one floor. This is what
    lets a Unigram-LM score be replayed bit-for-bit by a SQL oracle:
    true ``ln``/``log2`` are libm-dependent across engines, a quantized
    FLOOR of them can flip at implementation boundaries; this never
    does."""
    bl = F.length(F.bin(c.cast("bigint")))
    mant = c.cast("double") / F.pow(F.lit(2.0), (bl - 1).cast("double"))
    return ((bl - 1).cast("bigint") * 1000
            + F.floor((mant - F.lit(1.0)) * 1000).cast("bigint"))


def unigram_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_size: int = 1000,
    max_len: int = 4,
) -> DataFrame:
    """Candidate-piece table for Unigram-LM tokenization (Kudo 2018,
    arXiv:1804.10959 — the SentencePiece family's other half, next to
    BPE): ``(tok, lp_milli)`` where lp_milli = qlog2(count) -
    qlog2(total) in milli-bits (negative). Pieces are the top
    ``max_size`` character n-grams (2..max_len) by occurrence count
    over word occurrences (ties: count desc, tok asc), plus EVERY
    single character seen with its own count — segmentation never
    stalls on in-corpus text. One count + one TakeOrdered; the table
    is bounded and broadcastable (the ANN-centroid collect class).

    The full Kudo trainer prunes by EM likelihood loss; this fit keeps
    the frequency lattice (the standard seed vocabulary) — documented
    scope, same discipline as the closed-form NB fit."""
    if max_len < 2:
        raise ValueError(f"max_len must be >= 2 (got {max_len})")
    from storage_spark.functions.partitioning import spread_small_input

    words = spread_small_input(docs).select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.length("w") > 0)
    grams = F.flatten(
        F.transform(
            F.sequence(F.lit(2), F.lit(max_len)),
            lambda l: F.when(
                F.length(F.col("w")) >= l,
                F.transform(
                    F.sequence(F.lit(1), F.length(F.col("w")) - l + 1),
                    lambda p: F.col("w").substr(p, l),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    top = (
        words.select(F.explode(grams).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(int(max_size))
    )
    chars = (
        words.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(F.col("w"))),
                    lambda p: F.col("w").substr(p, F.lit(1)),
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pieces = top.unionByName(chars).groupBy("tok").agg(
        F.max("cnt").alias("cnt")
    )
    # pieces is bounded (<= max_size + charset rows) and referenced
    # twice (total + the final select); unpinned, each reference
    # replays BOTH corpus explodes (grams and chars) — the r12
    # _pin_model pattern halves the fit (one localCheckpoint job);
    # scope-releasable via pin_bounded (r13)
    from storage_spark.operators.dedup import pin_bounded

    pieces = pin_bounded(pieces)
    total = pieces.agg(F.sum("cnt").alias("_t"))
    return (
        pieces.crossJoin(F.broadcast(total))
        .select(
            "tok",
            (_qlog2_milli(F.col("cnt")) - _qlog2_milli(F.col("_t")))
            .alias("lp_milli"),
        )
    )


def unigram_tokenize(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 4,
) -> DataFrame:
    """Viterbi segmentation (the Unigram-LM decoder): per word, the
    piece sequence maximizing Σ lp_milli, ties broken by fewer pieces,
    then by the longer last piece at each DP step (smaller split
    point) — a total order, so the best path is unique by induction.
    Arrow-batched pandas UDF over the broadcast piece table, memoized
    per distinct word within a batch. Output per doc: ``(doc_id,
    n_words, n_pieces, score_milli)`` — the sums a SQL oracle can
    replay by unrolling the same DP over split positions.

    Scale: map-only (the vocab is bounded + broadcast); the per-word
    DP is O(len · max_len) dict lookups, amortized across repeats by
    the memo."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    lp = {r["tok"]: int(r["lp_milli"]) for r in vocab.collect()}
    ml = int(max_len)

    @pandas_udf("struct<n_words: long, n_pieces: long, score_milli: long>")
    def _seg(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, tuple[int, int]] = {}

        def word_dp(w: str) -> tuple[int, int]:
            got = memo.get(w)
            if got is not None:
                return got
            n = len(w)
            # S[j], P[j] = best (score, pieces) for prefix w[:j]
            S = [None] * (n + 1)
            P = [0] * (n + 1)
            S[0] = 0
            for j in range(1, n + 1):
                best = None
                for i in range(max(0, j - ml), j):
                    if S[i] is None:
                        continue
                    piece_lp = lp.get(w[i:j])
                    if piece_lp is None:
                        continue
                    cand = (S[i] + piece_lp, -(P[i] + 1), -i)
                    if best is None or cand > best:
                        best = cand
                        S[j] = S[i] + piece_lp
                        P[j] = P[i] + 1
            if S[n] is None:
                raise ValueError(f"unsegmentable word {w!r} (OOV char)")
            memo[w] = (S[n], P[n])
            return memo[w]

        rows = []
        for text in texts:
            nw = np_ = sc = 0
            if text:
                for w in text.split(" "):
                    if not w:
                        continue
                    s, p = word_dp(w)
                    nw += 1
                    np_ += p
                    sc += s
            rows.append((nw, np_, sc))
        return pd.DataFrame(rows, columns=["n_words", "n_pieces",
                                           "score_milli"])

    from storage_spark.functions.partitioning import spread_small_input

    return spread_small_input(docs).select(
        F.col(id_col).alias("doc_id"), _seg(F.col(text_col)).alias("_s")
    ).select("doc_id", "_s.n_words", "_s.n_pieces", "_s.score_milli")
