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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    words = docs.select(
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
