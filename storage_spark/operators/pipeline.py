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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storage_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from storage_spark.operators.dedup import ngram_jaccard_pairs


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


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    shingle_n: int = 3,
    min_jaccard: float = 0.5,
    max_shingle_df: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Returns the kept rows (id + quality score, scaled integral).

    Removal rules (deterministic):
    - quality_score < min_quality → dropped;
    - exact content duplicates (same normalized fingerprint) → keep the
      lowest doc_id of each group;
    - near-duplicates (Jaccard >= min_jaccard) → drop the higher doc_id of
      each pair (the transitive greedy pass of MinHashLSH-style dedup).

    ``materialize=True`` checkpoints the scored/exact-kept stage and the
    shingle index: they feed several subplans each (keeper agg, semi-join,
    index a/b sides, final anti-join), and Catalyst re-plans shared
    subtrees per consumer — at scale the scan+scoring+shingling would
    otherwise run several times.
    """
    from storage_spark.operators.dedup import _materialize

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
    losers = pairs.select(F.col("doc_b").alias("doc")).distinct()
    kept = exact_kept.join(losers, "doc", "left_anti")
    return kept.select(
        F.col("doc").alias(id_col),
        F.round(F.col("_q") * 1000).cast("bigint").alias("score_1e3"),
    )
