"""Persistent text-quality models — fit once, score many times.

Every text scorer in ``operators.pipeline`` splits into a corpus-sized FIT
(a vocabulary/bucket count table) and a cheap SCORE (explode + one
broadcast join). The fit is the expensive half — at 100 TB it is a full
corpus scan — and in production it runs once per reference corpus, not
once per scoring job. This module persists the fitted table the same way
``sources.annindex`` persists an ANN index: parquet + a ``config.json``
recording the kind and the fit parameters the SCORING side must reuse
(DSIR's bucket count shapes the score-side feature hash; a mismatch would
silently score under the wrong feature space — load_text_model hands the
params back so callers can't drop them).

Model kinds and their column contracts (all are the exact tables the
scorers already accept via their ``model=`` / ``bigrams=`` parameters —
persistence adds no new math, so persisted-vs-refit scores are EQUAL by
construction, asserted in tests):

- ``unigram``: ``(tok, cnt)``       — ``pipeline.unigram_model``
- ``bigram``:  ``(prev, tok, cnt)`` — ``pipeline.bigram_model``
- ``nb``:      ``(tok, w)``         — ``pipeline.nb_quality_model``
- ``dsir``:    ``(b, lw)``          — ``pipeline.dsir_model``
- ``subword``: ``(tok)``            — ``functions.bpe.build_subword_vocab``
  (budgets must count in the SAME vocabulary the packing ran under)
- ``merges``: ``(merge_rank, lhs, rhs, merged, pair_count)`` —
  ``functions.bpe.bpe_learn_merges`` (rank order IS the model: apply-time
  replay folds the merges in merge_rank order)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

#: kind -> required columns (order-insensitive; extra columns rejected so a
#: model written by a newer fit can't silently feed an older scorer)
MODEL_COLUMNS: dict[str, set[str]] = {
    "unigram": {"tok", "cnt"},
    "bigram": {"prev", "tok", "cnt"},
    "nb": {"tok", "w"},
    "dsir": {"b", "lw"},
    "subword": {"tok"},
    "merges": {"merge_rank", "lhs", "rhs", "merged", "pair_count"},
    # Unigram-LM piece table (bpe.unigram_vocab): quantized milli-bit
    # log2 scores — the Viterbi scorer's entire state
    "unipiece": {"tok", "lp_milli"},
    # trained language-ID (operators.langid): NB char-n-gram weights,
    # per-lang OOV weight riding as the gram='' row; record n in params
    "langid": {"lang", "gram", "w_milli"},
}

_FORMAT_VERSION = 1


def save_text_model(
    model: DataFrame,
    path: str,
    kind: str,
    params: dict | None = None,
) -> dict:
    """Write a fitted model table under ``path/`` (``model/`` parquet +
    ``config.json``). ``params`` records whatever the scoring side must
    replay (smoothing, num_buckets, use_bigrams, fit-corpus note, …).
    Returns the config dict. Overwrites an existing model at the path —
    refit-and-replace is the maintenance model, like annindex rebuilds."""
    if kind not in MODEL_COLUMNS:
        raise ValueError(f"unknown model kind {kind!r} (have {sorted(MODEL_COLUMNS)})")
    want = MODEL_COLUMNS[kind]
    have = set(model.columns)
    if have != want:
        raise ValueError(
            f"{kind} model must have exactly columns {sorted(want)}, got {sorted(have)}"
        )
    os.makedirs(path, exist_ok=True)
    model.write.mode("overwrite").parquet(os.path.join(path, "model"))
    # n_rows from the data just written (one read, not a recount of the
    # possibly-expensive fit plan)
    spark = model.sparkSession
    n_rows = spark.read.parquet(os.path.join(path, "model")).count()
    cfg = {
        "format_version": _FORMAT_VERSION,
        "kind": kind,
        "columns": sorted(want),
        "n_rows": n_rows,
        "params": params or {},
    }
    with open(os.path.join(path, "config.json"), "w") as fh:
        json.dump(cfg, fh)
    return cfg


def load_text_model(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Read back ``(model, config)``. Validates the stored schema against
    the kind's contract so a corrupted/foreign table fails loudly at load
    time, not as silent NULL joins at score time."""
    with open(os.path.join(path, "config.json")) as fh:
        cfg = json.load(fh)
    kind = cfg.get("kind")
    if kind not in MODEL_COLUMNS:
        raise ValueError(f"config at {path} names unknown kind {kind!r}")
    df = spark.read.parquet(os.path.join(path, "model"))
    if set(df.columns) != MODEL_COLUMNS[kind]:
        raise ValueError(
            f"stored {kind} model columns {sorted(df.columns)} != contract"
            f" {sorted(MODEL_COLUMNS[kind])}"
        )
    return df, cfg
