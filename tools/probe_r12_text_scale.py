"""r12 probe (VERDICT r11 #6): scale behavior of the TEXT dedup family —
the discipline that caught the langid and media defects, applied to
`minhash_lsh_pairs`, `exact_substring_spans`, and `line_dedup` at
sf1-geometry (~50k real docs) and a synthetic 1M-doc corpus.

Synthetic corpus (pure Spark expressions, fully deterministic): N docs of
`n_tokens` tokens drawn uniformly from a `vocab`-token vocabulary via
xxhash64 (uniform is the LOW-collision background for MinHash — real
corpora share boilerplate, which raises bucket skew; the planted rows
below supply the structured part). Planted rows:

- near-dups: doc ``p<i>`` = doc ``i`` with every ``mutate_every``-th
  token replaced (shingle-level Jaccard ~0.66 at the defaults — ON the
  banded-LSH S-curve, so the recall spread across (n_hashes, band_size)
  settings is the measurement, not a foregone 1.0);
- exact substrings: the unmutated runs between replacements are shared
  verbatim (length mutate_every-1 tokens ≥ k), so the substring op has
  real cross-doc spans to find;
- boilerplate: every doc's first LINE is one global constant line (the
  line_dedup hot key — the Zipf-head case its groupBy combiner must
  absorb).

Per (n_hashes, band_size, max_band_df) setting this probe measures:

- the `band_pair_volume` AUDIT (new r12): exact pre-distinct candidate
  volume + max bucket from ONE groupBy over the band index — the number
  that prices the candidate shuffle, measured BEFORE paying it;
- wall + distinct candidate count of the full `minhash_lsh_pairs`;
- recall of the planted near-dup pairs.

The audit is the sizing rule this probe ships (the MinHash twin of
`multimodal.band_candidate_estimate`, which closed-forms UNIFORM
fingerprints — MinHash volume is corpus-dependent, so the planner runs
the O(|bands|) audit instead of a formula).

Run: python tools/probe_r12_text_scale.py [N] (default 1_000_000;
use a small N first — the full probe is ~15-25 min on 32 cores).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def _tok(doc_expr, j, vocab: int, salt: str = ""):
    """Deterministic token `t<id-in-letters>` for (doc, position); `salt`
    derives the replacement stream for planted mutations. Letter-suffixed
    (digits translated a-j), NOT digit-suffixed: line_dedup's CCNet
    normalization folds every digit to '0', so digit tokens would
    collapse ALL lines to one hash and measure a pathological fixture
    instead of the operator."""
    h = F.xxhash64(F.concat(doc_expr.cast("string"), F.lit(f":{salt}:"), j.cast("string")))
    return F.concat(
        F.lit("m" if salt else "t"),
        F.translate(
            F.pmod(h, F.lit(vocab)).cast("string"),
            "0123456789", "abcdefghij",
        ),
    )


def corpus(spark, n_docs: int, n_planted: int, n_tokens: int, vocab: int,
           mutate_every: int, line_len: int):
    """(docs, planted_pairs): docs has doc_id + text (lines of `line_len`
    tokens joined by newline, first line a global constant); planted_pairs
    is the (doc_a, doc_b) ground truth for recall."""
    boiler = "t0 " * (line_len - 1) + "t0"  # the global first line

    def text_expr(doc_col, mutated: bool):
        tok = F.transform(
            F.sequence(F.lit(1), F.lit(n_tokens)),
            lambda j: (
                F.when(j % mutate_every == 0, _tok(doc_col, j, vocab, salt="x"))
                .otherwise(_tok(doc_col, j, vocab))
                if mutated
                else _tok(doc_col, j, vocab)
            ),
        )
        # group tokens into lines of line_len, prepend the boilerplate line
        lines = F.transform(
            F.sequence(F.lit(0), F.lit(n_tokens // line_len - 1)),
            lambda i: F.array_join(F.slice(tok, i * line_len + 1, line_len), " "),
        )
        return F.concat(F.lit(boiler + "\n"), F.array_join(lines, "\n"))

    base = spark.range(n_docs).select(
        F.col("id").cast("string").alias("doc_id"),
        text_expr(F.col("id"), mutated=False).alias("text"),
    )
    pl = spark.range(n_planted).select(
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("doc_id"),
        text_expr(F.col("id"), mutated=True).alias("text"),
    )
    truth = spark.range(n_planted).select(
        F.col("id").cast("string").alias("doc_a"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("doc_b"),
    )
    return base.unionByName(pl), truth


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from storage_spark.operators.dedup import (
        band_pair_volume,
        exact_substring_spans,
        line_dedup,
        minhash_band_index,
        minhash_lsh_pairs,
    )
    from storage_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_planted = max(1, n_docs // 100)
    n_tokens, vocab, mutate_every, line_len = 60, 30_000, 15, 10

    spark = get_spark("probe_r12_text_scale", cpus=32)
    docs, truth = corpus(spark, n_docs, n_planted, n_tokens, vocab,
                         mutate_every, line_len)
    # flat text (no newlines) for the token-shingle ops: newline tokens
    # would otherwise glue across lines
    flat = docs.select("doc_id", F.regexp_replace("text", "\n", " ").alias("text"))
    t0 = time.time()
    flat.cache().count()
    docs.cache().count()
    print(f"corpus: {n_docs}+{n_planted} docs materialized in "
          f"{time.time() - t0:.1f}s", flush=True)
    truth_rows = n_planted

    print(f"\n== minhash settings sweep (N={n_docs}, planted={n_planted}, "
          f"shingle n=3) ==", flush=True)
    print(f"{'setting':>28} | {'audit_s':>7} | {'cand_pre':>12} | "
          f"{'max_bkt':>8} | {'pairs_s':>8} | {'pairs':>10} | {'recall':>6}")
    for n_hashes, band_size, cap in [(8, 2, None), (8, 2, 64),
                                     (8, 4, None), (16, 4, None)]:
        t0 = time.time()
        bands = minhash_band_index(flat, n=3, n_hashes=n_hashes,
                                   band_size=band_size)
        vol = band_pair_volume(bands).agg(
            F.sum("candidates"), F.max("max_bucket")
        ).collect()[0]
        audit_s = time.time() - t0
        t0 = time.time()
        pairs = minhash_lsh_pairs(
            flat, n=3, n_hashes=n_hashes, band_size=band_size,
            materialize=True, max_band_df=cap,
        ).cache()
        n_pairs = pairs.count()
        pairs_s = time.time() - t0
        hit = pairs.join(truth, ["doc_a", "doc_b"], "left_semi").count()
        pairs.unpersist()
        name = f"(h={n_hashes}, r={band_size}, cap={cap})"
        print(f"{name:>28} | {audit_s:7.1f} | {int(vol[0]):12d} | "
              f"{int(vol[1]):8d} | {pairs_s:8.1f} | {n_pairs:10d} | "
              f"{hit / truth_rows:6.3f}", flush=True)

    print("\n== exact_substring_spans (k=10) ==", flush=True)
    t0 = time.time()
    n_spans = exact_substring_spans(flat, k=10).count()
    print(f"spans={n_spans} wall={time.time() - t0:.1f}s", flush=True)

    print("\n== line_dedup (keep-first, global boilerplate line) ==",
          flush=True)
    t0 = time.time()
    out = line_dedup(docs)
    # force the rebuilt text column (count() alone would prune it)
    got = out.agg(F.sum(F.length("text"))).collect()[0][0]
    print(f"rebuilt_chars={got} wall={time.time() - t0:.1f}s", flush=True)

    flat.unpersist()
    docs.unpersist()

    # sf1-geometry real text, if the sf1 dataset was generated this round
    import os

    sf1 = "/tmp/sf1/documents.parquet"
    if os.path.exists(sf1):
        real = spark.read.parquet(sf1).select("doc_id", "text")
        n = real.count()
        print(f"\n== sf1 real documents ({n} docs) ==", flush=True)
        for n_hashes, band_size in [(8, 2), (8, 4)]:
            t0 = time.time()
            bands = minhash_band_index(real, n=3, n_hashes=n_hashes,
                                       band_size=band_size)
            vol = band_pair_volume(bands).agg(
                F.sum("candidates"), F.max("max_bucket")
            ).collect()[0]
            audit_s = time.time() - t0
            t0 = time.time()
            n_pairs = minhash_lsh_pairs(
                real, n=3, n_hashes=n_hashes, band_size=band_size,
                materialize=True,
            ).count()
            print(f"(h={n_hashes}, r={band_size}): audit {audit_s:.1f}s "
                  f"cand_pre={int(vol[0])} max_bkt={int(vol[1])} "
                  f"pairs={n_pairs} wall={time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        n_spans = exact_substring_spans(real, k=10).count()
        print(f"substring spans={n_spans} wall={time.time() - t0:.1f}s",
              flush=True)
        t0 = time.time()
        got = line_dedup(real).agg(F.sum(F.length("text"))).collect()[0][0]
        print(f"line_dedup rebuilt_chars={got} wall={time.time() - t0:.1f}s",
              flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
