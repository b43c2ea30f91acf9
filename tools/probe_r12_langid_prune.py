"""r12 probe (VERDICT r11 #8): does `langid_prune` earn its keep on a
gram space big enough to matter?

The r11 sf1 probe was honest about the negative result on THAT corpus:
4 langs × char-trigram space ≈ a few 10k grams — the full model is
already broadcast-size, so pruning bought agreement loss and no wall.
The claim to test is the 100 TB story in `langid_prune`'s docstring:
with a REAL fastText-style feature space (word unigrams + bigrams on a
large vocabulary — 1M+ (lang, gram) rows), the full model is no longer
broadcast-size, the matched-occurrence join goes shuffle-both-sides,
and pruning to |langs| × keep_top rows flips it back to broadcast.

Fixture: 4 synthetic languages, each with its own large word vocabulary
plus a SHARED vocabulary pool mixed in at `share_pct` (so languages
overlap and pruning can actually flip argmaxes — a disjoint-vocab
fixture would make 100% agreement a foregone conclusion). Docs are
`n_tokens` words; fit on half, predict on a freshly generated half
(different salt), word_ns=(1, 2) — TextCat's full profile.

Measured per model (full, pruned@50k, pruned@10k):

- model rows (the gram space) and fit/prune wall (one-time costs);
- predict wall over the test half (the per-corpus recurring cost the
  pruning exists to cut);
- agreement with the FULL model's predictions, and accuracy against
  the generating language (both halves of the honesty: a pruned model
  that agrees 99% but was already wrong is not a win).

Run: python tools/probe_r12_langid_prune.py [n_docs_per_lang]
(default 12500 → 50k fit docs + 50k test docs, ~1-2M gram rows).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

LANGS = ["aa", "bb", "cc", "dd"]


def _word(lang_i: int, doc, j, vocab_own: int, vocab_shared: int,
          share_pct: int, salt: str):
    """Deterministic word at (doc, position): from the shared pool with
    probability share_pct/100, else from the language's own vocabulary.
    Words are multi-char ('w<lang><id>' / 's<id>') so char trigrams and
    word grams both see structure."""
    h = F.xxhash64(F.concat(doc.cast("string"), F.lit(f":{salt}:"),
                            j.cast("string")))
    h2 = F.xxhash64(F.concat(F.lit("pick:"), doc.cast("string"),
                             F.lit(":"), j.cast("string"), F.lit(salt)))
    shared = F.concat(F.lit("s"), F.pmod(h, F.lit(vocab_shared)).cast("string"))
    own = F.concat(F.lit(f"w{lang_i}x"),
                   F.pmod(h, F.lit(vocab_own)).cast("string"))
    return F.when(F.pmod(h2, F.lit(100)) < share_pct, shared).otherwise(own)


def corpus(spark, n_per_lang: int, n_tokens: int, vocab_own: int,
           vocab_shared: int, share_pct: int, salt: str):
    def tok_fn(i):
        # one-arg lambda via closure factory: a `lambda j, i=i` default
        # arg would make F.transform pass the ARRAY INDEX as the second
        # argument (two-arg transform lambdas are (element, index)),
        # silently replacing the language id with a Column
        return lambda j: _word(i, F.col("id"), j, vocab_own,
                               vocab_shared, share_pct, salt)

    parts = []
    for i, lang in enumerate(LANGS):
        parts.append(
            spark.range(n_per_lang).select(
                F.concat(F.lit(f"{lang}{salt}"),
                         F.col("id").cast("string")).alias("doc_id"),
                F.lit(lang).alias("lang"),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(n_tokens)), tok_fn(i)
                    ),
                    " ",
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from storage_spark.operators.langid import (
        langid_fit,
        langid_predict,
        langid_prune,
    )
    from storage_spark.session import get_spark

    n_per_lang = int(sys.argv[1]) if len(sys.argv) > 1 else 12_500
    n_tokens, vocab_own, vocab_shared, share_pct = 80, 50_000, 20_000, 30
    word_ns = (1, 2)

    spark = get_spark("probe_r12_langid_prune", cpus=32)
    fit_docs = corpus(spark, n_per_lang, n_tokens, vocab_own, vocab_shared,
                      share_pct, salt="f").cache()
    test = corpus(spark, n_per_lang, n_tokens, vocab_own, vocab_shared,
                  share_pct, salt="t").select("doc_id", "lang", "text").cache()
    n_fit, n_test = fit_docs.count(), test.count()
    print(f"fit={n_fit} test={n_test} docs, word_ns={word_ns}", flush=True)

    t0 = time.time()
    full = langid_fit(fit_docs, word_ns=word_ns).cache()
    n_rows = full.count()
    print(f"full model: {n_rows} (lang, gram) rows, fit {time.time()-t0:.1f}s",
          flush=True)

    truth = test.select("doc_id", F.col("lang").alias("want"))

    def run(model, name):
        t0 = time.time()
        preds = langid_predict(test, model, word_ns=word_ns).cache()
        preds.count()
        wall = time.time() - t0
        acc = preds.join(truth, "doc_id").filter(
            F.col("lang") == F.col("want")
        ).count() / n_test
        return preds, wall, acc

    full_preds, full_wall, full_acc = run(full, "full")
    print(f"{'model':>12} | {'rows':>9} | {'prune_s':>7} | {'predict_s':>9} "
          f"| {'agree':>6} | {'acc':>6}")
    print(f"{'full':>12} | {n_rows:9d} | {'-':>7} | {full_wall:9.1f} "
          f"| {'1.000':>6} | {full_acc:6.3f}", flush=True)

    for keep_top in (50_000, 10_000):
        t0 = time.time()
        pruned = langid_prune(full, keep_top=keep_top).cache()
        p_rows = pruned.count()
        prune_s = time.time() - t0
        preds, wall, acc = run(pruned, f"pruned@{keep_top}")
        agree = preds.join(
            full_preds.select("doc_id", F.col("lang").alias("_f")), "doc_id"
        ).filter(F.col("lang") == F.col("_f")).count() / n_test
        print(f"{'pruned@%dk' % (keep_top // 1000):>12} | {p_rows:9d} | "
              f"{prune_s:7.1f} | {wall:9.1f} | {agree:6.3f} | {acc:6.3f}",
              flush=True)
        preds.unpersist()
        pruned.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
