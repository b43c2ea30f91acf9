"""Text analysis for large-scale training-data pipelines.

Not part of the reference's surface (flagged extension per SURVEY §7.10) —
these are the document-level operators a 100 TB corpus pipeline needs:
tokenization, quality scoring, language-ID heuristics, fingerprinting,
shingling. Everything is built-in Column expressions (codegen'd); no Python
touches row data, so these run at full scan speed and parallelize freely.

Determinism note: ratios are exact small-integer divisions in double
precision and every surfaced number is scaled to an integer, so results are
engine-reproducible (see __spark_entry__ output conventions).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny embedded stopword lists for the language-ID heuristic. Real
#: deployments plug in real lists; the operator shape is what matters.
STOPWORDS = {
    "en": ["a", "the", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "les", "et", "de"],
    "es": ["el", "la", "los", "y", "de"],
}

#: Deterministic language priority for tie-breaks.
LANG_PRIORITY = ["en", "de", "fr", "es"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def regex_token_count(text: Column, pattern: str = "[a-z]+|[0-9]+|[^a-z0-9 ]") -> Column:
    """BPE-ish tokenizer proxy: count of regex token matches."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), F.lit(0)))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    toks = tokens(F.lower(text))
    # `is None`, not falsiness: an explicitly EMPTY list means "no
    # stopword term" (ratio 0), not "use the English default"
    sw = STOPWORDS["en"] if stopwords is None else stopwords
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return hits.cast("double") / F.size(toks).cast("double")


def mean_token_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    lexical diversity. Deterministic double math over small-int ratios."""
    n = token_count(text).cast("double")
    length_band = F.when((n >= 20) & (n <= 1000), F.lit(1.0)).otherwise(
        n / F.lit(20.0)
    )
    length_band = F.least(length_band, F.lit(1.0))
    diversity = distinct_token_count(text).cast("double") / n
    stop = stopword_ratio(text)
    stop_band = F.least(stop * 4.0, F.lit(1.0))
    return length_band * 0.4 + diversity * 0.4 + stop_band * 0.2


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(F.lower(text))
    n = F.size(toks).cast("double")
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(words))).cast("double") / n
        for lang, words in STOPWORDS.items()
    }


def lang_id(text: Column, default: str = "und") -> Column:
    """Argmax stopword-hit ratio across language lists; strictly-greater
    comparison in priority order makes ties deterministic; 'und' when no
    list matches at all."""
    scores = lang_scores(text)
    best_lang = F.lit(default)
    best_score = F.lit(0.0)
    # Process lowest→highest priority with >=, so ties resolve to the
    # higher-priority language; zero scores never assign (default 'und').
    for lang in reversed(LANG_PRIORITY):
        s = scores[lang]
        take = (s > 0) & (s >= best_score)
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint(text: Column, length: int = 16) -> Column:
    """Content fingerprint: md5 of the normalized text, truncated."""
    return F.substring(F.md5(normalized_text(text)), 1, length)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word n-gram shingles (space-joined); empty array when the
    document has fewer than n tokens.

    Implementation note — lambda-capture hazard: any non-lambda-bound
    subexpression referenced INSIDE a higher-order-function lambda is
    re-evaluated per array element, so indexing the token array from the
    lambda re-runs the whole regex tokenization O(L) times per doc (measured
    ~100x slowdown on a 260k-shingle corpus). This build only combines
    zip_with/slice ARGUMENTS (each evaluated once per row); lambda bodies
    touch nothing but their own variables."""
    toks = tokens(normalized_text(text))
    shingle = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0)))
        shingle = F.zip_with(
            shingle,
            shifted,
            lambda a, b: F.when(
                a.isNull() | b.isNull(), F.lit(None)
            ).otherwise(F.concat(a, F.lit(" "), b)),
        )
    # zip_with pads the shorter side with null → trailing incomplete
    # shingles are null; drop them.
    return F.filter(shingle, lambda x: x.isNotNull())


def duplicate_ngram_fraction(text: Column, n: int = 3) -> Column:
    """Within-document repetition signal: the fraction of word n-gram
    OCCURRENCES that are repeats of an n-gram already seen in the same
    document — (total - distinct) / total over the shingle array. The
    dup-n-gram family of Gopher's repetition filters (Rae et al. 2021,
    the public quality-filter recipe) in occurrence-count form
    (documented variant: Gopher measures the character share; the
    occurrence share needs no second pass and ranks documents the same
    way for filtering).

    Pure within-row array math — NO shuffle, no explode: repetition
    scoring 100 TB is a map-only pass. NULL when the doc has no
    n-grams (shorter than n tokens) — callers treat it as "no signal",
    not 0 (a 2-token doc isn't repetition-free evidence)."""
    sh = word_shingles(text, n)
    total = F.size(sh)
    dups = (total - F.size(F.array_distinct(sh))).cast("double")
    return F.when(total > 0, dups / total.cast("double"))


def duplicate_line_fraction(text: Column) -> Column:
    """Fraction of line occurrences that repeat an earlier line of the
    SAME document (empty lines ignored) — boilerplate menus/footers
    pasted repeatedly inside one page. Same no-shuffle shape as
    duplicate_ngram_fraction; NULL when the doc has no non-empty
    lines."""
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    total = F.size(lines)
    dups = (total - F.size(F.array_distinct(lines))).cast("double")
    return F.when(total > 0, dups / total.cast("double"))


def winnowing_fingerprints(
    text: Column, n: int = 3, window: int = 4
) -> Column:
    """Winnowing (MOSS-style) document fingerprints: hash every word
    n-gram, then keep the MIN hash of each sliding window of ``window``
    consecutive hashes — the standard rolling-fingerprint selection that
    guarantees any shared substring of ≥ n+window-1 words contributes at
    least one common fingerprint between two documents.

    All expression-level: the window-min uses the same zip_with-of-shifted-
    copies trick as word_shingles (each slice evaluated once per row, no
    lambda capture of outer expressions). Hashes are md5 strings and the
    min is lexicographic, so any engine reproduces the selection exactly.
    Returns a sorted distinct array; empty when the doc has fewer than
    ``n + window - 1`` words."""
    h = F.transform(word_shingles(text, n), lambda s: F.md5(s))
    wmin = h
    for j in range(1, window):
        shifted = F.slice(h, j + 1, F.greatest(F.size(h) - j, F.lit(0)))
        wmin = F.zip_with(
            wmin,
            shifted,
            lambda a, b: F.when(a.isNull() | b.isNull(), F.lit(None)).otherwise(
                F.least(a, b)
            ),
        )
    # only full windows: positions 1 .. len(h) - window + 1
    full = F.slice(
        wmin, 1, F.greatest(F.size(h) - window + 1, F.lit(0))
    )
    return F.array_sort(F.array_distinct(F.filter(full, lambda x: x.isNotNull())))


#: PII regexes, applied in THIS order (email first so its digits/dots are
#: gone before the looser ip/phone classes run). Every pattern is in the
#: common Java-regex ∩ RE2 dialect — character classes, bounded repeats,
#: \d, \b — so the SQL oracle replays them verbatim in DuckDB.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Sequentially replace email → IPv4 → phone matches with typed
    placeholders. Pure regexp_replace chain: codegen'd, map-only — PII
    scrubbing 100 TB is a scan-speed pass with zero shuffle. The order is
    part of the contract (an email's digits must not survive into the
    phone pass)."""
    out = text
    for _kind, pattern, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def pii_counts(text: Column) -> Column:
    """Struct of per-kind match counts, computed on the SAME progressive
    redaction sequence ``redact_pii`` applies, so counts equal exactly
    what redaction removed (an IP inside an already-redacted email is not
    double-counted)."""
    fields = []
    cur = text
    for kind, pattern, placeholder in PII_PATTERNS:
        fields.append(
            F.size(F.regexp_extract_all(cur, F.lit(pattern), F.lit(0)))
            .cast("bigint")
            .alias("n_" + kind)
        )
        cur = F.regexp_replace(cur, pattern, placeholder)
    return F.struct(*fields)


def nfc_text(text: Column) -> Column:
    """Unicode NFC normalization (canonical composition — the fix for
    the same visible string hashing to different dedup keys because one
    source emitted combining sequences and another precomposed chars).

    Spark has no built-in normalizer, so this is the one function in
    this module that leaves the JVM: an Arrow-batched ``pandas_udf``
    over ``unicodedata.normalize`` (vectorized transfer, ~μs/row; shows
    as ArrowEvalPython in plans, never row-at-a-time BatchEvalPython).
    NFC only — NFKC's compatibility folds (① → 1, ﬁ → fi) change
    content and belong to an explicit cleaning policy, not a default.
    NULL passes through as NULL."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:  # noqa: ANN001 — Spark infers from hints
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    return _nfc(text)


def clean_whitespace(text: Column) -> Column:
    """Whitespace/control cleanup (the JVM-side half of text
    normalization, pure codegen'd regex): strip C0/C1 control chars
    except \\t \\n \\r, fold \\r\\n and \\r to \\n, collapse runs of
    spaces/tabs to one space, trim each line's edges, and drop leading/
    trailing blank lines. Newlines are PRESERVED — line structure is
    load-bearing for line_dedup and Gopher's line metrics."""
    c = F.regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    c = F.regexp_replace(c, "\\r\\n?", "\n")
    c = F.regexp_replace(c, "[ \\t]+", " ")
    c = F.regexp_replace(c, " ?\\n ?", "\n")
    c = F.regexp_replace(c, "\\n{2,}", "\n\n")  # ≥2 blank lines → one
    return F.regexp_replace(c, "^[\\n ]+|[\\n ]+$", "")
