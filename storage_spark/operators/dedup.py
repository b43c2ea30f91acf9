"""Deduplication operators for training-data pipelines (extension surface).

Five escalating strategies, each a pure DataFrame pipeline:

1. exact duplicates — hash groupBy (one shuffle, map-side combined);
2. fingerprint duplicates — exact over normalized-text md5;
3. n-gram Jaccard — inverted-index candidate join (explode shingles →
   equi-join → per-pair intersection counts), never an all-pairs product;
4. MinHash + banded LSH — per-doc signature mins, band-bucket equi-join;
   the at-scale near-dup plan (candidates only meet inside a band bucket);
5. SimHash — bitwise majority signature + Hamming-ball pairing.

Scale notes: every strategy's join key is content-derived (shingle, band
signature, simhash), so the shuffle distributes by content and skewed hot
shingles are the main hazard — the standard mitigation (drop
ultra-frequent shingles as stopword-shingles) is a filter on the inverted
index, see ``max_shingle_df``. All hashes are md5-based so results are
engine-portable and seed-stable; no RNG state.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from storage_spark.functions.text import fingerprint, word_shingles


def exact_duplicates(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Groups of rows identical on ``key_cols`` (count > 1)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fingerprint_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-content duplicate groups via normalized-text fingerprint."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition the doc side to full parallelism before expression-heavy
    explodes — but ONLY when the input is under-partitioned. Document tables
    often arrive as one file → one partition; the shingle/hash work below is
    CPU-bound and must fan out across cores (measured >10x on a single-file
    5k-doc corpus at 32 cores). A corpus that already has >= parallelism
    partitions (the normal case at 100 TB) passes through untouched: an
    unconditional repartition there is a gratuitous full shuffle of the
    dataset."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)


def _materialize(df: DataFrame, flag) -> DataFrame:
    """Self-join inputs are planned TWICE by Catalyst (no ReusedExchange
    across the two sides), so the expensive signature/index subplan pays
    double. Strategies (``flag``):

    - ``False`` — pure lazy transform (the shared subplan recomputes per
      consumer; right when the subplan is cheaper than materializing it);
    - ``True`` / ``"checkpoint"`` — eager ``localCheckpoint``: runs the
      subplan NOW as its own job and truncates lineage. Strongest
      isolation, but the materialization job is serial with everything
      downstream — the r5 sf1 probe measured it dominating curate_corpus
      (98 s at 50k docs);
    - ``"cache"`` / ``"disk"`` — lazy ``persist`` (MEMORY_AND_DISK /
      DISK_ONLY): the first consumer fills the cache as a side effect of
      its own job (no extra serial job), later consumers read
      InMemoryTableScan. Preferred at scale when the intermediate fits
      the chosen storage tier; lineage stays intact (no truncation).

    Lifetime of the persist strategies: the pinned blocks live until the
    session ends, ``spark.catalog.clearCache()`` (which also drops
    UNRELATED caches), or — the supported per-batch form — the enclosing
    ``materialize_scope()`` exits: every frame persisted inside the
    scope is unpersisted on exit, so a LOOP calling a persisting
    operator per batch frees each iteration's blocks
    (``with materialize_scope(): kept = curate_corpus(...,
    materialize="disk"); kept.collect()``). Without a scope, prefer
    ``"checkpoint"`` for unbounded loops (blocks are owned by the
    lineage and GC'd with the DataFrame)."""
    if flag is True or flag == "checkpoint":
        return pin_bounded(df)
    if flag in ("cache", "disk"):
        from pyspark import StorageLevel

        level = (
            StorageLevel.MEMORY_AND_DISK
            if flag == "cache"
            else StorageLevel.DISK_ONLY
        )
        df = df.persist(level)
        stack = getattr(_SCOPE_STACK, "frames", None)
        if stack:
            stack[-1].append(df)
        return df
    if flag is not False:
        raise ValueError(
            f"materialize must be False|True|'checkpoint'|'cache'|'disk', "
            f"got {flag!r}"
        )
    return df


_SCOPE_STACK = threading.local()


class _CheckpointPin:
    """Release handle for an eager ``localCheckpoint`` pin registered in
    a ``materialize_scope``. A checkpointed frame's blocks live in the
    block manager as the truncated RDD's cached partitions —
    ``DataFrame.unpersist()`` (the cache-manager route the persist
    strategies use) never touches them, so without this handle a long
    session accumulates every pin ever made (VERDICT r12 #4). Releasing
    reaches the RDD through the frame's ``LogicalRDD`` plan node.

    Contract difference vs a persist pin: a released CHECKPOINT frame is
    gone (lineage was truncated — consumers error), where a released
    persist frame recomputes. Both are covered by materialize_scope's
    existing rule: consume results INSIDE the block."""

    def __init__(self, df: DataFrame):
        self.df = df

    def unpersist(self) -> None:
        try:
            plan = self.df._jdf.queryExecution().analyzed()
            plan.rdd().unpersist(False)
        except Exception:  # noqa: BLE001 — release is best-effort
            pass


def pin_bounded(df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` of a BOUNDED (model / batch / sketch
    sized — never corpus-sized) table that the surrounding plan
    references more than once, registered for release with the active
    ``materialize_scope`` if one is open (VERDICT r12 #4: the r12 sweep
    pins had no unpersist path). Catalyst plans every reference to an
    unpersisted frame separately — no cross-reference reuse for
    broadcast builds — so an inline-fit subplan re-runs its corpus
    aggregation once PER reference; one eager checkpoint collapses that
    to one pass. Outside a scope the blocks live until the frame is
    garbage-collected (ContextCleaner) or the session ends — fine for
    one-shot queries, use a scope in composing loops."""
    if df.is_cached:
        return df
    out = df.localCheckpoint(eager=True)
    stack = getattr(_SCOPE_STACK, "frames", None)
    if stack:
        stack[-1].append(_CheckpointPin(out))
    return out


@contextlib.contextmanager
def materialize_scope():
    """Bounds the lifetime of ``materialize='cache'/'disk'`` blocks
    (ADVICE r6: the persisted handles were internal, so per-batch
    callers could only ``spark.catalog.clearCache()``, dropping
    unrelated caches too). Every frame a persist strategy pins inside
    the ``with`` block is registered here and unpersisted on exit —
    consume the results (collect/write) INSIDE the block; afterwards the
    lineage recomputes from source. Scopes nest (innermost owns); the
    registry is thread-local, matching Spark's one-driver-thread-per-
    job-group usage. Yields the list of pinned frames (diagnostics)."""
    frames: list[DataFrame] = []
    if not hasattr(_SCOPE_STACK, "frames"):
        _SCOPE_STACK.frames = []
    _SCOPE_STACK.frames.append(frames)
    try:
        yield frames
    finally:
        _SCOPE_STACK.frames.pop()
        for df in frames:
            df.unpersist()


def _cap_band_buckets(
    bands: DataFrame, bucket_cols: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Hot-bucket skew guard for band equi-joins: a degenerate band value
    (e.g. the all-zeros signature every near-empty doc hashes to) turns the
    self-join quadratic in that bucket's size. Like ``max_shingle_df`` on
    the inverted index, buckets above the cap are dropped — a documented
    recall trade for a bounded join (at 100 TB an uncapped hot bucket is a
    straggler task that never finishes)."""
    if max_bucket_size is None:
        return bands
    hot = (
        bands.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket_size)
        .select(*bucket_cols)
    )
    return bands.join(hot, bucket_cols, "left_anti")


def _doc_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int, max_shingle_df: int | None
) -> DataFrame:
    """Inverted index: one row per (doc, distinct shingle). Optionally drop
    shingles appearing in more than ``max_shingle_df`` docs (skew guard)."""
    idx = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("sh"),
    )
    if max_shingle_df is not None:
        hot = (
            idx.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh")
        )
        idx = idx.join(hot, "sh", "left_anti")
    return idx


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_jaccard: float = 0.3,
    max_shingle_df: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard similarity.

    Plan: inverted index self-join on shingle → count per pair (|A∩B|) →
    join per-doc sizes (|A|, |B|) → J = i / (|A|+|B|-i). Output columns:
    doc_a < doc_b, jaccard (double). The inverted index feeds THREE
    subplans (sizes + both join sides) — pass ``materialize=True`` to
    compute it once.
    """
    idx = _materialize(_doc_shingles(df, text_col, id_col, n, max_shingle_df), materialize)
    sizes = idx.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = idx.select(F.col("doc").alias("doc_a"), "sh")
    b = idx.select(F.col("doc").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("i").cast("double")
            / (F.col("na") + F.col("nb") - F.col("i")).cast("double"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_containment: float = 0.5,
    max_shingle_df: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Asymmetric near-containment: ordered pairs where
    ``|shingles(in) ∩ shingles(out)| / |shingles(in)|`` >= the threshold
    — "doc_in is (nearly) contained in doc_out".

    This is the dedup case symmetric Jaccard MISSES: a 200-word doc
    quoted whole inside a 20,000-word doc has J ≈ 0.01 (diluted by the
    long side) but containment ≈ 1.0 — exactly the boilerplate-wrapped
    repost / quote-stuffed aggregation shape a training corpus needs
    scrubbed. Same inverted-index plan as ``ngram_jaccard_pairs`` (the
    candidate join IS the intersection count — no new shuffle shape);
    both directions come from the one intersection table, so a mutual
    near-containment (≈ exact dup) emits both ordered rows.
    """
    idx = _materialize(
        _doc_shingles(df, text_col, id_col, n, max_shingle_df), materialize
    )
    sizes = idx.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = idx.select(F.col("doc").alias("doc_in"), "sh")
    b = idx.select(F.col("doc").alias("doc_out"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_in") != F.col("doc_out"))
        .groupBy("doc_in", "doc_out")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return (
        inter.join(
            sizes.select(
                F.col("doc").alias("doc_in"), F.col("n_sh").alias("n_in")
            ),
            "doc_in",
        )
        .withColumn(
            "containment",
            F.col("i").cast("double") / F.col("n_in").cast("double"),
        )
        .filter(F.col("containment") >= min_containment)
        .select("doc_in", "doc_out", "containment")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 8,
) -> DataFrame:
    """Per-doc MinHash signature: for each seed, min over shingles of
    md5(seed || ':' || shingle). md5-based → portable, seedable, no RNG.

    Shape matters at scale: explode shingles once, compute each seed's hash
    exactly once per (shingle, seed), then one groupBy with ``n_hashes``
    map-side-combined MIN aggregates — the naive per-seed
    ``array_min(transform(...))`` recomputes the shingle array per seed
    (measured 30x slower at sf0.1). Docs with no shingles drop out.
    """
    ex = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("sh"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{seed}:"), F.col("sh")))).alias(f"mh{seed}")
        for seed in range(n_hashes)
    ]
    return ex.groupBy("doc").agg(*aggs)


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """The persistable LSH index: one row per (doc, band, sig), where
    ``sig`` is the concatenated MinHash values of that band. This is the
    table a 100 TB pipeline stores (partitioned by ``band``) so that
    ingest batches probe it instead of re-shingling the corpus — see
    ``incremental_minhash_pairs``."""
    assert n_hashes % band_size == 0
    sigs = minhash_signatures(df, text_col, id_col, n, n_hashes)
    n_bands = n_hashes // band_size
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
            ).alias("sig"),
        )
        for b in range(n_bands)
    ]
    return sigs.select(
        "doc", F.explode(F.array(*band_structs)).alias("bs")
    ).select("doc", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def incremental_minhash_pairs(
    index: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
    max_band_df: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup candidates for an ingest BATCH against an already-indexed
    corpus, without touching corpus text.

    ``index`` is a prior ``minhash_band_index`` output (doc, band, sig).
    The batch's bands are computed with the same md5 generator, so equal
    shingle sets produce equal signatures across runs — then:

    - batch-vs-corpus candidates: equi-join batch bands against the index
      on (band, sig) — cost scales with the BATCH, not the corpus; with
      the index stored partitioned by ``band`` the join prunes to probed
      partitions;
    - batch-internal candidates: the usual self-join on the batch's own
      bands (batches are small; this is cheap).

    Returns ``(pairs, batch_bands)``: ``pairs`` has canonical
    (doc_a < doc_b) rows, and ``batch_bands`` is exactly the rows to
    APPEND to the index — the monotonic-ingest maintenance contract, same
    shape as ``incremental_exact_dedup``'s fingerprint index.
    """
    # pinned: the batch's band table feeds FOUR consumers (the corpus
    # probe, both self-join sides, and the returned append rows) — each
    # unpinned reference replayed the md5 x n_hashes shingle pipeline
    # over the batch (8 Generates in q_dedup_incremental's plan, r12
    # sweep). Bounded by the ingest batch, never the corpus;
    # scope-releasable via pin_bounded (r13).
    batch_bands = pin_bounded(
        minhash_band_index(batch, text_col, id_col, n, n_hashes, band_size)
    )
    probe = _cap_band_buckets(batch_bands, ["band", "sig"], max_band_df)
    cross = (
        index.select(F.col("doc").alias("_ix"), "band", "sig")
        .join(probe.select(F.col("doc").alias("_bt"), "band", "sig"),
              ["band", "sig"])
        .filter(F.col("_ix") != F.col("_bt"))
        .select(
            F.least("_ix", "_bt").alias("doc_a"),
            F.greatest("_ix", "_bt").alias("doc_b"),
        )
    )
    a = probe.select(F.col("doc").alias("doc_a"), "band", "sig")
    b = probe.select(F.col("doc").alias("doc_b"), "band", "sig")
    internal = (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    return cross.unionByName(internal).distinct(), batch_bands


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
    materialize: bool = False,
    max_band_df: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Signature of ``n_hashes`` md5-mins, split into bands of ``band_size``;
    docs sharing ANY band's full signature become a candidate pair (one
    explode → equi-join on (band, sig), never an all-pairs product).
    Output: doc_a < doc_b (distinct candidates — verify with
    ngram_jaccard_pairs on the candidates at scale).
    """
    bands = minhash_band_index(df, text_col, id_col, n, n_hashes, band_size)
    bands = _materialize(bands, materialize)  # before the cap: its agg +
    # anti-join would otherwise re-plan the full signature pipeline twice
    bands = _cap_band_buckets(bands, ["band", "sig"], max_band_df)
    a = bands.select(F.col("doc").alias("doc_a"), "band", "sig")
    b = bands.select(F.col("doc").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def band_pair_volume(
    bands: DataFrame, bucket_cols: list[str] | None = None
) -> DataFrame:
    """Pre-join candidate-volume audit for ANY banded LSH index frame —
    MinHash bands (``minhash_band_index``), SimHash segments, media
    fingerprint bands: per band, the EXACT number of candidate pairs the
    (band, sig) self-join will emit before ``distinct()``, which is
    Σ over buckets of C(size, 2), plus the largest bucket (the skew
    number a hot-bucket cap or AQE split must handle).

    This is the data-driven twin of ``multimodal.band_candidate_estimate``
    (r11): that closed form prices UNIFORM fingerprints a priori; MinHash
    signatures depend on corpus content, so there is no corpus-free
    formula — but the exact volume costs ONE map-side-combinable groupBy
    over the index (O(|bands| rows), no pair ever materialized), versus
    the join's O(candidates). A 100 TB planner therefore runs this audit
    FIRST and picks (n_hashes, band_size, max_band_df) BEFORE paying the
    candidate shuffle — the r12 1M-doc probe (tools/
    probe_r12_text_scale.py) is the measured use of exactly this audit.

    Output: one row per band — (band, n_buckets, max_bucket, candidates);
    ``sum(candidates)`` prices the stage, and a band whose volume is far
    off its siblings' indicates a degenerate hash or a hot signature.
    """
    cols = bucket_cols or ["band", "sig"]
    sz = F.count(F.lit(1)).alias("_sz")
    return (
        bands.groupBy(*cols)
        .agg(sz)
        .groupBy(cols[0])
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("_sz").cast("long").alias("max_bucket"),
            F.sum(
                F.col("_sz").cast("long") * (F.col("_sz") - 1).cast("long") / 2
            )
            .cast("long")
            .alias("candidates"),
        )
    )


def band_threshold(n_hashes: int, band_size: int) -> float:
    """The banded-LSH S-curve inflection ``(1/b)^(1/r)``: the Jaccard
    similarity at which a pair has ~50% candidate probability. Pick
    (n_hashes, band_size) so this sits just under the dedup threshold."""
    b = n_hashes // band_size
    return (1.0 / b) ** (1.0 / band_size)


def banding_sweep(
    df: DataFrame,
    configs: list[tuple[int, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> list[dict]:
    """Empirical banding-parameter sweep: for each ``(n_hashes, band_size)``
    run the banded pipeline once and record candidate-pair count next to
    the analytic threshold. Small config list → a driver loop over full
    distributed jobs (each config is one independent Spark job; at scale
    run them concurrently from separate threads if sweep latency matters).
    """
    out = []
    for n_hashes, band_size in configs:
        pairs = minhash_lsh_pairs(
            df, text_col=text_col, id_col=id_col, n=n,
            n_hashes=n_hashes, band_size=band_size,
        )
        out.append(
            {
                "n_hashes": n_hashes,
                "band_size": band_size,
                "n_bands": n_hashes // band_size,
                "threshold": round(band_threshold(n_hashes, band_size), 4),
                "candidate_pairs": pairs.count(),
            }
        )
    return out


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------

def _hex_digit_val(c: Column) -> Column:
    """Hex digit → 0..15 (base conversion; the oracle side uses
    position-in-'0123456789abcdef' — independent formulations)."""
    return F.conv(c, 16, 10).cast("int")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """SimHash over whitespace tokens: per bit, majority vote of
    md5(token) bits (+1/-1), packed little-endian into a BIGINT.

    Plan: explode tokens → n_bits/4 hex digits → per-bit sign sums per
    doc → pack. One shuffle (groupBy doc), all expression-level.

    Signature width is CORPUS-SIZED by default: with ``n_bits=None`` the
    width comes from ``sig_bits_for(n_docs)`` (``n_docs`` given, or one
    column-pruned ``df.count()`` when omitted — NOTE this count is an
    EAGER job that re-executes the full upstream lineage on every call;
    when ``df`` is an expensive plan, pass ``n_docs`` or count a
    materialized input once yourself). This is the knob
    the sf1 probe measured (NOTES_r5): a 16-bit signature on a 50k-doc
    corpus ran the banded join in 391 s because candidate pairs grow
    with the SQUARE of bucket occupancy; the sized 48-bit width ran the
    same operator in 6.5 s. Small corpora (≤ ~1k docs) derive the old
    16-bit default, so explicit sizing is only needed to reproduce a
    fixed configuration. An explicit ``n_bits`` more than 2× under the
    rule (checkable only when ``n_docs`` is also passed) warns.

    The chosen width is recorded as metadata on the ``simhash`` column,
    so ``simhash_near_pairs`` bands the signature correctly without the
    caller re-stating it.
    """
    from storage_spark.functions.text import normalized_text, tokens

    if n_bits is None:
        if n_docs is None:
            n_docs = df.count()
        n_bits = min(60, ((sig_bits_for(n_docs) + 3) // 4) * 4)
    elif n_docs is not None and sig_bits_for(n_docs) > 2 * n_bits:
        import warnings

        warnings.warn(
            f"simhash n_bits={n_bits} is >2x under the sizing rule for "
            f"n_docs={n_docs} (rule: {sig_bits_for(n_docs)} bits); the "
            "banded join's buckets will blow up — see dedup.sig_bits_for",
            stacklevel=2,
        )
    if not 4 <= n_bits <= 60 or n_bits % 4:
        raise ValueError("n_bits must be a multiple of 4 in [4, 60]")
    toked = _spread(df).select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(normalized_text(F.col(text_col)))).alias("tok"),
    )
    h = F.md5(F.col("tok"))
    n_digits = n_bits // 4
    digit_vals = [
        _hex_digit_val(F.substring(h, i + 1, 1)) for i in range(n_digits)
    ]
    bit_sums = []
    for i in range(n_digits):
        d = digit_vals[i]
        for b in range(4):
            bit = F.floor(d / (2**b)) % 2
            bit_sums.append(
                F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"s{i * 4 + b}")
            )
    sums = toked.groupBy("doc").agg(*bit_sums)
    packed = None
    for k in range(n_bits):
        term = F.when(F.col(f"s{k}") > 0, F.lit(2**k)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return sums.select(
        "doc",
        packed.cast("bigint").alias("simhash", metadata={"sig_bits": n_bits}),
    )


def simhash16(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """16-bit SimHash (see ``simhash`` for the generalized form and the
    signature-width-vs-corpus-size sizing rule)."""
    return simhash(df, text_col, id_col, n_bits=16)


def sig_bits_for(n_docs: int, max_hamming: int = 3, target_bucket: int = 16) -> int:
    """Signature width that keeps the banded join's buckets bounded: with
    ``b = max_hamming + 1`` pigeonhole bands, each band carries
    ``bits // b`` bits, so a (band, value) bucket holds on average
    ``n_docs / 2^(bits // b)`` docs — candidate pairs grow with its
    SQUARE. Solve for average occupancy <= ``target_bucket`` and round
    up to whole bands, capped at the 60-bit BIGINT packing limit.

    This is the knob the sf1 probe quantified (NOTES_r5): at 50k docs,
    16-bit signatures (16 values per 4-bit band) ran the banded join in
    391 s; this function returns 48, which ran in 6.5 s — same operator,
    right width. Size from the CORPUS, not the sample you tested on.
    """
    import math

    b = max_hamming + 1
    per_band = max(1, math.ceil(math.log2(max(2, n_docs // max(1, target_bucket)))))
    return min(60, max(16, per_band * b))


def embedding_planes_for(
    n_docs: int, n_bands: int = 2, target_bucket: int = 200
) -> tuple[int, int]:
    """(n_planes, band_size) for banded hyperplane LSH, sized so the
    average (band, value) bucket holds ≤ ``target_bucket`` vectors:
    ``band_size = log2(n_docs / target_bucket)`` clamped to [4, 16],
    ``n_planes = n_bands * band_size``. Same square-law rationale as
    ``sig_bits_for``; per-pair cost here is one dot product so buckets
    can run larger than simhash's. The sf1 probe measured the anchor
    points (NOTES_r5): at 50k docs the old static default (8 planes /
    4-bit bands) ran 244 s; this rule returns (16, 8), which ran 18.7 s
    recalling 89,998 of 90,000 planted near-dup pairs. Small corpora
    (≤ ~3k docs) derive the old (8, 4) default."""
    import math

    band = math.ceil(math.log2(max(2, n_docs // max(1, target_bucket))))
    band = min(16, max(4, band))
    return n_bands * band, band


def _band_bounds(width: int, n_bands: int) -> list[tuple[int, int]]:
    """Split ``width`` bits into ``n_bands`` contiguous (offset, width)
    chunks whose sizes differ by at most one."""
    base, extra = divmod(width, n_bands)
    bounds, off = [], 0
    for i in range(n_bands):
        w = base + (1 if i < extra else 0)
        bounds.append((off, w))
        off += w
    return bounds


def simhash_near_pairs(
    sim: DataFrame,
    max_hamming: int = 3,
    doc_col: str = "doc",
    sim_col: str = "simhash",
    sig_bits: int | None = None,
    materialize: bool = False,
    max_band_df: int | None = None,
) -> DataFrame:
    """Pairs within a Hamming ball, by pigeonhole banding: split the
    ``sig_bits`` signature into ``max_hamming + 1`` disjoint bit-bands. A
    pair with hamming ≤ max_hamming differs in at most max_hamming bands,
    so it agrees EXACTLY on at least one band — candidates meet in a
    (band, band_value) equi-join, never an all-pairs product, and the exact
    bit_count(xor) filter then keeps only true hits. Output is identical to
    the naive crossJoin (banding only prunes pairs the hamming filter would
    reject); the shuffle is content-distributed by band value, same scale
    story as the MinHash bands above.

    ``sig_bits=None`` (default) reads the width ``simhash`` recorded as
    column metadata, so the default path bands exactly the corpus-sized
    signature — banding a wide signature as 16 bits would silently put
    every doc's low 16 bits in the same key space (the measured cliff).
    A signature column without that metadata requires an explicit
    ``sig_bits``."""
    if sig_bits is None:
        meta = sim.schema[sim_col].metadata or {}
        sig_bits = meta.get("sig_bits")
        if sig_bits is None:
            raise ValueError(
                f"column {sim_col!r} carries no sig_bits metadata (not "
                "produced by dedup.simhash?) — pass sig_bits explicitly"
            )
    n_bands = max_hamming + 1
    assert n_bands <= sig_bits, "need at least one bit per band"
    s = sim.select(F.col(doc_col).alias("doc"), F.col(sim_col).alias("h"))
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("h"), off)
            .bitwiseAND(F.lit((1 << w) - 1))
            .alias("val"),
        )
        for i, (off, w) in enumerate(_band_bounds(sig_bits, n_bands))
    ]
    bands = s.select(
        "doc", "h", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc", "h", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    bands = _materialize(bands, materialize)  # before the cap: its agg +
    # anti-join would otherwise re-plan the full signature pipeline twice
    bands = _cap_band_buckets(bands, ["band", "val"], max_band_df)
    a = bands.select(
        F.col("doc").alias("doc_a"), F.col("h").alias("ha"), "band", "val"
    )
    b = bands.select(
        F.col("doc").alias("doc_b"), F.col("h").alias("hb"), "band", "val"
    )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()  # a pair may agree on several bands
    )


def dedup_components(
    pairs: DataFrame,
    doc_a: str = "doc_a",
    doc_b: str = "doc_b",
    nodes: DataFrame | None = None,
    max_iterations: int = 50,
    algorithm: str = "label",
) -> DataFrame:
    """Connected components over near-dup pairs: every document converges
    to ``component`` = the MIN doc id reachable through any chain of pairs.
    This replaces greedy pair-drop dedup — a whole near-dup CLUSTER keeps
    exactly one representative even when the pair list only connects it
    transitively (a~b, b~c but not a~c).

    Two physical strategies, same contract:

    - ``algorithm="label"`` (default): iterative min-label propagation —
      per round, each node takes the min of its own label and its
      neighbors' labels (one equi-join + groupBy per round), with
      ``localCheckpoint`` truncating lineage so round N's plan does not
      replay rounds 1..N-1. Converges in O(graph diameter) rounds;
      near-dup graphs are dense clusters with tiny diameters, so 2-3
      rounds is typical.
    - ``algorithm="star"``: alternating large-star/small-star contraction
      (Kiveris et al., "Connected Components in MapReduce and Beyond") —
      O(log n) rounds regardless of diameter, the scale path for graphs
      with long chains (e.g. transitive fuzzy-match chains at 100 TB).

    Both RAISE if ``max_iterations`` rounds pass without convergence —
    returning unconverged labels would silently merge/split clusters.

    ``nodes`` optionally supplies the full document set so singletons (no
    pairs) appear with ``component = doc``.
    """
    edges = pairs.select(F.col(doc_a).alias("a"), F.col(doc_b).alias("b"))
    edges = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    if nodes is None:
        nodes_df = edges.select(F.col("a").alias("doc")).distinct()
    else:
        nodes_df = nodes.select(F.col(nodes.columns[0]).alias("doc")).distinct()
    if algorithm == "star":
        return _components_star(edges, nodes_df, max_iterations)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}; use 'label' or 'star'")
    labels = nodes_df.select("doc", F.col("doc").alias("component"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("doc").alias("a"), F.col("component").alias("la")
                ),
                "a",
            )
            .groupBy(F.col("b").alias("doc"))
            .agg(F.min("la").alias("nbr"))
        )
        new_labels = (
            labels.join(nbr_min, "doc", "left")
            .select(
                "doc",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.select("doc", F.col("component").alias("old")), "doc"
            )
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        # round N-1's checkpoint blocks are dead once new_labels is
        # materialized and the changed probe consumed both sides —
        # release them so the loop holds ONE round of labels in executor
        # storage instead of all of them (r13, guide §5)
        _CheckpointPin(labels).unpersist()
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"dedup_components(label) did not converge in {max_iterations} rounds "
        "— a pair chain is longer than max_iterations hops; raise "
        "max_iterations or use algorithm='star' (O(log n) rounds)"
    )


def _components_star(
    edges: DataFrame, nodes_df: DataFrame, max_iterations: int
) -> DataFrame:
    """Large-star/small-star contraction. ``edges`` is the symmetric edge
    list. Each round:

    - large-star: per node u, link every STRICTLY LARGER neighbor to
      m = min(N(u) ∪ {u});
    - small-star: orient edges child=max/parent=min; per child u, link u
      and all its (≤) parents to the minimum parent.

    Fixpoint: the edge set is a union of stars rooted at each component's
    minimum; labels fall out as (child → root) ∪ (root → root).
    Convergence check per round = one exceptAll().limit(1).count() probe —
    the same O(1)-row action shape as the label path's `changed` probe.
    """
    cur = edges.filter(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)
    for _ in range(max_iterations):
        # Large-star: group the symmetric adjacency by u.
        sym = cur.unionByName(cur.select(F.col("b").alias("a"), F.col("a").alias("b")))
        grouped = sym.groupBy("a").agg(F.collect_set("b").alias("nbrs"))
        m = F.array_min(F.array_append(F.col("nbrs"), F.col("a")))
        large = (
            grouped.select(
                F.explode(F.filter("nbrs", lambda v: v > F.col("a"))).alias("v"),
                m.alias("m"),
            )
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        # Small-star over large-star output: child = max end, parent = min end.
        oriented = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("p")
        )
        grouped2 = oriented.groupBy("u").agg(F.collect_set("p").alias("ps"))
        m2 = F.array_min(F.col("ps"))
        small = (
            grouped2.select(
                F.explode(F.array_append(F.col("ps"), F.col("u"))).alias("v"),
                m2.alias("m"),
            )
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = (
            small.exceptAll(cur).limit(1).count()
            + cur.exceptAll(small).limit(1).count()
        )
        # release the superseded round's edge checkpoint (see the label
        # loop); `small` is already materialized and the convergence
        # probe consumed both sides
        _CheckpointPin(cur).unpersist()
        cur = small
        if changed == 0:
            # Stars: every edge is (child, root). Labels = children ∪ roots
            # ∪ singletons.
            child = cur.select(F.col("a").alias("doc"), F.col("b").alias("component"))
            return (
                nodes_df.join(child, "doc", "left")
                .select(
                    "doc",
                    F.coalesce(F.col("component"), F.col("doc")).alias("component"),
                )
            )
    raise RuntimeError(
        f"dedup_components(star) did not converge in {max_iterations} rounds"
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    key_col: str = "key",
    vector_col: str = "embedding",
    max_distance: float = 0.2,
    dim: int | None = 64,
    n_planes: int | None = None,
    band_size: int | None = None,
    exact: bool = False,
    materialize: bool = False,
    arrow: bool = False,
    max_band_df: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs under a distance threshold.

    Default (scale) path: banded random-hyperplane LSH — each vector gets an
    ``n_planes``-bit signature (functions.vectors.lsh_signature), split into
    ``n_planes / band_size`` bands; candidate pairs share at least one whole
    band (equi-join on (band, band_value)), then the exact cosine distance
    filter keeps real near-dups. Same bucketed-equi-join shape as
    lsh_ann_join / the MinHash bands: the corpus shuffles once by content,
    never an all-pairs product. Recall < 1 is the LSH trade (tuned by
    n_planes / band_size); ``exact=True`` keeps the exhaustive crossJoin as
    the small-input / recall-measurement baseline.

    Signature geometry is CORPUS-SIZED by default: with
    ``n_planes=band_size=None`` both come from
    ``embedding_planes_for(n_docs)`` (``n_docs`` given, or one
    column-pruned count when omitted — NOTE that count is an EAGER job
    re-executing the full upstream lineage per call; pass ``n_docs``
    when ``vectors`` is an expensive plan) — the static 8-plane/4-bit-band
    config the sf1 probe measured at 244 s on 50k docs derives only for
    small corpora; 50k docs derive the measured (16, 8) = 18.7 s config.
    Pass both explicitly to pin a configuration (an explicit band_size
    2× under the rule warns when ``n_docs`` is also known).
    """
    from storage_spark.functions.vectors import (
        cosine_distance,
        dot,
        hyperplanes,
        lsh_signature,
        norm,
    )

    if exact:
        a = vectors.select(F.col(key_col).alias("key_a"), F.col(vector_col).alias("va"))
        b = vectors.select(F.col(key_col).alias("key_b"), F.col(vector_col).alias("vb"))
        return (
            a.crossJoin(b)
            .filter(F.col("key_a") < F.col("key_b"))
            .withColumn("distance", cosine_distance(F.col("va"), F.col("vb")))
            .filter(F.col("distance") < max_distance)
            .select("key_a", "key_b", "distance")
        )
    if (n_planes is None) != (band_size is None):
        raise ValueError(
            "pass BOTH n_planes and band_size (a pinned config) or "
            "NEITHER (corpus-sized via embedding_planes_for)"
        )
    if n_planes is None:
        if n_docs is None:
            n_docs = vectors.count()
        n_planes, band_size = embedding_planes_for(n_docs)
    elif n_docs is not None:
        rule_band = embedding_planes_for(n_docs)[1]
        if rule_band >= 2 * band_size:
            import warnings

            warnings.warn(
                f"band_size={band_size} is >=2x under the sizing rule for "
                f"n_docs={n_docs} (rule: {rule_band}-bit bands); candidate "
                "pairs grow with the square of bucket occupancy — see "
                "dedup.embedding_planes_for",
                stacklevel=2,
            )
    if n_planes % band_size:
        raise ValueError(
            f"n_planes={n_planes} must be a multiple of band_size="
            f"{band_size} (bands split the signature evenly)"
        )
    n_bands = n_planes // band_size
    # A dim/plane-length mismatch silently zero-collapses every signature
    # (zip_with null-pads → dot folds NULL → every bit '0' → one giant
    # bucket): fail loudly instead. With an explicit dim the guard is a
    # LAZY per-row assert_true fused into the scan — no extra driver job;
    # only dim=None pays a one-row probe to size the hyperplanes.
    if dim is None:
        probe = vectors.select(F.size(F.col(vector_col)).alias("d")).first()
        # empty corpus: any plane length yields empty output
        dim = probe["d"] if probe is not None else 1
    planes = hyperplanes(dim, n_planes)
    sig = lsh_signature(F.col(vector_col), planes)
    # fuse the dim guard INTO the signature expression (a separate
    # dropped column would be pruned away and never evaluate):
    # assert_true yields NULL on success, raises on the first bad row
    sig = F.when(
        F.assert_true(
            F.size(F.col(vector_col)) == dim,
            F.lit(f"embedding dimension != dim={dim}"),
        ).isNull(),
        sig,
    )
    # Precompute the norm ONCE PER ROW (not per candidate pair): per-pair
    # work drops to a single dot product. The pairwise expression
    # dot/(na*nb) is bit-identical to cosine_distance's dot/(norm*norm) —
    # same left-folded doubles, same operation order.
    from storage_spark.functions.partitioning import spread_small_input

    v = spread_small_input(vectors).select(
        F.col(key_col).alias("key"),
        F.col(vector_col).alias("vec"),
        norm(F.col(vector_col)).alias("nrm"),
        sig.alias("sig"),
    )
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.substring(F.col("sig"), i * band_size + 1, band_size).alias("val"),
        )
        for i in range(n_bands)
    ]
    bands = v.select(
        "key", "vec", "nrm", F.explode(F.array(*band_structs)).alias("b")
    ).select(
        "key", "vec", "nrm", F.col("b.band").alias("band"), F.col("b.val").alias("val")
    )
    bands = _materialize(bands, materialize)  # before the cap: its agg +
    # anti-join would otherwise re-plan the full signature pipeline twice
    bands = _cap_band_buckets(bands, ["band", "val"], max_band_df)
    a = bands.select(
        F.col("key").alias("key_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), "band", "val",
    )
    b = bands.select(
        F.col("key").alias("key_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), "band", "val",
    )
    if arrow:
        from storage_spark.functions.vectors import cosine_distance_arrow

        dist = cosine_distance_arrow(
            F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
        )
    else:
        dist = F.lit(1.0) - dot(F.col("va"), F.col("vb")) / (
            F.col("na") * F.col("nb")
        )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("distance", dist)
        .filter(F.col("distance") < max_distance)
        .select("key_a", "key_b", "distance")
        .distinct()  # a pair may share several bands
    )


def resolve_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    prefer: Column | None = None,
    doc_a: str = "doc_a",
    doc_b: str = "doc_b",
    algorithm: str = "label",
) -> DataFrame:
    """The resolution stage that turns near-dup PAIRS into a kept corpus:
    close pairs transitively (``dedup_components``), then elect exactly one
    canonical representative per cluster and flag everyone else a casualty.

    Election is deterministic: highest ``prefer`` value wins (default =
    whitespace token count, i.e. "keep the longest document" — the common
    curation policy, since near-dup clusters usually contain truncated or
    boilerplate-trimmed variants of one source), ties broken by MIN doc id.

    Returns one row per input doc:
    ``(doc, component, canonical, is_canonical)``.

    Scale shape: beyond the component closure itself, election is ONE
    partially-aggregated shuffle on ``component`` (a lexicographic
    struct-min — no window function, so no per-partition sort of the full
    corpus) plus a broadcast-size join of the winners table back onto the
    membership rows only when clusters are few; Catalyst picks the join
    strategy from runtime stats under AQE.
    """
    from storage_spark.functions.text import token_count

    if prefer is None:
        prefer = token_count(F.col("text"))
    ranked = docs.select(
        F.col(id_col).alias("doc"), prefer.alias("_pref")
    )
    comp = dedup_components(
        pairs, doc_a=doc_a, doc_b=doc_b,
        nodes=docs.select(id_col), algorithm=algorithm,
    )
    member = comp.join(ranked, "doc")
    # struct-min is lexicographic: (-pref, doc) ascending == highest pref,
    # then lowest doc — a single partial-aggregable expression.
    winners = member.groupBy("component").agg(
        F.min(F.struct((-F.col("_pref")).alias("np"), F.col("doc").alias("d")))
        .alias("w")
    ).select("component", F.col("w.d").alias("canonical"))
    return (
        member.join(winners, "component")
        .select(
            "doc",
            "component",
            "canonical",
            (F.col("doc") == F.col("canonical")).alias("is_canonical"),
        )
    )


def incremental_exact_dedup(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fp",
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against an existing corpus without touching the
    corpus text: the corpus is represented only by its fingerprint ``index``
    (one 16-char md5 prefix per retained doc — the shape you keep as a
    bucketed table at 100 TB and grow monotonically).

    Two rules, both set-oriented:
    - within-batch: keep the MIN id per fingerprint group;
    - cross-corpus: drop any batch doc whose fingerprint already exists in
      the index (left-anti equi-join on ``fp``).

    Returns ``(kept, new_index_rows)`` — callers append ``new_index_rows``
    to the index table to absorb the batch.

    Scale shape: one map-side-combined groupBy on ``fp`` over the (small)
    batch plus one anti-join against the index. With the index stored
    bucketed on ``fp`` (``sources/layout.py``), the big side needs NO
    shuffle — only the batch redistributes; without bucketing it is one
    hash-join shuffle keyed on uniformly-distributed md5 (no skew by
    construction).
    """
    fps = batch.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias(fp_col)
    )
    first_in_batch = fps.groupBy(fp_col).agg(F.min(id_col).alias(id_col))
    fresh = first_in_batch.join(
        index.select(fp_col), fp_col, "left_anti"
    )
    kept = batch.join(fresh.select(id_col), id_col, "left_semi")
    return kept, fresh.select(fp_col, F.col(id_col).alias("first_" + id_col))


def semantic_cells_for(n_docs: int, target_cell: int | None = None) -> int:
    """Cluster count balancing semantic dedup's TWO per-doc cost terms:
    the cell ASSIGNMENT scans every centroid (``n x cells`` distance
    evals) while the within-cell pairing scans every cell-mate
    (``n x occupancy / 2``). Total ≈ ``n²/occupancy + n·occupancy/2``,
    minimized at occupancy ``≈ sqrt(2n)`` — i.e. ``cells = ceil(
    sqrt(n/2))``, the same sqrt shape as IVF practice (and the
    SemDeDup paper's ~11k clusters at 100M docs). Capped at 65536 (the
    centroid-broadcast ceiling shared with the ANN index geometry; it
    binds only past ~8.6e9 docs).

    The r7 sf1 probe measured why a FIXED target occupancy is the wrong
    rule here (NOTES_r7) — at 20k docs, eps=0.55, local[32]:

    ====================  =====  ======
    rule                  cells  wall
    ====================  =====  ======
    occupancy 32            625  309 s   (assignment-dominated)
    occupancy 128           157   85 s
    sqrt(n/2) (this rule)   100   59 s
    occupancy 512            40   36 s   (box constants favor fewer)
    occupancy 2048            10   57 s   (pair-dominated)
    ====================  =====  ======

    The sqrt rule is within ~1.6x of the measured optimum across the
    sweep and — unlike any fixed occupancy — stays near-optimal as n
    grows 1000x (a fixed 128 would be 50x off at 10^9 docs, with the
    assignment term paying the difference). ``target_cell`` overrides
    with a fixed occupancy (``ceil(n/target_cell)`` cells) for callers
    tuning recall: larger cells = fewer boundary-split misses.
    Same size-from-the-CORPUS discipline as ``sig_bits_for`` /
    ``embedding_planes_for``: a cluster count tuned on a 50k sample is
    quadratically wrong on the 50M corpus."""
    import math

    if target_cell is not None:
        return min(65536, max(1, math.ceil(n_docs / max(1, target_cell))))
    return min(65536, max(1, math.ceil(math.sqrt(max(0, n_docs) / 2))))


def _semantic_assigned(
    vectors: DataFrame,
    key_col: str,
    vector_col: str,
    n_clusters: int | None,
    kmeans_iterations: int,
    n_docs: int | None,
) -> DataFrame:
    """Shared first stage of the semantic-dedup family: cluster the corpus
    with the IVF coarse quantizer and return one row per doc —
    ``(doc, vec, nrm, cell, cdist)`` where ``cdist`` is the cosine distance
    to the doc's OWN centroid (the SemDeDup keep-priority signal).

    ``n_clusters=None`` derives via ``semantic_cells_for`` (NOTE: when
    ``n_docs`` is also omitted that derivation is an EAGER count
    re-executing the full upstream lineage — pass ``n_docs`` when
    ``vectors`` is an expensive plan). An explicit cluster count ≥4×
    under the rule warns (4×, not the 2× the other sizing rules use —
    the cost basin around the sqrt rule is flat; see the inline note):
    too few clusters is the square-law hazard.
    """
    from storage_spark.functions.vectors import (
        cosine_distance,
        ivf_assign,
        ivf_centroids,
        ivf_centroids_kmeans,
        norm,
    )

    if n_clusters is None:
        if n_docs is None:
            n_docs = vectors.count()
        n_clusters = semantic_cells_for(n_docs)
    elif n_docs is not None:
        rule = semantic_cells_for(n_docs)
        # 4x, not the 2x the other sizing rules use: the r7 probe showed
        # the cost basin around the sqrt rule is FLAT (2.5x-under beat
        # the rule at 20k docs — box constants favor fewer cells); the
        # square-law pairing term only dominates well past 4x under
        if rule >= 4 * n_clusters:
            import warnings

            warnings.warn(
                f"n_clusters={n_clusters} is >=4x under the sizing rule for "
                f"n_docs={n_docs} (rule: {rule} clusters); within-cluster "
                "pair work grows with the SQUARE of cluster size — see "
                "dedup.semantic_cells_for",
                stacklevel=3,
            )
    from storage_spark.functions.partitioning import spread_small_input

    # the per-vector cell argmin (n_clusters x dim dots per row) fuses
    # into the scan stage; a one-file input would serialize it (r13)
    base = spread_small_input(vectors.select(key_col, vector_col))
    if kmeans_iterations > 0:
        cents = ivf_centroids_kmeans(
            base, n_clusters, iterations=kmeans_iterations,
            key_col=key_col, vector_col=vector_col,
        )
    else:
        cents = ivf_centroids(base, n_clusters, key_col, vector_col)
    assigned = ivf_assign(base, cents, "cosine", key_col, vector_col)
    a = assigned.join(F.broadcast(cents), "cell").select(
        F.col(key_col).alias("doc"),
        F.col(vector_col).alias("vec"),
        norm(F.col(vector_col)).alias("nrm"),
        F.col("cell"),
        cosine_distance(F.col(vector_col), F.col("centroid")).alias("cdist"),
    )
    return a


def _factored_pair_cosine() -> Column:
    """The shared pair-distance expression of the semantic family:
    ``1 - dot(va, vb) / (na * nb)`` over per-ROW precomputed norms —
    bit-identical to ``cosine_distance``'s dot/(norm*norm) (same
    left-folded doubles, same operation order), kept in ONE place so
    the three pair joins and their DuckDB oracles can never diverge."""
    from storage_spark.functions.vectors import dot

    return F.lit(1.0) - dot(F.col("va"), F.col("vb")) / (
        F.col("na") * F.col("nb")
    )


def semantic_cluster_pairs(
    vectors: DataFrame,
    key_col: str = "key",
    vector_col: str = "embedding",
    eps: float = 0.07,
    n_clusters: int | None = None,
    kmeans_iterations: int = 0,
    max_cell_size: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Within-cluster semantic near-dup pairs (SemDeDup candidate stage,
    Abbas et al. 2023, arXiv:2303.09540): cluster embeddings with the IVF
    coarse quantizer, then full pairwise cosine INSIDE each cluster —
    pairs at distance < ``eps`` are semantic duplicates. Returns
    ``(doc_a, doc_b, cell, distance)`` with ``doc_a < doc_b``.

    Scale shape: the corpus shuffles ONCE by ``cell`` and the self-join is
    an equi-join on it — pair work is Σ c(c-1)/2 over cluster sizes,
    balanced against the n×cells assignment scan by
    ``semantic_cells_for``'s sqrt(n/2) rule (plus the ``max_cell_size``
    guard for degenerate hot clusters). The recall trade
    vs ``embedding_near_dup_pairs``' banded LSH: a near-dup pair SPLIT
    ACROSS a cluster boundary is never considered — that miss is inherent
    to cluster-scoped dedup (SemDeDup accepts it; quantify it with the
    LSH operator when it matters). What clustering buys over LSH bands:
    candidate quality — members of a cluster are ALL mutually comparable,
    so the pair stage wastes no distance evals on hash collisions, and
    the clusters themselves are reusable corpus structure (mixing,
    analysis, IVF search share the same quantizer).

    Determinism: ``kmeans_iterations=0`` (default) uses the first-n
    deterministic quantizer — fully replayable in plain SQL; Lloyd rounds
    refine cluster balance at the cost of that replay (results remain
    deterministic, just not closed-form).
    """
    a = _semantic_assigned(
        vectors, key_col, vector_col, n_clusters, kmeans_iterations, n_docs,
    )
    # pin the assignment before the self-join: both join sides (and the
    # cap's hot-cell aggregation) re-ran the n x cells assignment scan
    # per reference (the semantic_dedup finding, r12). DISK_ONLY persist
    # with lineage kept, not localCheckpoint — corpus-sized frame; see
    # semantic_dedup's ranked pin for the scale rationale (r13)
    a = _materialize(a, "disk")
    # the hot-cell guard scopes the PAIR join only — a capped cluster's
    # docs simply form no pairs (they stay in semantic_dedup's output as
    # kept=true, the documented recall trade; silently dropping the DOCS
    # would break the one-row-per-doc contract downstream)
    a = _cap_band_buckets(a, ["cell"], max_cell_size)
    lhs = a.select(
        F.col("doc").alias("doc_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), "cell",
    )
    rhs = a.select(
        F.col("doc").alias("doc_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), "cell",
    )
    dist = _factored_pair_cosine()
    return (
        lhs.join(rhs, "cell")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("distance", dist)
        .filter(F.col("distance") < eps)
        .select("doc_a", "doc_b", "cell", "distance")
    )


def semantic_dedup(
    vectors: DataFrame,
    key_col: str = "key",
    vector_col: str = "embedding",
    eps: float = 0.07,
    n_clusters: int | None = None,
    kmeans_iterations: int = 0,
    resolution: str = "rank",
    max_cell_size: int | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Semantic (embedding-space) dedup, SemDeDup-style: cluster the
    corpus, find within-cluster pairs at cosine distance < ``eps``, keep
    one representative per duplicate group. Returns one row per doc:
    ``(doc, cell, cent_rank, kept)``.

    Keep priority follows the paper: the member FARTHEST from its
    centroid survives (low centroid-similarity examples carry the most
    marginal information; the cluster core is what's redundant).
    ``cent_rank`` is that priority — rank 1 = farthest, ties by doc id.

    Two resolution strategies:

    - ``"rank"`` (default): a doc is dropped iff SOME higher-priority doc
      in its cluster sits within ``eps``. One windowed rank per cluster +
      the pair equi-join + an anti-join — no iteration. This is the
      common production form (e.g. NVIDIA NeMo Curator's semantic dedup).
      Relative to transitive grouping it UNDER-drops: a doc whose only
      eps-neighbor is a lower-priority (itself-dropped) doc survives,
      where the strict transitive reading folds the whole chain into one
      group. Every rank-dropped doc is also components-dropped (a doc
      with a higher-priority eps-neighbor is never its component's
      maximum), so "rank" is the conservative, iteration-free choice.
    - ``"components"``: transitive closure over the pair graph
      (``dedup_components``) + highest-``cdist`` canonical election
      (``resolve_canonical``) — exactly one survivor per CONNECTED group,
      the strict reading of the paper, at the cost of the iterative
      closure.

    Scale shape = ``semantic_cluster_pairs`` (one shuffle by cell,
    assignment/pairing balanced by the derived sqrt-rule cluster count)
    plus, for "rank", a per-cell window (bounded by cluster size, never
    corpus size).
    """
    from pyspark.sql import Window

    # validate the cheap string BEFORE _semantic_assigned, whose
    # derived-cluster path may run an eager full-corpus count
    if resolution not in ("rank", "components"):
        raise ValueError(
            f"unknown resolution {resolution!r}; use 'rank' or 'components'"
        )
    a = _semantic_assigned(
        vectors, key_col, vector_col, n_clusters, kmeans_iterations, n_docs,
    )
    w = Window.partitionBy("cell").orderBy(F.col("cdist").desc(), F.col("doc").asc())
    # pin the ranked assignment: it feeds BOTH self-join sides and the
    # final keep-join (3 references), and Catalyst plans each reference
    # separately — the n x cells assignment scan (the expensive half of
    # this operator) re-ran per reference; replaying it costs
    # O(n·cells·dim) twice more — strictly worse at every scale
    # (measured r12: 4.1 → 3.4 s steady at sf0.1, identical rows).
    # DISK_ONLY persist, not localCheckpoint (r13, guide §5): this is a
    # CORPUS-sized frame — a checkpoint truncates lineage, so at scale
    # an executor loss makes the job unrecoverable, and the pinned
    # blocks compete with shuffle for executor memory. The lazy persist
    # keeps lineage (recomputable), fills during the first consumer's
    # own job (no serial materialization job — BlockManager's
    # per-partition block lock dedupes concurrent fills), and registers
    # with materialize_scope for release.
    ranked = _materialize(
        a.withColumn("cent_rank", F.row_number().over(w)), "disk"
    )
    # hot-cell guard: capped clusters form no pairs, so their members all
    # come back kept=true (recall trade, never a dropped doc)
    pairable = _cap_band_buckets(ranked, ["cell"], max_cell_size)
    # ONE rank-ordered pair join serves both resolutions: ranks are
    # distinct within a cell, so ra < rb enumerates each unordered pair
    # exactly once, with doc_hi the higher-priority (kept-first) side
    lhs = pairable.select(
        F.col("doc").alias("doc_hi"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), F.col("cent_rank").alias("ra"), "cell",
    )
    rhs = pairable.select(
        F.col("doc").alias("doc_lo"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), F.col("cent_rank").alias("rb"), "cell",
    )
    pairs = (
        lhs.join(rhs, "cell")
        .filter(F.col("ra") < F.col("rb"))
        .filter(_factored_pair_cosine() < eps)
        .select("doc_hi", "doc_lo")
    )
    if resolution == "rank":
        removed = (
            pairs.select(F.col("doc_lo").alias("doc"))
            .distinct()
            .withColumn("_rm", F.lit(True))
        )
        return (
            ranked.join(removed, "doc", "left")
            .select(
                "doc", "cell", "cent_rank",
                F.col("_rm").isNull().alias("kept"),
            )
        )
    # components: edge direction is irrelevant (dedup_components
    # symmetrizes), so the rank-ordered pairs double as the edge list
    res = resolve_canonical(
        ranked.select("doc", "cdist"), pairs, id_col="doc",
        prefer=F.col("cdist"), doc_a="doc_hi", doc_b="doc_lo",
    )
    return (
        res.join(ranked.select("doc", "cell", "cent_rank"), "doc")
        .select("doc", "cell", "cent_rank", F.col("is_canonical").alias("kept"))
    )


def semantic_cluster_stats(
    vectors: DataFrame,
    key_col: str = "key",
    vector_col: str = "embedding",
    n_clusters: int | None = None,
    kmeans_iterations: int = 0,
    n_docs: int | None = None,
) -> DataFrame:
    """Corpus-structure report over the semantic quantizer's cells: one
    row per cell with occupancy and centroid-distance shape —
    ``(cell, n_docs, mean_cdist_1e4, max_cdist_1e4, p50x2_cdist_1e4)``
    (the median is stored DOUBLED — twice a median of integers is
    always integral, so the value casts exactly in every engine, where
    a bare ``.5`` median would truncate in one and round in another).
    The diagnostic read before semantic dedup / mixing / IVF tuning:
    hot cells (skewed occupancy) say the quantizer needs more cells or
    a Lloyd refinement; a large mean radius says the cell is a grab-bag
    (eps inside it means little); near-zero radius says a template
    flood.

    Exactness: each doc's centroid distance is quantized to an integer
    (``round(cdist * 1e4)``) BEFORE aggregation, so the per-cell sums /
    maxes / medians are integer math — order-free, engine-exact —
    without the ordered-fold machinery ``mean_pool_embeddings`` needs
    for full-precision means. One broadcast assign + one
    map-side-combined shuffle on ``cell``.
    """
    a = _semantic_assigned(
        vectors, key_col, vector_col, n_clusters, kmeans_iterations, n_docs,
    )
    q = a.select(
        "cell", F.round(F.col("cdist") * 10000).cast("bigint").alias("_cd"),
    )
    return (
        q.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("_cd") / F.count(F.lit(1))).cast("bigint")
            .alias("mean_cdist_1e4"),
            F.max("_cd").alias("max_cdist_1e4"),
            F.expr("CAST(2 * median(_cd) AS BIGINT)").alias("p50x2_cdist_1e4"),
        )
    )


def incremental_semantic_dedup(
    batch: DataFrame,
    index_vectors: DataFrame,
    centroids: DataFrame,
    key_col: str = "key",
    vector_col: str = "embedding",
    eps: float = 0.07,
    max_cell_size: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Semantic-dedup an ingest BATCH against an already-indexed corpus —
    the monotonic-ingest form of ``semantic_dedup``, same contract shape
    as ``incremental_exact_dedup`` / ``incremental_minhash_pairs``.

    ``index_vectors`` is the stored per-cell corpus ``(key, embedding,
    cell)`` (a prior ``ivf_assign`` output, kept partitioned by ``cell``
    at scale so the probe join prunes partitions); ``centroids`` is the
    quantizer the index was built with — the batch is assigned with the
    STORED centroids, never a re-derivation (re-deriving would shift
    cell boundaries under the existing postings and silently miss index
    neighbors).

    Drop rules (both set-oriented, one equi-join on ``cell`` each):
    - batch-vs-index: a batch doc within ``eps`` of ANY index doc in its
      cell drops — the index is settled, it always wins;
    - batch-internal: the ``semantic_dedup`` rank rule among batch docs
      sharing a cell (farthest-from-centroid priority, ties by key).

    Returns ``(kept, new_index_rows)``: ``kept`` preserves every batch
    column (left-semi on the surviving keys); ``new_index_rows`` is
    exactly the ``(key, embedding, cell)`` rows to APPEND to the index.
    Cost scales with the BATCH times cell occupancy, never the corpus.

    ``max_cell_size`` caps only the batch-INTERNAL pairing (a batch
    flooding one cell); the vs-index gate is never skipped — capping it
    would re-append already-indexed docs on every re-ingest. A hot
    INDEX cell is a quantizer-sizing problem (``semantic_cells_for``,
    Lloyd rounds at build), not one this guard can mask.
    """
    from pyspark.sql import Window

    from storage_spark.functions.vectors import (
        cosine_distance,
        ivf_assign,
        norm,
    )

    assigned = ivf_assign(
        batch.select(key_col, vector_col), centroids, "cosine",
        key_col, vector_col,
    )
    b = assigned.join(F.broadcast(centroids), "cell").select(
        F.col(key_col).alias("doc"),
        F.col(vector_col).alias("vec"),
        norm(F.col(vector_col)).alias("nrm"),
        "cell",
        cosine_distance(F.col(vector_col), F.col("centroid")).alias("cdist"),
    )
    w = Window.partitionBy("cell").orderBy(F.col("cdist").desc(), F.col("doc").asc())
    ranked = b.withColumn("cent_rank", F.row_number().over(w))
    # the hot-cell cap scopes the BATCH-INTERNAL pairing only: the
    # vs-index gate must see EVERY batch doc, or a capped cell would
    # skip the "index always wins" check and re-append duplicates on
    # every re-ingest (breaking the documented idempotency). A hot
    # INDEX cell is a quantizer-sizing problem, fixed at index build
    # (semantic_cells_for / Lloyd rounds), not maskable here.
    pairable = _cap_band_buckets(ranked, ["cell"], max_cell_size)
    dist = _factored_pair_cosine()
    # batch-vs-index: the index row is 'a' (always wins)
    ix = index_vectors.select(
        F.col(key_col).alias("ix_key"), F.col(vector_col).alias("va"),
        norm(F.col(vector_col)).alias("na"), "cell",
    )
    vs_index = (
        ix.join(
            ranked.select(
                F.col("doc").alias("doc_lo"), F.col("vec").alias("vb"),
                F.col("nrm").alias("nb"), "cell",
            ),
            "cell",
        )
        .filter(dist < eps)
        .select("doc_lo")
    )
    # batch-internal: higher cent-rank priority wins (semantic_dedup rule)
    lhs = pairable.select(
        F.col("vec").alias("va"), F.col("nrm").alias("na"),
        F.col("cent_rank").alias("ra"), "cell",
    )
    rhs = pairable.select(
        F.col("doc").alias("doc_lo"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), F.col("cent_rank").alias("rb"), "cell",
    )
    internal = (
        lhs.join(rhs, "cell")
        .filter(F.col("ra") < F.col("rb"))
        .filter(dist < eps)
        .select("doc_lo")
    )
    removed = vs_index.unionByName(internal).distinct().select(
        F.col("doc_lo").alias(key_col)
    )
    survivors = assigned.join(removed, key_col, "left_anti")
    kept = batch.join(survivors.select(key_col), key_col, "left_semi")
    return kept, survivors.select(key_col, vector_col, "cell")


# --------------------------------------------------------------------------
# Exact substring dedup (Lee et al. 2022, arXiv:2107.06499 — "Deduplicating
# Training Data Makes Language Models Better", the ExactSubstr operator).
# The paper builds a suffix array over the concatenated corpus and reports
# byte ranges duplicated verbatim across documents; the set-oriented
# equivalent is a rolling k-token shingle inverted index — every length-≥k
# verbatim repeat is exactly a maximal run of consecutive duplicated
# k-shingles, so hash shingles → keep hashes seen in ≥2 distinct docs →
# merge each doc's matched positions into spans (gaps-and-islands).
# --------------------------------------------------------------------------

#: Token separator inside a shingle hash — a byte that cannot appear in a
#: whitespace-split token, so 'ab c'+'d' and 'ab'+'cd' hash differently.
_SHINGLE_SEP = "\x01"


def _positioned_shingles(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """One row per (doc, 1-based token position, md5 of the k tokens starting
    there). Tokenization is a plain single-space split so any SQL engine
    reproduces it bit-for-bit; plug a different tokenizer by pre-splitting
    into a text column of space-joined tokens.

    The token array is PROJECTED before the higher-order transform so the
    lambda body only touches bound variables and column references — the
    word_shingles lambda-capture hazard (re-evaluating the split per
    element) does not apply.
    """
    from storage_spark.functions.partitioning import spread_small_input

    base = spread_small_input(df).select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("_toks")
    ).withColumn("_n", F.size("_toks") - F.lit(k) + 1)
    hashes = F.when(
        F.col("_n") >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.col("_n"), F.lit(1))),
            lambda i: F.md5(
                F.array_join(F.slice(F.col("_toks"), i, k), _SHINGLE_SEP)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        "doc_id", F.posexplode(hashes).alias("_p0", "h")
    ).select("doc_id", (F.col("_p0") + 1).cast("long").alias("pos"), "h")


def exact_substring_spans(
    df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_df: int = 2,
) -> DataFrame:
    """Cross-document verbatim spans of ≥k tokens: ``(doc_id, span_start,
    span_end)`` with 1-based inclusive start / exclusive end token offsets.

    Plan (all equi-joins + one per-doc window — no pairwise comparison):
    positioned k-shingles → groupBy hash HAVING count(DISTINCT doc) >=
    min_doc_df (map-side-combined; the duplicated-hash table is tiny next
    to the corpus) → semi-join back → per-doc gaps-and-islands merge of the
    matched positions (two spans merge when the next start is ≤ the running
    end — touching runs are one contiguous duplicated range).

    100 TB story: the shuffle key is the shingle hash (uniform by
    construction); the only window is PARTITIONED BY doc, so no global
    ordering exists anywhere. Zipf-head shingles are already length-k token
    sequences — far rarer than single-token heads; a stopword-shingle cap is
    unnecessary at k ≥ 8 (and would change results).
    """
    from pyspark.sql.window import Window

    sh = _positioned_shingles(df, k, text_col, id_col)
    dup = (
        sh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_doc_df)
        .select("h")
    )
    matched = sh.join(dup, "h", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_span = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        matched.withColumn("_new", new_span)
        .withColumn("_g", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "_g")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def strip_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove every token covered by a span (ALL copies of a duplicated
    run, the released ExactSubstr tool's behavior) and re-join the
    survivors with single spaces. Within-row array math: the spans list is
    collected per doc (bounded — spans are disjoint post-merge) and each
    token index tests membership with ``exists`` in one projection."""
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = F.split(F.col(text_col), " ")
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("_spans"),
            lambda s: (s["span_start"] <= i + 1) & (i + 1 < s["span_end"]),
        ),
    )
    out_text = F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(
        F.array_join(kept, " ")
    )
    n_removed = F.when(F.col("_spans").isNull(), F.lit(0)).otherwise(
        F.size(toks) - F.size(kept)
    )
    return (
        df.join(per_doc, df[id_col] == per_doc["doc_id"], "left")
        .drop(per_doc["doc_id"])
        .select(
            *[c for c in df.columns if c != text_col],
            out_text.alias(text_col),
            n_removed.cast("long").alias("n_tokens_removed"),
        )
    )


def substring_shingle_stats(
    df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The persistable corpus state for incremental exact-substring dedup:
    per k-shingle hash, the three-valued distinct-doc state ``(h, n_docs,
    solo_doc)`` with ``n_docs`` CAPPED at 2 — cross-doc duplication only
    distinguishes 0 / 1(who) / ≥2 distinct docs, so the capped state is
    exact AND closed under merge (unlike a raw count, which double-counts
    a doc re-contributing the same shingle). ``solo_doc`` is the one doc
    when n_docs = 1, NULL otherwise. Row count ≤ distinct shingles —
    smaller than the positioned postings, carries no positions (the batch
    side supplies its own positions at probe time)."""
    return (
        _positioned_shingles(df, k, text_col, id_col)
        .groupBy("h")
        .agg(
            F.least(F.count_distinct("doc_id"), F.lit(2)).cast("int").alias("n_docs"),
            F.when(
                F.count_distinct("doc_id") == 1, F.min("doc_id")
            ).alias("solo_doc"),
        )
    )


def merge_substring_stats(stats: DataFrame) -> DataFrame:
    """Compact appended stats rows back to one row per hash (the epoch-
    compaction step): ≥2 anywhere → ≥2; two solo rows naming DIFFERENT
    docs → ≥2; all solo rows naming one doc → still that solo. Exact by
    the three-valued-state argument in ``substring_shingle_stats``."""
    return (
        stats.groupBy("h")
        .agg(
            F.max("n_docs").alias("_mx"),
            F.count_distinct("solo_doc").alias("_ns"),
            F.min("solo_doc").alias("_solo"),
        )
        .select(
            "h",
            F.when((F.col("_mx") >= 2) | (F.col("_ns") >= 2), F.lit(2))
            .otherwise(F.lit(1)).cast("int").alias("n_docs"),
            F.when(
                (F.col("_mx") == 1) & (F.col("_ns") == 1), F.col("_solo")
            ).alias("solo_doc"),
        )
    )


def incremental_substring_spans(
    index: DataFrame,
    batch: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Exact-substring spans for a NEW batch against an existing corpus
    WITHOUT re-shingling the corpus — the fourth member of the
    incremental family (exact fingerprints, MinHash bands, semantic
    cells, now substring shingles). ``index`` is a
    ``substring_shingle_stats`` table (possibly with unmerged appended
    rows — merged here, associatively).

    A batch position is duplicated iff ≥2 distinct docs across
    (corpus ∪ batch) carry its shingle — since the batch doc itself
    always contributes 1, that is exactly "anyone else has it". The
    merged three-valued state answers that with ONE equi-join on the
    batch's own hashes; the corpus is touched only through the index.

    Returns ``(spans, batch_stats)`` — spans in the same
    ``(doc_id, span_start, span_end)`` shape as ``exact_substring_spans``
    (and EQUAL to a full recompute restricted to batch docs — tested);
    append ``batch_stats`` to the index table to absorb the batch,
    compacting with ``merge_substring_stats`` on your epoch cadence.
    """
    from pyspark.sql.window import Window

    bsh = _positioned_shingles(batch, k, text_col, id_col)
    bstats = (
        bsh.groupBy("h")
        .agg(
            F.least(F.count_distinct("doc_id"), F.lit(2)).cast("int").alias("n_docs"),
            F.when(
                F.count_distinct("doc_id") == 1, F.min("doc_id")
            ).alias("solo_doc"),
        )
    )
    merged = merge_substring_stats(
        merge_substring_stats(index).unionByName(bstats)
    )
    dup = merged.filter(F.col("n_docs") >= 2).select("h")
    matched = bsh.join(dup, "h", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_span = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    spans = (
        matched.withColumn("_new", new_span)
        .withColumn(
            "_g", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("doc_id", "_g")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )
    return spans, bstats


def _ccnet_normalize(line: Column) -> Column:
    """CCNet's paragraph-hash normalization (Wenzek et al. 2019,
    arXiv:1911.00359 §3.1, lightened to the SQL-expressible core):
    lowercase, trim, fold every digit to '0'. Accent/punctuation folding
    is tokenizer territory — documented out, not silently approximated."""
    return F.regexp_replace(F.lower(F.trim(line)), "[0-9]", "0")


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    mode: str = "keep_first",
    normalize: bool = True,
    min_len: int = 0,
    group_col: str | None = None,
) -> DataFrame:
    """Line/paragraph-level dedup across the WHOLE corpus (CCNet's shard
    dedup, arXiv:1911.00359 — the step that strips boilerplate navigation
    lines, cookie banners, and repeated headers from web text): split each
    doc on ``sep``, hash the (optionally normalized) line, and rebuild
    every doc from its surviving lines in original order.

    Modes: ``keep_first`` keeps the globally-first occurrence of each
    distinct line (ordered by (doc_id, position) — deterministic);
    ``drop_all`` removes EVERY occurrence of any line that appears more
    than once (within- or cross-doc). Lines whose normalized form is
    shorter than ``min_len`` chars bypass dedup entirely (always kept);
    with the default 0, duplicate empty lines collapse too — exactly
    CCNet's behavior on repeated blank paragraphs.

    Output: the input columns with ``text_col`` rebuilt, plus
    ``n_lines`` / ``n_lines_kept`` / ``n_lines_removed``. A doc whose
    every line was deduplicated away keeps its row with empty text —
    downstream length filters decide its fate, not this operator.

    100 TB story: BOTH modes are pure double-sided aggregations — no
    window, no join against the line table. The winner (or the
    uniqueness proof) per line-hash is ``min(struct(doc_id, pos, line))``
    / ``count(*)`` in ONE groupBy, so the Zipf-head boilerplate line that
    appears in 100 M docs collapses in the map-side combiner instead of
    concentrating a window partition or a skewed join key. The rebuild
    groups by doc — the corpus's natural uniform key.
    """
    import re as _re

    if mode not in ("keep_first", "drop_all"):
        raise ValueError("mode must be 'keep_first' or 'drop_all'")
    from storage_spark.functions.partitioning import spread_small_input

    df = spread_small_input(df)
    toks = F.split(F.col(text_col), _re.escape(sep), -1)
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "line"),
    )
    norm = _ccnet_normalize(F.col("line")) if normalize else F.col("line")
    lines = lines.withColumn("_nl", norm)

    if group_col is not None:
        # group-scoped dedup (CCNet runs per language/shard group): the
        # hash key is salted with the group, so identical lines in
        # DIFFERENT groups never compete — same plan, same combiner.
        # The min_len exemption still tests the RAW normalized line.
        gmap = df.select(
            F.col(id_col).alias("doc_id"), F.col(group_col).alias("_grp")
        )
        lines = lines.join(gmap, "doc_id").withColumn(
            "_hk", F.concat(F.coalesce(F.col("_grp"), F.lit("")),
                            F.lit("\x01"), F.col("_nl"))
        ).drop("_grp")
    else:
        lines = lines.withColumn("_hk", F.col("_nl"))
    exempt = lines.filter(F.length("_nl") < min_len) if min_len > 0 else None
    parts = (
        lines.filter(F.length("_nl") >= min_len) if min_len > 0 else lines
    )
    grouped = parts.groupBy(F.md5("_hk").alias("h")).agg(
        F.count(F.lit(1)).alias("_c"),
        F.min(F.struct("doc_id", "pos", "line")).alias("_w"),
    )
    if mode == "drop_all":
        grouped = grouped.filter(F.col("_c") == 1)
    kept = grouped.select("_w.doc_id", "_w.pos", "_w.line")
    if exempt is not None:
        kept = kept.unionByName(exempt.select("doc_id", "pos", "line"))

    reb = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_nk"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("_txt"),
    )
    src = df.withColumn("_n_lines", F.size(toks))
    joined = src.join(
        reb, src[id_col] == reb["doc_id"], "left"
    ).drop(reb["doc_id"])
    return joined.select(
        *[c for c in df.columns if c != text_col],
        F.coalesce(F.col("_txt"), F.lit("")).alias(text_col),
        F.col("_n_lines").cast("long").alias("n_lines"),
        F.coalesce(F.col("_nk"), F.lit(0)).cast("long").alias("n_lines_kept"),
        (F.col("_n_lines") - F.coalesce(F.col("_nk"), F.lit(0)))
        .cast("long")
        .alias("n_lines_removed"),
    )


def _doc_lines(df: DataFrame, text_col: str, id_col: str, sep: str,
               normalize: bool) -> DataFrame:
    """(doc_id, pos, line, h) rows for line_dedup and its incremental
    index — one tokenization, shared by both paths."""
    import re as _re

    from storage_spark.functions.partitioning import spread_small_input

    df = spread_small_input(df)
    toks = F.split(F.col(text_col), _re.escape(sep), -1)
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "line"),
    )
    norm = _ccnet_normalize(F.col("line")) if normalize else F.col("line")
    return lines.withColumn("h", F.md5(norm))


def line_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    normalize: bool = True,
) -> DataFrame:
    """Persistable corpus state for incremental line dedup: one row per
    distinct (normalized) line hash — ``(h, n_occ, first_doc,
    first_pos)`` with ``n_occ`` CAPPED at 2 (dedup only distinguishes
    unseen / seen-once-where / seen-multiple, so the capped count is
    exact and closed under merge) and ``first`` = the global
    (doc_id, pos) minimum. Bounded by distinct lines, not corpus
    length; the fifth member of the incremental family (exact
    fingerprints, MinHash bands, semantic cells, substring shingles,
    now lines)."""
    return (
        _doc_lines(df, text_col, id_col, sep, normalize)
        .groupBy("h")
        .agg(
            F.least(F.count(F.lit(1)), F.lit(2)).cast("int").alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("_f"),
        )
        .select(
            "h", "n_occ",
            F.col("_f.doc_id").alias("first_doc"),
            F.col("_f.pos").alias("first_pos"),
        )
    )


def merge_line_stats(stats: DataFrame) -> DataFrame:
    """Epoch compaction for appended line-stats rows: capped counts
    saturate (2 anywhere → 2; two rows each 1 → 2), firsts take the
    global (doc, pos) minimum. Idempotent and order-free."""
    return (
        stats.groupBy("h")
        .agg(
            F.least(F.sum("n_occ"), F.lit(2)).cast("int").alias("n_occ"),
            F.min(F.struct(
                F.col("first_doc").alias("doc_id"),
                F.col("first_pos").alias("pos"),
            )).alias("_f"),
        )
        .select(
            "h", "n_occ",
            F.col("_f.doc_id").alias("first_doc"),
            F.col("_f.pos").alias("first_pos"),
        )
    )


def incremental_line_dedup(
    index: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    normalize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Line dedup for a NEW batch against the corpus-so-far WITHOUT
    re-splitting the corpus: a batch line survives iff its hash is NOT
    in ``index`` AND it is the first occurrence within the batch
    (keep-first, forward-only — the same contract as the other
    incremental paths: batches arrive after the corpus they probe).
    Returns ``(deduped_batch, batch_stats)`` where ``batch_stats`` is
    the batch's own ``line_stats`` to append + compact via
    ``merge_line_stats``.

    Equivalence (pinned by tests): when every batch doc sorts after
    every corpus doc, the result row-equals full-corpus
    ``line_dedup(mode='keep_first')`` restricted to batch docs.

    100 TB story: ONE left-anti equi-join of the batch's lines against
    the bounded index (never the corpus), then the same min-struct
    winner aggregation as line_dedup — no window, no skew surface
    beyond the hash join AQE already handles."""
    import re as _re

    lines = _doc_lines(batch, text_col, id_col, sep, normalize)
    fresh = lines.join(index.select("h"), "h", "left_anti")
    winners = fresh.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos", "line")).alias("_w")
    ).select("_w.doc_id", "_w.pos", "_w.line")

    toks = F.split(F.col(text_col), _re.escape(sep), -1)
    reb = winners.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_nk"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("_txt"),
    )
    src = batch.withColumn("_n_lines", F.size(toks))
    joined = src.join(
        reb, src[id_col] == reb["doc_id"], "left"
    ).drop(reb["doc_id"])
    out = joined.select(
        *[c for c in batch.columns if c != text_col],
        F.coalesce(F.col("_txt"), F.lit("")).alias(text_col),
        F.col("_n_lines").cast("long").alias("n_lines"),
        F.coalesce(F.col("_nk"), F.lit(0)).cast("long").alias("n_lines_kept"),
        (F.col("_n_lines") - F.coalesce(F.col("_nk"), F.lit(0)))
        .cast("long")
        .alias("n_lines_removed"),
    )
    return out, line_stats(batch, text_col, id_col, sep, normalize)


def boilerplate_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    normalize: bool = True,
    min_docs: int = 2,
) -> DataFrame:
    """Per-doc boilerplate SIGNAL (the RefinedWeb/CCNet-style quality
    feature, as a score rather than a rewrite): the fraction of a doc's
    lines whose normalized form appears in ≥ ``min_docs`` DISTINCT docs
    corpus-wide, as an exact integer ratio ``(doc_id, n_lines,
    n_boilerplate, ratio_x10000)``. Filters gate on it; ``line_dedup``
    is the rewrite for what survives.

    Same scale shape as line_dedup: the per-hash distinct-doc count is
    one map-side-combined groupBy (capped at min_docs — saturating
    early keeps the combiner effective on Zipf-head lines), then one
    equi-join back on the hash and a per-doc count. No window."""
    lines = _doc_lines(df, text_col, id_col, sep, normalize)
    dup = (
        lines.select("h", "doc_id").groupBy("h")
        .agg(F.least(F.count_distinct("doc_id"), F.lit(min_docs)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("h")
    )
    flagged = lines.join(dup, "h", "left_semi").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_nb")
    )
    totals = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_nl"))
    return (
        totals.join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_nl").cast("long").alias("n_lines"),
            F.coalesce(F.col("_nb"), F.lit(0)).cast("long")
            .alias("n_boilerplate"),
            F.expr(
                "CAST((coalesce(_nb, 0) * 10000) DIV _nl AS BIGINT)"
            ).alias("ratio_x10000"),
        )
    )
