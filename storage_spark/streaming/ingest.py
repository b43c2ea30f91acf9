"""Streaming corpus ingestion with incremental near-dup gating.

The continuous version of the batch curation flow: documents arrive as a
stream; each micro-batch is deduplicated against the PERSISTENT MinHash
band index (the corpus is never re-shingled — `dedup.minhash_band_index`
/ `incremental_minhash_pairs`), accepted docs land in the corpus store,
and their band rows are appended to the index so the NEXT batch probes
them too. Extension surface — the reference's queue layer moves objects,
not corpus text (SURVEY §2.10/§2.13).

Exactly-once effect on an at-least-once channel: `foreachBatch` can
replay a batch after a failure, so both sinks write through **per-epoch
dynamic partition overwrite** (`epoch=<id>` partition, overwritten on
replay) — a replayed epoch rewrites its own partition byte-for-byte
instead of appending duplicates. Readers just scan the directory; the
epoch column is dropped on read.

Rejection rule per batch (greedy, matching `curate_corpus`'s default):
a batch doc is rejected iff it band-collides with an indexed corpus doc
(corpus always wins, regardless of id) or with ANY lower-id doc of the
same batch — the lower-id doc's own fate is not consulted, so in a
chain A<B<C with pairs (A,B),(B,C), both B and C are rejected (greedy
over-delete, exactly curate_corpus's default; use its
resolution='components' mode upstream when one-survivor-per-cluster
semantics are required).

At 100 TB: the index lives partitioned by `band`, so a batch probe reads
only the band partitions it hashes into; per-epoch partitions are
compacted away periodically with ``compact_ingest_tables`` (replay of a
compacted epoch fails loudly — the same boundary checkpoint retention
already imposes; sources/snapshots.compact is the same motion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

INDEX_SCHEMA = T.StructType(
    [
        T.StructField("doc", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("sig", T.StringType()),
    ]
)


def _read_index(
    spark: SparkSession, index_path: str, exclude_epoch: int | None = None
) -> DataFrame:
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(index_path)
        if exclude_epoch is not None and "epoch" in df.columns:
            # a REPLAYED epoch must not probe the band rows its own
            # previous (partial) attempt wrote — that partition is about
            # to be overwritten anyway
            df = df.filter(F.col("epoch") != exclude_epoch)
        return df.select("doc", "band", "sig")
    except AnalysisException as ex:
        # ONLY the first-epoch bootstrap (no index yet) may fall back to
        # empty — a corrupt index or storage error must fail the batch,
        # or the gate silently ingests near-duplicates with no signal
        msg = str(ex)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return spark.createDataFrame([], INDEX_SCHEMA)
        raise


def _overwrite_epoch(df: DataFrame, path: str, epoch_id: int) -> None:
    (
        df.withColumn("epoch", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(path)
    )


def dedup_ingest_batch(
    batch: DataFrame,
    epoch_id: int,
    index_path: str,
    accepted_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
    on_id_reuse: str = "raise",
) -> None:
    """One micro-batch tick: gate ``batch`` against the persistent index,
    append survivors + their band rows (per-epoch overwrite, replay-safe).
    Exposed standalone so batch jobs and tests drive the exact code the
    stream runs.

    ``on_id_reuse`` decides what a doc id already accepted in a PRIOR
    epoch means: ``"raise"`` (default) kills the batch — right when the
    source is exactly-once upstream, where a reused id is corruption.
    ``"skip_exact"`` drops redeliveries whose ``text_col`` is IDENTICAL
    to the accepted row (the at-least-once upstream shape: the same doc
    arriving again under a new epoch is idempotently skipped) and raises
    only when the content differs — that is still a real id collision.
    """
    from storage_spark.operators.dedup import incremental_minhash_pairs

    from pyspark.errors import AnalysisException

    spark = batch.sparkSession
    # Intra-batch id discipline (ADVICE r6): exact (id, text) repeats
    # inside one batch collapse idempotently, but the same id carrying
    # DIFFERENT text is a real collision — the near-dup gate cannot see
    # it (pair canonicalization needs distinct ids), and silently picking
    # one row would ingest an arbitrary winner. ONE probe job over the
    # raw batch (map-side combinable countDistinct); the collapse itself
    # stays a lazy dropDuplicates in the main lineage, so no second
    # re-execution of an expensive batch source per tick (review r7).
    collided = (
        batch.groupBy(id_col)
        .agg(
            # countDistinct ignores NULLs: count a null-text variant as
            # one more distinct value so (null, "x") under one id raises
            (
                F.countDistinct(text_col)
                + F.max(F.when(F.col(text_col).isNull(), 1).otherwise(0))
            ).alias("_nt")
        )
        .filter(F.col("_nt") > 1)
        .limit(1)
        .count()
    )
    if collided:
        raise ValueError(
            f"batch epoch={epoch_id} carries the same {id_col} with "
            "differing text — an intra-batch id collision the near-dup "
            "gate cannot canonicalize; fix the source ids"
        )
    batch = batch.dropDuplicates([id_col, text_col])
    index = _read_index(spark, index_path, exclude_epoch=int(epoch_id))
    # Id uniqueness is the invariant the pair canonicalization relies on:
    # incremental_minhash_pairs drops index-vs-batch pairs with EQUAL ids,
    # so an id-reusing near-duplicate would silently bypass the gate and
    # append a second band-row set under the same doc id. Raise instead.
    # (The current epoch is excluded, so a replayed batch does NOT trip
    # this on its own previous partial write.) The probe reads the
    # ACCEPTED table's id column — one value per doc, column-pruned —
    # not the band index (n_bands rows per doc, and probing it whole
    # would defeat the read-only-your-band-partitions scaling story).
    if on_id_reuse not in ("raise", "skip_exact"):
        raise ValueError(
            f"on_id_reuse must be 'raise' or 'skip_exact', got {on_id_reuse!r}"
        )
    try:
        seen_full = spark.read.parquet(accepted_path)
        if "epoch" in seen_full.columns:
            seen_full = seen_full.filter(F.col("epoch") != int(epoch_id))
        seen = seen_full.select(F.col(id_col).alias("doc"))
    except AnalysisException as ex:
        if "PATH_NOT_FOUND" in str(ex) or "Path does not exist" in str(ex):
            seen = spark.createDataFrame(
                [], batch.select(F.col(id_col).alias("doc")).schema
            )
            seen_full = None
        else:
            raise
    if on_id_reuse == "skip_exact" and seen_full is not None:
        # At-least-once upstream: an already-accepted (id, text) pair
        # arriving again is a redelivery, not a collision — drop it
        # before the clash probe so only content-differing reuse raises.
        prior = seen_full.select(
            F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
        )
        batch = batch.join(prior, [id_col, text_col], "left_anti")
    clash = (
        batch.select(F.col(id_col).alias("doc"))
        .join(seen, "doc", "left_semi")
        .limit(5)
        .collect()
    )
    if clash:
        raise ValueError(
            f"batch reuses doc id(s) already in the index: "
            f"{sorted(r['doc'] for r in clash)} — ids must be unique "
            "across the corpus (mint new ids upstream"
            + (
                ", or the redelivered content differs from the accepted row"
                if on_id_reuse == "skip_exact"
                else "; at-least-once sources can pass on_id_reuse='skip_exact'"
            )
            + ")"
        )
    pairs, batch_bands = incremental_minhash_pairs(
        index,
        batch,
        text_col=text_col,
        id_col=id_col,
        n=n,
        n_hashes=n_hashes,
        band_size=band_size,
    )
    bids_a = batch.select(F.col(id_col).alias("doc_a"))
    bids_b = batch.select(F.col(id_col).alias("doc_b"))
    # corpus on either side → reject the batch side; batch-batch → reject
    # the greater id (canonical pairs have doc_a < doc_b)
    rej = (
        pairs.join(bids_a, "doc_a", "left_anti")
        .select(F.col("doc_b").alias("doc"))
        .unionByName(
            pairs.join(bids_b, "doc_b", "left_anti").select(
                F.col("doc_a").alias("doc")
            )
        )
        .unionByName(
            pairs.join(bids_a, "doc_a", "left_semi")
            .join(bids_b, "doc_b", "left_semi")
            .select(F.col("doc_b").alias("doc"))
        )
        .distinct()
    )
    accepted = batch.join(
        rej, batch[id_col] == rej["doc"], "left_anti"
    )
    # cache: accepted feeds two sinks; without it the gate recomputes
    accepted = accepted.localCheckpoint(eager=True)
    _overwrite_epoch(accepted, accepted_path, epoch_id)
    kept_bands = batch_bands.join(
        accepted.select(F.col(id_col).alias("doc")), "doc", "left_semi"
    )
    _overwrite_epoch(kept_bands, index_path, epoch_id)


def stream_dedup_ingest(
    stream: DataFrame,
    index_path: str,
    accepted_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
    trigger_available_now: bool = True,
    on_id_reuse: str = "raise",
):
    """Wire the gate into a streaming query. ``trigger_available_now=True``
    drains everything pending then stops (backfill / test mode); flip it
    off for a continuous processing-time trigger. ``on_id_reuse`` as in
    ``dedup_ingest_batch`` — pass ``"skip_exact"`` for at-least-once
    sources that may redeliver accepted documents across epochs."""

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        dedup_ingest_batch(
            batch,
            epoch_id,
            index_path,
            accepted_path,
            id_col=id_col,
            text_col=text_col,
            n=n,
            n_hashes=n_hashes,
            band_size=band_size,
            on_id_reuse=on_id_reuse,
        )

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_ingest_tables(
    spark: SparkSession,
    index_path: str,
    accepted_path: str,
    before_epoch: int,
    compacted_epoch: int = -1,
) -> dict:
    """Consolidate the per-epoch partitions both ingest sinks accumulate
    (one partition per micro-batch, forever) into a single
    ``epoch=compacted_epoch`` partition per table — the streaming
    analogue of ``annindex.ann_index_compact`` / ``snapshots.compact``.
    Row-preserving: the gate's reads (band probe, accepted-id probe) see
    the identical row set before and after, asserted in tests.

    REPLAY SAFETY — the one real contract: only compact epochs the
    stream's checkpoint can no longer replay (epochs at or below the
    last committed batch; ``before_epoch`` is EXCLUSIVE and must not
    exceed current_epoch, which a replay could still rewrite). Per-epoch
    overwrite is what makes replays idempotent, so a replay of an
    already-COMPACTED epoch cannot be idempotent anymore — it fails
    LOUDLY instead: its rows now live in the consolidated partition,
    which the replay's own-epoch exclusion does not exclude, so the
    id-reuse gate raises on the replayed ids (tested). That is the
    honest boundary, the same one checkpoint retention already imposes
    upstream.

    Crash-safety: the consolidated partition is written (dynamic
    per-partition overwrite of ``epoch=compacted_epoch``) BEFORE the old
    epoch directories are removed. A crash between the two leaves each
    leftover epoch's rows present TWICE (consolidated + original) —
    harmless to the gate meanwhile (its probes are set-membership
    reads) — and re-running the compaction heals it exactly BECAUSE the
    re-read deduplicates whole rows before rewriting: a leftover
    epoch's rows are byte-identical to their consolidated copies (both
    came from the same per-epoch overwrite), so ``dropDuplicates()``
    restores the exact pre-crash row set rather than baking the
    duplicates in. At cluster scale the localCheckpoint staging step
    becomes a temp-table write; the motion is identical.

    Returns ``{table: {"epochs_removed": [...], "rows": n}}``.
    """
    import os
    import shutil

    if compacted_epoch >= 0:
        raise ValueError(
            "compacted_epoch must be negative (real epochs are >= 0), "
            f"got {compacted_epoch}"
        )
    report: dict = {}
    for name, path in (("index", index_path), ("accepted", accepted_path)):
        df = spark.read.parquet(path)
        if "epoch" not in df.columns:
            raise ValueError(f"{path} is not epoch-partitioned")
        old = df.filter(F.col("epoch") < before_epoch).drop("epoch")
        # whole-row dedupe: after a crash between write and delete, a
        # leftover epoch's rows exist both consolidated and in their
        # original partition (byte-identical copies) — without this the
        # "re-run to heal" path would permanently double them
        old = old.dropDuplicates()
        # materialize BEFORE overwriting the consolidated partition the
        # plan reads from
        old = old.localCheckpoint(eager=True)
        n = old.count()
        _overwrite_epoch(old, path, compacted_epoch)
        removed = []
        for entry in sorted(os.listdir(path)):
            if not entry.startswith("epoch="):
                continue
            ep = int(entry.split("=", 1)[1])
            if 0 <= ep < before_epoch:
                shutil.rmtree(os.path.join(path, entry))
                removed.append(ep)
        report[name] = {"epochs_removed": removed, "rows": n}
    return report


LINE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("h", T.StringType()),
        T.StructField("n_occ", T.IntegerType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("first_pos", T.IntegerType()),
    ]
)


def line_scrub_ingest_batch(
    batch: DataFrame,
    epoch_id: int,
    index_path: str,
    accepted_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    normalize: bool = True,
) -> None:
    """One micro-batch tick of STREAMING line dedup (the CCNet scrub at
    ingest): every line already seen in a PRIOR epoch vanishes from the
    batch's docs (plus within-batch keep-first), rewritten docs land in
    the corpus store, and the batch's own ``line_stats`` rows append to
    the index so the NEXT batch scrubs against them too. The sixth
    surface of the incremental family gets its streaming form, same
    discipline as ``dedup_ingest_batch``: per-epoch dynamic partition
    overwrite on BOTH sinks, replay rewrites its own partition
    byte-for-byte, and a replayed epoch never probes its previous
    partial write (own-epoch exclusion).

    Unlike the near-dup gate there is no id-reuse hazard here — the
    index keys are line hashes, not doc ids — so redelivered docs simply
    scrub to the same bytes again (idempotent by the overwrite)."""
    from pyspark.errors import AnalysisException

    from storage_spark.operators.dedup import incremental_line_dedup

    spark = batch.sparkSession
    try:
        index = spark.read.parquet(index_path)
        if "epoch" in index.columns:
            index = index.filter(F.col("epoch") != int(epoch_id))
        index = index.select("h", "n_occ", "first_doc", "first_pos")
    except AnalysisException as ex:
        # first-epoch bootstrap only; any other read error must fail the
        # batch (same policy as _read_index)
        msg = str(ex)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        index = spark.createDataFrame([], LINE_STATS_SCHEMA)
    out, bstats = incremental_line_dedup(
        index, batch,
        text_col=text_col, id_col=id_col, sep=sep, normalize=normalize,
    )
    out = out.localCheckpoint(eager=True)  # feeds one sink; stats re-derive
    _overwrite_epoch(out, accepted_path, epoch_id)
    _overwrite_epoch(bstats, index_path, epoch_id)


def stream_line_scrub_ingest(
    stream: DataFrame,
    index_path: str,
    accepted_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    normalize: bool = True,
    trigger_available_now: bool = True,
):
    """Wire the line scrub into a streaming query (availableNow drain by
    default, same as ``stream_dedup_ingest``)."""

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        line_scrub_ingest_batch(
            batch, epoch_id, index_path, accepted_path,
            id_col=id_col, text_col=text_col, sep=sep, normalize=normalize,
        )

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_line_stats_table(
    spark: SparkSession,
    index_path: str,
    before_epoch: int,
    compacted_epoch: int = -1,
) -> int:
    """Consolidate per-epoch line-stats partitions through
    ``dedup.merge_line_stats`` — NOT row-preserving like
    ``compact_ingest_tables`` (stats rows MERGE: capped counts saturate,
    firsts take the global min), but scrub-preserving: the kept/dropped
    decision for any future batch depends only on hash MEMBERSHIP, which
    the merge preserves exactly (asserted in tests). Epochs at or above
    ``before_epoch`` keep their own partitions so their replays stay
    idempotent — only the no-longer-replayable tail merges. Same motion
    as ``compact_ingest_tables``: write the consolidated partition
    first, then remove the old epoch directories; a crash in between
    leaves hash duplicates that only saturate counts (never flip a
    membership probe), and re-running heals because merge_line_stats is
    idempotent over its own output. Returns the number of stats rows
    consolidated."""
    import os
    import shutil

    from storage_spark.operators.dedup import merge_line_stats

    if compacted_epoch >= 0:
        raise ValueError(
            "compacted_epoch must be negative (real epochs are >= 0), "
            f"got {compacted_epoch}"
        )
    df = spark.read.parquet(index_path)
    if "epoch" not in df.columns:
        raise ValueError(f"{index_path} is not epoch-partitioned")
    has_real_old = (
        df.filter(
            (F.col("epoch") >= 0) & (F.col("epoch") < before_epoch)
        ).limit(1).count()
    )
    if not has_real_old:
        return 0  # nothing newly compactable: re-run is a no-op
    old = df.filter(F.col("epoch") < before_epoch).drop("epoch")
    merged = merge_line_stats(old).localCheckpoint(eager=True)
    n = merged.count()
    _overwrite_epoch(merged, index_path, compacted_epoch)
    for entry in sorted(os.listdir(index_path)):
        if not entry.startswith("epoch="):
            continue
        ep = int(entry.split("=", 1)[1])
        if 0 <= ep < before_epoch:
            shutil.rmtree(os.path.join(index_path, entry))
    return n
