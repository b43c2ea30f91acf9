"""Usage aggregations — A1/A2/A6/A7 and the analytics extensions (A8).

Reference:
- size per bucket: migrations/tenant/0005-add-size-functions.sql:2-16
- object counts (full + capped existence count): pg.ts:498-535
- capped resource counts: src/storage/protocols/iceberg/pg.ts:576-595

Sums are carried in integral types (sizes are bytes) so distributed partial
aggregation is exact and order-insensitive (float sums would differ
run-to-run across partitionings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_usage(objects: DataFrame) -> DataFrame:
    """Total size + object count per bucket (A1+A2). Partial aggregation
    (map-side combine) makes this one small shuffle of one row per
    (partition, bucket)."""
    return objects.groupBy("bucket_id").agg(
        F.sum("size").alias("total_size"),
        F.count(F.lit(1)).alias("n_objects"),
    )


def capped_count(df: DataFrame, cap: int) -> DataFrame:
    """COUNT capped at ``cap`` without scanning past it — the reference's
    existence-count trick `SELECT count(*) FROM (SELECT 1 … LIMIT cap)`
    (pg.ts:498-535). Spark's LocalLimit short-circuits the scan the same
    way."""
    return df.limit(cap).select(F.count(F.lit(1)).alias("n"))


def salted_usage(
    objects: DataFrame,
    group_col: str = "bucket_id",
    salt_buckets: int = 16,
    salt_col: str | None = "name",
) -> DataFrame:
    """Two-stage salted form of bucket_usage. Results are identical
    (integral sums are associative).

    Operating regime — measured, not assumed (NOTES_r4 §salting): in
    SPARK, salting aggregation buys nothing for sums/counts (map-side
    partial combine already collapses a hot key to one row per map
    partition before the shuffle) NOR for count(DISTINCT) (the dedup
    Exchange is keyed (group, value) — plan-verified). Measured on a
    10 M-row namespace with one key holding 50% of rows: plain vs salted
    within ±15% both AQE on and off, no skew cliff anywhere. Salting
    aggregation pays on engines lacking those rewrites, and for holistic
    aggregates (collect_list/collect_set) whose partial buffers carry
    the hot key's whole value list to one reducer — though there the
    OUTPUT itself is per-key, so the real 100 TB advice is to not
    collect hot-key lists at all. Join-side skew is AQE's job
    (test_skew.py). Kept as the two-stage template; results identical
    to bucket_usage (integral sums are associative).
    """
    if salt_col is not None and salt_col in objects.columns:
        salt_src = F.xxhash64(F.col(salt_col))
    else:
        # no designated salt column: hash the whole row (any deterministic
        # spreader works — the two-stage sums recombine identically)
        salt_src = F.xxhash64(*[F.col(c) for c in objects.columns])
    salt = F.pmod(salt_src, F.lit(salt_buckets))
    stage1 = (
        objects.groupBy(F.col(group_col), salt.alias("_salt"))
        .agg(
            F.sum("size").alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return stage1.groupBy(group_col).agg(
        F.sum("_s").alias("total_size"), F.sum("_n").alias("n_objects")
    )


def distinct_usage(
    objects: DataFrame,
    group_col: str = "bucket_id",
    distinct_col: str = "name",
) -> DataFrame:
    """Exact distinct-value count per group (distinct object names per
    bucket — the dedup-audit number). Spark plans ``count(DISTINCT x)``
    with the dedup Exchange keyed on (group, x) — verified in the
    physical plan, NOTES_r4 §salting — so even this is natively
    skew-safe here; the salted variant below is the engine-portable /
    bounded-buffer template, not a Spark speedup."""
    return objects.groupBy(group_col).agg(
        F.count_distinct(F.col(distinct_col)).alias("n_distinct")
    )


def salted_distinct_usage(
    objects: DataFrame,
    group_col: str = "bucket_id",
    distinct_col: str = "name",
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact distinct count via a value-derived salt: every distinct
    value lands in exactly one salt bucket, so per-(group, salt)
    distinct counts SUM to the exact per-group count (equality
    property-tested in test_skew.py). In Spark this matches
    ``distinct_usage`` in time (its dedup shuffle is already keyed
    (group, value)); the two-stage form is for engines that key the
    dedup on group alone, and it bounds any single reducer's hash table
    at 1/salt_buckets of a hot group's value set."""
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salt_buckets))
    stage1 = objects.groupBy(F.col(group_col), salt.alias("_salt")).agg(
        F.count_distinct(F.col(distinct_col)).alias("_nd")
    )
    return stage1.groupBy(group_col).agg(
        F.sum("_nd").alias("n_distinct")
    )


def owner_usage(objects: DataFrame) -> DataFrame:
    """Per-owner rollup — extension of A1 (marked non-reference in SURVEY
    §2.4/A8): grouping-sets usage analytics."""
    return objects.rollup("bucket_id", "owner_id").agg(
        F.sum("size").alias("total_size"),
        F.count(F.lit(1)).alias("n_objects"),
    )


def usage_delta_from_changes(changes: DataFrame) -> DataFrame:
    """Fold a CDC change batch (``SnapshotTable.table_changes`` /
    Delta-CDF shape: ``_change_type`` ∈ insert / delete /
    update_preimage / update_postimage) into per-bucket usage deltas.
    Postimages and inserts add; preimages and deletes subtract — so an
    update contributes exactly its size difference and a net-zero row
    count."""
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), 1)
        .when(F.col("_change_type").isin("delete", "update_preimage"), -1)
        .otherwise(F.lit(None))
    )
    signed = changes.select(
        "bucket_id", sign.alias("_sign"), F.col("size")
    )
    # unknown change types must fail loudly, not silently skew the sums
    bad = signed.filter(F.col("_sign").isNull()).limit(1).count()
    if bad:
        raise ValueError("unknown _change_type in change batch")
    return signed.groupBy("bucket_id").agg(
        F.sum(F.col("_sign") * F.col("size")).alias("size_delta"),
        F.sum("_sign").alias("count_delta"),
    )


def apply_usage_delta(usage: DataFrame, delta: DataFrame) -> DataFrame:
    """Incrementally maintain the bucket_usage materialization: merge a
    delta batch into the previous aggregate without touching the base
    table. Buckets whose object count reaches zero drop out — exactly
    what a recompute would produce.

    This is the 100 TB answer to "keep usage fresh": the full recompute
    scans the entire objects table per refresh; this path costs one
    aggregate over the CHANGE BATCH plus a join against the (tiny,
    one-row-per-bucket) materialization. Correctness is anchored by the
    integral sums being associative/commutative — asserted against full
    recompute in tests and by the usage_incremental oracle."""
    u = usage.select(
        "bucket_id",
        F.col("total_size").alias("_s"),
        F.col("n_objects").alias("_n"),
    )
    d = delta.select(
        "bucket_id",
        F.col("size_delta").alias("_ds"),
        F.col("count_delta").alias("_dn"),
    )
    merged = u.join(d, "bucket_id", "full_outer").select(
        "bucket_id",
        (F.coalesce(F.col("_s"), F.lit(0)) + F.coalesce(F.col("_ds"), F.lit(0))).alias("total_size"),
        (F.coalesce(F.col("_n"), F.lit(0)) + F.coalesce(F.col("_dn"), F.lit(0))).alias("n_objects"),
    )
    return merged.filter(F.col("n_objects") > 0)


def numeric_histogram(
    df: DataFrame,
    value_col: str,
    mode: str = "log2",
    lo: int = 0,
    width: int = 1,
) -> DataFrame:
    """Distribution profile of a non-negative integer column — the size /
    token-length histogram a corpus dashboard plots.

    Buckets are computed with INTEGER-EXACT arithmetic so the histogram
    is identical on every engine (no float log whose edge values could
    land a boundary row in a different bucket):

    - ``mode='log2'``: bucket = number of binary digits of the value
      (``length(conv(v, 10, 2))`` — i.e. ``floor(log2 v) + 1`` for v>0;
      value 0 → bucket 0). Power-of-two buckets, right for sizes
      spanning many decades.
    - ``mode='linear'``: bucket = ``(v - lo) div width``.

    One scan, one partial-agg shuffle of #buckets rows; grouped on a
    tiny key so skew is structural-free.
    """
    v = F.col(value_col)
    if mode == "log2":
        bucket = F.when(v <= 0, F.lit(0)).otherwise(
            F.length(F.conv(v.cast("string"), 10, 2))
        ).cast("long")
    elif mode == "linear":
        # floor-div without a double quotient: strip the remainder with
        # pmod (floor semantics for negatives), then divide the exact
        # multiple in DECIMAL — double division would round once v - lo
        # passes 2^53, moving boundary rows across buckets
        d = v - F.lit(lo)
        m = d - F.pmod(d, F.lit(width))
        bucket = (
            m.cast("decimal(38,0)") / F.lit(width).cast("decimal(38,0)")
        ).cast("long")
    else:
        raise ValueError(f"mode must be 'log2' or 'linear', got {mode!r}")
    return (
        df.select(bucket.alias("bucket"), v.alias("_v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_v").alias("min_value"),
            F.max("_v").alias("max_value"),
            F.sum("_v").alias("sum_value"),
        )
    )
