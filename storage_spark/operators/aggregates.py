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
    """Skew-safe variant of bucket_usage: two-stage aggregation with a
    deterministic salt. When one bucket holds a disproportionate share of
    objects (the hot-tenant case at 100 TB), the single-stage groupBy sends
    every row of that key to one reducer; salting spreads stage one across
    ``salt_buckets`` reducers and stage two combines ``salt_buckets`` rows
    per key. Results are identical to bucket_usage (integral sums are
    associative). AQE's skew handling covers joins; this covers aggregation.
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


def owner_usage(objects: DataFrame) -> DataFrame:
    """Per-owner rollup — extension of A1 (marked non-reference in SURVEY
    §2.4/A8): grouping-sets usage analytics."""
    return objects.rollup("bucket_id", "owner_id").agg(
        F.sum("size").alias("total_size"),
        F.count(F.lit(1)).alias("n_objects"),
    )
