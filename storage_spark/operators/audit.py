"""Constraint audits — the batch-engine answer to the reference's
declarative constraints.

Postgres enforces the data model's invariants inline: objects unique on
(bucket_id, name) (0002-storage-schema.sql:80), buckets unique on name
(0002:66), prefixes PK (bucket_id, level, name) (0026:21), and FKs from
objects/multipart uploads to buckets. A Spark table can't reject a bad
row at write time the same way — uniqueness comes from MERGE key
semantics — so the engine ships the invariants as AUDIT operators:
set-oriented queries that return the violating rows (empty = healthy).
Run them after bulk ingest / backfill, or continuously via foreachBatch.

Every audit is one partially-aggregated groupBy or one anti-join —
linear scans at any scale, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows violating a uniqueness contract: one row per duplicated key
    with its multiplicity (`n_rows` > 1). The objects contract is
    ``["bucket_id", "name"]`` (0002:80); buckets is ``["name"]``."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def orphaned_foreign_keys(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Child rows whose FK resolves to no parent row — e.g. objects whose
    ``bucket_id`` names no bucket (the FK Postgres enforces at write).
    One anti-join; the parent side broadcasts when it's a dimension."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )


def null_violations(df: DataFrame, not_null_cols: list[str]) -> DataFrame:
    """Rows with NULL in any declared NOT NULL column, tagged with the
    violated column list."""
    viol = F.filter(
        F.array(*[
            F.when(F.col(c).isNull(), F.lit(c)) for c in not_null_cols
        ]),
        lambda x: x.isNotNull(),
    )
    return (
        df.withColumn("null_columns", viol)
        .filter(F.size("null_columns") > 0)
    )


def audit_report(
    objects: DataFrame, buckets: DataFrame
) -> DataFrame:
    """One-pass health report over the core invariants: duplicate object
    keys, duplicate bucket names, orphaned objects. Returns
    ``(check, n_violations)`` — all zeros is the contract."""
    checks = [
        ("duplicate_object_keys",
         duplicate_keys(objects, ["bucket_id", "name"])),
        ("duplicate_bucket_names", duplicate_keys(buckets, ["name"])),
        ("orphaned_objects",
         orphaned_foreign_keys(objects, buckets, "bucket_id", "name")),
        ("null_object_names", null_violations(objects, ["name"])),
    ]
    out = None
    for name, df in checks:
        row = df.select(
            F.lit(name).alias("check"),
            F.count(F.lit(1)).alias("n_violations"),
        )
        out = row if out is None else out.unionByName(row)
    return out
