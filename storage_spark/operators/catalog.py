"""Iceberg catalog surface: the tenant-aware namespace/table INDEX plus
native-catalog wiring (SURVEY §7.7).

The reference stores an index of namespaces/tables per ANALYTICS bucket in
Postgres (migrations/tenant/0038-iceberg-catalog-flag-on-buckets.sql:18-47,
evolved 0047/0048) and proxies actual Iceberg operations to a REST catalog
(src/storage/protocols/iceberg/catalog/tenant-catalog.ts:96). Spark IS an
Iceberg client natively, so the engine splits the same way:

- the *index* (quota enforcement A6, listing, FK joins J5) is a small
  DataFrame maintained with the mutation operators;
- load/commit/snapshot go through ``spark.sql`` DDL once an Iceberg
  catalog is configured (``configure_iceberg_catalog``) — gated on the
  runtime jar, absent in this container.

Quota caps mirror src/storage/protocols/iceberg/pg.ts:576-595 (capped
counts, not full counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storage_spark.operators.aggregates import capped_count
from storage_spark.operators.mutations import KeyAlreadyExistsError, create_rows

DEFAULT_MAX_NAMESPACES = 25
DEFAULT_MAX_TABLES = 10


class QuotaExceededError(Exception):
    pass


class NamespaceNotEmptyError(Exception):
    """RESTRICT refusal (FK 23503) — distinct from a unique violation so
    create-if-absent retry logic never misreads a non-empty namespace as a
    name conflict."""


def create_namespace(
    index: DataFrame,
    bucket_id: str,
    namespace: str,
    max_namespaces: int = DEFAULT_MAX_NAMESPACES,
) -> DataFrame:
    """A6-capped create: existence count is capped at the quota, so the scan
    never pays for more rows than the limit it enforces."""
    n = capped_count(
        index.filter(F.col("bucket_id") == bucket_id), max_namespaces
    ).collect()[0]["n"]
    if n >= max_namespaces:
        raise QuotaExceededError(f"namespace quota {max_namespaces} reached")
    spark = index.sparkSession
    row = spark.createDataFrame(
        [(bucket_id, namespace)], "bucket_id string, namespace string"
    )
    return create_rows(index, row, ["bucket_id", "namespace"])


def create_table(
    tables: DataFrame,
    namespaces: DataFrame,
    bucket_id: str,
    namespace: str,
    table: str,
    max_tables: int = DEFAULT_MAX_TABLES,
) -> DataFrame:
    ns_exists = (
        namespaces.filter(
            (F.col("bucket_id") == bucket_id) & (F.col("namespace") == namespace)
        )
        .limit(1)
        .count()
    )
    if not ns_exists:
        raise KeyError(f"namespace {bucket_id}/{namespace} does not exist")
    n = capped_count(
        tables.filter(
            (F.col("bucket_id") == bucket_id) & (F.col("namespace") == namespace)
        ),
        max_tables,
    ).collect()[0]["n"]
    if n >= max_tables:
        raise QuotaExceededError(f"table quota {max_tables} reached")
    spark = tables.sparkSession
    row = spark.createDataFrame(
        [(bucket_id, namespace, table)],
        "bucket_id string, namespace string, table_name string",
    )
    return create_rows(tables, row, ["bucket_id", "namespace", "table_name"])


def list_namespaces(index: DataFrame, bucket_id: str, limit: int | None = None) -> DataFrame:
    df = index.filter(F.col("bucket_id") == bucket_id).orderBy("namespace")
    return df.limit(limit) if limit else df


def list_tables(
    tables: DataFrame, bucket_id: str, namespace: str, limit: int | None = None
) -> DataFrame:
    df = tables.filter(
        (F.col("bucket_id") == bucket_id) & (F.col("namespace") == namespace)
    ).orderBy("table_name")
    return df.limit(limit) if limit else df


def drop_table(
    tables: DataFrame, bucket_id: str, namespace: str, table_name: str
) -> DataFrame:
    """dropTable (src/storage/protocols/iceberg/pg.ts:160-178): DELETE by
    (catalog, namespace, name) — 0048 renames our bucket_id key to
    catalog_id; the index shape is identical."""
    return tables.filter(
        ~(
            (F.col("bucket_id") == bucket_id)
            & (F.col("namespace") == namespace)
            & (F.col("table_name") == table_name)
        )
    )


def rename_table(
    tables: DataFrame,
    bucket_id: str,
    namespace: str,
    table_name: str,
    new_name: str,
    new_namespace: str | None = None,
) -> DataFrame:
    """REST-catalog rename (proxied by tenant-catalog.ts; on the index it is
    a keyed update): destination must not exist, source must."""
    dst_ns = new_namespace or namespace
    if (
        tables.filter(
            (F.col("bucket_id") == bucket_id)
            & (F.col("namespace") == dst_ns)
            & (F.col("table_name") == new_name)
        )
        .limit(1)
        .count()
    ):
        raise KeyAlreadyExistsError(f"table {dst_ns}.{new_name} exists")
    src = (F.col("bucket_id") == bucket_id) & (
        F.col("namespace") == namespace
    ) & (F.col("table_name") == table_name)
    if tables.filter(src).limit(1).count() == 0:
        raise KeyError(f"table {namespace}.{table_name} does not exist")
    return tables.withColumns(
        {
            "namespace": F.when(src, F.lit(dst_ns)).otherwise(F.col("namespace")),
            "table_name": F.when(src, F.lit(new_name)).otherwise(
                F.col("table_name")
            ),
        }
    )


def drop_namespace(
    namespaces: DataFrame, tables: DataFrame, bucket_id: str, namespace: str
) -> DataFrame:
    """dropNamespace (pg.ts:348-372): RESTRICT — refuses while tables
    remain (FK 23503 in the reference)."""
    if (
        tables.filter(
            (F.col("bucket_id") == bucket_id) & (F.col("namespace") == namespace)
        )
        .limit(1)
        .count()
    ):
        raise NamespaceNotEmptyError(
            f"namespace {namespace} still has tables (RESTRICT)"
        )
    return namespaces.filter(
        ~((F.col("bucket_id") == bucket_id) & (F.col("namespace") == namespace))
    )


def upsert_table_location(
    tables: DataFrame,
    bucket_id: str,
    namespace: str,
    table_name: str,
    location: str,
) -> DataFrame:
    """Table upsert with location refresh — INSERT … ON CONFLICT DO UPDATE
    SET location (pg.ts:455-460; location/metadata columns from
    migrations 0047/0048)."""
    from storage_spark.operators.mutations import merge_upsert

    if "location" not in tables.columns:
        # the ADD COLUMN IF NOT EXISTS evolution step (0047/0048)
        tables = tables.withColumn("location", F.lit(None).cast("string"))
    spark = tables.sparkSession
    row = spark.createDataFrame(
        [(bucket_id, namespace, table_name, location)],
        "bucket_id string, namespace string, table_name string, location string",
    )
    # null-pad whatever other columns the index schema has evolved
    # (metadata/shard columns from 0047/0048) so the upsert row conforms
    for f in tables.schema.fields:
        if f.name not in row.columns:
            row = row.withColumn(f.name, F.lit(None).cast(f.dataType))
    return merge_upsert(
        tables, row.select(*tables.columns), ["bucket_id", "namespace", "table_name"]
    )


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def configure_iceberg_catalog(
    spark: SparkSession, name: str = "analytics", warehouse: str = "/tmp/iceberg-wh"
) -> bool:
    """Wire Spark's native Iceberg catalog for ANALYTICS buckets. Returns
    False (no-op) when the Iceberg runtime jar is absent — callers keep
    using the index DataFrames; DDL paths activate on real clusters."""
    if not iceberg_available(spark):
        return False
    spark.conf.set(f"spark.sql.catalog.{name}", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{name}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{name}.warehouse", warehouse)
    return True


class KeyAlreadyExists(KeyAlreadyExistsError):
    """Alias kept for API parity with the reference's error name."""


def column_stats(
    df: DataFrame,
    columns: list[str],
    exact_ndv: bool = True,
) -> DataFrame:
    """ANALYZE-style per-column statistics — the stats table a catalog
    stores for optimizer costing and data-quality dashboards: row count,
    null count, distinct count, min/max (stringified so one schema holds
    any column type).

    One pass per column batch via a single select of grouped aggregates
    (no shuffle beyond each aggregate's partial-combine). ``exact_ndv``
    uses count(DISTINCT) — natively skew-safe in Spark (two-stage
    dedup-then-count plan, NOTES_r4 §salting) and oracle-comparable; at
    10^10+ rows flip to ``approx_count_distinct`` (HLL, mergeable,
    constant memory) and accept ~2% relative error.
    """
    aggs = []
    for c in columns:
        col = F.col(c)
        nd = (
            F.countDistinct(col)
            if exact_ndv
            else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            nd.alias(f"{c}__ndv"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__ndv").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in columns
    ]
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
