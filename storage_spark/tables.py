"""Test-data loading and the storage-shaped derived views.

The driver's synthetic tables are TPC-H-ish (region nation customer supplier
part orders lineitem events documents embeddings). The storage engine's
domain tables (objects, buckets, s3_keys) are derived from them with
engine-portable ANSI SQL so the exact same derivation runs in Spark and in
the DuckDB oracle — the *operators* under test are then two independent
implementations (DataFrame API here, hand-written SQL in the oracle).

Derivation (mirrors the reference's data model, SURVEY.md §1):

- ``objects``   — one row per ``part`` row. ``name`` is a '/'-separated
  hierarchical path (p_type/p_name-word1/p_name-word2-<key>.txt) with ~1/11
  of keys placed at the root, so listings see both folders and leaves.
  Mirrors storage.objects (migrations/tenant/0002-storage-schema.sql:68).
- ``buckets``   — one row per distinct p_brand (25 buckets).
  Mirrors storage.buckets (0002-storage-schema.sql:58).
- ``s3_keys``   — the "remote backend listing" for reconciliation: most
  object keys (1/7 missing → DB orphans), plus per-supplier extra keys
  (S3 orphans) and ``.info`` sidecars that scanners must ignore
  (src/storage/scanner/scanner.ts:323-403).

created_at is modelled as epoch-milliseconds BIGINT (`created_at_ms`) —
millisecond precision is exactly the reference's cursor-comparison precision
(0039-add-search-v2-sort-support.sql:44-52) and avoids engine-specific
timestamp literal syntax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BASE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

OBJECTS_SQL = """
SELECT
  CAST(p_partkey AS STRING) AS id,
  p_brand AS bucket_id,
  CASE WHEN p_partkey % 11 = 0
       THEN 'top-' || CAST(p_partkey AS STRING) || '.txt'
       ELSE p_type || '/' || split_part(p_name, ' ', 1) || '/' ||
            split_part(p_name, ' ', 2) || '-' || CAST(p_partkey AS STRING) || '.txt'
  END AS name,
  CAST(round(p_retailprice * 100) AS BIGINT) AS size,
  1704067200000 + p_partkey * 60000 AS created_at_ms,
  1704067200000 + p_partkey * 60000 + (p_partkey % 13) * 3600000 AS updated_at_ms,
  'user-' || CAST(p_partkey % 10 AS STRING) AS owner_id,
  CASE WHEN p_partkey % 3 = 0 THEN 'v2' ELSE 'v1' END AS version,
  CASE WHEN p_partkey % 4 = 0 THEN 'image/png'
       WHEN p_partkey % 4 = 1 THEN 'image/jpeg'
       WHEN p_partkey % 4 = 2 THEN 'text/plain'
       ELSE 'application/octet-stream' END AS mimetype
FROM part
"""

BUCKETS_SQL = """
SELECT DISTINCT
  p_brand AS id,
  p_brand AS name,
  (CAST(substr(p_brand, 7) AS INT) % 2 = 0) AS public,
  CAST(substr(p_brand, 7) AS INT) % 5 * 1000000 AS file_size_limit,
  'user-' || CAST(CAST(substr(p_brand, 7) AS INT) % 10 AS STRING) AS owner_id
FROM part
"""

S3_KEYS_SQL = """
SELECT bucket_id || '/' || name || '/' || version AS key, size
FROM objects
WHERE CAST(id AS BIGINT) % 7 <> 0
UNION ALL
SELECT 'Brand#99/extra/orphan-' || CAST(s_suppkey AS STRING) || '.txt/v1' AS key,
       CAST(0 AS BIGINT) AS size
FROM supplier
UNION ALL
SELECT 'Brand#99/extra/orphan-' || CAST(s_suppkey AS STRING) || '.txt/v1.info' AS key,
       CAST(0 AS BIGINT) AS size
FROM supplier
"""

MULTIPART_UPLOADS_SQL = """
SELECT
  'up-' || CAST(o_orderkey AS STRING) AS id,
  'mpu-bucket' AS bucket_id,
  lower(replace(split_part(o_orderpriority, '-', 2), ' ', '-')) ||
    '/obj-' || CAST(o_orderkey AS STRING) || '.bin' AS key,
  'v1' AS version,
  CAST(round(o_totalprice * 100) AS BIGINT) AS in_progress_size,
  'user-' || CAST(o_custkey % 10 AS STRING) AS owner_id,
  1704067200000 + o_orderkey * 1000 AS created_at_ms,
  CASE WHEN o_orderkey % 100 = 0
       THEN '{"client":"cli","trace":"' || CAST(o_orderkey AS STRING) || '"}'
  END AS metadata
FROM orders WHERE o_orderkey % 50 = 0
"""

MULTIPART_PARTS_SQL = """
SELECT
  'up-' || CAST(l_orderkey AS STRING) AS upload_id,
  l_linenumber AS part_number,
  CAST(round(l_extendedprice * 100) AS BIGINT) AS size,
  md5(CAST(l_orderkey AS STRING) || '-' || CAST(l_linenumber AS STRING)) AS etag,
  1704067200000 + l_orderkey * 1000 + l_linenumber AS created_at_ms
FROM lineitem WHERE l_orderkey % 50 = 0
"""

PART_COPIES_SQL = """
SELECT
  u.id AS upload_id,
  100 AS part_number,
  CASE WHEN u.ok % 500 = 450 THEN 'no-such-bucket' ELSE o.bucket_id END
    AS source_bucket,
  o.name AS source_key,
  CASE WHEN u.ok % 150 > 0 THEN CAST(0 AS BIGINT) END AS range_start,
  CASE WHEN u.ok % 150 = 50 THEN CAST(floor(o.size / 2) AS BIGINT)
       WHEN u.ok % 150 = 100 THEN o.size + 5 END AS range_end,
  1704067200000 + u.ok AS created_at_ms
FROM (SELECT id, CAST(substr(id, 4) AS BIGINT) AS ok FROM multipart_uploads) u
JOIN objects o ON CAST(o.id AS BIGINT) = u.ok % 199 + 1
UNION ALL
SELECT
  'up-phantom-' || CAST(o.id AS STRING) AS upload_id,
  101 AS part_number,
  o.bucket_id AS source_bucket,
  o.name AS source_key,
  CAST(NULL AS BIGINT) AS range_start,
  CAST(NULL AS BIGINT) AS range_end,
  1704067200000 AS created_at_ms
FROM objects o WHERE CAST(o.id AS BIGINT) <= 5
"""

ICEBERG_TABLES_SQL = """
SELECT
  lower(replace(r_name, ' ', '-')) || '-bkt' AS bucket_id,
  'ns-' || lower(replace(r_name, ' ', '-')) AS namespace,
  'tbl-' || lower(replace(n_name, ' ', '-')) AS table_name,
  's3://warehouse/' || lower(replace(n_name, ' ', '-')) AS location
FROM nation JOIN region ON n_regionkey = r_regionkey
"""

BUCKETS_VECTORS_SQL = """
SELECT DISTINCT
  'vb-' || CAST(n_nationkey % 5 AS STRING) AS id,
  'VECTOR' AS type
FROM nation
"""

VECTOR_INDEXES_SQL = """
SELECT
  'vb-' || CAST(n_nationkey % 5 AS STRING) AS bucket_id,
  'idx-' || lower(replace(n_name, ' ', '-')) AS name,
  'float32' AS data_type,
  64 AS dimension,
  CASE WHEN n_nationkey % 2 = 0 THEN 'cosine' ELSE 'euclidean' END AS distance_metric,
  CASE WHEN n_nationkey % 3 = 0
       THEN '{"nonFilterableMetadataKeys": ["private-note"]}' END AS metadata_configuration,
  1704067200000 + n_nationkey * 1000 AS created_at_ms
FROM nation
"""

TENANTS_SQL = """
SELECT DISTINCT
  'tenant-' || CAST(CAST(substr(p_brand, 7) AS INT) % 5 AS STRING) AS tenant_id,
  CAST(substr(p_brand, 7) AS INT) % 5 % 2 = 0 AS features_image_transform,
  (CAST(substr(p_brand, 7) AS INT) % 5 + 1) * 10000000 AS max_size_bytes
FROM part
"""

DERIVED_VIEWS = [
    ("objects", OBJECTS_SQL),
    ("buckets", BUCKETS_SQL),
    ("s3_keys", S3_KEYS_SQL),
    ("multipart_uploads", MULTIPART_UPLOADS_SQL),
    ("multipart_parts", MULTIPART_PARTS_SQL),
    ("part_copies", PART_COPIES_SQL),
    ("iceberg_tables", ICEBERG_TABLES_SQL),
    ("buckets_vectors", BUCKETS_VECTORS_SQL),
    ("vector_indexes", VECTOR_INDEXES_SQL),
    ("tenants", TENANTS_SQL),
]


def load_base_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read the driver parquet tables and register them as temp views.

    ``events.ts`` has shipped in two physical forms across testdata
    generations: INT64 TIMESTAMP(NANOS) (which Spark 4 refuses by default —
    read as nano-longs under the scoped legacy flag and floor-convert) and
    plain ``timestamp[us]`` without a timezone (reads as TIMESTAMP_NTZ —
    cast to TimestampType, a numeric no-op under the UTC session zone).
    Either way the engine-facing contract is the same: ``ts`` is
    TimestampType at microsecond precision.
    """
    out: dict[str, DataFrame] = {}
    for t in BASE_TABLES:
        if t == "events":
            from pyspark.sql import functions as F

            # scope the legacy flag to THIS read and restore it: leaving it
            # set would make every later TIMESTAMP(NANOS) parquet read in
            # the session silently come back as BIGINT without the fixup
            prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            try:
                df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
                ts_type = dict(df.dtypes).get("ts")
                if ts_type == "bigint":  # TIMESTAMP(NANOS) read as nano-longs
                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000"))
                    )
                elif ts_type == "timestamp_ntz":
                    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
                # materialize the schema under the flag; the plan itself
                # stays lazy (binary parquet read options are bound at
                # DataFrame creation)
            finally:
                if prev is None:
                    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
                else:
                    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        else:
            df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.createOrReplaceTempView(t)
        out[t] = df
    return out


def register_derived_views(spark: SparkSession) -> dict[str, DataFrame]:
    """Create the storage-shaped views on top of the base tables.

    At 100 TB, ``objects`` would be a table partitioned by ``bucket_id`` and
    sorted by ``name``; expressing it as a view over a columnar scan keeps the
    same pushdown behavior (the CASE projection does not block partition
    pruning on the base table's columns).
    """
    out: dict[str, DataFrame] = {}
    for name, sql in DERIVED_VIEWS:
        spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {sql}")
        out[name] = spark.table(name)
    return out


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tables = load_base_tables(spark, sf_dir)
    tables.update(register_derived_views(spark))
    return tables


def oracle_views_prefix() -> str:
    """CTE prefix so a DuckDB oracle query sees the same derived views."""
    parts = ", ".join(f"{name} AS ({sql.strip()})" for name, sql in DERIVED_VIEWS)
    return "WITH " + parts
