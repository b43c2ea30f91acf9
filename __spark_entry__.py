"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Every query here is an instantiation of an operator from
SURVEY.md §2 over the driver's synthetic tables; the storage-shaped inputs
(objects / buckets / s3_keys) are deterministic derived views shared with
the oracle (storage_spark/tables.py), while the operator itself has two
independent implementations: DataFrame API in storage_spark.* vs hand-written
ANSI SQL below.

Output conventions (so value-hash comparison is exact across engines):
- money/size sums are DECIMAL (exact, order-insensitive) — never float sums;
- timestamps are surfaced as epoch-milliseconds BIGINT, matching the
  reference's millisecond cursor precision (0039-add-search-v2-sort-support
  .sql:44-52);
- every LIMIT is applied over a total (tie-free) ordering.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storage_spark.tables import load_all, oracle_views_prefix


_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def _t(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = load_all(spark, sf_dir)
    return _TABLE_CACHE[key]


def _o(body: str) -> str:
    """Prepend the shared derived-view CTEs to an oracle query body."""
    return oracle_views_prefix() + "\n" + body


# --------------------------------------------------------------------------
# Listing family (S1-S3, F1-F4, A4, A5, O1-O4, W2)
# --------------------------------------------------------------------------

LISTING_SELECT = "name, id, size, created_at_ms, updated_at_ms, mimetype"


def _oracle_delimiter_listing(where: str, prefix: str, limit: int | None) -> str:
    """Oracle-side A4 plan for a given literal prefix."""
    p = len(prefix) + 1
    lim = f"LIMIT {limit}" if limit is not None else ""
    return _o(f"""
, src AS (SELECT * FROM objects WHERE {where}),
tagged AS (
  SELECT *,
         CASE WHEN instr(substr(name, {p}), '/') > 0
              THEN '{prefix}' || split_part(substr(name, {p}), '/', 1) || '/'
         END AS cp
  FROM src
),
folders AS (
  SELECT cp AS name, CAST(NULL AS STRING) AS id,
         CAST(NULL AS DECIMAL(12,2)) AS size,
         min(created_at_ms) AS created_at_ms,
         min(created_at_ms) AS updated_at_ms,
         CAST(NULL AS STRING) AS mimetype
  FROM tagged WHERE cp IS NOT NULL GROUP BY cp
),
leaves AS (
  SELECT {LISTING_SELECT} FROM tagged WHERE cp IS NULL
)
SELECT * FROM (SELECT * FROM folders UNION ALL SELECT * FROM leaves)
ORDER BY name {lim}
""")


def q_list_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.listing import list_objects_with_delimiter

    t = _t(spark, sf_dir)
    return list_objects_with_delimiter(t["objects"], bucket_id="Brand#13", prefix="")


def q_list_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.listing import list_objects_with_delimiter

    t = _t(spark, sf_dir)
    return list_objects_with_delimiter(
        t["objects"], bucket_id=None, prefix="ECONOMY/", limit=500
    )


def q_list_flat_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.listing import list_objects_flat

    t = _t(spark, sf_dir)
    return list_objects_flat(
        t["objects"],
        bucket_id="Brand#13",
        start_after="S",
        limit=50,
        columns=["name", "id", "size", "created_at_ms"],
    )


def q_skipscan_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.listing import search_prefixes

    t = _t(spark, sf_dir)
    return search_prefixes(t["objects"], bucket_id=None, prefix="")


def q_sort_updated_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.listing import search_objects_sorted

    t = _t(spark, sf_dir)
    return search_objects_sorted(
        t["objects"],
        bucket_id=None,
        prefix="ECONOMY/",
        sort_column=F.col("updated_at_ms"),
        sort_desc=True,
        limit=100,
    ).select("name", "updated_at_ms")


def q_topk_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.listing import top_k_merge

    t = _t(spark, sf_dir)
    obj = t["objects"]
    a = obj.filter(F.col("bucket_id") == "Brand#13").select("name")
    b = obj.filter(F.col("bucket_id") == "Brand#22").select("name")
    return top_k_merge([a, b], [F.col("name").asc()], 20)


# --------------------------------------------------------------------------
# Aggregations (A1, A2, A6, A8) and joins (J2, J3, J5)
# --------------------------------------------------------------------------


def q_bucket_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.aggregates import bucket_usage

    t = _t(spark, sf_dir)
    return bucket_usage(t["objects"])


def q_capped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.aggregates import capped_count

    t = _t(spark, sf_dir)
    return capped_count(t["objects"].filter(F.col("bucket_id") == "Brand#13"), 50)


def q_owner_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.aggregates import owner_usage

    t = _t(spark, sf_dir)
    return owner_usage(t["objects"].filter(F.col("bucket_id").isin("Brand#13", "Brand#22")))


def q_orphans_s3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.reconcile import s3_orphans

    t = _t(spark, sf_dir)
    return s3_orphans(t["objects"], t["s3_keys"]).select("key", "size")


def q_orphans_db(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.reconcile import db_orphans

    t = _t(spark, sf_dir)
    return db_orphans(t["objects"], t["s3_keys"]).select("key")


def q_consistency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.operators.reconcile import consistency_report

    t = _t(spark, sf_dir)
    return consistency_report(t["objects"], t["s3_keys"])


def q_fk_join_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 dimension joins: customer→nation→region rollup (broadcast dims)."""
    t = _t(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Keyset cursors over event time (F4) — ms-truncated composite cursor
# --------------------------------------------------------------------------


def q_keyset_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    ts_ms = F.unix_millis(F.date_trunc("millisecond", F.col("ts")))
    cursor_ms = 1704070800000  # 2024-01-01T01:00:00Z
    cursor_id = 0
    return (
        t["events"]
        .withColumn("ts_ms", ts_ms)
        .filter(
            (F.col("ts_ms") > cursor_ms)
            | ((F.col("ts_ms") == cursor_ms) & (F.col("event_id") > cursor_id))
        )
        .orderBy("ts_ms", "event_id")
        .limit(100)
        .select("event_id", "ts_ms", "event_type")
    )


# --------------------------------------------------------------------------
# jsonb metadata filter DSL (F9) — compiled to Column over events.props
# --------------------------------------------------------------------------


def q_meta_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.functions.jsonmeta import compile_filter

    t = _t(spark, sf_dir)
    ast = {"$and": [{"k": {"$gte": 30}}, {"k": {"$lt": 60}}]}
    return (
        t["events"]
        .filter(compile_filter(ast, "props"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_meta_filter_in_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.functions.jsonmeta import compile_filter

    t = _t(spark, sf_dir)
    ast = {"$or": [{"k": {"$in": [1, 2, 3, 4, 5]}}, {"k": {"$exists": False}}]}
    return (
        t["events"].filter(compile_filter(ast, "props")).select("event_id").orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Path algebra (§2.8)
# --------------------------------------------------------------------------


def q_path_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.functions import paths

    t = _t(spark, sf_dir)
    n = F.col("name")
    return (
        t["objects"]
        .filter(F.col("bucket_id") == "Brand#13")
        .select(
            "name",
            paths.foldername(n).alias("folder"),
            paths.filename(n).alias("file"),
            paths.extension(n).alias("ext"),
            paths.get_level(n).alias("level"),
        )
    )


def q_prefix_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 replacement: recompute the prefixes table from objects — distinct
    exploded ancestor prefixes (0026-objects-prefixes.sql:37-57)."""
    from storage_spark.functions.paths import get_prefixes

    t = _t(spark, sf_dir)
    return (
        t["objects"]
        .filter(F.col("bucket_id") == "Brand#13")
        .select(F.explode(get_prefixes(F.col("name"))).alias("prefix"))
        .distinct()
        .orderBy("prefix")
    )


# --------------------------------------------------------------------------
# Contract
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hierarchical delimiter listing (A4 plan) on sf0.001."""
    return q_list_root(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "list_root": q_list_root,
        "list_nested": q_list_nested,
        "list_flat_cursor": q_list_flat_cursor,
        "skipscan_prefixes": q_skipscan_prefixes,
        "sort_updated_at": q_sort_updated_at,
        "topk_merge": q_topk_merge,
        "bucket_usage": q_bucket_usage,
        "capped_count": q_capped_count,
        "owner_rollup": q_owner_rollup,
        "orphans_s3": q_orphans_s3,
        "orphans_db": q_orphans_db,
        "consistency_report": q_consistency_report,
        "fk_join_usage": q_fk_join_usage,
        "keyset_events": q_keyset_events,
        "meta_filter_range": q_meta_filter_range,
        "meta_filter_in_or": q_meta_filter_in_or,
        "path_functions": q_path_functions,
        "prefix_derivation": q_prefix_derivation,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "list_root": _oracle_delimiter_listing("bucket_id = 'Brand#13'", "", None),
        "list_nested": _oracle_delimiter_listing(
            "name >= 'ECONOMY/' AND name < 'ECONOMY0'", "ECONOMY/", 500
        ),
        "list_flat_cursor": _o("""
SELECT name, id, size, created_at_ms FROM objects
WHERE bucket_id = 'Brand#13' AND name > 'S'
ORDER BY name LIMIT 50
"""),
        "skipscan_prefixes": _o("""
SELECT DISTINCT split_part(name, '/', 1) || '/' AS name
FROM objects WHERE instr(name, '/') > 0 ORDER BY name
"""),
        "sort_updated_at": _o("""
SELECT name, updated_at_ms FROM objects
WHERE name >= 'ECONOMY/' AND name < 'ECONOMY0'
ORDER BY coalesce(updated_at_ms, 0) DESC, name DESC LIMIT 100
"""),
        "topk_merge": _o("""
SELECT name FROM (
  SELECT name FROM (
    SELECT name FROM objects WHERE bucket_id = 'Brand#13' ORDER BY name LIMIT 20
  )
  UNION ALL
  SELECT name FROM (
    SELECT name FROM objects WHERE bucket_id = 'Brand#22' ORDER BY name LIMIT 20
  )
) ORDER BY name LIMIT 20
"""),
        "bucket_usage": _o("""
SELECT bucket_id, sum(size) AS total_size, count(*) AS n_objects
FROM objects GROUP BY bucket_id
"""),
        "capped_count": _o("""
SELECT count(*) AS n FROM (
  SELECT 1 FROM objects WHERE bucket_id = 'Brand#13' LIMIT 50
)
"""),
        "owner_rollup": _o("""
SELECT bucket_id, owner_id, sum(size) AS total_size, count(*) AS n_objects
FROM objects WHERE bucket_id IN ('Brand#13', 'Brand#22')
GROUP BY ROLLUP (bucket_id, owner_id)
"""),
        "orphans_s3": _o("""
SELECT key, size FROM s3_keys
WHERE key NOT LIKE '%.info'
  AND NOT EXISTS (
    SELECT 1 FROM objects o
    WHERE o.bucket_id || '/' || o.name || '/' || o.version = s3_keys.key
  )
"""),
        "orphans_db": _o("""
SELECT o.bucket_id || '/' || o.name || '/' || o.version AS key
FROM objects o
WHERE NOT EXISTS (
  SELECT 1 FROM s3_keys s
  WHERE s.key NOT LIKE '%.info'
    AND s.key = o.bucket_id || '/' || o.name || '/' || o.version
)
"""),
        "consistency_report": _o("""
SELECT key, 'S3_ORPHAN' AS kind FROM s3_keys
WHERE key NOT LIKE '%.info'
  AND NOT EXISTS (
    SELECT 1 FROM objects o
    WHERE o.bucket_id || '/' || o.name || '/' || o.version = s3_keys.key
  )
UNION ALL
SELECT o.bucket_id || '/' || o.name || '/' || o.version AS key,
       'DB_ORPHAN' AS kind
FROM objects o
WHERE NOT EXISTS (
  SELECT 1 FROM s3_keys s
  WHERE s.key NOT LIKE '%.info'
    AND s.key = o.bucket_id || '/' || o.name || '/' || o.version
)
"""),
        "fk_join_usage": _o("""
SELECT r_name, count(*) AS n_customers,
       sum(CAST(c_acctbal AS DECIMAL(18,2))) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""),
        "keyset_events": _o("""
SELECT event_id, epoch_ms(date_trunc('milliseconds', ts)) AS ts_ms, event_type
FROM events
WHERE epoch_ms(date_trunc('milliseconds', ts)) > 1704070800000
   OR (epoch_ms(date_trunc('milliseconds', ts)) = 1704070800000 AND event_id > 0)
ORDER BY ts_ms, event_id LIMIT 100
"""),
        "meta_filter_range": _o("""
SELECT event_type, count(*) AS n
FROM events
WHERE json_type(CAST(props AS JSON), '$.k') IN ('BIGINT', 'UBIGINT', 'DOUBLE')
  AND CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 30
  AND CAST(json_extract_string(props, '$.k') AS DOUBLE) < 60
GROUP BY event_type
"""),
        "meta_filter_in_or": _o("""
SELECT event_id FROM events
WHERE json_extract_string(props, '$.k') IN ('1', '2', '3', '4', '5')
   OR json_extract_string(props, '$.k') IS NULL
ORDER BY event_id
"""),
        "path_functions": _o("""
SELECT name,
       CASE WHEN instr(name, '/') = 0 THEN ''
            ELSE regexp_replace(name, '/[^/]*$', '') END AS folder,
       regexp_extract(name, '[^/]*$') AS file,
       CASE WHEN instr(regexp_extract(name, '[^/]*$'), '.') > 0
            THEN regexp_extract(name, '[^.]*$') ELSE '' END AS ext,
       len(str_split(name, '/')) AS level
FROM objects WHERE bucket_id = 'Brand#13'
"""),
        "prefix_derivation": _o("""
SELECT DISTINCT array_to_string(list_slice(str_split(name, '/'), 1, lvl), '/') AS prefix
FROM objects, generate_series(1, 3) AS t(lvl)
WHERE bucket_id = 'Brand#13' AND len(str_split(name, '/')) > lvl
ORDER BY prefix
"""),
    }
