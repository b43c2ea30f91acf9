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
- every numeric output is integral (BIGINT sizes/cents/scaled distances) —
  exact and render-identical across engines; never float or decimal outputs;
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
         CAST(NULL AS BIGINT) AS size,
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
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("acctbal_cents"),
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
# Vector store (§2 vector ops; SURVEY §3.3)
# --------------------------------------------------------------------------

_ONES = [1.0] * 64

# DuckDB fragments for exact-parity distance math: double-promoted,
# left-folded like the Spark side (F.aggregate) so doubles match bitwise.
_DUCK_DOT = "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))"
_DUCK_NORM = (
    "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)
_DUCK_DOT2 = (
    "list_sum(list_transform(list_zip(c.embedding, q.q_vec),"
    " t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))"
)
_DUCK_NORM_C = (
    "sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)
_DUCK_NORM_Q = (
    "sqrt(list_sum(list_transform(q.q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return t["embeddings"].select(
        F.col("vec_id").cast("string").alias("key"), "embedding", "label"
    )


def q_vector_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.functions.vectors import query_vectors

    v = _vectors(spark, sf_dir)
    out = query_vectors(v, _ONES, top_k=10, metric="cosine")
    return out.select(
        "key", F.round(F.col("distance") * 10000).cast("bigint").alias("dist_1e4")
    )


def q_vector_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.functions.vectors import query_vectors

    v = _vectors(spark, sf_dir)
    out = query_vectors(v, _ONES, top_k=10, metric="euclidean")
    return out.select(
        "key", F.round(F.col("distance") * 10000).cast("bigint").alias("dist_1e4")
    )


def q_vector_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.functions.vectors import query_vectors

    v = _vectors(spark, sf_dir).filter(F.col("label") == 2)
    out = query_vectors(v, _ONES, top_k=5, metric="cosine")
    return out.select(
        "key", F.round(F.col("distance") * 10000).cast("bigint").alias("dist_1e4")
    )


def q_vector_segment_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.functions.vectors import list_vectors

    t = _t(spark, sf_dir)
    v = t["embeddings"].select(
        F.col("vec_id").cast("string").alias("key"), F.col("vec_id"), "label"
    )
    return list_vectors(
        v,
        segment_count=8,
        segment_index=3,
        next_key="25",
        max_results=100,
        segment_expr=F.col("vec_id"),
    ).select("key", "label")


def q_vector_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from storage_spark.functions.vectors import knn_join

    v = _vectors(spark, sf_dir)
    queries = v.filter(F.col("key").cast("bigint") < 20).select(
        F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
    )
    out = knn_join(queries, v, k=3, metric="cosine")
    return out.select(
        "q_key",
        "key",
        F.round(F.col("distance") * 10000).cast("bigint").alias("dist_1e4"),
        "rank",
    )


def q_vector_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (scale path) — approximate, so rows-only driver
    check; recall vs brute force is asserted in tests/test_vectors.py."""
    from storage_spark.functions.vectors import lsh_ann_join

    v = _vectors(spark, sf_dir)
    queries = v.filter(F.col("key").cast("bigint") < 20).select(
        F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
    )
    return lsh_ann_join(queries, v, k=3, dim=64, n_planes=6)


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
        "vector_cosine_topk": q_vector_cosine_topk,
        "vector_l2_topk": q_vector_l2_topk,
        "vector_filtered_topk": q_vector_filtered_topk,
        "vector_segment_scan": q_vector_segment_scan,
        "vector_knn_join": q_vector_knn_join,
        "vector_lsh_ann": q_vector_lsh_ann,
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
SELECT bucket_id, CAST(sum(size) AS BIGINT) AS total_size, count(*) AS n_objects
FROM objects GROUP BY bucket_id
"""),
        "capped_count": _o("""
SELECT count(*) AS n FROM (
  SELECT 1 FROM objects WHERE bucket_id = 'Brand#13' LIMIT 50
)
"""),
        "owner_rollup": _o("""
SELECT bucket_id, owner_id, CAST(sum(size) AS BIGINT) AS total_size, count(*) AS n_objects
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
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
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
        "vector_cosine_topk": _o(f"""
SELECT key, CAST(round(distance * 10000) AS BIGINT) AS dist_1e4
FROM (
  SELECT CAST(vec_id AS STRING) AS key,
         1.0 - {_DUCK_DOT} / ({_DUCK_NORM} * 8.0) AS distance
  FROM embeddings
) ORDER BY distance, key LIMIT 10
"""),
        "vector_l2_topk": _o(f"""
SELECT key, CAST(round(distance * 10000) AS BIGINT) AS dist_1e4
FROM (
  SELECT CAST(vec_id AS STRING) AS key,
         sqrt(list_sum(list_transform(embedding,
              x -> (CAST(x AS DOUBLE) - 1.0) * (CAST(x AS DOUBLE) - 1.0)))) AS distance
  FROM embeddings
) ORDER BY distance, key LIMIT 10
"""),
        "vector_filtered_topk": _o(f"""
SELECT key, CAST(round(distance * 10000) AS BIGINT) AS dist_1e4
FROM (
  SELECT CAST(vec_id AS STRING) AS key,
         1.0 - {_DUCK_DOT} / ({_DUCK_NORM} * 8.0) AS distance
  FROM embeddings WHERE label = 2
) ORDER BY distance, key LIMIT 5
"""),
        "vector_segment_scan": _o("""
SELECT CAST(vec_id AS STRING) AS key, label
FROM embeddings
WHERE abs(vec_id) % 8 = 3 AND CAST(vec_id AS STRING) > '25'
ORDER BY key LIMIT 100
"""),
        "vector_knn_join": _o(f"""
SELECT q_key, key, CAST(round(distance * 10000) AS BIGINT) AS dist_1e4, rank
FROM (
  SELECT q.q_key, c.key,
         1.0 - {_DUCK_DOT2} / ({_DUCK_NORM_C} * {_DUCK_NORM_Q}) AS distance,
         CAST(row_number() OVER (PARTITION BY q.q_key ORDER BY
           1.0 - {_DUCK_DOT2} / ({_DUCK_NORM_C} * {_DUCK_NORM_Q}) ASC, c.key ASC) AS INT) AS rank
  FROM (SELECT CAST(vec_id AS STRING) AS key, embedding FROM embeddings) c,
       (SELECT CAST(vec_id AS STRING) AS q_key, embedding AS q_vec
        FROM embeddings WHERE vec_id < 20) q
  WHERE q.q_key <> c.key
) WHERE rank <= 3
"""),
    }
