"""Vector bucket / index lifecycle — the metadata layer the vector query
operators (functions.vectors) run against.

Reference:
- schema: storage.buckets_vectors + storage.vector_indexes with
  metadata_configuration jsonb (migrations/tenant/0045-vector-buckets.sql:7-26)
- createVectorBucket / createVectorIndex / deleteVectorIndex /
  deleteVectorBucket / listIndexes / getIndex
  (src/storage/protocols/vector/pg.ts:213-340)
- create-time validation: dataType float32 only, dimension 1..4000
  (src/storage/protocols/vector/adapter/pgvector/index.ts:425-455)
- metadata_configuration.nonFilterableMetadataKeys drives F10 filter
  validation at query time (vector-store.ts:166-185; functions/jsonmeta
  .validate_filterable_keys)

Spark split (same as the Iceberg catalog, operators/catalog.py): the INDEX
is a small DataFrame maintained with the mutation operators; the vector
DATA lives in ordinary tables the ANN/top-k operators scan. The reference's
per-index Postgres table + HNSW index becomes "a column + the exact/LSH/IVF
paths" — creating an index here records its contract (metric, dimension,
filterable keys) and validates queries against it.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storage_spark.operators.aggregates import capped_count
from storage_spark.operators.mutations import KeyAlreadyExistsError, create_rows

MAX_DIMENSIONS = 4000  # pgvector halfvec opclass cap (pgvector/index.ts:436-446)
DISTANCE_METRICS = ("cosine", "euclidean")
DEFAULT_MAX_INDEXES = 500  # listIndexes hard cap doubles as the quota (pg.ts:232)

INDEX_SCHEMA = (
    "bucket_id string, name string, data_type string, dimension int,"
    " distance_metric string, metadata_configuration string,"
    " created_at_ms bigint"
)


class VectorBucketNotFoundError(Exception):
    """S3VectorNotFoundException('vector bucket') (pg.ts:207)."""


class VectorIndexNotFoundError(Exception):
    """S3VectorNotFoundException('vector index') (pg.ts:272)."""


class InvalidIndexParameterError(Exception):
    """ERRORS.InvalidParameter at create-index time (pgvector/index.ts:429-455)."""


class VectorBucketNotEmptyError(Exception):
    """FK refusal on bucket delete while indexes remain (0045:18) —
    distinct from a unique violation."""


def create_vector_bucket(buckets: DataFrame, bucket_name: str) -> DataFrame:
    """createVectorBucket (pg.ts:213-229): INSERT; id collision conflicts."""
    spark = buckets.sparkSession
    row = spark.createDataFrame([(bucket_name, "VECTOR")], "id string, type string")
    return create_rows(buckets, row.select(*buckets.columns), ["id"])


def create_vector_index(
    indexes: DataFrame,
    buckets: DataFrame,
    bucket_id: str,
    name: str,
    dimension: int,
    data_type: str = "float32",
    distance_metric: str = "cosine",
    metadata_configuration: dict | None = None,
    created_at_ms: int = 0,
    max_indexes: int = DEFAULT_MAX_INDEXES,
) -> DataFrame:
    """createVectorIndex (pg.ts:278-315) with the pgvector adapter's
    create-time validation (pgvector/index.ts:425-455) and an A6-capped
    per-bucket quota (the capped count never scans past the limit)."""
    if data_type != "float32":
        raise InvalidIndexParameterError(
            f"Unsupported data type for this backend: {data_type}"
        )
    if (
        not isinstance(dimension, int)
        or isinstance(dimension, bool)
        or dimension < 1
        or dimension > MAX_DIMENSIONS
    ):
        raise InvalidIndexParameterError(
            f"Invalid dimension: {dimension} (must be 1..{MAX_DIMENSIONS})"
        )
    if distance_metric not in DISTANCE_METRICS:
        raise InvalidIndexParameterError(
            f"Invalid distance metric: {distance_metric}"
        )
    if buckets.filter(F.col("id") == bucket_id).limit(1).count() == 0:
        raise VectorBucketNotFoundError(bucket_id)
    n = capped_count(
        indexes.filter(F.col("bucket_id") == bucket_id), max_indexes
    ).collect()[0]["n"]
    if n >= max_indexes:
        raise InvalidIndexParameterError(f"index quota {max_indexes} reached")
    spark = indexes.sparkSession
    row = spark.createDataFrame(
        [
            (
                bucket_id,
                name,
                data_type,
                dimension,
                distance_metric,
                json.dumps(metadata_configuration)
                if metadata_configuration is not None
                else None,
                created_at_ms,
            )
        ],
        INDEX_SCHEMA,
    )
    try:
        return create_rows(indexes, row.select(*indexes.columns), ["bucket_id", "name"])
    except KeyAlreadyExistsError as e:
        raise KeyAlreadyExistsError(
            f"vector index conflict: {bucket_id}/{name}"
        ) from e


def delete_vector_index(indexes: DataFrame, bucket_id: str, name: str) -> DataFrame:
    """deleteVectorIndex (pg.ts:317-327)."""
    return indexes.filter(
        ~((F.col("bucket_id") == bucket_id) & (F.col("name") == name))
    )


def delete_vector_bucket(
    buckets: DataFrame, indexes: DataFrame, bucket_name: str
) -> DataFrame:
    """deleteVectorBucket (pg.ts:329-338). The FK from vector_indexes
    (0045:18) makes deleting a bucket with live indexes a violation."""
    if indexes.filter(F.col("bucket_id") == bucket_name).limit(1).count():
        raise VectorBucketNotEmptyError(
            f"vector bucket {bucket_name} still has indexes (FK violation)"
        )
    return buckets.filter(F.col("id") != bucket_name)


def list_indexes(
    indexes: DataFrame,
    bucket_id: str,
    prefix: str | None = None,
    next_token: str | None = None,
    max_results: int = 500,
) -> DataFrame:
    """listIndexes (pg.ts:231-266): name-ordered keyset pagination with a
    prefix filter; the sargable range rewrite (F2) applies to the prefix."""
    from storage_spark.functions.paths import prefix_range_filter

    df = indexes.filter(F.col("bucket_id") == bucket_id)
    if prefix:
        df = df.filter(prefix_range_filter(F.col("name"), prefix))
    if next_token:
        df = df.filter(F.col("name") > next_token)
    # Zero/negative max_results falls back to the default page size (the
    # reference treats it as "unset"); never hand limit() a non-positive
    # value (empty page / IllegalArgumentException).
    page = max_results if 0 < max_results <= 500 else 500
    return (
        df.select("name", "bucket_id", "created_at_ms")
        .orderBy("name")
        .limit(page)
    )


def get_index(indexes: DataFrame, bucket_id: str, name: str):
    """getIndex (pg.ts:268-276): the row, or not-found."""
    rows = (
        indexes.filter(
            (F.col("bucket_id") == bucket_id) & (F.col("name") == name)
        )
        .limit(1)
        .collect()
    )
    if not rows:
        raise VectorIndexNotFoundError(f"{bucket_id}/{name}")
    return rows[0]


def non_filterable_keys(index_row) -> set[str]:
    """metadata_configuration.nonFilterableMetadataKeys → the F10 validation
    set (vector-store.ts:166-185)."""
    raw = index_row["metadata_configuration"]
    if not raw:
        return set()
    cfg = json.loads(raw)
    return set(cfg.get("nonFilterableMetadataKeys") or [])


MAX_VECTOR_KEYS = 100  # MAX_GET/DELETE_VECTOR_KEYS (pgvector/index.ts:693,726)


def put_vectors(
    store: DataFrame,
    rows: DataFrame,
    index_row=None,
    key_col: str = "key",
    vector_col: str = "embedding",
) -> DataFrame:
    """putVectors (pgvector/index.ts:518-585): batch upsert keyed on
    ``key`` — INSERT … ON CONFLICT (key) DO UPDATE as one merge. With an
    ``index_row`` the batch is validated against the index contract
    (dimension) before it lands, the create-time check the adapter gets
    from the halfvec(N) column type."""
    from storage_spark.operators.mutations import merge_upsert

    if index_row is not None:
        dim = index_row["dimension"]
        bad = rows.filter(F.size(F.col(vector_col)) != dim).limit(1).count()
        if bad:
            raise InvalidIndexParameterError(
                f"vector dimension != index dimension {dim}"
            )
    return merge_upsert(store, rows, [key_col])


def get_vectors(
    store: DataFrame,
    keys: list[str],
    return_data: bool = False,
    return_metadata: bool = False,
    key_col: str = "key",
    vector_col: str = "embedding",
    metadata_col: str = "metadata",
) -> DataFrame:
    """getVectors (pgvector/index.ts:690-721): keyed fetch with explicit
    projection flags (column pruning reaches the scan for free)."""
    if len(keys) > MAX_VECTOR_KEYS:
        raise InvalidIndexParameterError(
            f"too many keys: {len(keys)} > {MAX_VECTOR_KEYS}"
        )
    cols = [F.col(key_col)]
    if return_data:
        cols.append(F.col(vector_col))
    if return_metadata and metadata_col in store.columns:
        cols.append(F.col(metadata_col))
    return store.filter(F.col(key_col).isin(keys)).select(*cols)


def delete_vectors(
    store: DataFrame, keys: list[str], key_col: str = "key"
) -> DataFrame:
    """deleteVectors (pgvector/index.ts:723-738): keyed batch delete."""
    if len(keys) > MAX_VECTOR_KEYS:
        raise InvalidIndexParameterError(
            f"too many keys: {len(keys)} > {MAX_VECTOR_KEYS}"
        )
    return store.filter(~F.col(key_col).isin(keys))


def query_index(
    indexes: DataFrame,
    vectors: DataFrame,
    bucket_id: str,
    index_name: str,
    query_vec: list[float],
    top_k: int,
    filter_ast: dict | None = None,
    metadata_col: str = "metadata",
) -> DataFrame:
    """QueryVectors routed through the index contract: the stored
    distance_metric picks the operator (pgvector/index.ts:325-334), the
    stored dimension validates the query vector, and the stored
    metadata_configuration drives F10 filter validation — the wiring the
    reference does per-request in vector-store.ts."""
    from storage_spark.functions.vectors import query_vectors

    idx = get_index(indexes, bucket_id, index_name)
    if len(query_vec) != idx["dimension"]:
        raise InvalidIndexParameterError(
            f"query vector dimension {len(query_vec)} != index dimension"
            f" {idx['dimension']}"
        )
    return query_vectors(
        vectors,
        query_vec,
        top_k=top_k,
        metric=idx["distance_metric"],
        filter_ast=filter_ast,
        metadata_col=metadata_col,
        non_filterable=non_filterable_keys(idx),
    )
