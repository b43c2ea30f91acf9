"""S3 multipart upload listing operators (O6 + the A5 delimiter variant).

Reference:
- listParts: ``ORDER BY part_number LIMIT max`` with ``part_number > after``
  keyset (pg.ts:1581-1613)
- list_multipart_uploads_with_delimiter: DISTINCT ON common-prefix folding
  over in-flight upload keys (migrations/tenant/0021-s3-multipart-uploads
  .sql:28-67)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storage_spark.functions.paths import common_prefix, prefix_range_filter


def encode_upload_id(bucket: str, key: str, version: str) -> str:
    """TUS/S3 upload-id codec (src/storage/protocols/tus/upload-id.ts:15):
    url-safe base64 of the tuple, so the id round-trips through URLs."""
    import base64

    raw = "\x00".join((bucket, key, version))
    return base64.urlsafe_b64encode(raw.encode()).decode().rstrip("=")


def decode_upload_id(upload_id: str) -> tuple[str, str, str]:
    import base64

    pad = "=" * (-len(upload_id) % 4)
    raw = base64.urlsafe_b64decode((upload_id + pad).encode()).decode()
    parts = raw.split("\x00")
    if len(parts) != 3 or not all(parts[:2]):
        raise ValueError(f"invalid upload id: {upload_id!r}")
    return parts[0], parts[1], parts[2]


def list_parts(
    parts: DataFrame,
    upload_id: str,
    part_number_after: int | None = None,
    max_parts: int | None = None,
) -> DataFrame:
    df = parts.filter(F.col("upload_id") == upload_id)
    if part_number_after is not None:
        df = df.filter(F.col("part_number") > part_number_after)
    df = df.orderBy("part_number")
    if max_parts is not None:
        df = df.limit(max_parts)
    return df


def list_multipart_uploads(
    uploads: DataFrame,
    bucket_id: str | None = None,
    prefix: str = "",
    delimiter: str | None = "/",
    key_after: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Delimiter listing over in-flight upload keys: folders become
    ``prefix + segment + delimiter`` rows with NULL id (the DISTINCT ON in
    0021:28-67 ≡ group-by common prefix), leaves pass through ordered by
    ``(key, created_at)``."""
    df = uploads
    if bucket_id is not None:
        df = df.filter(F.col("bucket_id") == bucket_id)
    if prefix:
        df = df.filter(prefix_range_filter(F.col("key"), prefix))
    if delimiter:
        cp = common_prefix(F.col("key"), prefix, delimiter)
        df = df.withColumn("_cp", cp)
        folders = (
            df.filter(F.col("_cp").isNotNull())
            .groupBy(F.col("_cp").alias("key"))
            .agg(F.min("created_at_ms").alias("created_at_ms"))
            .select("key", F.lit(None).cast("string").alias("id"), "created_at_ms")
        )
        leaves = df.filter(F.col("_cp").isNull()).select("key", "id", "created_at_ms")
        df = folders.unionByName(leaves)
    else:
        df = df.select("key", "id", "created_at_ms")
    if key_after:
        df = df.filter(F.col("key") > key_after)
    df = df.orderBy("key", "created_at_ms")
    if limit is not None:
        df = df.limit(limit)
    return df
