"""Bucket scans and key-probe operators (S2/S3, F6/F7, J4, A5/W1, J1).

Reference:
- listBuckets with search/sort/limit/offset: pg.ts:746-791
- findObjectVersions / deleteObjectVersions tuple probes: pg.ts:1093-1117,
  1229-1253
- findObjects by id array (`id = ANY($1)`): pg.ts:728-744
- DISTINCT ON first-per-key: 0020-list-objects-with-delimiter.sql:3-40
- legacy folder left-join search v0: 0002-storage-schema.sql:125-150
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def list_buckets(
    buckets: DataFrame,
    search: str | None = None,
    sort_column: str = "name",
    sort_desc: bool = False,
    limit: int | None = None,
    offset: int | None = None,
) -> DataFrame:
    """S2: bucket listing with ILIKE search (case-insensitive contains) and
    sort/limit/offset pagination (pg.ts:746-791)."""
    df = buckets
    if search:
        df = df.filter(F.lower(F.col("name")).contains(search.lower()))
    key = F.col(sort_column)
    df = df.orderBy(key.desc() if sort_desc else key.asc(), F.col("name").asc())
    if offset:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    return df


def find_object_versions(objects: DataFrame, pairs: DataFrame) -> DataFrame:
    """F6: ``(name, version) IN ((…),(…))`` as a broadcast semi-join on the
    composite key (pg.ts:1093-1117). The probe side is small by contract
    (page-sized), so it broadcasts — no shuffle of the objects side."""
    return objects.join(
        F.broadcast(pairs.select("name", "version")), ["name", "version"], "left_semi"
    )


def find_objects_by_id(objects: DataFrame, ids: list[str]) -> DataFrame:
    """F7: ``id = ANY($1::text[])`` (pg.ts:728-744). For literal lists an
    ``isin`` compiles to an in-set predicate pushed to the scan; for a
    DataFrame of ids use a semi-join instead."""
    return objects.filter(F.col("id").isin(ids))


def first_per_group(
    df: DataFrame, group_cols: list[str], order: list[Column]
) -> DataFrame:
    """A5/W1: ``SELECT DISTINCT ON (group) … ORDER BY …`` as a window
    row_number — first row per group under the given order."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def legacy_folder_search(
    objects: DataFrame,
    bucket_id: str,
    prefix: str = "",
    delimiter: str = "/",
    levels: int = 1,
) -> DataFrame:
    """J1: the v0 ``storage.search`` plan (0002-storage-schema.sql:125-150):
    the ``levels``-th path segment per object — a BARE token with no
    trailing delimiter — grouped distinct, then LEFT JOINed back to the
    SAME bucket's objects on ``prefix || folder = name``, so leaf segments
    carry their object's columns and pure folders carry NULLs. Superseded
    by the A4 common-prefix plan; kept for parity."""
    import re as _re

    from storage_spark.functions.paths import prefix_range_filter

    src = objects.filter(F.col("bucket_id") == bucket_id)
    if prefix:
        src = src.filter(prefix_range_filter(F.col("name"), prefix))
    seg = F.element_at(F.split(F.col("name"), _re.escape(delimiter)), levels)
    folders = src.select(seg.alias("name")).distinct()
    same_bucket = objects.filter(F.col("bucket_id") == bucket_id).select(
        F.col("name").alias("_objname"), "id", "size"
    )
    return (
        folders.withColumn("_objname", F.concat(F.lit(prefix), F.col("name")))
        .join(same_bucket, "_objname", "left")
        .select("name", "id", "size")
    )
