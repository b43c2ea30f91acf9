"""Blob-side sources/sinks (S4, S7, S9, T9).

Reference:
- S4 backend listing: paginated ListObjectsV2 against real S3 with
  ``beforeDate`` exclusion (src/storage/backend/s3/adapter.ts:383-430) —
  here one ``binaryFile`` (or S3A) scan; pagination machinery disappears
  because the scan is already distributed, and the cutoff is a filter on
  ``modificationTime`` (T10).
- S9 byte source: getObject range/conditional reads are serving concerns;
  bulk content ops read ``content`` and push per-blob work into columnar
  expressions.
- T9 hash/count transforms (src/internal/streams/hash-stream.ts:38,
  byte-counter.ts:21): ``sha2(content, 256)`` / ``md5`` / ``length`` —
  the spill-to-disk incremental hashing exists only because Node streams
  one request at a time; a scan hashes every blob in parallel.
- S7 NDJSON sink (src/internal/streams/ndjson.ts:4): ``df.write.json``.

On a cluster the same code points at ``s3a://bucket/prefix`` — the
binaryFile reader carries path/length/modificationTime pushdown via
``pathGlobFilter`` / ``modifiedAfter`` options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def list_blobs(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    before_ms: int | None = None,
    with_content: bool = False,
) -> DataFrame:
    """S4: distributed backend listing. Emits (key, size, modified_ms
    [, content]) where key is the path's basename hierarchy under ``path``."""
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    base = path.rstrip("/") + "/"
    key = F.regexp_replace(F.col("path"), f"^.*?{base}", "")
    out = df.select(
        key.alias("key"),
        F.col("length").alias("size"),
        F.unix_millis(F.col("modificationTime")).alias("modified_ms"),
        *([F.col("content")] if with_content else []),
    )
    if before_ms is not None:
        out = out.filter(F.col("modified_ms") < before_ms)
    return out


def slice_content(
    blobs: DataFrame,
    start: int,
    length: int | None = None,
    content_col: str = "content",
) -> DataFrame:
    """S9 range read as a columnar slice: the batch form of the backend's
    ``Range`` header pass-through (src/storage/backend/s3/adapter.ts:119,
    :135 contentRange). ``start`` is 0-based; ``length=None`` reads to the
    end. Emits ``content`` (sliced) + ``content_range`` ("start-end/total",
    HTTP Content-Range shape)."""
    total = F.length(F.col(content_col))
    # substring is 1-based; binary-safe in Spark
    sliced = (
        F.substring(F.col(content_col), start + 1, length)
        if length is not None
        else F.expr(f"substring({content_col}, {start + 1})")
    )
    end = (
        F.least(F.lit(start + length), total) - 1
        if length is not None
        else total - 1
    )
    return blobs.withColumn("content_range", F.concat(
        F.lit(f"{start}-"), end.cast("string"), F.lit("/"), total.cast("string")
    )).withColumn(content_col, sliced)


def conditional_get(
    blobs: DataFrame,
    etag_col: str = "md5",
    modified_col: str = "modified_ms",
    if_match: str | None = None,
    if_none_match: str | None = None,
    if_modified_since_ms: int | None = None,
    if_unmodified_since_ms: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """S9 conditional read: the HTTP precondition headers the reference
    forwards to the backend (adapter.ts:117-123; renderer/asset.ts:20-21)
    as set filters. Returns ``(served, not_served)`` — ``not_served`` is
    the 304/412 population (If-None-Match hit or If-Modified-Since miss).

    Rows with a NULL etag/modified attribute make the raw predicate NULL;
    both ``filter(cond)`` and ``filter(~cond)`` would drop them. Coalesce to
    False so they land deterministically in ``not_served`` (a precondition
    that cannot be evaluated is not satisfied)."""
    cond = F.lit(True)
    if if_match is not None:
        cond = cond & (F.col(etag_col) == if_match.strip('"'))
    if if_none_match is not None:
        cond = cond & (F.col(etag_col) != if_none_match.strip('"'))
    if if_modified_since_ms is not None:
        cond = cond & (F.col(modified_col) > if_modified_since_ms)
    if if_unmodified_since_ms is not None:
        cond = cond & (F.col(modified_col) <= if_unmodified_since_ms)
    cond = F.coalesce(cond, F.lit(False))
    return blobs.filter(cond), blobs.filter(~cond)


def hash_blobs(blobs: DataFrame) -> DataFrame:
    """T9: content digests + byte counts as columnar expressions."""
    return blobs.select(
        "key",
        F.length(F.col("content")).alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha256"),
        F.md5(F.col("content")).alias("md5"),
    )


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: newline-delimited JSON sink (admin orphan export shape,
    src/http/routes/admin/objects.ts:81,145)."""
    df.write.mode(mode).json(path)


def read_ndjson(
    spark,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
):
    """S7 read side: schema-enforced NDJSON ingest with bad-record
    capture. PERMISSIVE mode keeps malformed lines instead of failing
    the 100 TB job at line 3 billion: a broken line lands with every
    typed column NULL and its raw text in ``corrupt_col``. Pair with
    ``split_corrupt`` to route the quarantine.

    The schema is REQUIRED: schema inference runs an extra full pass
    over the data and silently widens types on dirty input — both wrong
    at scale."""
    from pyspark.sql.types import StringType, StructField, StructType

    full = StructType(
        list(schema.fields)
        + (
            []
            if corrupt_col in schema.names
            else [StructField(corrupt_col, StringType(), True)]
        )
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_quarantine_col, quarantined_raw_lines).

    Caches the parsed frame first: Spark refuses to answer a query that
    references ONLY the corrupt-record column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and both
    outputs consume the same parse anyway, so one materialization is
    also the efficient plan."""
    df = df.cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw")
    )
    return good, bad
