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
