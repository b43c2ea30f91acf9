"""S3 multipart upload operators — listing (O6 + the A5 delimiter variant)
and the write side (create / upload-part / complete / abort).

Reference:
- createMultipartUpload: INSERT with in_progress_size 0 + upload signature
  (pg.ts:1455-1495; s3-handler.ts:440-480)
- shouldAllowPartUpload: signature check → progress accumulation → size cap
  (s3-handler.ts:1432-1462); insertUploadPart (pg.ts:1561-1580)
- listParts: ``ORDER BY part_number LIMIT max`` with ``part_number > after``
  keyset (pg.ts:1581-1613)
- completeMultipartUpload: assemble parts → object upsert → delete upload
  (s3-handler.ts:489-560); abort → deleteMultipartUpload (pg.ts:1545-1560)
- list_multipart_uploads_with_delimiter: DISTINCT ON common-prefix folding
  over in-flight upload keys (migrations/tenant/0021-s3-multipart-uploads
  .sql:28-67)

The reference guards per-request progress races with SELECT … FOR UPDATE;
a batch engine applies a whole batch of parts as ONE set-oriented merge, so
the per-upload accumulation is a groupBy instead of a lock. The upload
signature (an encrypted copy of the progress the reference uses to detect
out-of-band writes) becomes a deterministic digest of the progress value —
pure-function, recomputable by any engine, tamper-evident against the
stored progress column.

TUS lease lockers (src/storage/protocols/tus/postgres-locker.ts:53,
s3-locker.ts:40) are deliberately NOT modelled: their whole purpose is to
serialize CONCURRENT PATCH requests mutating one upload's byte stream in
place. In this engine an upload's parts are immutable rows applied in
set-oriented batches and the final assembly is one deterministic merge
commit — the table format's optimistic-concurrency commit (see
mutations.CatalogTable) already rejects conflicting writers, which is
exactly the serialization the lease provided, without lease renewal
machinery or expiry races.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from storage_spark.functions.paths import common_prefix, prefix_range_filter
from storage_spark.operators.dedup import pin_bounded


class EntityTooLargeError(Exception):
    """A part batch would push an upload past its size cap
    (ERRORS.EntityTooLarge, s3-handler.ts:1454-1456)."""


class InvalidUploadSignatureError(Exception):
    """Stored progress does not match its signature
    (ERRORS.InvalidUploadSignature, s3-handler.ts:1448-1450)."""


class InvalidCompleteError(Exception):
    """CompleteMultipartUpload with no parts / malformed part list
    (the XML parser enforces ≥1 Part; this is the engine-side guard)."""


def upload_signature(progress: Column) -> Column:
    """Deterministic signature of the progress value — the engine analogue
    of uploadSignature({in_progress_size}) (s3-handler.ts:458, :1458).
    md5-based so Spark, the oracle, and any auditor recompute it identically;
    deployments needing secrecy swap in operators.signing HMAC."""
    return F.md5(F.concat(F.lit("mpu-sig:"), progress.cast("string")))


def with_signature(uploads: DataFrame) -> DataFrame:
    """Attach the derived ``upload_signature`` column."""
    return uploads.withColumn(
        "upload_signature", upload_signature(F.col("in_progress_size"))
    )


def validate_signatures(uploads_signed: DataFrame) -> DataFrame:
    """Rows whose stored signature does NOT match their progress — the batch
    analogue of decryptUploadSignature → InvalidUploadSignature
    (s3-handler.ts:1446-1450)."""
    return uploads_signed.filter(
        F.col("upload_signature") != upload_signature(F.col("in_progress_size"))
    )


def create_multipart_upload(
    uploads: DataFrame,
    upload_id: str,
    bucket_id: str,
    key: str,
    version: str = "v1",
    owner_id: str | None = None,
    created_at_ms: int = 0,
    metadata: str | None = None,
) -> DataFrame:
    """CreateMultipartUpload (pg.ts:1455-1495): INSERT with
    in_progress_size = 0; id collision is an error (PRIMARY KEY).
    ``metadata`` is the upload-scoped jsonb added by
    0057-s3-multipart-uploads-metadata.sql (NULL allowed), stored on the
    upload row and read back at complete time (s3-handler.ts:500-508)."""
    from storage_spark.operators.mutations import create_rows

    spark = uploads.sparkSession
    row = spark.createDataFrame(
        [(upload_id, bucket_id, key, version, 0, owner_id, created_at_ms,
          metadata)],
        "id string, bucket_id string, key string, version string,"
        " in_progress_size bigint, owner_id string, created_at_ms bigint,"
        " metadata string",
    )
    # select(*uploads.columns) keeps this compatible with pre-0057 upload
    # tables that lack the metadata column
    return create_rows(uploads, row.select(*uploads.columns), ["id"])


def upload_parts(
    uploads: DataFrame,
    parts: DataFrame,
    new_parts: DataFrame,
    max_file_size: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Apply a batch of parts: per-upload accumulation + size-cap gate in
    ONE set-oriented pass (the merge form of shouldAllowPartUpload +
    insertUploadPart, s3-handler.ts:1432-1462, pg.ts:1561-1580).

    Returns ``(uploads', parts', rejected_parts)``: uploads whose batch
    total would exceed ``max_file_size`` are left untouched and ALL their
    new parts land in ``rejected_parts`` (the reference rejects the request;
    partial application would corrupt the signature chain).

    S3 retry semantics: re-uploading an existing ``part_number`` REPLACES
    the stored part, so the progress delta counts ``new − replaced_old``
    bytes and the parts table upserts on (upload_id, part_number) — a
    retried part never double-counts toward the size cap or the final
    object. Within one batch the last row per part_number wins
    (max created_at_ms, ties by size).
    """
    # last-write-wins within the batch itself
    from storage_spark.operators.scans import first_per_group

    # pinned: the deduped batch feeds FOUR consumers (replaced probe,
    # add, accepted, and surviving's anti-join via accepted) and each
    # unpinned reference replayed the whole upstream request chain plus
    # this window — q_multipart_part_copy's plan carried 80 scans / 30
    # windows before the pin (r12 sweep). Bounded by the REQUEST batch,
    # never a corpus; scope-releasable via pin_bounded (r13).
    batch = pin_bounded(
        first_per_group(
            new_parts,
            ["upload_id", "part_number"],
            [F.col("created_at_ms").desc(), F.col("size").desc()],
        )
    )
    # bytes freed by parts this batch replaces
    replaced = (
        parts.join(
            batch.select("upload_id", "part_number"),
            ["upload_id", "part_number"],
            "left_semi",
        )
        .groupBy(F.col("upload_id").alias("id"))
        .agg(F.sum("size").alias("_old"))
    )
    add = (
        batch.groupBy(F.col("upload_id").alias("id"))
        .agg(F.sum("size").alias("_new"))
        .join(replaced, "id", "left")
        .select(
            "id",
            (F.col("_new") - F.coalesce(F.col("_old"), F.lit(0))).alias("_add"),
        )
    )
    gated = uploads.join(F.broadcast(add), "id", "left").withColumn(
        "_new_size",
        F.col("in_progress_size") + F.coalesce(F.col("_add"), F.lit(0)),
    )
    # pinned: id-width, read by accepted/rejected/surviving — unpinned
    # it replayed the uploads-gate join per reference (see batch above)
    ok_ids = pin_bounded(
        gated.filter(F.col("_new_size") <= max_file_size).select("id")
    )
    updated = (
        gated.withColumn(
            "in_progress_size",
            F.when(F.col("_new_size") <= max_file_size, F.col("_new_size")).otherwise(
                F.col("in_progress_size")
            ),
        )
        .drop("_add", "_new_size")
    )
    if "upload_signature" in updated.columns:
        # the reference re-signs on every progress update
        # (s3-handler.ts:1458); a stale stored signature would read as
        # tampering to validate_signatures
        updated = updated.withColumn(
            "upload_signature", upload_signature(F.col("in_progress_size"))
        )
    ok_uploads = F.broadcast(ok_ids.withColumnRenamed("id", "upload_id"))
    accepted = batch.join(ok_uploads, "upload_id", "left_semi")
    rejected = new_parts.join(ok_uploads, "upload_id", "left_anti")
    surviving = parts.join(
        accepted.select("upload_id", "part_number"),
        ["upload_id", "part_number"],
        "left_anti",
    )
    return updated, surviving.unionByName(accepted), rejected


def upload_part_copy(
    uploads: DataFrame,
    parts: DataFrame,
    objects: DataFrame,
    copies: DataFrame,
    max_file_size: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """S3 UploadPartCopy as a set-oriented batch
    (s3-handler.ts:1267-1390; range rules: range.ts:58-77
    parseCopySourceRangeHeader; route: operations.ts S3_UPLOAD_PART_COPY).

    ``copies`` rows: ``(upload_id, part_number, source_bucket, source_key,
    range_start, range_end, created_at_ms)`` — the two range bounds are
    BOTH present or BOTH NULL (the copy-source header regex requires
    ``bytes=(\\d+)-(\\d+)``; NULL/NULL copies the whole object).

    Per request, exactly the reference's checks, as Column expressions over
    ONE equi-join to the object catalog:

    - source resolved by (bucket, key) → missing = ``NO_SUCH_KEY``;
    - range valid iff ``0 <= start <= end < source_size`` (range.ts:69
      rejects ``toByte >= sourceSize`` — copy ranges do NOT clamp, unlike
      read ranges) → ``INVALID_RANGE``;
    - copy size = ``end - start + 1`` (or the whole source size), then the
      same per-upload accumulation + cap gate as uploaded parts via
      ``upload_parts`` → ``ENTITY_TOO_LARGE``.

    The part's etag is the deterministic digest of the source identity and
    byte range (the backend's copy-part etag is content-addressed; source
    id/version + range IS the content identity here).

    Returns ``(uploads', parts', failed)`` — ``failed`` carries the copy
    request columns plus ``reason``.
    """
    src = objects.select(
        F.col("bucket_id").alias("source_bucket"),
        F.col("name").alias("source_key"),
        F.col("id").alias("_src_id"),
        F.col("version").alias("_src_version"),
        F.col("size").alias("_src_size"),
    )
    # The reference resolves the multipart upload BEFORE the copy source
    # (s3-handler.ts UploadPartCopy), so an unknown upload_id is
    # NoSuchUpload — not a downstream size rejection.
    up_ids = uploads.select(
        F.col("id").alias("upload_id"), F.lit(True).alias("_up_ok")
    ).distinct()
    joined = copies.join(src, ["source_bucket", "source_key"], "left").join(
        up_ids, "upload_id", "left"
    )
    has_range = F.col("range_start").isNotNull() | F.col("range_end").isNotNull()
    range_valid = (
        F.col("range_start").isNotNull()
        & F.col("range_end").isNotNull()
        & (F.col("range_start") >= 0)
        & (F.col("range_end") >= F.col("range_start"))
        & (F.col("range_end") < F.col("_src_size"))
    )
    # pinned: failed_early and the ok branch both read this — unpinned,
    # each replayed the copies x catalog resolution join (request-batch
    # sized; part of the 80-scan plan the r12 sweep flagged)
    classified = pin_bounded(
        joined.withColumn(
            "reason",
            F.when(F.col("_up_ok").isNull(), F.lit("NO_SUCH_UPLOAD"))
            .when(F.col("_src_id").isNull(), F.lit("NO_SUCH_KEY"))
            .when(
                has_range & ~F.coalesce(range_valid, F.lit(False)),
                F.lit("INVALID_RANGE"),
            )
            .otherwise(F.lit(None)),
        )
    )
    copy_cols = copies.columns
    failed_early = classified.filter(F.col("reason").isNotNull()).select(
        *copy_cols, "reason"
    )
    ok = classified.filter(F.col("reason").isNull())
    derived = ok.select(
        "upload_id",
        "part_number",
        F.when(
            has_range, F.col("range_end") - F.col("range_start") + 1
        ).otherwise(F.col("_src_size")).alias("size"),
        F.md5(
            F.concat_ws(
                ":",
                F.lit("part-copy"),
                F.col("_src_id"),
                F.col("_src_version"),
                F.coalesce(F.col("range_start").cast("string"), F.lit("0")),
                F.coalesce(
                    F.col("range_end").cast("string"),
                    (F.col("_src_size") - 1).cast("string"),
                ),
            )
        ).alias("etag"),
        "created_at_ms",
    )
    new_uploads, new_parts, rejected = upload_parts(
        uploads, parts, derived, max_file_size
    )
    too_large = copies.join(
        rejected.select("upload_id", "part_number"),
        ["upload_id", "part_number"],
        "left_semi",
    ).select(*copy_cols, F.lit("ENTITY_TOO_LARGE").alias("reason"))
    return new_uploads, new_parts, failed_early.unionByName(too_large)


def complete_multipart_upload(
    uploads: DataFrame,
    parts: DataFrame,
    objects: DataFrame,
    upload_id: str,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Assemble previously uploaded parts into the final object
    (s3-handler.ts:489-560): object size = Σ part sizes, ETag is the
    AWS-style hash-of-hashes ``md5(concat(etags)) || '-' || n``; the upload
    row and its parts are deleted (ON DELETE CASCADE, 0021:14).

    Returns ``(objects', uploads', parts', assembled)`` where ``assembled``
    is the 1-row RETURNING-parity DataFrame.
    """
    from storage_spark.operators.mutations import NoSuchKeyError, merge_upsert

    up = uploads.filter(F.col("id") == upload_id)
    if up.limit(1).count() == 0:
        raise NoSuchKeyError(f"no such upload: {upload_id}")
    if parts.filter(F.col("upload_id") == upload_id).limit(1).count() == 0:
        # completing with zero parts is an error (the reference requires at
        # least one Part; silently dropping the upload row would destroy an
        # in-flight upload without producing an object)
        raise InvalidCompleteError(f"upload {upload_id} has no parts")
    assembled = (
        parts.filter(F.col("upload_id") == upload_id)
        .groupBy("upload_id")
        .agg(
            F.sum("size").alias("size"),
            F.count(F.lit(1)).alias("n_parts"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("part_number", "etag"))
                        ),
                        lambda s: s["etag"],
                    ),
                    "",
                )
            ).alias("etag_md5"),
        )
        .join(
            up.select(
                F.col("id").alias("upload_id"), "bucket_id",
                F.col("key").alias("name"), "version", "owner_id",
                "created_at_ms",
                # 0057 upload-scoped metadata rides along to the RETURNING
                # row (findMultipartUpload('…,metadata') at complete time,
                # s3-handler.ts:500-508); absent on pre-0057 tables
                *(["metadata"] if "metadata" in uploads.columns else []),
            ),
            "upload_id",
        )
        .withColumn(
            "etag", F.concat(F.col("etag_md5"), F.lit("-"), F.col("n_parts"))
        )
        .drop("etag_md5")
    )
    new_objects = merge_upsert(
        objects,
        assembled.select(
            F.col("upload_id").alias("id"), "bucket_id", "name", "size",
            "created_at_ms", F.col("created_at_ms").alias("updated_at_ms"),
            "owner_id", "version",
            F.lit("application/octet-stream").alias("mimetype"),
        ),
        ["bucket_id", "name"],
    )
    return (
        new_objects,
        uploads.filter(F.col("id") != upload_id),
        parts.filter(F.col("upload_id") != upload_id),
        assembled,
    )


def abort_multipart_upload(
    uploads: DataFrame, parts: DataFrame, upload_id: str
) -> tuple[DataFrame, DataFrame]:
    """AbortMultipartUpload (s3-handler.ts:761+, pg.ts:1545-1560): drop the
    upload row; the parts cascade."""
    return (
        uploads.filter(F.col("id") != upload_id),
        parts.filter(F.col("upload_id") != upload_id),
    )


def multipart_progress(
    uploads: DataFrame, parts: DataFrame
) -> DataFrame:
    """Per-upload progress reconciliation: declared ``in_progress_size``
    (the signature-guarded accumulator) vs the Σ size of parts actually
    inserted — the set-oriented audit of the invariant
    shouldAllowPartUpload maintains per request. ``drift ≠ 0`` marks uploads
    whose part inserts failed after the progress bump (the compensation
    path at s3-handler.ts:684-694)."""
    actual = parts.groupBy(F.col("upload_id").alias("id")).agg(
        F.sum("size").alias("parts_size"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        uploads.join(actual, "id", "left")
        .select(
            "id",
            "key",
            "in_progress_size",
            F.coalesce(F.col("parts_size"), F.lit(0)).alias("parts_size"),
            F.coalesce(F.col("n_parts"), F.lit(0)).alias("n_parts"),
            (
                F.col("in_progress_size")
                - F.coalesce(F.col("parts_size"), F.lit(0))
            ).alias("drift"),
        )
    )


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
