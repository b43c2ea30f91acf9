"""Multipart write-side semantics: create / part accumulation + size cap /
complete (assemble) / abort — the batch re-expression of
s3-handler.ts:440-560, :1432-1462 and pg.ts:1455-1613."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storage_spark.operators.multipart import (
    abort_multipart_upload,
    complete_multipart_upload,
    create_multipart_upload,
    multipart_progress,
    upload_parts,
    upload_signature,
    validate_signatures,
    with_signature,
)
from storage_spark.operators.mutations import KeyAlreadyExistsError

UPLOAD_SCHEMA = (
    "id string, bucket_id string, key string, version string,"
    " in_progress_size bigint, owner_id string, created_at_ms bigint"
)
PART_SCHEMA = (
    "upload_id string, part_number int, size bigint, etag string,"
    " created_at_ms bigint"
)


@pytest.fixture()
def uploads(spark):
    return spark.createDataFrame(
        [("up-a", "b1", "dir/a.bin", "v1", 0, "u1", 1000)], UPLOAD_SCHEMA
    )


@pytest.fixture()
def parts(spark):
    return spark.createDataFrame([], PART_SCHEMA)


def test_create_then_duplicate_fails(spark, uploads):
    out = create_multipart_upload(uploads, "up-b", "b1", "x/y.bin")
    assert out.count() == 2
    row = out.filter(F.col("id") == "up-b").first()
    assert row["in_progress_size"] == 0
    with pytest.raises(KeyAlreadyExistsError):
        create_multipart_upload(out, "up-a", "b1", "again.bin")


def test_upload_parts_accumulates_and_caps(spark, uploads, parts):
    batch = spark.createDataFrame(
        [("up-a", 1, 600, "e1", 1001), ("up-a", 2, 300, "e2", 1002)], PART_SCHEMA
    )
    up2, parts2, rejected = upload_parts(uploads, parts, batch, max_file_size=1000)
    assert rejected.count() == 0
    assert up2.first()["in_progress_size"] == 900
    assert parts2.count() == 2
    # a second batch pushing past the cap rejects the WHOLE batch for that
    # upload and leaves progress untouched (EntityTooLarge semantics)
    batch2 = spark.createDataFrame([("up-a", 3, 200, "e3", 1003)], PART_SCHEMA)
    up3, parts3, rejected3 = upload_parts(up2, parts2, batch2, max_file_size=1000)
    assert rejected3.count() == 1
    assert up3.first()["in_progress_size"] == 900
    assert parts3.count() == 2


def test_part_retry_replaces_not_duplicates(spark, uploads, parts):
    """S3 retry semantics: re-uploading a part_number REPLACES the stored
    part — progress counts the delta, never double-counts, and the
    completed object sees one part."""
    b1 = spark.createDataFrame([("up-a", 1, 100, "e1", 1001)], PART_SCHEMA)
    up2, parts2, _ = upload_parts(uploads, parts, b1, max_file_size=1000)
    assert up2.first()["in_progress_size"] == 100
    # retry with a different size (e.g. after a corrected upload)
    b2 = spark.createDataFrame([("up-a", 1, 120, "e1b", 1002)], PART_SCHEMA)
    up3, parts3, rej = upload_parts(up2, parts2, b2, max_file_size=1000)
    assert rej.count() == 0
    assert up3.first()["in_progress_size"] == 120  # delta, not 220
    rows = parts3.collect()
    assert len(rows) == 1 and rows[0]["etag"] == "e1b"
    # duplicate part_number WITHIN one batch: last write wins
    b3 = spark.createDataFrame(
        [("up-a", 2, 50, "x1", 1003), ("up-a", 2, 60, "x2", 1004)], PART_SCHEMA
    )
    up4, parts4, _ = upload_parts(up3, parts3, b3, max_file_size=1000)
    assert up4.first()["in_progress_size"] == 180
    assert {r["etag"] for r in parts4.collect()} == {"e1b", "x2"}


def test_upload_parts_refreshes_stored_signature(spark, uploads, parts):
    """A persisted upload_signature column is re-signed on every progress
    update (the reference re-signs at s3-handler.ts:1458) — otherwise every
    sanctioned write would read as tampering."""
    signed = with_signature(uploads)
    batch = spark.createDataFrame([("up-a", 1, 100, "e1", 1001)], PART_SCHEMA)
    up2, _, _ = upload_parts(signed, parts, batch, max_file_size=1000)
    assert validate_signatures(up2).count() == 0


def test_complete_requires_upload_and_parts(spark, uploads, parts):
    from storage_spark.operators.multipart import InvalidCompleteError
    from storage_spark.operators.mutations import NoSuchKeyError

    objects = spark.createDataFrame(
        [],
        "id string, bucket_id string, name string, size bigint,"
        " created_at_ms bigint, updated_at_ms bigint, owner_id string,"
        " version string, mimetype string",
    )
    with pytest.raises(NoSuchKeyError):
        complete_multipart_upload(uploads, parts, objects, "up-ghost")
    with pytest.raises(InvalidCompleteError):
        complete_multipart_upload(uploads, parts, objects, "up-a")  # no parts


def test_signature_roundtrip(spark, uploads):
    signed = with_signature(uploads)
    assert validate_signatures(signed).count() == 0
    tampered = signed.withColumn(
        "in_progress_size", F.col("in_progress_size") + 7
    )
    assert validate_signatures(tampered).count() == 1
    # and the signature is a pure function of progress
    resigned = tampered.withColumn(
        "upload_signature", upload_signature(F.col("in_progress_size"))
    )
    assert validate_signatures(resigned).count() == 0


def test_complete_assembles_and_cascades(spark, uploads, parts):
    batch = spark.createDataFrame(
        [("up-a", 2, 300, "e2", 1002), ("up-a", 1, 600, "e1", 1001)], PART_SCHEMA
    )
    up2, parts2, _ = upload_parts(uploads, parts, batch, max_file_size=10000)
    objects = spark.createDataFrame(
        [],
        "id string, bucket_id string, name string, size bigint,"
        " created_at_ms bigint, updated_at_ms bigint, owner_id string,"
        " version string, mimetype string",
    )
    obj2, up3, parts3, assembled = complete_multipart_upload(
        up2, parts2, objects, "up-a"
    )
    row = assembled.first()
    assert row["size"] == 900 and row["n_parts"] == 2
    # ETag is order-sensitive on part_number: md5(e1||e2)-2
    import hashlib

    expect = hashlib.md5(b"e1e2").hexdigest() + "-2"
    assert row["etag"] == expect
    assert up3.count() == 0 and parts3.count() == 0
    obj = obj2.first()
    assert obj["name"] == "dir/a.bin" and obj["size"] == 900


def test_abort_cascades(spark, uploads, parts):
    batch = spark.createDataFrame([("up-a", 1, 100, "e1", 1001)], PART_SCHEMA)
    up2, parts2, _ = upload_parts(uploads, parts, batch, max_file_size=10000)
    up3, parts3 = abort_multipart_upload(up2, parts2, "up-a")
    assert up3.count() == 0 and parts3.count() == 0


def test_progress_reconciliation(spark, uploads, parts):
    batch = spark.createDataFrame([("up-a", 1, 250, "e1", 1001)], PART_SCHEMA)
    up2, parts2, _ = upload_parts(uploads, parts, batch, max_file_size=10000)
    rec = multipart_progress(up2, parts2).first()
    assert rec["parts_size"] == 250 and rec["drift"] == 0
    # simulate the compensation path: progress bumped but insert failed
    drifted = up2.withColumn(
        "in_progress_size", F.col("in_progress_size") + 50
    )
    rec2 = multipart_progress(drifted, parts2).first()
    assert rec2["drift"] == 50


COPY_SCHEMA = (
    "upload_id string, part_number int, source_bucket string,"
    " source_key string, range_start bigint, range_end bigint,"
    " created_at_ms bigint"
)


@pytest.fixture()
def source_objects(spark):
    return spark.createDataFrame(
        [
            ("obj-1", "src-b", "data/big.bin", 1000, "v1"),
            ("obj-2", "src-b", "data/small.bin", 10, "v2"),
        ],
        "id string, bucket_id string, name string, size bigint, version string",
    )


def test_upload_part_copy_whole_and_ranged(spark, uploads, parts, source_objects):
    from storage_spark.operators.multipart import upload_part_copy

    copies = spark.createDataFrame(
        [
            ("up-a", 1, "src-b", "data/small.bin", None, None, 1001),  # whole
            ("up-a", 2, "src-b", "data/big.bin", 100, 599, 1002),  # 500 bytes
        ],
        COPY_SCHEMA,
    )
    up2, parts2, failed = upload_part_copy(
        uploads, parts, source_objects, copies, max_file_size=1000
    )
    assert failed.count() == 0
    got = {r.part_number: r for r in parts2.collect()}
    assert got[1].size == 10 and got[2].size == 500
    assert up2.first()["in_progress_size"] == 510
    # etag is deterministic content identity: same source+range -> same etag
    _, parts3, _ = upload_part_copy(
        uploads, parts, source_objects, copies, max_file_size=1000
    )
    assert {r.etag for r in parts2.collect()} == {r.etag for r in parts3.collect()}


def test_upload_part_copy_failures_classified(spark, uploads, parts, source_objects):
    """NO_SUCH_KEY for a missing source; INVALID_RANGE exactly per
    parseCopySourceRangeHeader (range.ts:58-77): copy ranges do NOT clamp —
    range_end >= source_size is refused, as is a half-open range."""
    from storage_spark.operators.multipart import upload_part_copy

    copies = spark.createDataFrame(
        [
            ("up-a", 1, "src-b", "nope.bin", None, None, 1001),
            ("up-a", 2, "src-b", "data/big.bin", 0, 1000, 1002),  # end==size
            ("up-a", 3, "src-b", "data/big.bin", 500, None, 1003),  # half-open
            ("up-a", 4, "src-b", "data/big.bin", 0, 999, 1004),  # exact fit
        ],
        COPY_SCHEMA,
    )
    up2, parts2, failed = upload_part_copy(
        uploads, parts, source_objects, copies, max_file_size=5000
    )
    reasons = {r.part_number: r.reason for r in failed.collect()}
    assert reasons == {1: "NO_SUCH_KEY", 2: "INVALID_RANGE", 3: "INVALID_RANGE"}
    assert [r.part_number for r in parts2.collect()] == [4]
    assert up2.first()["in_progress_size"] == 1000


def test_upload_part_copy_cap_rejects_batch(spark, uploads, parts, source_objects):
    """The copy feeds the same accumulation gate as uploaded parts: a batch
    pushing the upload past max_file_size fails whole with
    ENTITY_TOO_LARGE and leaves progress untouched."""
    from storage_spark.operators.multipart import upload_part_copy

    copies = spark.createDataFrame(
        [("up-a", 1, "src-b", "data/big.bin", None, None, 1001)], COPY_SCHEMA
    )
    up2, parts2, failed = upload_part_copy(
        uploads, parts, source_objects, copies, max_file_size=500
    )
    assert [(r.part_number, r.reason) for r in failed.collect()] == [
        (1, "ENTITY_TOO_LARGE")
    ]
    assert parts2.count() == 0
    assert up2.first()["in_progress_size"] == 0


def test_upload_part_copy_unknown_upload_is_no_such_upload(
    spark, uploads, parts, source_objects
):
    """The reference resolves the upload before the copy source: an
    unknown upload_id is NoSuchUpload — it must neither surface as
    ENTITY_TOO_LARGE nor shadow into NO_SUCH_KEY even when the source is
    ALSO missing (upload resolution happens first)."""
    from storage_spark.operators.multipart import upload_part_copy

    copies = spark.createDataFrame(
        [
            ("up-ghost", 1, "src-b", "data/small.bin", None, None, 1001),
            ("up-ghost", 2, "src-b", "nope.bin", None, None, 1002),
            ("up-a", 3, "src-b", "data/small.bin", None, None, 1003),
        ],
        COPY_SCHEMA,
    )
    up2, parts2, failed = upload_part_copy(
        uploads, parts, source_objects, copies, max_file_size=1000
    )
    reasons = {r.part_number: r.reason for r in failed.collect()}
    assert reasons == {1: "NO_SUCH_UPLOAD", 2: "NO_SUCH_UPLOAD"}
    assert [r.part_number for r in parts2.collect()] == [3]


# --------------------------------------------------------------------------
# 0057 metadata column + 0055 direct-delete guard
# --------------------------------------------------------------------------

UPLOAD_SCHEMA_META = UPLOAD_SCHEMA + ", metadata string"


def test_create_carries_metadata_and_complete_returns_it(spark):
    uploads = spark.createDataFrame([], UPLOAD_SCHEMA_META)
    parts = spark.createDataFrame([], PART_SCHEMA)
    up1 = create_multipart_upload(
        uploads, "up-m", "b1", "dir/m.bin", metadata='{"client":"cli"}'
    )
    assert up1.first()["metadata"] == '{"client":"cli"}'
    batch = spark.createDataFrame([("up-m", 1, 10, "e1", 1001)], PART_SCHEMA)
    up2, parts2, _ = upload_parts(up1, parts, batch, max_file_size=10000)
    objects = spark.createDataFrame(
        [],
        "id string, bucket_id string, name string, size bigint,"
        " created_at_ms bigint, updated_at_ms bigint, owner_id string,"
        " version string, mimetype string",
    )
    _, _, _, assembled = complete_multipart_upload(up2, parts2, objects, "up-m")
    assert assembled.first()["metadata"] == '{"client":"cli"}'


def test_pre_0057_uploads_table_still_works(spark, uploads):
    # metadata param silently dropped when the table lacks the column
    out = create_multipart_upload(
        uploads, "up-z", "b1", "z.bin", metadata='{"x":1}'
    )
    assert "metadata" not in out.columns and out.count() == 2


def test_direct_delete_guard(spark):
    from storage_spark.operators.mutations import DirectDeleteError, merge_delete

    target = spark.createDataFrame([("b1", "n1")], "bucket_id string, name string")
    probe = spark.createDataFrame([("b1", "n1")], "bucket_id string, name string")
    remaining, deleted = merge_delete(target, probe, ["bucket_id", "name"])
    assert remaining.count() == 0 and deleted.count() == 1
    with pytest.raises(DirectDeleteError):
        merge_delete(target, probe, ["bucket_id", "name"], api_mediated=False)
