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
