"""Regression coverage for review findings: v0 legacy search parity
(bucket-restricted join, bare-token folder names) and the reconcile
in-flight-write cutoff plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from storage_spark.operators.reconcile import (
    consistency_report,
    db_orphans,
    s3_orphans,
)
from storage_spark.operators.scans import legacy_folder_search


def test_legacy_search_bucket_restricted_and_bare_tokens(spark):
    objects = spark.createDataFrame(
        [
            ("A", "docs/a.txt", "id1", 10),
            ("A", "docs", "id2", 20),      # placeholder object AT the folder name
            ("A", "top.txt", "id3", 30),   # root leaf
            ("B", "docs", "idB", 99),      # other bucket: must NOT leak in
        ],
        "bucket_id string, name string, id string, size long",
    )
    out = {r.name: r for r in legacy_folder_search(objects, "A").collect()}
    # bare tokens, no trailing delimiter (0002-storage-schema.sql:146-148)
    assert set(out) == {"docs", "top.txt"}
    # the placeholder object in bucket A matches -- bucket B's never does
    assert out["docs"].id == "id2" and out["docs"].size == 20
    assert out["top.txt"].id == "id3"
    # prefix variant: folder token is the segment AFTER the prefix and the
    # join key is prefix || token, so the leaf resolves to its object
    out2 = {r.name: r for r in legacy_folder_search(objects, "A", prefix="docs/", levels=2).collect()}
    assert set(out2) == {"a.txt"}
    assert out2["a.txt"].id == "id1"


def test_reconcile_before_ms_excludes_inflight(spark):
    objects = spark.createDataFrame(
        [("b", "old.txt", "v1")], "bucket_id string, name string, version string"
    )
    s3 = spark.createDataFrame(
        [
            ("b/old.txt/v1", 100),
            ("b/inflight.txt/v1", 9999),  # landed after the DB snapshot
            ("b/stale-orphan.txt/v1", 100),
        ],
        "key string, created_at_ms long",
    )
    # without the cutoff: the in-flight upload is (wrongly) an orphan
    assert {r.key for r in s3_orphans(objects, s3).collect()} == {
        "b/inflight.txt/v1",
        "b/stale-orphan.txt/v1",
    }
    # with the cutoff the live upload is excluded everywhere
    assert {r.key for r in s3_orphans(objects, s3, before_ms=1000).collect()} == {
        "b/stale-orphan.txt/v1"
    }
    rep = consistency_report(objects, s3, before_ms=1000)
    assert {(r.key, r.kind) for r in rep.collect()} == {
        ("b/stale-orphan.txt/v1", "S3_ORPHAN")
    }
    assert db_orphans(objects, s3, before_ms=1000).count() == 0
