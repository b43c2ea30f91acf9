"""Constraint audits: uniqueness, FK orphans, NOT NULL — violations
surface as rows, healthy tables audit clean."""

from __future__ import annotations

from pyspark.sql import functions as F

from storage_spark.operators.audit import (
    audit_report,
    duplicate_keys,
    null_violations,
    orphaned_foreign_keys,
)


def _objects(spark, rows):
    return spark.createDataFrame(rows, "bucket_id string, name string")


def test_duplicate_keys_finds_multiplicity(spark):
    df = _objects(spark, [("b", "a"), ("b", "a"), ("b", "a"), ("b", "x"), ("c", "a")])
    got = {(r.bucket_id, r.name): r.n_rows for r in duplicate_keys(df, ["bucket_id", "name"]).collect()}
    assert got == {("b", "a"): 3}


def test_orphaned_foreign_keys(spark):
    objs = _objects(spark, [("b1", "a"), ("ghost", "b"), ("b2", "c")])
    buckets = spark.createDataFrame([("b1",), ("b2",)], "name string")
    got = [r.bucket_id for r in orphaned_foreign_keys(objs, buckets, "bucket_id", "name").collect()]
    assert got == ["ghost"]


def test_null_violations_tags_columns(spark):
    df = spark.createDataFrame(
        [("b", None, 1), (None, None, 2), ("b", "k", 3)],
        "bucket_id string, name string, size long",
    )
    got = {r.size: sorted(r.null_columns) for r in null_violations(df, ["bucket_id", "name"]).collect()}
    assert got == {1: ["name"], 2: ["bucket_id", "name"]}


def test_audit_report_clean_table_is_all_zero(spark):
    objs = _objects(spark, [("b1", "a"), ("b1", "b"), ("b2", "a")])
    buckets = spark.createDataFrame([("b1",), ("b2",)], "name string")
    got = {r.check: r.n_violations for r in audit_report(objs, buckets).collect()}
    assert got == {
        "duplicate_object_keys": 0,
        "duplicate_bucket_names": 0,
        "orphaned_objects": 0,
        "null_object_names": 0,
    }
