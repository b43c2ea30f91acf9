"""MERGE-semantics mutation operators (M1-M5) + lifecycle event diffs (T3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storage_spark.operators.mutations import (
    KeyAlreadyExistsError,
    ParquetTable,
    copy_object,
    create_rows,
    delete_all_before,
    lifecycle_events,
    merge_delete,
    merge_update_columns,
    merge_upsert,
)

SCHEMA = "bucket_id string, name string, size long, created_at_ms long"


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [
            ("b1", "a.txt", 10, 1000),
            ("b1", "b.txt", 20, 2000),
            ("b2", "a.txt", 30, 3000),
        ],
        SCHEMA,
    )


def test_merge_upsert(spark, target):
    updates = spark.createDataFrame(
        [("b1", "a.txt", 99, 1000), ("b1", "c.txt", 5, 4000)], SCHEMA
    )
    out = merge_upsert(target, updates, ["bucket_id", "name"])
    rows = {(r.bucket_id, r.name): r.size for r in out.collect()}
    assert rows == {
        ("b1", "a.txt"): 99,  # updated
        ("b1", "b.txt"): 20,  # survived
        ("b2", "a.txt"): 30,  # survived
        ("b1", "c.txt"): 5,  # inserted
    }


def test_merge_update_columns(spark, target):
    updates = spark.createDataFrame(
        [("b1", "a.txt", 77, 9999)], SCHEMA
    )
    out = merge_update_columns(
        target, updates, ["bucket_id", "name"], update_cols=["size"]
    )
    rows = {(r.bucket_id, r.name): (r.size, r.created_at_ms) for r in out.collect()}
    assert rows[("b1", "a.txt")] == (77, 1000)  # size updated, ts untouched
    assert rows[("b1", "b.txt")] == (20, 2000)
    assert out.count() == 3  # no inserts on update-only


def test_create_rows_conflict(spark, target):
    dup = spark.createDataFrame([("b1", "a.txt", 1, 1)], SCHEMA)
    with pytest.raises(KeyAlreadyExistsError):
        create_rows(target, dup, ["bucket_id", "name"])
    fresh = spark.createDataFrame([("b3", "z.txt", 1, 1)], SCHEMA)
    assert create_rows(target, fresh, ["bucket_id", "name"]).count() == 4


def test_merge_delete_returning(spark, target):
    probe = spark.createDataFrame(
        [("b1", "a.txt"), ("b9", "nope.txt")], "bucket_id string, name string"
    )
    remaining, deleted = merge_delete(target, probe, ["bucket_id", "name"])
    assert {r.name for r in deleted.collect()} == {"a.txt"}
    assert deleted.count() == 1  # RETURNING parity: only rows that existed
    assert remaining.count() == 2


def test_delete_all_before(spark, target):
    remaining, deleted = delete_all_before(target, before_ms=2500)
    assert deleted.count() == 2 and remaining.count() == 1
    remaining_b1, deleted_b1 = delete_all_before(target, 2500, bucket_id="b1")
    assert deleted_b1.count() == 2 and remaining_b1.count() == 1


def test_delete_all_before_null_timestamps_survive(spark):
    objects = spark.createDataFrame(
        [("b1", "old.txt", 1, 100), ("b1", "untimed.txt", 2, None)],
        "bucket_id string, name string, size long, created_at_ms long",
    )
    remaining, deleted = delete_all_before(objects, before_ms=1000)
    # the NULL-timestamp row must NOT vanish from both sides
    assert {r.name for r in deleted.collect()} == {"old.txt"}
    assert {r.name for r in remaining.collect()} == {"untimed.txt"}


def test_lifecycle_events(spark, target):
    after = spark.createDataFrame(
        [
            ("b1", "a.txt", 99, 1000),  # updated (size changed)
            ("b1", "b.txt", 20, 2000),  # unchanged
            ("b1", "new.txt", 1, 5000),  # created
        ],
        SCHEMA,
    )
    ev = lifecycle_events(target, after, ["bucket_id", "name"], "size")
    got = {(r.bucket_id, r.name, r.event_type) for r in ev.collect()}
    assert got == {
        ("b1", "new.txt", "ObjectCreated"),
        ("b1", "a.txt", "ObjectUpdatedMetadata"),
        ("b2", "a.txt", "ObjectRemoved"),
    }


def test_merge_sql_compilation():
    from storage_spark.operators.mutations import (
        merge_delete_sql,
        merge_update_columns_sql,
        merge_upsert_sql,
    )

    up = merge_upsert_sql("cat.db.objects", "src", ["bucket_id", "name"])
    assert "MERGE INTO cat.db.objects t USING src s" in up
    assert "t.bucket_id = s.bucket_id AND t.name = s.name" in up
    assert "WHEN MATCHED THEN UPDATE SET *" in up
    assert "WHEN NOT MATCHED THEN INSERT *" in up
    part = merge_update_columns_sql("tbl", "src", ["id"], ["size", "version"])
    assert "UPDATE SET t.size = s.size, t.version = s.version" in part
    assert "INSERT" not in part  # partial update never inserts
    dele = merge_delete_sql("tbl", "src", ["id"])
    assert "WHEN MATCHED THEN DELETE" in dele


def test_catalog_table_merge_execution(spark, target, tmp_path):
    """The real-DDL path: executes only when an Iceberg/Delta catalog jar
    is present (absent in this container — skip documents the gate)."""
    from storage_spark.operators.catalog import (
        configure_iceberg_catalog,
        iceberg_available,
    )
    from storage_spark.operators.mutations import CatalogTable

    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar in container")
    configure_iceberg_catalog(spark, "mcat", str(tmp_path / "wh"))
    spark.sql("CREATE TABLE IF NOT EXISTS mcat.db.objects (bucket_id string, name string, size long, created_at_ms long)")
    tab = CatalogTable(spark, "mcat.db.objects")
    tab.merge_upsert(target, ["bucket_id", "name"])
    assert tab.read().count() == 3
    updates = spark.createDataFrame([("b1", "a.txt", 99, 1000)], SCHEMA)
    tab.merge_upsert(updates, ["bucket_id", "name"])
    assert tab.read().filter("size = 99").count() == 1
    tab.merge_delete(updates, ["bucket_id", "name"])
    assert tab.read().count() == 2


def test_copy_object_mints_new_identity(spark):
    """A copy never shares the source's primary id or version (the
    reference mints both: randomUUID at object.ts:316 + upsertObject)."""
    objects = spark.createDataFrame(
        [("b1", "src.txt", "id-1", "v1", 10)],
        "bucket_id string, name string, id string, version string, size long",
    )
    out = copy_object(objects, "b1", "src.txt", "dst.txt")
    rows = {r.name: r for r in out.collect()}
    assert set(rows) == {"src.txt", "dst.txt"}
    assert rows["dst.txt"].id != rows["src.txt"].id
    assert rows["dst.txt"].version != rows["src.txt"].version
    assert rows["dst.txt"].size == 10  # metadata travels
    # explicit identity wins (deterministic replay)
    out2 = copy_object(
        objects, "b1", "src.txt", "dst.txt", new_id="N", new_version="V"
    )
    d = {r.name: r for r in out2.collect()}["dst.txt"]
    assert (d.id, d.version) == ("N", "V")
    # missing source raises (and must NOT delete a pre-existing destination)
    from storage_spark.operators.mutations import NoSuchKeyError

    with pytest.raises(NoSuchKeyError):
        copy_object(out, "b1", "no-such.txt", "dst.txt")


def test_parquet_table_commit(spark, target, tmp_path):
    path = str(tmp_path / "objects")
    target.write.parquet(path)
    tbl = ParquetTable(spark, path)
    updates = spark.createDataFrame([("b1", "a.txt", 111, 1000)], SCHEMA)
    tbl.commit(merge_upsert(tbl.read(), updates, ["bucket_id", "name"]))
    assert {
        r.size for r in tbl.read().filter(F.col("name") == "a.txt").collect()
    } == {111, 30}


def test_copy_objects_batched(spark):
    """Set-oriented copy: one pass for a whole batch — missing sources land
    in failed (no poison-pill raise), destinations get fresh identity,
    duplicate destinations dedup to one winner."""
    from storage_spark.operators.mutations import copy_objects

    objects = spark.createDataFrame(
        [
            ("b1", "a.txt", "id-1", "v1", 10),
            ("b1", "b.txt", "id-2", "v1", 20),
            ("b2", "c.txt", "id-3", "v2", 30),
        ],
        "bucket_id string, name string, id string, version string, size long",
    )
    pairs = spark.createDataFrame(
        [
            ("b1", "a.txt", None, "copies/a.txt"),
            ("b1", "b.txt", "b2", "b-moved.txt"),
            ("b1", "missing.txt", None, "copies/m.txt"),
            # two pairs to ONE destination: max source name (b.txt) wins
            ("b1", "a.txt", "b2", "dup-dst.txt"),
            ("b1", "b.txt", "b2", "dup-dst.txt"),
        ],
        "bucket_id string, from_name string, to_bucket_id string, to_name string",
    )
    out, failed = copy_objects(objects, pairs)
    assert [tuple(r) for r in failed.collect()] == [
        ("b1", "missing.txt", "b1", "copies/m.txt")
    ]
    rows = {(r.bucket_id, r.name): r for r in out.collect()}
    assert len(rows) == 3 + 3  # originals + 3 distinct destinations
    copy_a = rows[("b1", "copies/a.txt")]
    assert copy_a.size == 10
    assert copy_a.id != "id-1" and copy_a.version != "v1"
    assert rows[("b2", "dup-dst.txt")].size == 20  # b.txt won the dup dst
    # batch output identical to scalar copy_object for the same copy
    from storage_spark.operators.mutations import copy_object

    scalar = copy_object(objects, "b1", "a.txt", "copies/a.txt")
    srow = {(r.bucket_id, r.name): r for r in scalar.collect()}[("b1", "copies/a.txt")]
    assert srow.size == copy_a.size and srow.name == copy_a.name
    # a pre-existing destination row is REPLACED, not duplicated
    out2, _ = copy_objects(out, spark.createDataFrame(
        [("b1", "b.txt", "b1", "copies/a.txt")],
        "bucket_id string, from_name string, to_bucket_id string, to_name string",
    ))
    replaced = [r for r in out2.collect() if (r.bucket_id, r.name) == ("b1", "copies/a.txt")]
    assert len(replaced) == 1 and replaced[0].size == 20


def test_copy_objects_dup_dst_same_name_cross_bucket_deterministic(spark):
    """Two pairs targeting one destination from SAME-named sources in
    different buckets must pick the same winner every run: the tiebreak
    orders by (source name desc, source bucket desc)."""
    from storage_spark.operators.mutations import copy_objects

    objects = spark.createDataFrame(
        [
            ("b1", "same.txt", "id-1", "v1", 111),
            ("b2", "same.txt", "id-2", "v1", 222),
        ],
        "bucket_id string, name string, id string, version string, size long",
    )
    pairs = spark.createDataFrame(
        [
            ("b1", "same.txt", "b9", "dst.txt"),
            ("b2", "same.txt", "b9", "dst.txt"),
        ],
        "bucket_id string, from_name string, to_bucket_id string, to_name string",
    )
    for _ in range(3):
        out, failed = copy_objects(objects, pairs)
        assert failed.count() == 0
        winner = [r for r in out.collect() if r.name == "dst.txt"]
        assert len(winner) == 1
        assert winner[0].size == 222  # b2 > b1 on the bucket tiebreak
