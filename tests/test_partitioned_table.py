"""PartitionedParquetTable: partition-pruned copy-on-write mutations.

The contract under test is the one that matters at 100 TB: a mutation
batch rewrites ONLY the partitions its keys touch — every other
partition's data files stay byte-identical on disk (not just
value-equal).
"""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from storage_spark.operators.mutations import PartitionedParquetTable


def _partition_file_hashes(path: str, part: str) -> dict[str, str]:
    out = {}
    for f in sorted(glob.glob(f"{path}/bucket_id={part}/*.parquet")):
        with open(f, "rb") as fh:
            out[os.path.basename(f)] = hashlib.md5(fh.read()).hexdigest()
    return out


@pytest.fixture()
def table(spark, tmp_path):
    t = PartitionedParquetTable(spark, str(tmp_path / "tbl"))
    rows = [
        (b, f"k{i}", f"v-{b}-{i}", i * 10)
        for b in ("b1", "b2", "b3")
        for i in range(5)
    ]
    t.write_initial(
        spark.createDataFrame(
            rows, "bucket_id string, name string, payload string, size long"
        )
    )
    return t


def test_upsert_rewrites_only_touched_partitions(spark, table):
    before_b2 = _partition_file_hashes(table.path, "b2")
    before_b3 = _partition_file_hashes(table.path, "b3")
    assert before_b2 and before_b3

    updates = spark.createDataFrame(
        [("b1", "k0", "UPDATED", 999), ("b1", "k9", "NEW", 900)],
        "bucket_id string, name string, payload string, size long",
    )
    table.merge_upsert(updates, ["bucket_id", "name"])

    # untouched partitions: files byte-identical, not merely value-equal
    assert _partition_file_hashes(table.path, "b2") == before_b2
    assert _partition_file_hashes(table.path, "b3") == before_b3

    got = {
        (r.bucket_id, r.name): (r.payload, r.size) for r in table.read().collect()
    }
    assert got[("b1", "k0")] == ("UPDATED", 999)
    assert got[("b1", "k9")] == ("NEW", 900)
    assert got[("b1", "k1")] == ("v-b1-1", 10)  # survivor in touched part
    assert len(got) == 16  # 15 + 1 inserted


def test_update_columns_partition_pruned(spark, table):
    before_b1 = _partition_file_hashes(table.path, "b1")
    updates = spark.createDataFrame(
        [("b2", "k1", 777)], "bucket_id string, name string, size long"
    )
    table.merge_update_columns(updates, ["bucket_id", "name"], ["size"])
    assert _partition_file_hashes(table.path, "b1") == before_b1
    got = {(r.bucket_id, r.name): r for r in table.read().collect()}
    assert got[("b2", "k1")].size == 777
    assert got[("b2", "k1")].payload == "v-b2-1"  # non-updated col survives
    assert got[("b2", "k2")].size == 20


def test_delete_returning_and_empty_partition_drop(spark, table):
    before_b3 = _partition_file_hashes(table.path, "b3")
    # delete a subset of b1, and ALL of b2
    probe = spark.createDataFrame(
        [("b1", "k0")] + [("b2", f"k{i}") for i in range(5)],
        "bucket_id string, name string",
    )
    deleted = table.merge_delete(probe, ["bucket_id", "name"])
    assert deleted.count() == 6
    assert _partition_file_hashes(table.path, "b3") == before_b3
    # fully-deleted partition directory is gone, not stale
    assert not os.path.exists(f"{table.path}/bucket_id=b2")
    remaining = table.read()
    assert remaining.filter(F.col("bucket_id") == "b2").count() == 0
    assert remaining.count() == 14 - 5  # 15 - 1(b1) - 5(b2)


def test_keys_must_include_partition_col(spark, table):
    updates = spark.createDataFrame(
        [("b1", "k0", "x", 1)],
        "bucket_id string, name string, payload string, size long",
    )
    with pytest.raises(ValueError):
        table.merge_upsert(updates, ["name"])
    with pytest.raises(ValueError):
        table.merge_delete(updates.select("bucket_id", "name"), ["name"])
    with pytest.raises(ValueError):
        table.merge_update_columns(updates, ["name"], ["size"])
