"""Iceberg namespace/table index: quotas, existence checks, jar gating."""

from __future__ import annotations

import pytest

from storage_spark.operators.catalog import (
    NamespaceNotEmptyError,
    QuotaExceededError,
    configure_iceberg_catalog,
    create_namespace,
    create_table,
    drop_namespace,
    drop_table,
    iceberg_available,
    list_namespaces,
    list_tables,
    rename_table,
    upsert_table_location,
)
from storage_spark.operators.mutations import KeyAlreadyExistsError


@pytest.fixture()
def ns_index(spark):
    return spark.createDataFrame(
        [("b1", "raw"), ("b1", "curated")], "bucket_id string, namespace string"
    )


@pytest.fixture()
def tbl_index(spark):
    return spark.createDataFrame(
        [("b1", "raw", "events")],
        "bucket_id string, namespace string, table_name string",
    )


def test_namespace_create_and_quota(spark, ns_index):
    out = create_namespace(ns_index, "b1", "staging")
    assert out.count() == 3
    with pytest.raises(KeyAlreadyExistsError):
        create_namespace(ns_index, "b1", "raw")
    with pytest.raises(QuotaExceededError):
        create_namespace(ns_index, "b1", "x", max_namespaces=2)


def test_table_create_requires_namespace(spark, ns_index, tbl_index):
    out = create_table(tbl_index, ns_index, "b1", "raw", "lineitems")
    assert out.count() == 2
    with pytest.raises(KeyError):
        create_table(tbl_index, ns_index, "b1", "nope", "t")
    with pytest.raises(QuotaExceededError):
        create_table(tbl_index, ns_index, "b1", "raw", "t2", max_tables=1)


def test_listings(spark, ns_index, tbl_index):
    assert [r.namespace for r in list_namespaces(ns_index, "b1").collect()] == [
        "curated",
        "raw",
    ]
    assert [r.table_name for r in list_tables(tbl_index, "b1", "raw").collect()] == [
        "events"
    ]


def test_drop_and_rename_table(spark, tbl_index):
    dropped = drop_table(tbl_index, "b1", "raw", "events")
    assert dropped.count() == 0
    # rename: source must exist, destination must not
    renamed = rename_table(tbl_index, "b1", "raw", "events", "events_v2")
    assert [r.table_name for r in renamed.collect()] == ["events_v2"]
    with pytest.raises(KeyError):
        rename_table(tbl_index, "b1", "raw", "ghost", "x")
    both = tbl_index.union(
        spark.createDataFrame([("b1", "raw", "events_v2")], tbl_index.schema)
    )
    with pytest.raises(KeyAlreadyExistsError):
        rename_table(both, "b1", "raw", "events", "events_v2")
    # rename across namespaces moves the row
    moved = rename_table(tbl_index, "b1", "raw", "events", "events", "curated")
    row = moved.first()
    assert (row.namespace, row.table_name) == ("curated", "events")


def test_drop_namespace_restrict(spark, ns_index, tbl_index):
    with pytest.raises(NamespaceNotEmptyError):
        drop_namespace(ns_index, tbl_index, "b1", "raw")
    empty_tables = drop_table(tbl_index, "b1", "raw", "events")
    out = drop_namespace(ns_index, empty_tables, "b1", "raw")
    assert [r.namespace for r in out.collect()] == ["curated"]


def test_upsert_table_location_evolves_schema(spark, tbl_index):
    # index predates 0047 (no location column): upsert adds it, refreshes
    # on conflict, inserts on miss
    out = upsert_table_location(tbl_index, "b1", "raw", "events", "s3://w/e2")
    rows = {r.table_name: r.location for r in out.collect()}
    assert rows == {"events": "s3://w/e2"}
    out2 = upsert_table_location(out, "b1", "raw", "clicks", "s3://w/c")
    rows2 = {r.table_name: r.location for r in out2.collect()}
    assert rows2 == {"events": "s3://w/e2", "clicks": "s3://w/c"}


def test_iceberg_gating(spark):
    # container has no Iceberg jar: configure is a clean no-op
    assert iceberg_available(spark) is False
    assert configure_iceberg_catalog(spark) is False
