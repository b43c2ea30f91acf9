"""Iceberg namespace/table index: quotas, existence checks, jar gating."""

from __future__ import annotations

import pytest

from storage_spark.operators.catalog import (
    QuotaExceededError,
    configure_iceberg_catalog,
    create_namespace,
    create_table,
    iceberg_available,
    list_namespaces,
    list_tables,
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


def test_iceberg_gating(spark):
    # container has no Iceberg jar: configure is a clean no-op
    assert iceberg_available(spark) is False
    assert configure_iceberg_catalog(spark) is False
