"""Vector bucket/index lifecycle: create validation, quota, conflict,
delete-with-FK, listIndexes pagination, and the metadata_configuration →
F10 filter-validation wiring (pg.ts:213-340, pgvector/index.ts:425-516,
0045-vector-buckets.sql)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storage_spark.functions.jsonmeta import FilterError
from storage_spark.operators.mutations import KeyAlreadyExistsError
from storage_spark.operators.vectorindex import (
    INDEX_SCHEMA,
    VectorBucketNotEmptyError,
    InvalidIndexParameterError,
    VectorBucketNotFoundError,
    VectorIndexNotFoundError,
    create_vector_bucket,
    create_vector_index,
    delete_vector_bucket,
    delete_vector_index,
    get_index,
    list_indexes,
    non_filterable_keys,
    query_index,
)


@pytest.fixture()
def buckets(spark):
    return spark.createDataFrame([("vb-main", "VECTOR")], "id string, type string")


@pytest.fixture()
def indexes(spark):
    return spark.createDataFrame([], INDEX_SCHEMA)


def test_create_bucket_conflict(spark, buckets):
    out = create_vector_bucket(buckets, "vb-2")
    assert out.count() == 2
    with pytest.raises(KeyAlreadyExistsError):
        create_vector_bucket(out, "vb-main")


def test_create_index_validation(spark, buckets, indexes):
    with pytest.raises(InvalidIndexParameterError):
        create_vector_index(indexes, buckets, "vb-main", "i", 64, data_type="float64")
    for bad_dim in (0, -1, 4001):
        with pytest.raises(InvalidIndexParameterError):
            create_vector_index(indexes, buckets, "vb-main", "i", bad_dim)
    with pytest.raises(InvalidIndexParameterError):
        create_vector_index(
            indexes, buckets, "vb-main", "i", 64, distance_metric="manhattan"
        )
    with pytest.raises(VectorBucketNotFoundError):
        create_vector_index(indexes, buckets, "vb-ghost", "i", 64)


def test_create_index_conflict_and_quota(spark, buckets, indexes):
    one = create_vector_index(indexes, buckets, "vb-main", "idx-a", 64)
    with pytest.raises(KeyAlreadyExistsError):
        create_vector_index(one, buckets, "vb-main", "idx-a", 64)
    # same name in another bucket is fine
    b2 = create_vector_bucket(buckets, "vb-2")
    two = create_vector_index(one, b2, "vb-2", "idx-a", 64)
    assert two.count() == 2
    with pytest.raises(InvalidIndexParameterError):
        create_vector_index(one, buckets, "vb-main", "idx-b", 64, max_indexes=1)


def test_delete_index_and_bucket_fk(spark, buckets, indexes):
    one = create_vector_index(indexes, buckets, "vb-main", "idx-a", 64)
    with pytest.raises(VectorBucketNotEmptyError):
        delete_vector_bucket(buckets, one, "vb-main")
    none = delete_vector_index(one, "vb-main", "idx-a")
    assert none.count() == 0
    assert delete_vector_bucket(buckets, none, "vb-main").count() == 0


def test_list_indexes_keyset(spark, buckets, indexes):
    df = indexes
    for n in ("idx-a", "idx-b", "idx-c", "other-x"):
        df = create_vector_index(df, buckets, "vb-main", n, 64)
    names = [r["name"] for r in list_indexes(df, "vb-main", prefix="idx-").collect()]
    assert names == ["idx-a", "idx-b", "idx-c"]
    page2 = list_indexes(df, "vb-main", prefix="idx-", next_token="idx-a", max_results=1)
    assert [r["name"] for r in page2.collect()] == ["idx-b"]


def test_put_get_delete_vectors(spark, buckets, indexes):
    from storage_spark.operators.vectorindex import (
        delete_vectors,
        get_vectors,
        put_vectors,
    )

    idx_df = create_vector_index(indexes, buckets, "vb-main", "i1", 4)
    idx = get_index(idx_df, "vb-main", "i1")
    store = spark.createDataFrame(
        [("k1", [1.0, 0.0, 0.0, 0.0], '{"a": 1}')],
        "key string, embedding array<double>, metadata string",
    )
    batch = spark.createDataFrame(
        [
            ("k1", [0.5, 0.5, 0.0, 0.0], '{"a": 2}'),  # update
            ("k2", [0.0, 1.0, 0.0, 0.0], "{}"),  # insert
        ],
        "key string, embedding array<double>, metadata string",
    )
    store2 = put_vectors(store, batch, index_row=idx)
    assert store2.count() == 2
    got = {
        r["key"]: r
        for r in get_vectors(
            store2, ["k1", "k2", "kX"], return_data=True, return_metadata=True
        ).collect()
    }
    assert set(got) == {"k1", "k2"}  # missing keys drop out
    assert got["k1"]["embedding"] == [0.5, 0.5, 0.0, 0.0]  # upsert won
    assert got["k1"]["metadata"] == '{"a": 2}'
    # projection flags prune columns
    assert get_vectors(store2, ["k1"]).columns == ["key"]
    left = delete_vectors(store2, ["k1"])
    assert [r["key"] for r in left.collect()] == ["k2"]
    # dimension contract enforced at put time
    bad = spark.createDataFrame(
        [("k3", [1.0, 2.0], "{}")],
        "key string, embedding array<double>, metadata string",
    )
    with pytest.raises(InvalidIndexParameterError):
        put_vectors(store2, bad, index_row=idx)
    # key-count caps (MAX_GET/DELETE_VECTOR_KEYS)
    with pytest.raises(InvalidIndexParameterError):
        get_vectors(store2, [str(i) for i in range(101)])


def test_metadata_configuration_drives_f10(spark, buckets, indexes):
    df = create_vector_index(
        indexes, buckets, "vb-main", "idx-cfg", 4,
        distance_metric="euclidean",
        metadata_configuration={"nonFilterableMetadataKeys": ["private-note"]},
    )
    idx = get_index(df, "vb-main", "idx-cfg")
    assert non_filterable_keys(idx) == {"private-note"}
    with pytest.raises(VectorIndexNotFoundError):
        get_index(df, "vb-main", "nope")

    vectors = spark.createDataFrame(
        [
            ("k1", [1.0, 0.0, 0.0, 0.0], '{"genre": "a", "private-note": "x"}'),
            ("k2", [0.0, 1.0, 0.0, 0.0], '{"genre": "b"}'),
        ],
        "key string, embedding array<double>, metadata string",
    )
    # filtering on an allowed key works and uses the stored metric
    out = query_index(
        df, vectors, "vb-main", "idx-cfg", [1.0, 0.0, 0.0, 0.0], top_k=1,
        filter_ast={"genre": "a"},
    )
    assert [r["key"] for r in out.collect()] == ["k1"]
    # filtering on the configured non-filterable key is rejected (F10)
    with pytest.raises(FilterError):
        query_index(
            df, vectors, "vb-main", "idx-cfg", [1.0, 0.0, 0.0, 0.0], top_k=1,
            filter_ast={"private-note": "x"},
        )
    # dimension contract enforced
    with pytest.raises(InvalidIndexParameterError):
        query_index(df, vectors, "vb-main", "idx-cfg", [1.0, 0.0], top_k=1)


def test_list_indexes_nonpositive_max_results_uses_default_page(spark, buckets, indexes):
    """A zero/negative max_results means "unset": the full default page, not
    an empty page or an IllegalArgumentException from limit()."""
    df = indexes
    for n in ("idx-a", "idx-b"):
        df = create_vector_index(df, buckets, "vb-main", n, 64)
    for bad in (0, -5, 10_000):
        names = [r["name"] for r in list_indexes(df, "vb-main", max_results=bad).collect()]
        assert names == ["idx-a", "idx-b"], f"max_results={bad}"
