"""Structured Streaming layer: windowed rollups, webhook foreachBatch sink,
singleton-key dedup — all drained deterministically with availableNow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storage_spark.streaming.events import (
    dedup_singleton,
    for_queue,
    read_event_stream,
    run_to_memory,
    run_webhook_sink,
    windowed_event_counts,
)
from storage_spark.tables import load_base_tables


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    sf_dir = "/root/testdata/sf0.001"
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_base_tables(spark, sf_dir)["events"].write.parquet(path)
    return path


def test_windowed_counts_match_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    run_to_memory(windowed_event_counts(stream), "hourly", output_mode="complete")
    streamed = {
        (r.window_start, r.event_type): (r.n, r.value_cents)
        for r in spark.table("hourly").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n, r.value_cents)
        for r in (
            spark.read.parquet(event_dir)
            .groupBy(
                F.window("ts", "1 hour").alias("window"), F.col("event_type")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                    "value_cents"
                ),
            )
            .select(F.col("window.start").alias("window_start"), "event_type", "n", "value_cents")
            .collect()
        )
    }
    assert streamed == batch and len(streamed) > 0


def test_webhook_sink_delivers_all_rows(spark, event_dir, tmp_path):
    stream = for_queue(read_event_stream(spark, event_dir), ["error"])
    delivered: list[dict] = []
    run_webhook_sink(
        stream,
        delivered.extend,
        checkpoint_dir=str(tmp_path / "ckpt"),
        from_executors=False,  # driver-held list: the explicit test-only mode
    )
    expected = (
        spark.read.parquet(event_dir).filter(F.col("event_type") == "error").count()
    )
    assert len(delivered) == expected > 0
    assert all(r["event_type"] == "error" for r in delivered)


def test_webhook_sink_posts_from_executors(spark, event_dir, tmp_path):
    """foreachPartition fan-out: every partition posts its own rows from
    the executor (delivery bandwidth scales with the cluster); verified via
    a filesystem sink since executor processes can't touch driver lists."""
    import glob
    import json
    import os
    import uuid

    out_dir = str(tmp_path / "posted")
    os.makedirs(out_dir, exist_ok=True)

    def post(rows: list[dict]) -> None:
        with open(f"{out_dir}/{uuid.uuid4().hex}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps({"event_type": r["event_type"]}) + "\n")

    stream = for_queue(read_event_stream(spark, event_dir), ["error"])
    # default mode: executor-side fan-out
    run_webhook_sink(stream, post, checkpoint_dir=str(tmp_path / "ckpt2"))
    delivered = []
    for path in glob.glob(f"{out_dir}/*.jsonl"):
        with open(path) as f:
            delivered.extend(json.loads(line) for line in f)
    expected = (
        spark.read.parquet(event_dir).filter(F.col("event_type") == "error").count()
    )
    assert len(delivered) == expected > 0
    assert all(r["event_type"] == "error" for r in delivered)


def test_streaming_vector_ingest_upserts(spark, tmp_path):
    """Micro-batched putVectors: later batches win on key conflicts and the
    committed store accumulates across batches."""
    from storage_spark.operators.mutations import ParquetTable
    from storage_spark.streaming.events import run_vector_ingest

    store_path = str(tmp_path / "store")
    spark.createDataFrame(
        [("k1", [1.0, 0.0])], "key string, embedding array<double>"
    ).write.parquet(store_path)
    table = ParquetTable(spark, store_path)

    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(
        [("k1", [9.0, 9.0]), ("k2", [0.0, 1.0])],
        "key string, embedding array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema("key string, embedding array<double>").parquet(
        str(src)
    )
    run_vector_ingest(stream, table, checkpoint_dir=str(tmp_path / "ck"))
    got = {r.key: r.embedding for r in table.read().collect()}
    assert got == {"k1": [9.0, 9.0], "k2": [0.0, 1.0]}


def test_config_cdc_invalidation(spark, tmp_path):
    """T6: config change stream folds into a cache — last-write-wins per
    key, NULL deletes, replay-safe via checkpoint."""
    import json

    from storage_spark.streaming.events import run_config_invalidation

    changes = [
        {"config_key": "tenant-1/max_size", "config_value": "100", "ts": 1},
        {"config_key": "tenant-1/max_size", "config_value": "200", "ts": 2},
        {"config_key": "tenant-2/feature_x", "config_value": "on", "ts": 1},
        {"config_key": "tenant-3/old", "config_value": None, "ts": 5},
    ]
    src = tmp_path / "cfg"
    src.mkdir()
    (src / "batch1.json").write_text("\n".join(json.dumps(c) for c in changes))
    schema = "config_key string, config_value string, ts long"
    stream = spark.readStream.schema(schema).json(str(src))
    cache = {"tenant-3/old": "stale"}
    run_config_invalidation(stream, cache, str(tmp_path / "ckpt"))
    assert cache == {
        "tenant-1/max_size": "200",  # last write wins
        "tenant-2/feature_x": "on",
    }  # tenant-3 deleted by NULL


def test_dedup_singleton(spark, event_dir):
    stream = read_event_stream(spark, event_dir).withColumn(
        "singleton_key", F.col("event_type")
    )
    run_to_memory(
        dedup_singleton(stream, ["singleton_key"], "ts"), "singletons"
    )
    rows = spark.table("singletons").groupBy("singleton_key").count().collect()
    assert all(r["count"] == 1 for r in rows)
    assert len(rows) == 5  # one in-flight job per event type


def test_delete_all_before_consumer(spark, tmp_path):
    from storage_spark.operators.mutations import ParquetTable
    from storage_spark.streaming.events import run_delete_all_before_consumer

    objects = spark.createDataFrame(
        [
            ("b1", "old1.txt", 100),
            ("b1", "old2.txt", 200),
            ("b1", "new.txt", 9000),
            ("b2", "old3.txt", 150),
        ],
        "bucket_id string, name string, created_at_ms long",
    )
    table_path = str(tmp_path / "objects")
    objects.write.parquet(table_path)
    table = ParquetTable(spark, table_path)

    req_dir = str(tmp_path / "requests")
    spark.createDataFrame(
        [("b1", 1000, "t/b1")], "bucket_id string, before_ms long, singleton_key string"
    ).write.parquet(req_dir)
    stream = spark.readStream.schema(
        "bucket_id string, before_ms long, singleton_key string"
    ).parquet(req_dir)

    emitted: list[dict] = []
    run_delete_all_before_consumer(
        stream, table, emitted, checkpoint_dir=str(tmp_path / "ckpt")
    )
    left = {(r.bucket_id, r.name) for r in table.read().collect()}
    assert left == {("b1", "new.txt"), ("b2", "old3.txt")}  # b2 untouched
    assert {e["name"] for e in emitted} == {"old1.txt", "old2.txt"}
    assert all(e["event_type"] == "ObjectRemoved" for e in emitted)


def test_delete_all_before_consumer_appends_events_table(spark, tmp_path):
    """Production sink shape: lifecycle rows land in an events TABLE via
    an executor-side DataFrame append — no driver collect of the deleted
    set (the list sink stays as the test mode above)."""
    from storage_spark.operators.mutations import ParquetTable
    from storage_spark.streaming.events import run_delete_all_before_consumer

    objects = spark.createDataFrame(
        [
            ("b1", "old1.txt", 100),
            ("b1", "old2.txt", 200),
            ("b1", "new.txt", 9000),
            ("b2", "old3.txt", 150),
        ],
        "bucket_id string, name string, created_at_ms long",
    )
    table_path = str(tmp_path / "objects")
    objects.write.parquet(table_path)
    table = ParquetTable(spark, table_path)

    req_dir = str(tmp_path / "requests")
    spark.createDataFrame(
        [("b1", 1000, "t/b1")],
        "bucket_id string, before_ms long, singleton_key string",
    ).write.parquet(req_dir)
    stream = spark.readStream.schema(
        "bucket_id string, before_ms long, singleton_key string"
    ).parquet(req_dir)

    events_path = str(tmp_path / "events_table")
    run_delete_all_before_consumer(
        stream, table, events_path, checkpoint_dir=str(tmp_path / "ckpt")
    )
    left = {(r.bucket_id, r.name) for r in table.read().collect()}
    assert left == {("b1", "new.txt"), ("b2", "old3.txt")}
    ev = spark.read.parquet(events_path).collect()
    assert {e["name"] for e in ev} == {"old1.txt", "old2.txt"}
    assert all(e["event_type"] == "ObjectRemoved" for e in ev)
