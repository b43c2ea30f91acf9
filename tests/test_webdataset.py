"""WebDataset tar shard export/ingest (storage_spark/sources/webdataset.py)."""

from __future__ import annotations

import hashlib
import tarfile

from pyspark.sql import functions as F

from storage_spark.sources.webdataset import (
    read_webdataset_shards,
    write_webdataset_shards,
)


def _df(spark):
    rows = [
        (f"doc{i:03d}", f"text body {i}", bytes([i % 256, 1, 2, 3]))
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "key string, txt string, img binary")


def test_write_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wds")
    (tmp_path / "wds").mkdir()
    manifest = write_webdataset_shards(
        _df(spark), out, "key", ["txt", "img"], n_shards=4
    ).collect()
    assert len(manifest) == 4
    assert sum(m["n_samples"] for m in manifest) == 20
    # contiguous slicing: shard 0 holds the first ceil(20/4)=5 keys in order
    by_shard = {m["shard"]: m for m in manifest}
    with tarfile.open(by_shard[0]["path"]) as tar:
        names = tar.getnames()
    assert names[0] == "doc000.txt" and names[1] == "doc000.img"
    assert len(names) == 10  # 5 samples x 2 members, adjacent per sample

    back = read_webdataset_shards(spark, out + "/shard-*.tar")
    rows = back.collect()
    assert len(rows) == 40  # 20 samples x 2 members
    texts = {
        r["key"]: bytes(r["content"]).decode()
        for r in rows
        if r["member"] == "txt"
    }
    assert texts["doc007"] == "text body 7"
    imgs = {r["key"]: bytes(r["content"]) for r in rows if r["member"] == "img"}
    assert imgs["doc013"] == bytes([13, 1, 2, 3])


def test_write_is_byte_deterministic(spark, tmp_path):
    def digest(d):
        d.mkdir()
        ms = write_webdataset_shards(
            _df(spark), str(d), "key", ["txt", "img"], n_shards=3
        ).collect()
        h = hashlib.sha256()
        for m in sorted(ms, key=lambda m: m["shard"]):
            h.update(open(m["path"], "rb").read())
        return h.hexdigest()

    assert digest(tmp_path / "a") == digest(tmp_path / "b")


def test_custom_order_survives_sharding(spark, tmp_path):
    out = tmp_path / "wds"
    out.mkdir()
    df = _df(spark).withColumn(
        "rev", F.lit(1000) - F.substring("key", 4, 3).cast("int")
    )
    # curriculum = reverse key order via the rev column (unique total order)
    manifest = write_webdataset_shards(
        df, str(out), "key", ["txt"], n_shards=2, order_by=[F.col("rev")]
    ).collect()
    first = min(manifest, key=lambda m: m["shard"])
    with tarfile.open(first["path"]) as tar:
        names = tar.getnames()
    assert names[0] == "doc019.txt"  # highest key first under rev order


def test_listing_layout_bloom_filters(spark, sf_dir, tmp_path):
    """Bloom-filter columns land in the files (size delta ≈ ndv bits per
    row group) and filtered reads stay correct."""
    import glob
    import os

    from storage_spark.sources.layout import write_listing_layout
    from storage_spark.tables import load_all

    objects = load_all(spark, sf_dir)["objects"]
    plain_dir, bloom_dir = str(tmp_path / "plain"), str(tmp_path / "bloom")
    write_listing_layout(objects, plain_dir)
    write_listing_layout(
        objects, bloom_dir, bloom_filter_cols=["id"], bloom_ndv=100_000
    )

    def total(d):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(d + "/**/*.parquet", recursive=True)
        )

    n_files = len(glob.glob(bloom_dir + "/**/*.parquet", recursive=True))
    delta = total(bloom_dir) - total(plain_dir)
    # ndv=100k → ~128 KiB of bloom bitset per row group; require at least
    # half that per file to prove the filters are physically present
    assert delta > n_files * 64 * 1024, (delta, n_files)

    some_id = objects.select("id").limit(1).collect()[0]["id"]
    got = (
        spark.read.parquet(bloom_dir)
        .where(F.col("id") == some_id)
        .count()
    )
    assert got == objects.where(F.col("id") == some_id).count()


def test_out_dir_created_per_task_and_uri_raises(spark, tmp_path):
    """Shard tasks create a missing out_dir themselves; object-store URIs
    fail up front with a legible message instead of tarfile's OSError."""
    import pytest

    from storage_spark.sources.webdataset import write_webdataset_shards

    df = spark.createDataFrame(
        [("k1", b"x"), ("k2", b"y")], "key string, payload binary"
    )
    missing = str(tmp_path / "not" / "yet" / "there")
    man = write_webdataset_shards(
        df, missing, key_col="key", payload_cols=["payload"], n_shards=1
    ).collect()
    assert len(man) == 1 and man[0]["n_samples"] == 2
    with pytest.raises(Exception, match="POSIX"):
        write_webdataset_shards(
            df, "s3a://bucket/prefix", key_col="key",
            payload_cols=["payload"], n_shards=1,
        ).collect()
