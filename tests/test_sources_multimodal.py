"""Binary source (S4/T9/S7) and multimodal mapInPandas plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from storage_spark.operators.multimodal import (
    decode_image_meta,
    fake_header,
    frame_sample_plan,
    transform_images,
    validate_render_options,
)
from storage_spark.sources.binary import hash_blobs, list_blobs, write_ndjson


@pytest.fixture(scope="module")
def blob_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blobs")
    (d / "a").mkdir()
    (d / "a" / "x.bin").write_bytes(b"hello world")
    (d / "a" / "y.bin").write_bytes(b"spark")
    (d / "z.info").write_bytes(b"sidecar")
    return str(d)


def test_list_blobs_keys_and_filter(spark, blob_dir):
    df = list_blobs(spark, blob_dir)
    keys = {r.key: r.size for r in df.collect()}
    assert keys == {"a/x.bin": 11, "a/y.bin": 5, "z.info": 7}
    only_bin = list_blobs(spark, blob_dir, glob="*.bin")
    assert {r.key for r in only_bin.collect()} == {"a/x.bin", "a/y.bin"}
    assert list_blobs(spark, blob_dir, before_ms=0).count() == 0  # T10 cutoff


def test_hash_blobs(spark, blob_dir):
    df = hash_blobs(list_blobs(spark, blob_dir, with_content=True))
    row = {r.key: r for r in df.collect()}["a/x.bin"]
    assert row.sha256 == hashlib.sha256(b"hello world").hexdigest()
    assert row.md5 == hashlib.md5(b"hello world").hexdigest()
    assert row.n_bytes == 11


def test_range_read_slice(spark, blob_dir):
    from storage_spark.sources.binary import slice_content

    blobs = list_blobs(spark, blob_dir, with_content=True)
    row = {
        r.key: r
        for r in slice_content(blobs, start=6, length=3).collect()
    }["a/x.bin"]
    assert bytes(row.content) == b"wor"
    assert row.content_range == "6-8/11"
    # open-ended range reads to EOF; length overrun clamps
    tail = {r.key: r for r in slice_content(blobs, start=6).collect()}["a/x.bin"]
    assert bytes(tail.content) == b"world" and tail.content_range == "6-10/11"
    over = {r.key: r for r in slice_content(blobs, 6, 99).collect()}["a/x.bin"]
    assert bytes(over.content) == b"world" and over.content_range == "6-10/11"


def test_conditional_get(spark, blob_dir):
    from storage_spark.sources.binary import conditional_get

    blobs = hash_blobs(
        list_blobs(spark, blob_dir, with_content=True)
    ).join(list_blobs(spark, blob_dir), "key")
    etag = hashlib.md5(b"hello world").hexdigest()
    served, not_served = conditional_get(blobs, if_match=f'"{etag}"')
    assert {r.key for r in served.collect()} == {"a/x.bin"}
    served2, not_served2 = conditional_get(blobs, if_none_match=etag)
    assert {r.key for r in not_served2.collect()} == {"a/x.bin"}  # the 304
    served3, _ = conditional_get(blobs, if_modified_since_ms=0)
    assert served3.count() == 3  # all modified after epoch
    _, failed = conditional_get(blobs, if_unmodified_since_ms=0)
    assert failed.count() == 3  # the 412 population


def test_ndjson_sink_roundtrip(spark, blob_dir, tmp_path):
    df = list_blobs(spark, blob_dir).select("key", "size")
    out = str(tmp_path / "nd")
    write_ndjson(df, out)
    back = spark.read.json(out)
    assert {(r.key, r.size) for r in back.collect()} == {
        ("a/x.bin", 11), ("a/y.bin", 5), ("z.info", 7)
    }


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("img1", fake_header(640, 480) + b"px" * 10),
        ("img2", fake_header(100, 200) + b"px"),
        ("clip", fake_header(1920, 1080, 120) + b"frames"),
    ]
    return spark.createDataFrame(rows, "key string, content binary")


def test_decode_image_meta(spark, media_df):
    meta = {r.key: r for r in decode_image_meta(media_df).collect()}
    assert (meta["img1"].width, meta["img1"].height) == (640, 480)
    assert meta["clip"].n_frames == 120
    assert meta["img2"].n_bytes == len(fake_header(100, 200)) + 2


def test_decode_unknown_codec_raises(spark):
    df = spark.createDataFrame([("bad", b"\x89PNG....")], "key string, content binary")
    with pytest.raises(Exception, match="NotImplementedError|media codec"):
        decode_image_meta(df).collect()


def test_transform_images_gating(spark, media_df):
    with pytest.raises(NotImplementedError):
        transform_images(media_df, 100, 100)
    # with an injected codec the plumbing runs end-to-end
    out = transform_images(
        media_df, 100, 100, codec=lambda b, w, h, r, q: b[:4] + f"{w}x{h}".encode()
    ).collect()
    assert {bytes(r.content) for r in out} == {b"FAKE100x100"}
    for bad in [(0, 10, "cover"), (10, 99999, "cover"), (10, 10, "stretch")]:
        with pytest.raises(ValueError):
            validate_render_options(*bad)


def test_frame_sample_plan(spark, media_df):
    decoded = decode_image_meta(media_df)
    frames = frame_sample_plan(decoded.filter(F.col("n_frames") > 1), every_n=30)
    assert [r.frame_idx for r in frames.orderBy("frame_idx").collect()] == [0, 30, 60, 90]


def test_frame_sample_skips_zero_frame_videos(spark):
    from storage_spark.operators.multimodal import frame_sample_plan

    decoded = spark.createDataFrame(
        [("v1", 90), ("still", 0), ("broken", None)],
        "key string, n_frames int",
    )
    rows = frame_sample_plan(decoded, every_n=30).collect()
    # no phantom frame 0 for zero-frame or NULL-metadata entries
    assert {(r.key, r.frame_idx) for r in rows} == {
        ("v1", 0), ("v1", 30), ("v1", 60),
    }


def test_decode_audio_meta(spark):
    from storage_spark.operators.multimodal import decode_audio_meta, fake_audio_header

    df = spark.createDataFrame(
        [
            ("a1", fake_audio_header(16000, 48000) + b"pcm"),
            ("a2", fake_audio_header(8000, 8000)),
        ],
        "key string, content binary",
    )
    meta = {r.key: r for r in decode_audio_meta(df).collect()}
    assert meta["a1"].duration_ms == 3000 and meta["a1"].sample_rate == 16000
    assert meta["a2"].duration_ms == 1000
    bad = spark.createDataFrame([("x", b"RIFF....")], "key string, content binary")
    with pytest.raises(Exception, match="NotImplementedError|media codec"):
        decode_audio_meta(bad).collect()


def test_embedding_bridge_feeds_neardup(spark):
    """binary -> embedding -> near-dup: identical bytes produce identical
    vectors, so the duplicated blob pair surfaces at distance 0 while the
    distinct blob stays out — the multimodal dedup path end-to-end."""
    from storage_spark.operators.dedup import embedding_near_dup_pairs
    from storage_spark.operators.multimodal import extract_embeddings

    blobs = spark.createDataFrame(
        [
            ("b1", b"same payload bytes"),
            ("b2", b"same payload bytes"),  # exact duplicate content
            ("b3", b"completely different content"),
        ],
        "key string, content binary",
    )
    vecs = extract_embeddings(blobs, dim=64)
    row = {r.key: r.embedding for r in vecs.collect()}
    assert row["b1"] == row["b2"] != row["b3"]
    assert len(row["b1"]) == 64 and all(-1.0 <= x <= 1.0 for x in row["b1"])
    pairs = embedding_near_dup_pairs(vecs, max_distance=0.1).collect()
    assert [(p.key_a, p.key_b) for p in pairs] == [("b1", "b2")]
    assert pairs[0].distance < 1e-9
