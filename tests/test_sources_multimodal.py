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


def _png_bytes(width: int, height: int) -> bytes:
    """A complete, valid PNG: magic + IHDR + 1 IDAT row-filter stream + IEND
    (pure stdlib — struct reads are what the parser consumes)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + b"\x7f" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg_bytes(width: int, height: int, sof: int = 0xC0) -> bytes:
    """Minimal JPEG marker stream: SOI, APP0(JFIF), DQT, SOFn, EOI — the
    SOF frame header carries the dimensions the parser reads."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)
    sof_body = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    out = b"\xff\xd8"
    for marker, body in ((0xE0, app0), (0xDB, dqt), (sof, sof_body)):
        out += bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body
    return out + b"\xff\xd9"


def test_decode_real_png_jpeg_headers(spark):
    """The dependency-free codec parses REAL image bytes: PNG IHDR and
    baseline/progressive JPEG SOF frame headers."""
    rows = [
        ("png", _png_bytes(31, 17)),
        ("jpg_baseline", _jpeg_bytes(640, 480, sof=0xC0)),
        ("jpg_progressive", _jpeg_bytes(123, 456, sof=0xC2)),
    ]
    df = spark.createDataFrame(rows, "key string, content binary")
    meta = {r.key: r for r in decode_image_meta(df).collect()}
    assert (meta["png"].mime, meta["png"].width, meta["png"].height) == (
        "image/png", 31, 17,
    )
    assert (meta["jpg_baseline"].width, meta["jpg_baseline"].height) == (640, 480)
    assert meta["jpg_baseline"].mime == "image/jpeg"
    assert (meta["jpg_progressive"].width, meta["jpg_progressive"].height) == (
        123, 456,
    )
    assert meta["png"].n_bytes == len(_png_bytes(31, 17))


def test_decode_unknown_bytes_yield_null_meta(spark):
    """Unrecognized/poison blobs must NOT kill the job at scale: NULL
    metadata, row preserved. Covers truncated PNG magic, JPEG with no SOF
    before EOI, empty, and NULL content."""
    rows = [
        ("trunc_png", b"\x89PNG...."),
        ("no_sof", b"\xff\xd8\xff\xd9"),
        ("empty", b""),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "key string, content binary")
    got = {r.key: r for r in decode_image_meta(df).collect()}
    assert len(got) == 4
    for k in rows:
        assert got[k[0]].mime is None and got[k[0]].width is None
    assert got["empty"].n_bytes == 0 and got["nul"].n_bytes is None


def test_parse_image_header_pure():
    from storage_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_png_bytes(2500, 1)) == ("image/png", 2500, 1, 1)
    assert parse_image_header(_jpeg_bytes(1, 1)) == ("image/jpeg", 1, 1, 1)
    assert parse_image_header(fake_header(9, 8, 7)) == ("image/fake", 9, 8, 7)
    # fill bytes (0xFF padding) before a marker are legal
    padded = b"\xff\xd8" + b"\xff" + _jpeg_bytes(10, 20)[2:]
    assert parse_image_header(padded)[1:3] == (10, 20)
    # a DHT (0xC4) segment must NOT be mistaken for a frame header
    import struct
    dht = b"\xff\xd8" + b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    assert parse_image_header(dht + b"\xff\xd9") == (None, None, None, None)


def test_transform_images_default_codec_is_real_for_png(spark):
    # r9: codec=None defaults to the dependency-free PNG codec — a real
    # decode/resize/encode round-trip through the Spark stage
    import numpy as np

    from storage_spark.functions.imagecodec import png_decode, png_encode

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(40, 30, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("p1", png_encode(img))], "key string, content binary"
    )
    out = transform_images(df, 10, 10, resize="fill").collect()
    arr = png_decode(bytes(out[0].content))
    assert arr.shape == (10, 10, 3)


def test_transform_images_default_codec_dispatches_jpeg(spark):
    # r9: the default codec dispatches on magic bytes — a mixed PNG+JPEG
    # batch transforms in ONE stage, each format re-encoded as itself
    import numpy as np

    from storage_spark.functions.imagecodec import (
        jpeg_decode,
        jpeg_encode,
        png_encode,
    )

    yy, xx = np.mgrid[0:40, 0:30]
    img = np.stack(
        [xx * 8, yy * 6, (xx + yy) * 3], axis=2
    ).astype(np.uint8)
    df = spark.createDataFrame(
        [("j1", jpeg_encode(img, quality=92)), ("p1", png_encode(img))],
        "key string, content binary",
    )
    out = {r.key: bytes(r.content) for r in
           transform_images(df, 12, 12, resize="fill").collect()}
    assert out["j1"][:2] == b"\xff\xd8"
    assert out["p1"].startswith(b"\x89PNG")
    assert jpeg_decode(out["j1"]).shape == (12, 12, 3)


def test_decode_meta_and_frame_plan_on_real_gif(spark):
    # r9: n_frames is REAL for GIF — the block walker counts image
    # descriptors without decoding LZW, and frame_sample_plan grids it
    import numpy as np

    from storage_spark.functions.imagecodec import gif_encode
    from storage_spark.operators.multimodal import frame_sample_plan

    def anim(n):
        return gif_encode(
            [np.full((6, 9, 3), (f * 30 % 256, 0, 0), dtype=np.uint8)
             for f in range(n)]
        )

    df = spark.createDataFrame(
        [("g7", anim(7)), ("g1", anim(1))], "key string, content binary"
    )
    meta = decode_image_meta(df)
    rows = {r.key: r for r in meta.collect()}
    assert (rows["g7"].mime, rows["g7"].width, rows["g7"].height,
            rows["g7"].n_frames) == ("image/gif", 9, 6, 7)
    assert rows["g1"].n_frames == 1
    plan = frame_sample_plan(meta, every_n=2)
    got = sorted((r.key, r.frame_idx) for r in plan.collect())
    assert got == [("g1", 0), ("g7", 0), ("g7", 2), ("g7", 4), ("g7", 6)]


def test_transform_images_injected_codec_and_validation(spark, media_df):
    # with an injected codec the plumbing runs end-to-end on any bytes
    out = transform_images(
        media_df, 100, 100, codec=lambda b, w, h, r, q: b[:4] + f"{w}x{h}".encode()
    ).collect()
    assert {bytes(r.content) for r in out} == {b"FAKE100x100"}
    for bad in [(0, 10, "cover"), (10, 99999, "cover"), (10, 10, "stretch")]:
        with pytest.raises(ValueError):
            validate_render_options(*bad)
    # the default dispatching codec raises per-blob on unrecognized bytes
    with pytest.raises(Exception, match="baseline . progressive"):
        transform_images(media_df, 10, 10).collect()


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
    # compressed formats still need a codec library (honest raise)
    bad = spark.createDataFrame(
        [("x", b"ID3\x03\x00mp3-ish")], "key string, content binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|media codec"):
        decode_audio_meta(bad).collect()


def _wav_bytes(rate, samples):
    """Build a real PCM WAV via the stdlib wave module."""
    import io
    import struct as _struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"".join(_struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_decode_audio_meta_real_wav(spark):
    from storage_spark.operators.multimodal import decode_audio_meta

    df = spark.createDataFrame(
        [("w1", _wav_bytes(8000, [0, 1000, -1000, 500] * 2000))],
        "key string, content binary",
    )
    row = decode_audio_meta(df).first()
    assert row.sample_rate == 8000 and row.n_samples == 8000
    assert row.duration_ms == 1000


def test_audio_features_real_wav(spark):
    import math

    from storage_spark.operators.multimodal import audio_features

    # 1 kHz square-ish wave at 8 kHz: known zero-crossing count and RMS
    samples = [16384 if (i // 4) % 2 == 0 else -16384 for i in range(8000)]
    df = spark.createDataFrame(
        [("w1", _wav_bytes(8000, samples)), ("bad", b"not audio")],
        "key string, content binary",
    )
    rows = {r.key: r for r in audio_features(df).collect()}
    w = rows["w1"]
    assert w.sample_rate == 8000 and w.n_samples == 8000
    assert w.rms_1e6 == round(16384 / 32768 * 1_000_000)
    assert w.zero_crossings == 8000 // 4 - 1
    assert rows["bad"].sample_rate is None  # poison blob -> NULLs, no crash


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


def test_conditional_get_null_attributes_land_in_not_served(spark):
    """Rows with NULL etag/modified make the raw predicate NULL; without the
    coalesce both filter(cond) and filter(~cond) drop them (the vanishing-row
    class). They must land deterministically in not_served."""
    from storage_spark.sources.binary import conditional_get

    rows = [("k1", "aaa", 1000), ("k2", None, 1000), ("k3", "ccc", None)]
    blobs = spark.createDataFrame(rows, "key string, md5 string, modified_ms long")
    served, not_served = conditional_get(blobs, if_match='"aaa"')
    assert {r.key for r in served.collect()} == {"k1"}
    assert {r.key for r in not_served.collect()} == {"k2", "k3"}
    served2, not_served2 = conditional_get(blobs, if_modified_since_ms=500)
    assert {r.key for r in served2.collect()} == {"k1", "k2"}
    assert {r.key for r in not_served2.collect()} == {"k3"}
    # every row is in exactly one population, always
    assert served.count() + not_served.count() == 3
    assert served2.count() + not_served2.count() == 3


# --------------------------------------------------------------------------
# NDJSON round-trip with quarantine
# --------------------------------------------------------------------------


def test_ndjson_roundtrip_with_corrupt_lines(spark, tmp_path):
    from storage_spark.sources.binary import (
        read_ndjson,
        split_corrupt,
        write_ndjson,
    )

    df = spark.createDataFrame(
        [("b1", "k1", 10), ("b1", "k2", 20), ("b2", "k3", 30)],
        "bucket_id string, name string, size long",
    )
    path = str(tmp_path / "nd")
    write_ndjson(df, path)
    # poison the export with lines a real feed produces
    with open(f"{path}/part-poison.json", "w") as fh:
        fh.write('{"bucket_id": "b9", "name": "ok-extra", "size": 5}\n')
        fh.write('{"bucket_id": "b9", "name": broken!!\n')
        fh.write("not json at all\n")
    got = read_ndjson(spark, path, df.schema)
    good, bad = split_corrupt(got)
    rows = {(r.bucket_id, r.name): r.size for r in good.collect()}
    assert rows == {
        ("b1", "k1"): 10, ("b1", "k2"): 20, ("b2", "k3"): 30,
        ("b9", "ok-extra"): 5,
    }
    raws = sorted(r.raw for r in bad.collect())
    assert len(raws) == 2 and "not json at all" in raws
    assert any("broken!!" in r for r in raws)
    assert "_corrupt_record" not in good.columns


def test_decode_video_meta_real_avi(spark):
    import numpy as np

    from storage_spark.functions.imagecodec import avi_encode_mjpeg, jpeg_encode
    from storage_spark.operators.multimodal import decode_video_meta

    rows = []
    for k in range(4):
        nf = 1 + k
        frames = [
            jpeg_encode(
                np.full((16, 24, 3), (k * 37 + f * 11) % 256, dtype=np.uint8),
                quality=95,
                subsampling="444",
            )
            for f in range(nf)
        ]
        rows.append((str(k), bytearray(avi_encode_mjpeg(frames, 24, 16, fps=10 + k))))
    rows.append(("bad", bytearray(b"not an avi")))
    rows.append(("nul", None))
    df = spark.createDataFrame(rows, "key string, content binary")
    got = {r.key: r for r in decode_video_meta(df).collect()}
    assert got["2"].container == "video/x-msvideo"
    assert (got["2"].width, got["2"].height) == (24, 16)
    assert got["2"].n_frames == 3
    assert got["2"].fps_x1000 == 12000
    assert got["2"].duration_ms == 250  # 3 frames / 12 fps
    # poison rows: NULL metadata, no exception
    assert got["bad"].container is None and got["nul"].width is None


def test_sample_video_frames_grid_matches_plan_and_values(spark):
    import numpy as np

    from storage_spark.functions.imagecodec import avi_encode_mjpeg, jpeg_encode
    from storage_spark.operators.multimodal import (
        decode_video_meta,
        frame_sample_plan,
        sample_video_frames,
    )

    rows = []
    for k in range(5):
        nf = 1 + (k * 3) % 7
        frames = [
            jpeg_encode(
                np.full((16, 16, 3), (k * 37 + f * 11) % 256, dtype=np.uint8),
                quality=95,
                subsampling="444",
            )
            for f in range(nf)
        ]
        rows.append((str(k), bytearray(avi_encode_mjpeg(frames, 16, 16, fps=8))))
    df = spark.createDataFrame(rows, "key string, content binary")

    sampled = sample_video_frames(df, every_n=3)
    got = {(r.key, r.frame_idx): r for r in sampled.collect()}

    # the extractor fills EXACTLY the grid frame_sample_plan lays
    meta = decode_video_meta(df).withColumnRenamed("container", "mime")
    plan = {(r.key, r.frame_idx) for r in frame_sample_plan(meta, 3).collect()}
    assert set(got) == plan

    # flat-gray q95 is pixel-exact: mean_x100 == 100 * generated value
    for (k, f), r in got.items():
        v = (int(k) * 37 + f * 11) % 256
        assert (r.mean_r_x100, r.mean_g_x100, r.mean_b_x100) == (v * 100,) * 3
        assert (r.frame_width, r.frame_height) == (16, 16)


def test_sample_video_frames_skips_corrupt_and_validates(spark):
    import pytest as _pytest

    from storage_spark.operators.multimodal import sample_video_frames

    df = spark.createDataFrame(
        [("bad", bytearray(b"RIFF\x00\x00\x00\x00AVI ")), ("nul", None)],
        "key string, content binary",
    )
    assert sample_video_frames(df, 2).count() == 0
    with _pytest.raises(ValueError):
        sample_video_frames(df, 0)


def test_detect_scene_cuts_flags_planted_boundary(spark):
    import numpy as np

    from storage_spark.functions.imagecodec import avi_encode_mjpeg, jpeg_encode
    from storage_spark.operators.multimodal import detect_scene_cuts

    # 6 frames: three flat-10 "shots", then three flat-200 — one cut at 3
    frames = [
        jpeg_encode(np.full((16, 16, 3), 10 if f < 3 else 200, np.uint8),
                    quality=95, subsampling="444")
        for f in range(6)
    ]
    avi = avi_encode_mjpeg(frames, 16, 16, fps=10)
    df = spark.createDataFrame(
        [("v", bytearray(avi)), ("bad", bytearray(b"junk")), ("nul", None)],
        "key string, content binary",
    )
    got = {r.frame_idx: r for r in
           detect_scene_cuts(df, threshold_x100=3000).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[3].is_cut and got[3].mad_x100 == 19000  # |200-10| exact
    assert not any(got[i].is_cut for i in (1, 2, 4, 5))
    assert got[1].mad_x100 == 0


def test_detect_silence_merges_quiet_windows(spark):
    import numpy as np

    from storage_spark.functions.imagecodec import flac_encode, wav_encode
    from storage_spark.operators.multimodal import detect_silence

    # 2000 samples: loud / silent / loud / trailing partial silence
    x = np.zeros(2000, dtype=np.int64)
    x[:400] = 5000
    x[800:1200] = -4000
    wav = wav_encode(x, 8000, "pcm16")
    flac = flac_encode(x, 8000)
    df = spark.createDataFrame(
        [("w", bytearray(wav)), ("f", bytearray(flac)),
         ("bad", bytearray(b"nope"))],
        "key string, content binary",
    )
    out = detect_silence(df, window=400, max_mean_square=1000)
    got = {}
    for r in out.collect():
        got.setdefault(r.key, []).append((r.span_start, r.span_end))
    # identical spans from the WAV and the FLAC (lossless) of one signal
    assert sorted(got["w"]) == [(400, 800), (1200, 2000)]
    assert got["f"] == got["w"]
    assert "bad" not in got


def test_dhash_and_banded_pairs_match_python_replay(spark):
    import numpy as np

    from storage_spark.functions.imagecodec import (
        jpeg_encode,
        png_encode,
    )
    from storage_spark.functions.webpcodec import webp_encode
    from storage_spark.operators.multimodal import (
        dhash_bits,
        dhash_images,
        dhash_near_pairs,
    )

    # same pixels, three containers: PNG and WebP are lossless → equal
    # hashes; q95 JPEG of a smooth gradient → within a couple of bits
    yy, xx = np.mgrid[0:16, 0:27]
    v = ((xx * 9 + yy * 5) % 256).astype(np.uint8)
    img = np.stack([v, v, v], axis=2)
    h_png = dhash_bits(png_encode(img))
    h_webp = dhash_bits(webp_encode(img))
    h_jpeg = dhash_bits(jpeg_encode(img, quality=95, subsampling="444"))
    assert h_png == h_webp and len(h_png) == 64
    assert sum(a != b for a, b in zip(h_png, h_jpeg)) <= 3

    # python replay of the full hash from raw pixels: 9x8 AREA means
    # (16/8=2-row, 27/9=3-col exact cells)
    gray = v.astype(np.int64)
    g = [
        [
            int(gray[2 * y: 2 * y + 2, 3 * x: 3 * x + 3].sum()) // 6
            for x in range(9)
        ]
        for y in range(8)
    ]
    exp = "".join(
        "1" if g[y][x + 1] > g[y][x] else "0"
        for y in range(8) for x in range(8)
    )
    assert h_png == exp

    # banded pairs: perturbed copy within 3 bits pairs up; an unrelated
    # image does not; corrupt rows drop silently
    v2 = v.copy()
    v2[3, 4] = (int(v2[3, 4]) + 128) % 256
    other = ((xx * 31 + yy * 17 + 90) % 256).astype(np.uint8)
    df = spark.createDataFrame(
        [
            ("a", bytearray(png_encode(img))),
            ("b", bytearray(png_encode(np.stack([v2] * 3, axis=2)))),
            ("z", bytearray(png_encode(np.stack([other] * 3, axis=2)))),
            ("bad", bytearray(b"junk")),
        ],
        "key string, content binary",
    )
    pairs = {(r.key_a, r.key_b): r.hamming
             for r in dhash_near_pairs(dhash_images(df), 3).collect()}
    assert ("a", "b") in pairs and pairs[("a", "b")] <= 3
    assert not any("z" in p for p in pairs)

    # the resize-robust wide setting (r10): 6 bands admit hamming <= 5;
    # guarantee check rejects a threshold past the pigeonhole bound
    import pytest as _pytest

    fps = dhash_images(df)
    wide = {(r.key_a, r.key_b): r.hamming
            for r in dhash_near_pairs(fps, 5, n_bands=6).collect()}
    assert ("a", "b") in wide and not any("z" in p for p in wide)
    with _pytest.raises(ValueError):
        dhash_near_pairs(fps, 6, n_bands=6)


def test_audio_fingerprint_lossless_containers_agree(spark):
    import numpy as np
    import pytest as _pytest

    from storage_spark.functions.imagecodec import flac_encode, wav_encode
    from storage_spark.operators.multimodal import (
        audio_fingerprint_bits,
        audio_fingerprints,
        audio_near_pairs,
    )

    i = np.arange(3300)
    x = ((i * 11) % 9000 - 4500).astype(np.int64)
    f_wav = audio_fingerprint_bits(wav_encode(x, 8000, "pcm16"))
    f_flac = audio_fingerprint_bits(flac_encode(x, 8000))
    assert f_wav == f_flac and len(f_wav) == 32

    # python replay of the window/gradient math
    ms = [
        int((x[(w * 3300) // 33 : ((w + 1) * 3300) // 33] ** 2).sum())
        // len(x[(w * 3300) // 33 : ((w + 1) * 3300) // 33])
        for w in range(33)
    ]
    exp = "".join("1" if ms[w + 1] > ms[w] else "0" for w in range(32))
    assert f_wav == exp

    with _pytest.raises(ValueError):
        audio_fingerprint_bits(wav_encode(np.arange(10), 8000, "pcm16"))

    # near pair: a local dent pairs up; an unrelated signal does not
    x2 = x.copy(); x2[500:550] = 0
    other = ((i * i * 3) % 11000 - 5500).astype(np.int64)
    df = spark.createDataFrame(
        [("a", bytearray(wav_encode(x, 8000, "pcm16"))),
         ("b", bytearray(flac_encode(x2, 8000))),
         ("z", bytearray(wav_encode(other, 8000, "pcm16"))),
         ("bad", bytearray(b"nope"))],
        "key string, content binary",
    )
    pairs = {(r.key_a, r.key_b): r.hamming
             for r in audio_near_pairs(audio_fingerprints(df), 3).collect()}
    assert ("a", "b") in pairs
    assert not any("z" in p for p in pairs)


def test_video_temporal_fingerprint_and_pairs(spark):
    import numpy as np
    import pytest as _pytest

    from storage_spark.functions.imagecodec import (
        avi_encode_mjpeg,
        jpeg_encode,
    )
    from storage_spark.operators.multimodal import (
        video_fingerprint_bits,
        video_fingerprints,
        video_near_pairs,
    )

    def clip(vals):
        frames = [
            jpeg_encode(np.full((16, 16, 3), v, np.uint8),
                        quality=95, subsampling="444")
            for v in vals
        ]
        return avi_encode_mjpeg(frames, 16, 16, fps=8)

    vals = [(f * f * 7) % 256 for f in range(17)]
    fp = video_fingerprint_bits(clip(vals))
    # flat-gray exactness → python replay from the values themselves
    exp = "".join(
        "1" if vals[i + 1] > vals[i] else "0" for i in range(16)
    )
    assert fp == exp and len(fp) == 16

    with _pytest.raises(ValueError):
        video_fingerprint_bits(clip([100]))  # single frame

    # a one-frame bump pairs; a monotone-ramp envelope (all-1 bits,
    # Hamming 7 from `a`) does not — note reversal is NOT a good far
    # clip here: f²·7 mod 256 is near-palindromic in gradient
    v2 = list(vals)
    v2[5] = (v2[5] + 97) % 256
    ramp = [f * 3 for f in range(17)]
    df = spark.createDataFrame(
        [("a", bytearray(clip(vals))), ("b", bytearray(clip(v2))),
         ("z", bytearray(clip(ramp))),
         ("bad", bytearray(b"junk"))],
        "key string, content binary",
    )
    pairs = {(r.key_a, r.key_b): r.hamming
             for r in video_near_pairs(video_fingerprints(df), 3).collect()}
    assert ("a", "b") in pairs and pairs[("a", "b")] <= 2
    assert not any("z" in p for p in pairs)

    # different frame counts can never pair (length in the band key)
    df2 = spark.createDataFrame(
        [("p", bytearray(clip(vals))), ("q", bytearray(clip(vals[:9])))],
        "key string, content binary",
    )
    assert video_near_pairs(video_fingerprints(df2), 3).count() == 0


def test_long_fingerprint_hamming_counts_tail_bits(spark):
    """Regression (r10 ADVICE): the chunked Hamming must derive its
    chunk offsets from the ACTUAL fingerprint length. Two 200-bit
    fingerprints identical in the first 124 bits but divergent after
    must NOT report as near-duplicates — a fixed 4-offset window
    silently ignored bits past position 124."""
    from storage_spark.operators.multimodal import video_near_pairs

    head = "01" * 62                      # 124 identical bits
    fa = head + "0" * 76                  # 200 bits total
    fb = head + "1" * 76                  # 76 differing tail bits
    df = spark.createDataFrame(
        [("a", fa), ("b", fb)], "key string, vfp string"
    )
    # the band join admits the pair (3 of 4 50-bit bands agree), so the
    # Hamming verification alone must reject it
    assert video_near_pairs(df, max_hamming=3).count() == 0

    # and an actually-near long pair still passes with the exact count
    fc = head + "0" * 75 + "1"            # 1 differing tail bit
    df2 = spark.createDataFrame(
        [("a", fa), ("c", fc)], "key string, vfp string"
    )
    rows = video_near_pairs(df2, max_hamming=3).collect()
    assert len(rows) == 1 and rows[0].hamming == 1


def test_bits_hamming_unequal_lengths_prefix_aligned(spark):
    """Regression (r11 ADVICE): unequal-length fingerprints compare
    PREFIX-aligned — both rpadded with '0' to the common length — so
    the distance is Hamming over the shared prefix plus the longer
    tail's set bits. Without the pad, conv right-aligned the shorter
    string's final partial chunk and the distance was semi-arbitrary."""
    from storage_spark.operators.multimodal import _bits_hamming

    import pyspark.sql.functions as F

    cases = [
        # (a, b, expected): b == a + tail  ->  distance = popcount(tail)
        ("1" * 40, "1" * 40 + "101", 2),
        # shorter differs in-prefix too: 1 prefix diff + 3 tail ones
        ("0" * 40, "1" + "0" * 39 + "111", 4),
        # equal lengths unaffected
        ("0110" * 16, "0110" * 16, 0),
        ("0" * 62, "0" * 61 + "1", 1),
    ]
    df = spark.createDataFrame(cases, "fa string, fb string, want int")
    rows = df.select(
        "want", _bits_hamming("fa", "fb").cast("int").alias("got")
    ).collect()
    assert all(r.got == r.want for r in rows), rows


def test_dhash_near_pairs_rejects_empty_band_counts(spark):
    """Regression (r11 ADVICE): band counts whose ceil-segmentation
    leaves the last band past the 64-char hash (e.g. 9 bands -> 8-char
    segments -> band 8 starts at 65) must be rejected — every row
    would share the identical empty band and the band join degenerates
    into a full cross product."""
    import pytest

    from storage_spark.operators.multimodal import dhash_near_pairs

    fps = spark.createDataFrame([("a", "01" * 32)], "key string, dhash string")
    for bad in (9, 33):
        with pytest.raises(ValueError, match="empty"):
            dhash_near_pairs(fps, max_hamming=3, n_bands=bad)
    # divisor-friendly counts still fine
    assert dhash_near_pairs(fps, max_hamming=3, n_bands=8).count() == 0
    assert dhash_near_pairs(fps, max_hamming=3, n_bands=16).count() == 0


def test_incremental_fingerprint_pairs_equals_full_restricted(spark):
    import numpy as np

    from storage_spark.functions.imagecodec import png_encode
    from storage_spark.operators.multimodal import (
        dhash_images,
        dhash_near_pairs,
        fingerprint_band_index,
        incremental_fingerprint_pairs,
    )

    rows = []
    for k in range(24):
        g, m = k // 3, k % 3
        yy, xx = np.mgrid[0:16, 0:27]
        v = (g * 53 + xx * (7 + g) + yy * 13) % 256
        if m:
            v = v.copy()
            v[2 * m + 1, 3 * m + 1] = (v[2 * m + 1, 3 * m + 1] + 128) % 256
        rows.append(
            (f"{k:03d}",
             bytearray(png_encode(np.stack([v] * 3, axis=2).astype(np.uint8))))
        )
    df = spark.createDataFrame(rows, "key string, content binary")
    fps = dhash_images(df).localCheckpoint(eager=True)
    corpus = fps.filter('key < "012"')
    batch = fps.filter('key >= "012"')
    idx = fingerprint_band_index(corpus)
    pairs, bb = incremental_fingerprint_pairs(idx, batch)
    got = sorted(map(tuple, pairs.collect()))
    batch_keys = {r.key for r in batch.select("key").collect()}
    exp = sorted(
        tuple(r) for r in dhash_near_pairs(fps, 3).collect()
        if r.key_a in batch_keys or r.key_b in batch_keys
    )
    assert got == exp and len(got) > 0
    # appending the batch bands reproduces the full index
    merged = sorted(
        map(tuple, idx.unionByName(bb).collect())
    )
    whole = sorted(map(tuple, fingerprint_band_index(fps).collect()))
    assert merged == whole
    # works identically over the audio/video fingerprint columns
    import pytest as _pytest

    with _pytest.raises(ValueError):
        incremental_fingerprint_pairs(idx, batch, max_hamming=4)


def test_media_dedup_resolve_transitive_and_default_prefer(spark):
    """media_dedup_resolve: (a~b, b~c) with NO direct a~c pair must fold
    into ONE cluster keeping exactly one survivor (greedy pair-dropping
    can't do that); the default election keeps the LARGEST blob; a
    pairless asset is its own singleton component."""
    from storage_spark.operators.multimodal import media_dedup_resolve

    blobs = spark.createDataFrame(
        [
            ("a", bytearray(b"x" * 10)),
            ("b", bytearray(b"x" * 99)),   # largest -> canonical
            ("c", bytearray(b"x" * 50)),
            ("d", bytearray(b"x" * 5)),    # singleton
        ],
        "key string, content binary",
    )
    pairs = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 3)],
        "key_a string, key_b string, hamming int",
    )
    got = {r.key: r for r in media_dedup_resolve(blobs, pairs).collect()}
    assert len(got) == 4
    assert {got[k].component for k in "abc"} == {"a"}
    assert all(got[k].canonical == "b" for k in "abc")
    assert [got[k].is_canonical for k in "abcd"] == [False, True, False, True]
    assert got["d"].component == "d" and got["d"].canonical == "d"

    # star contraction path agrees with label propagation
    star = {
        r.key: (r.component, r.canonical, r.is_canonical)
        for r in media_dedup_resolve(blobs, pairs, algorithm="star").collect()
    }
    assert star == {
        k: (v.component, v.canonical, v.is_canonical) for k, v in got.items()
    }

    # size tie -> min key wins
    tie = spark.createDataFrame(
        [("a", bytearray(b"x" * 9)), ("b", bytearray(b"x" * 9))],
        "key string, content binary",
    )
    p1 = spark.createDataFrame([("a", "b", 1)],
                               "key_a string, key_b string, hamming int")
    t = {r.key: r for r in media_dedup_resolve(tie, p1).collect()}
    assert t["a"].is_canonical and not t["b"].is_canonical


def test_media_dedup_resolve_end_to_end_dhash(spark):
    """Full chain on real PNGs: base image + two one-pixel perturbations
    form a transitive near-dup fan; resolve keeps exactly one, and the
    unrelated image survives as its own canonical."""
    import numpy as np

    from storage_spark.functions.imagecodec import png_encode
    from storage_spark.operators.multimodal import (
        dhash_images,
        dhash_near_pairs,
        media_dedup_resolve,
    )

    yy, xx = np.mgrid[0:16, 0:27]
    v = ((xx * 9 + yy * 5) % 256).astype(np.uint8)
    v2, v3 = v.copy(), v.copy()
    v2[3, 4] = (int(v2[3, 4]) + 128) % 256
    v3[5, 7] = (int(v3[5, 7]) + 128) % 256
    other = ((xx * 31 + yy * 17 + 90) % 256).astype(np.uint8)
    blobs = spark.createDataFrame(
        [(k, bytearray(png_encode(np.stack([m] * 3, axis=2))))
         for k, m in [("a", v), ("b", v2), ("c", v3), ("z", other)]],
        "key string, content binary",
    )
    pairs = dhash_near_pairs(dhash_images(blobs), max_hamming=3)
    out = {r.key: r for r in media_dedup_resolve(blobs, pairs).collect()}
    fan = {out[k].component for k in "abc"}
    assert fan == {"a"} and out["z"].component == "z"
    assert sum(out[k].is_canonical for k in "abc") == 1
    assert out["z"].is_canonical


def test_band_candidate_estimate_matches_probe():
    """The sizing law vs the r11 1M-fingerprint probe's measured
    candidate counts (tools/probe_r11_media_scale.py)."""
    from storage_spark.operators.multimodal import band_candidate_estimate

    # 1M + 10k planted, 4 bands/16-bit segs: measured 31,144,432
    est = band_candidate_estimate(1_010_000, 4)
    assert abs(est - 31_144_432) / 31_144_432 < 0.01
    # 50k + 10k planted, 8 bands/8-bit segs: measured 55,500,927
    est8 = band_candidate_estimate(60_000, 8)
    assert abs(est8 - 55_500_927) / 55_500_927 < 0.02
    # the narrowing law: x32 going 4 -> 6 bands, x256 going 4 -> 8
    n = 1_000_000
    assert band_candidate_estimate(n, 6) // band_candidate_estimate(n, 4) == 48  # 6/4 * 32
    assert band_candidate_estimate(n, 8) // band_candidate_estimate(n, 4) == 512  # 8/4 * 256


def test_media_dedup_resolve_composes_with_incremental_pairs(spark):
    """The incremental ingest shape: corpus band index + new batch →
    incremental_fingerprint_pairs → media_dedup_resolve over the union.
    The resolution over (corpus ∪ batch) with incremental pairs must
    equal the full-corpus banded join's resolution restricted to the
    same keys — proving the incremental path feeds the resolver
    without re-hashing the corpus."""
    from pyspark.sql import functions as F

    from storage_spark.operators.multimodal import (
        fingerprint_band_index,
        incremental_fingerprint_pairs,
        media_dedup_resolve,
    )

    def fp(bits):
        return bits + "0" * (64 - len(bits))

    corpus = spark.createDataFrame(
        [("a", fp("1010")), ("b", fp("1011")), ("z", fp("01" * 32)[:64])],
        "key string, dhash string",
    )
    batch = spark.createDataFrame(
        [("c", fp("1010")), ("d", fp("1" * 24))],
        "key string, dhash string",
    )
    idx = fingerprint_band_index(corpus)
    pairs, _bb = incremental_fingerprint_pairs(idx, batch, max_hamming=3)

    allfp = corpus.unionByName(batch)
    blobs = allfp.select(
        "key",
        F.encode(F.concat(F.lit("x"), F.col("key")), "utf-8").alias("content"),
    )
    got = {
        r.key: (r.component, r.canonical, r.is_canonical)
        for r in media_dedup_resolve(
            blobs, pairs, prefer=F.length("key").cast("bigint")
        ).collect()
    }
    # a~b (1 bit), a~c (0 bits), b~c (1 bit) — one cluster {a, b, c};
    # z (corpus) and d (batch) are far from everything -> singletons
    assert {got[k][0] for k in "abc"} == {"a"}
    assert sum(got[k][2] for k in "abc") == 1
    assert got["z"] == ("z", "z", True)
    assert got["d"] == ("d", "d", True)


def test_media_resolve_staged_audio_video_pairs_hash_match(spark, sf_dir):
    """The staged audio/video cluster-resolution driver pairs
    (q_audio_dedup_resolve / q_video_dedup_resolve — unregistered, the
    r11 recording window was full) must pass the IDENTICAL gate the
    driver runs, so registering either when window room appears is a
    two-line diff. One shared resolve-oracle suffix drives all three
    media resolve replays (image registered, audio/video staged)."""
    import __spark_entry__ as entry_mod
    from tests.parity import assert_parity

    assert_parity(
        entry_mod.q_audio_dedup_resolve(spark, sf_dir),
        entry_mod._oracle_audio_dedup_resolve(),
        sf_dir,
        "audio_dedup_resolve_staged",
    )
    assert_parity(
        entry_mod.q_video_dedup_resolve(spark, sf_dir),
        entry_mod._oracle_video_dedup_resolve(),
        sf_dir,
        "video_dedup_resolve_staged",
    )
