"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's only media operator is the imgproxy render path
(src/storage/renderer/image.ts:298-355: width/height/resize∈{cover,contain,
fill}/format/quality with clamped limits). At 100 TB the engine-side shape
is: blobs as ``binary`` columns with a typed metadata struct, and
decode/transform/feature steps as Arrow-batched ``mapInPandas`` stages so
the Python media library only ever sees vectorized batches.

Metadata decode is REAL for PNG, JPEG, GIF, lossless WebP, MJPEG-in-AVI
video, and WAV (PCM + G.711 + IMA ADPCM) / FLAC audio — all pure
struct/bit walks, no media library. Pixel/sample-level work is REAL for
the same set as of round 9: ``functions.imagecodec.image_pixel_codec``
(PNG filtered scanlines; JPEG Huffman entropy decode incl. SOF2
successive-approximation scans + IDCT + subsampled plane upsampling +
JFIF YCbCr; GIF LZW with late width change; VP8L via
``functions.webpcodec``; cover/contain/fill resize; re-encode) is
``transform_images``'s default codec, dispatching on magic bytes; video
frames decode through ``sample_video_frames``/``detect_scene_cuts``;
audio through ``wav_decode_int``/``flac_decode`` into
``audio_features``/``detect_silence``. Only PERCEPTUAL codecs (lossy
WebP/VP8, mp3/ogg/opus, H.26x) still require an external library and
raise honestly; the deterministic FAKE header remains as a test fixture
format alongside the real ones.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata for a media blob (mirrors the jsonb metadata the
#: reference stores per object, narrowed to media fields).
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

#: Render-option clamps (image.ts:14-19: dimensions capped; quality 1-100).
MAX_DIMENSION = 2500
RESIZE_MODES = ("cover", "contain", "fill")


def fake_header(width: int, height: int, n_frames: int = 1) -> bytes:
    """Deterministic stand-in codec: 'FAKE:w:h:f|' + payload."""
    return f"FAKE:{width}:{height}:{n_frames}|".encode()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def parse_image_header(b: bytes) -> tuple[str | None, int | None, int | None, int | None]:
    """Pure-struct image metadata sniffer: ``(mime, width, height,
    n_frames)``, all-None when the bytes are not a recognized image.

    - **PNG**: 8-byte magic, then the IHDR chunk is REQUIRED first
      (PNG spec §11.2.2) — width/height are the two big-endian u32s at
      offsets 16/20.
    - **JPEG**: walk the marker stream; every SOFn (0xC0-0xCF except the
      non-frame DHT/DNL/DAC markers) carries precision(1) height(2)
      width(2) after the segment length. SOF always precedes SOS in a
      valid stream, so the walk stops at SOS/EOI.
    - **GIF**: 87a/89a magic; width/height are the logical-screen u16s
      and ``n_frames`` COUNTS the image descriptors with a pure
      block-length walk (LZW data is skipped, never decoded) — the one
      common format where n_frames is real, which is what makes
      ``frame_sample_plan`` exercisable on genuine bytes.
    - **FAKE**: the deterministic test fixture format, kept so plumbing
      tests don't need valid image bytes.

    This is the dependency-free core of the reference's metadata probe
    (src/storage/renderer/image.ts:298-355 reads the same fields via
    imgproxy); a real pixel codec is only needed for transforms.
    """
    if b is None:
        return (None, None, None, None)
    b = bytes(b)
    if b.startswith(b"FAKE:"):
        head = b.split(b"|", 1)[0].decode()
        _tag, w, h, f = head.split(":")
        return ("image/fake", int(w), int(h), int(f))
    if b.startswith(_PNG_MAGIC) and len(b) >= 24 and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return ("image/png", w, h, 1)
    if len(b) >= 12 and b[0:4] == b"RIFF" and b[8:12] == b"WEBP":
        from storage_spark.functions.webpcodec import webp_parse_meta

        try:
            w, h, _lossless = webp_parse_meta(b)
        except Exception:
            return (None, None, None, None)
        return ("image/webp", w, h, 1)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from storage_spark.functions.imagecodec import gif_parse_meta

        try:
            w, h, n = gif_parse_meta(b)
        except Exception:  # truncated/corrupt block walk → not an image
            return (None, None, None, None)
        return ("image/gif", w, h, n)
    if b.startswith(b"\xff\xd8"):
        i, n = 2, len(b)
        while i + 9 <= n:
            if b[i] != 0xFF:
                return (None, None, None, None)  # marker misalignment
            marker = b[i + 1]
            if marker == 0xFF:  # fill bytes before a marker
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # no-payload
                if marker == 0xD9:
                    break  # EOI before any SOF
                i += 2
                continue
            if marker == 0xDA:
                break  # SOS: entropy-coded data; SOF must precede it
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if seglen < 2:
                return (None, None, None, None)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return ("image/jpeg", w, h, 1)
            i += 2 + seglen
        return (None, None, None, None)
    return (None, None, None, None)


def decode_image_meta(blobs: DataFrame, key_col: str = "key",
                      content_col: str = "content") -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over binary content, one
    pandas batch per partition slice. Metadata parsing is real for
    PNG/JPEG (``parse_image_header``); unrecognized bytes yield NULL
    metadata instead of raising — at 100 TB one poison blob must not kill
    the job."""

    _decode_one = parse_image_header

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [_decode_one(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "key": pdf[key_col],
                    "mime": [m[0] for m in meta],
                    "width": [m[1] for m in meta],
                    "height": [m[2] for m in meta],
                    "n_frames": [m[3] for m in meta],
                    "n_bytes": [
                        None if b is None else len(bytes(b))
                        for b in pdf[content_col]
                    ],
                }
            )

    return blobs.mapInPandas(_batches, DECODED_SCHEMA)


def validate_render_options(width: int, height: int, resize: str,
                           quality: int = 80) -> None:
    """image.ts:298-355 option validation with clamped limits."""
    if not (0 < width <= MAX_DIMENSION and 0 < height <= MAX_DIMENSION):
        raise ValueError(f"dimensions must be in (0, {MAX_DIMENSION}]")
    if resize not in RESIZE_MODES:
        raise ValueError(f"resize must be one of {RESIZE_MODES}")
    if not (1 <= quality <= 100):
        raise ValueError("quality must be in [1, 100]")


def transform_images(
    blobs: DataFrame,
    width: int,
    height: int,
    resize: str = "cover",
    quality: int = 80,
    codec: Callable[[bytes, int, int, str, int], bytes] | None = None,
    key_col: str = "key",
    content_col: str = "content",
) -> DataFrame:
    """Batch image transform (render path as a bulk operator).
    ``codec=None`` defaults via ``fastcodec.select_pixel_codec()``: the
    dependency-free magic-dispatching codec
    (``functions.imagecodec.image_pixel_codec`` — real
    decode/resize/re-encode for PNG, JPEG incl. progressive, GIF, and
    lossless WebP), or the PIL-backed accelerated path when
    ``STORAGE_SPARK_FAST_CODECS=1`` and Pillow imports (same formats
    and resize geometry, native-speed entropy coding — see fastcodec's
    contract). Any ``codec(bytes, w, h, resize, quality) → bytes``
    callable plugs in; the Spark plumbing is identical either way."""
    validate_render_options(width, height, resize, quality)
    if codec is None:
        from storage_spark.functions.fastcodec import select_pixel_codec

        codec = select_pixel_codec()

    out_schema = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("content", T.BinaryType())]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "key": pdf[key_col],
                    "content": [
                        codec(bytes(b), width, height, resize, quality)
                        for b in pdf[content_col]
                    ],
                }
            )

    return blobs.mapInPandas(_batches, out_schema)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def fake_audio_header(sample_rate: int, n_samples: int) -> bytes:
    """Deterministic stand-in audio codec: 'FAKEPCM:<rate>:<n>|' + payload."""
    return f"FAKEPCM:{sample_rate}:{n_samples}|".encode()


def decode_audio_meta(
    blobs: DataFrame, key_col: str = "key", content_col: str = "content"
) -> DataFrame:
    """Audio decode stage — same Arrow-batched mapInPandas shape as
    decode_image_meta. REAL for PCM WAV, (r9) the dependency-free
    compressed forms — G.711 A-law/mu-law and IMA ADPCM
    (``imagecodec.wav_parse_meta_v2``: RIFF walk honoring the ``fact``
    chunk) — and (r9) FLAC (STREAMINFO parse; full Rice-coded decode in
    ``imagecodec.flac_decode``); the FAKEPCM test fixture stays
    recognized; perceptual formats (mp3/ogg/opus) still need an
    external decoder and raise honestly."""

    def _decode_one(b: bytes) -> tuple[int, int]:
        if b is not None and bytes(b).startswith(b"RIFF"):
            from storage_spark.functions.imagecodec import wav_parse_meta_v2

            _fmt, rate, n_samples, _ch = wav_parse_meta_v2(bytes(b))
            return (rate, n_samples)
        if b is not None and bytes(b).startswith(b"fLaC"):
            from storage_spark.functions.imagecodec import flac_parse_meta

            rate, n_samples, _ch, _bits = flac_parse_meta(bytes(b))
            return (rate, n_samples)
        if b is None or not bytes(b).startswith(b"FAKEPCM:"):
            raise NotImplementedError(
                "real audio decoding beyond PCM WAV requires a media codec"
                " — only WAV and the FAKEPCM fixture ship in this"
                " environment"
            )
        head = bytes(b).split(b"|", 1)[0].decode()
        _tag, rate, n = head.split(":")
        return (int(rate), int(n))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [_decode_one(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "key": pdf[key_col],
                    "sample_rate": [m[0] for m in meta],
                    "n_samples": [m[1] for m in meta],
                    "duration_ms": [
                        (m[1] * 1000) // m[0] if m[0] else 0 for m in meta
                    ],
                }
            )

    return blobs.mapInPandas(_batches, AUDIO_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_1e6", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_features(
    blobs: DataFrame, key_col: str = "key", content_col: str = "content"
) -> DataFrame:
    """REAL audio feature extraction for PCM WAV blobs (r9): full sample
    decode via the stdlib ``wave`` module, then deterministic
    integer-scaled features (RMS loudness ×1e6, zero-crossing count) —
    the audio-quality gate of a multimodal training pipeline, in the
    same Arrow-batched map-only shape as every media stage. Non-WAV
    bytes yield NULL features (poison blobs must not kill the job)."""
    from storage_spark.functions.imagecodec import wav_features

    def _one(b):
        try:
            return wav_features(bytes(b)) if b is not None else None
        except Exception:
            return None

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_one(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "key": pdf[key_col],
                    "sample_rate": [f[0] if f else None for f in feats],
                    "n_samples": [f[1] if f else None for f in feats],
                    "duration_ms": [f[2] if f else None for f in feats],
                    "rms_1e6": [f[3] if f else None for f in feats],
                    "zero_crossings": [f[4] if f else None for f in feats],
                }
            )

    return blobs.mapInPandas(_batches, AUDIO_FEATURES_SCHEMA)


def extract_embeddings(
    blobs: DataFrame,
    dim: int = 64,
    key_col: str = "key",
    content_col: str = "content",
    embedder=None,
) -> DataFrame:
    """The multimodal → vector bridge: content bytes → ``array<float>``
    embedding via an Arrow-batched mapInPandas stage. The DEFAULT
    featurizer is a DETERMINISTIC FAKE (md5-seeded floats in [-1, 1])
    standing in for a real encoder (CLIP/wav2vec/...); identical bytes →
    identical vector, so downstream near-dup
    (operators.dedup.embedding_near_dup_pairs) and ANN
    (functions.vectors) run for real against the fake's output.

    ``embedder`` dispatches a REAL provider through
    ``functions.embedder.select_embedder`` (the fastcodec pattern): pass
    a batch callable ``fn(list[bytes], dim) -> list[list[float]]`` or a
    ``module:function`` import target, or set the
    ``STORAGE_SPARK_EMBEDDER`` environment flag; resolution failures and
    wrong-count/wrong-dim outputs raise loudly rather than silently
    degrading. The batch shape, schema, and partition behavior are
    exactly what a real model-inference stage uses (one Arrow batch per
    provider call; providers cache their model at module level so the
    load is paid once per executor process)."""
    from storage_spark.functions.embedder import select_embedder, validate_batch

    embed = select_embedder(embedder)
    provider_name = getattr(embed, "__name__", repr(embed))

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            batch = [bytes(b) for b in pdf[content_col]]
            vecs = validate_batch(
                embed(batch, dim), len(batch), dim, provider_name
            )
            yield pd.DataFrame({"key": pdf[key_col], "embedding": vecs})

    return blobs.mapInPandas(_batches, out_schema)


def frame_sample_plan(videos: DataFrame, every_n: int,
                      key_col: str = "key") -> DataFrame:
    """Frame-sampling *plan*: one output row per sampled frame index, from
    the decoded n_frames metadata — the per-frame extraction UDF plugs into
    the same (key, frame_idx) grid. Pure expression (no Python rows)."""
    grid = F.when(
        F.col("n_frames") > 0,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    # zero-frame / NULL-metadata videos yield NO rows (a phantom frame 0
    # would send the per-frame UDF after a frame that does not exist)
    return videos.select(
        F.col(key_col).alias("key"), F.explode(grid).alias("frame_idx")
    )


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("container", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps_x1000", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_video_meta(
    blobs: DataFrame,
    key_col: str = "key",
    content_col: str = "content",
) -> DataFrame:
    """Video metadata stage, REAL for MJPEG-in-AVI (the one container a
    dependency-free environment can both write and read —
    ``functions.imagecodec.avi_parse_meta`` walks the RIFF tree with
    pure struct, never touching a frame's entropy-coded bytes). Columns
    mirror ``decode_image_meta``'s contract: unrecognized/corrupt bytes
    yield NULL metadata instead of raising (one poison blob must not
    kill a 100 TB scan); ``fps_x1000`` and ``duration_ms`` are integer
    math from the stream header's dwRate/dwScale so the values are
    engine-exact. Other containers (MP4/MKV/WebM) need an inter-frame
    codec to be USEFUL, not just parseable — honestly absent, same
    policy as WebP."""
    from storage_spark.functions.imagecodec import avi_parse_meta

    def _one(b):
        if b is None:
            return (None, None, None, None, None, None)
        try:
            w, h, n, fps = avi_parse_meta(bytes(b))
        except Exception:
            return (None, None, None, None, None, None)
        dur = (n * 1_000_000) // fps if fps else 0
        return ("video/x-msvideo", w, h, n, fps, dur)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [_one(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "key": pdf[key_col],
                    "container": [m[0] for m in meta],
                    "width": [m[1] for m in meta],
                    "height": [m[2] for m in meta],
                    "n_frames": [m[3] for m in meta],
                    "fps_x1000": [m[4] for m in meta],
                    "duration_ms": [m[5] for m in meta],
                }
            )

    return blobs.mapInPandas(_batches, VIDEO_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_width", T.IntegerType()),
        T.StructField("frame_height", T.IntegerType()),
        T.StructField("mean_r_x100", T.LongType()),
        T.StructField("mean_g_x100", T.LongType()),
        T.StructField("mean_b_x100", T.LongType()),
    ]
)


def sample_video_frames(
    blobs: DataFrame,
    every_n: int,
    key_col: str = "key",
    content_col: str = "content",
) -> DataFrame:
    """Frame EXTRACTION (the stage ``frame_sample_plan`` lays the grid
    for): decode every ``every_n``-th frame of each MJPEG AVI and emit
    per-frame dimensions + per-channel integer pixel means (×100,
    round-half-even via numpy — deterministic). One pass per blob: the
    RIFF walk yields frame payloads in stream order and only the sampled
    indices are JPEG-decoded, so the cost is proportional to the SAMPLED
    frames, not the stream length. Corrupt blobs/frames yield no rows.

    Scale shape: map-only Arrow stage, no shuffle; a blob's frames never
    split across tasks (a video row is the parallelism unit, same as the
    reference's per-object render — image.ts:298-355)."""
    if every_n <= 0:
        raise ValueError("every_n must be positive")
    import numpy as np

    from storage_spark.functions.imagecodec import avi_frame_bytes, jpeg_decode

    def _rows(key: str, b) -> list[tuple]:
        out = []
        if b is None:
            return out
        try:
            payloads = avi_frame_bytes(bytes(b))
            for i, p in enumerate(payloads):
                if i % every_n:
                    continue
                a = jpeg_decode(p)
                m = a.reshape(-1, a.shape[2]).mean(axis=0)
                out.append(
                    (
                        key,
                        i,
                        a.shape[1],
                        a.shape[0],
                        int(np.round(m[0] * 100)),
                        int(np.round(m[1] * 100)),
                        int(np.round(m[2] * 100)),
                    )
                )
        except Exception:
            return []
        return out

    cols = [f.name for f in FRAME_SCHEMA.fields]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            for key, b in zip(pdf[key_col], pdf[content_col]):
                rows.extend(_rows(key, b))
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(_batches, FRAME_SCHEMA)


SCENE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("mad_x100", T.LongType()),
        T.StructField("is_cut", T.BooleanType()),
    ]
)


def detect_scene_cuts(
    blobs: DataFrame,
    threshold_x100: int = 3000,
    key_col: str = "key",
    content_col: str = "content",
) -> DataFrame:
    """Scene-change detection over MJPEG AVI: per consecutive frame
    pair, the mean absolute pixel difference (×100, integer) and a cut
    flag when it exceeds ``threshold_x100``. One row per frame index ≥
    1. The classic shot-boundary baseline (frame-differencing) — the
    stage a video training pipeline runs to pick representative frames
    instead of a blind stride.

    Map-only Arrow stage; a blob's frames decode once in stream order
    (the RIFF walk yields payloads sequentially, only two frames held
    at a time). Corrupt blobs yield no rows."""
    import numpy as np

    from storage_spark.functions.imagecodec import avi_frame_bytes, jpeg_decode

    def _rows(key: str, b) -> list[tuple]:
        out = []
        if b is None:
            return out
        try:
            prev = None
            for i, p in enumerate(avi_frame_bytes(bytes(b))):
                cur = jpeg_decode(p).astype(np.int64)
                if prev is not None and cur.shape == prev.shape:
                    mad = int(np.round(np.abs(cur - prev).mean() * 100))
                    out.append((key, i, mad, mad > threshold_x100))
                prev = cur
        except Exception:
            return []
        return out

    cols = [f.name for f in SCENE_SCHEMA.fields]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            for key, b in zip(pdf[key_col], pdf[content_col]):
                rows.extend(_rows(key, b))
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(_batches, SCENE_SCHEMA)


SILENCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("span_start", T.LongType()),
        T.StructField("span_end", T.LongType()),
    ]
)


def detect_silence(
    blobs: DataFrame,
    window: int = 400,
    max_mean_square: int = 1000,
    key_col: str = "key",
    content_col: str = "content",
) -> DataFrame:
    """Silence segmentation over decodable audio (PCM / G.711 / ADPCM
    WAV, FLAC): split the int16-domain signal into fixed windows,
    compute each window's integer MEAN SQUARE (``Σx²//n`` — mean square
    rather than RMS on purpose: no sqrt, so an oracle replays it in
    exact integer arithmetic), and merge consecutive quiet windows
    (ms ≤ ``max_mean_square``) into half-open sample spans. The trim/
    segment stage of an audio training pipeline.

    Map-only Arrow stage; the trailing partial window is judged on its
    own length. Undecodable blobs yield no rows."""
    import numpy as np

    from storage_spark.functions.imagecodec import flac_decode, wav_decode_int

    def _rows(key: str, b) -> list[tuple]:
        out = []
        if b is None:
            return out
        try:
            bb = bytes(b)
            if bb[:4] == b"fLaC":
                _rate, x = flac_decode(bb)
            else:
                _rate, x = wav_decode_int(bb)
        except Exception:
            return []
        n = len(x)
        run_start = None
        for w0 in range(0, n, window):
            seg = x[w0 : w0 + window]
            ms = int((seg * seg).sum()) // len(seg)
            quiet = ms <= max_mean_square
            if quiet and run_start is None:
                run_start = w0
            elif not quiet and run_start is not None:
                out.append((key, run_start, w0))
                run_start = None
        if run_start is not None:
            out.append((key, run_start, n))
        return out

    cols = [f.name for f in SILENCE_SCHEMA.fields]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            for key, b in zip(pdf[key_col], pdf[content_col]):
                rows.extend(_rows(key, b))
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(_batches, SILENCE_SCHEMA)


def image_decode_rgb(b: bytes):
    """Decode any supported still image (PNG / JPEG / GIF frame 0 /
    lossless WebP) to an RGB uint8 array — the shared entry the
    perceptual-hash and feature stages use."""
    import numpy as np

    from storage_spark.functions.imagecodec import (
        gif_decode,
        jpeg_decode,
        png_decode,
    )

    b = bytes(b)
    if b.startswith(_PNG_MAGIC):
        a = png_decode(b)
    elif b[:2] == b"\xff\xd8":
        a = jpeg_decode(b)
    elif b[:6] in (b"GIF87a", b"GIF89a"):
        a = gif_decode(b, 0)
    elif len(b) >= 12 and b[0:4] == b"RIFF" and b[8:12] == b"WEBP":
        from storage_spark.functions.webpcodec import webp_decode

        a = webp_decode(b)[:, :, :3]
    else:
        raise NotImplementedError("unsupported image format for decode")
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=2)
    if a.shape[2] == 1:
        a = np.repeat(a, 3, axis=2)
    return a[:, :, :3]


def dhash_bits(b: bytes) -> str:
    """Perceptual difference hash (dHash): decode → integer luma
    ``(299r+587g+114b)//1000`` → AREA-MEAN downsample to a 9×8 grid
    (cell (y, x) covers rows [y·h//8, (y+1)·h//8) × cols [x·w//9,
    (x+1)·w//9); value = pixel sum // pixel count) → 64 row-wise
    gradient bits ``p[y][x+1] > p[y][x]``, returned as a 64-char
    '0'/'1' string. Every step is integer math, so identical bytes hash
    identically in any engine and a SQL oracle replays the whole hash.

    Area mean, NOT point sampling — the r10 planted-near-dup probe
    (tools/probe_r10_media_recall.py) measured the earlier pixel-center
    nearest sample at recall 0.18 under a 75% re-render and 0.50 under
    q75 JPEG re-encode (single-pixel samples flip on any local noise);
    box means integrate the cell, which is what published dHash
    implementations do and what makes the hash scale/noise-robust.
    Images narrower than the grid upscale first (deterministic
    nearest)."""
    import numpy as np

    from storage_spark.functions.imagecodec import _resize_nearest

    a = image_decode_rgb(b).astype(np.int64)
    gray = (a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114) // 1000
    h, w = gray.shape
    if h < 8 or w < 9:
        gray = _resize_nearest(gray, max(w, 9), max(h, 8))
        h, w = gray.shape
    cs = np.zeros((h + 1, w + 1), dtype=np.int64)
    cs[1:, 1:] = gray.cumsum(axis=0).cumsum(axis=1)
    ys = [y * h // 8 for y in range(9)]
    xs = [x * w // 9 for x in range(10)]
    g = np.empty((8, 9), dtype=np.int64)
    for y in range(8):
        for x in range(9):
            y0, y1, x0, x1 = ys[y], ys[y + 1], xs[x], xs[x + 1]
            g[y, x] = (
                cs[y1, x1] - cs[y0, x1] - cs[y1, x0] + cs[y0, x0]
            ) // ((y1 - y0) * (x1 - x0))
    bits = (g[:, 1:] > g[:, :-1]).astype(np.uint8)
    return "".join("1" if v else "0" for v in bits.reshape(-1))


def dhash_images(
    blobs: DataFrame,
    key_col: str = "key",
    content_col: str = "content",
) -> DataFrame:
    """Arrow map-only perceptual-hash stage: ``(key, dhash)`` with the
    64-bit dHash as a bit string. Undecodable blobs yield no rows."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for key, b in zip(pdf[key_col], pdf[content_col]):
                if b is None:
                    continue
                try:
                    rows.append((key, dhash_bits(bytes(b))))
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=["key", "dhash"])

    return blobs.mapInPandas(_batches, "key string, dhash string")


def dhash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Image near-dup pairs by dHash Hamming distance — the LAION-style
    image dedup stage, banded exactly like SimHash: the 64 bits split
    into ``n_bands`` bands; any pair within ``max_hamming`` ≤
    ``n_bands − 1`` shares at least one band VERBATIM (pigeonhole), so
    candidates come from ``n_bands`` equi-joins on band values, never a
    cross product. Exact Hamming verification on candidates via two
    32-bit ``bit_count(xor)`` halves (a 64-bit conv would overflow
    signed bigint). Output: ``(key_a, key_b, hamming)``, key_a < key_b.

    Threshold guidance (measured, tools/probe_r10_media_recall.py):
    the default (4 bands, ≤ 3) catches re-encodes (q75 JPEG 0.96,
    brightness 1.0) but smooth 75% RESIZES land at Hamming 2-5 —
    resize-robust dedup wants ``max_hamming=5, n_bands=6`` (recall
    0.94 on the planted fixture, candidate volume grows with the
    narrower 11-bit bands)."""
    if not (0 <= max_hamming <= n_bands - 1):
        raise ValueError(
            "banded recall guarantee needs max_hamming <= n_bands - 1"
        )
    seg = -(-64 // n_bands)  # ceil
    if (n_bands - 1) * seg >= 64:
        # e.g. n_bands=9 -> seg=8 puts band 8's start past the 64-char
        # hash: every row would share the identical EMPTY band and the
        # band join degenerates into a full cross product
        raise ValueError(
            f"n_bands={n_bands} leaves band {n_bands - 1} empty for a "
            f"64-bit hash (ceil-segment {seg}); use n_bands <= 8 or a "
            f"divisor-friendly band count"
        )
    bands = hashes.select(
        "key", "dhash",
        F.explode(
            F.array(*[
                F.concat(F.lit(f"{i}:"),
                         F.substring("dhash", i * seg + 1, seg))
                for i in range(n_bands)
            ])
        ).alias("band"),
    )
    a = bands.select(
        F.col("key").alias("key_a"), F.col("dhash").alias("h_a"), "band"
    )
    b = bands.select(
        F.col("key").alias("key_b"), F.col("dhash").alias("h_b"), "band"
    )
    cand = (
        a.join(b, "band")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "h_a", "h_b")
        .distinct()
    )
    ham = (
        F.bit_count(
            F.conv(F.substring("h_a", 1, 32), 2, 10).cast("bigint")
            .bitwiseXOR(
                F.conv(F.substring("h_b", 1, 32), 2, 10).cast("bigint")
            )
        )
        + F.bit_count(
            F.conv(F.substring("h_a", 33, 32), 2, 10).cast("bigint")
            .bitwiseXOR(
                F.conv(F.substring("h_b", 33, 32), 2, 10).cast("bigint")
            )
        )
    )
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("key_a", "key_b", "hamming")
    )


def audio_fingerprint_bits(b: bytes, n_windows: int = 33) -> str:
    """Deterministic audio fingerprint: the signal splits into
    ``n_windows`` equal windows, each scored by integer mean square
    (Σx²//len — the same no-sqrt discipline as ``detect_silence``), and
    the fingerprint is the 32 energy-GRADIENT bits ``ms[i+1] > ms[i]``
    — the audio analogue of the image dHash (envelope shape, loudness-
    scale robust to codec quantization because gradients compare
    neighbors). Pure integer math end to end, so a SQL oracle replays
    it from a generation rule. Short signals (< n_windows samples)
    raise — there is no meaningful envelope to hash."""
    import numpy as np

    from storage_spark.functions.imagecodec import flac_decode, wav_decode_int

    bb = bytes(b)
    if bb[:4] == b"fLaC":
        _rate, x = flac_decode(bb)
    else:
        _rate, x = wav_decode_int(bb)
    n = len(x)
    if n < n_windows:
        raise ValueError(f"signal too short for {n_windows} windows")
    ms = []
    for i in range(n_windows):
        lo, hi = (i * n) // n_windows, ((i + 1) * n) // n_windows
        seg = x[lo:hi]
        ms.append(int((seg * seg).sum()) // len(seg))
    return "".join(
        "1" if ms[i + 1] > ms[i] else "0" for i in range(n_windows - 1)
    )


def audio_fingerprints(
    blobs: DataFrame,
    key_col: str = "key",
    content_col: str = "content",
) -> DataFrame:
    """Arrow map-only fingerprint stage: ``(key, afp)`` 32-bit
    energy-gradient fingerprint as a bit string. Undecodable/too-short
    blobs yield no rows."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for key, b in zip(pdf[key_col], pdf[content_col]):
                if b is None:
                    continue
                try:
                    rows.append((key, audio_fingerprint_bits(bytes(b))))
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=["key", "afp"])

    return blobs.mapInPandas(_batches, "key string, afp string")


def audio_near_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
) -> DataFrame:
    """Audio near-dup pairs by fingerprint Hamming distance — same
    4-band pigeonhole plan as ``dhash_near_pairs`` (8-bit bands over
    the 32 bits; ≤ 3 differing bits guarantee one verbatim band)."""
    if not (0 <= max_hamming <= 3):
        raise ValueError("banded recall guarantee holds for max_hamming <= 3")
    bands = fingerprints.select(
        "key", "afp",
        F.explode(
            F.array(*[
                F.concat(F.lit(f"{i}:"), F.substring("afp", i * 8 + 1, 8))
                for i in range(4)
            ])
        ).alias("band"),
    )
    a = bands.select(
        F.col("key").alias("key_a"), F.col("afp").alias("f_a"), "band"
    )
    b = bands.select(
        F.col("key").alias("key_b"), F.col("afp").alias("f_b"), "band"
    )
    ham = F.bit_count(
        F.conv(F.col("f_a"), 2, 10).cast("bigint")
        .bitwiseXOR(F.conv(F.col("f_b"), 2, 10).cast("bigint"))
    )
    return (
        a.join(b, "band")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "f_a", "f_b")
        .distinct()
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("key_a", "key_b", "hamming")
    )


def video_fingerprint_bits(b: bytes) -> str:
    """Temporal video fingerprint: the per-frame mean-luma sequence's
    gradient bits ``mean[f+1] > mean[f]`` — the activity-envelope
    signature cheap video dedup prefilters use (frame content is the
    image hashes' job; this captures the TEMPORAL shape). Integer luma
    means (``//`` divisions only), so a SQL oracle replays it when the
    frames are rule-predictable. Streams with < 2 frames raise."""
    import numpy as np

    from storage_spark.functions.imagecodec import avi_frame_bytes, jpeg_decode

    means = []
    for p in avi_frame_bytes(bytes(b)):
        a = jpeg_decode(p).astype(np.int64)
        luma = (a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114) // 1000
        means.append(int(luma.sum()) // luma.size)
    if len(means) < 2:
        raise ValueError("need >= 2 frames for a temporal fingerprint")
    return "".join(
        "1" if means[i + 1] > means[i] else "0"
        for i in range(len(means) - 1)
    )


def video_fingerprints(
    blobs: DataFrame,
    key_col: str = "key",
    content_col: str = "content",
) -> DataFrame:
    """Arrow map-only stage: ``(key, vfp)`` temporal fingerprint bits.
    Undecodable/single-frame blobs yield no rows."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for key, b in zip(pdf[key_col], pdf[content_col]):
                if b is None:
                    continue
                try:
                    rows.append((key, video_fingerprint_bits(bytes(b))))
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=["key", "vfp"])

    return blobs.mapInPandas(_batches, "key string, vfp string")


def video_near_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Video near-dup pairs by temporal-fingerprint Hamming distance:
    same pigeonhole banding as the image/audio pairs, over
    variable-length bit strings (same-length fingerprints band
    together; different lengths can never pair — a different frame
    count IS a different clip)."""
    if max_hamming > n_bands - 1:
        raise ValueError("need max_hamming <= n_bands - 1 for recall")
    blen = F.length("vfp")
    seg = (blen + n_bands - 1) / n_bands
    bands = fingerprints.select(
        "key", "vfp",
        F.explode(
            F.array(*[
                F.concat(
                    F.lit(f"{i}:"), blen.cast("string"), F.lit(":"),
                    F.substring(
                        "vfp",
                        (F.lit(i) * F.ceil(seg) + 1).cast("int"),
                        F.ceil(seg).cast("int"),
                    ),
                )
                for i in range(n_bands)
            ])
        ).alias("band"),
    )
    a = bands.select(F.col("key").alias("key_a"),
                     F.col("vfp").alias("f_a"), "band")
    b = bands.select(F.col("key").alias("key_b"),
                     F.col("vfp").alias("f_b"), "band")
    # chunked 31-bit Hamming with offsets derived from the actual
    # fingerprint length (clips can exceed any fixed chunk window)
    ham = _bits_hamming("f_a", "f_b")
    return (
        a.join(b, "band")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "f_a", "f_b")
        .distinct()
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("key_a", "key_b", "hamming")
    )


def fingerprint_band_index(
    fps: DataFrame,
    bit_col: str = "dhash",
    n_bands: int = 4,
) -> DataFrame:
    """Persistable band index over bit-string fingerprints (image dHash
    / audio energy / video temporal — any of this module's
    fingerprints): ``(band, key, bits)`` rows, the same posting shape
    the MinHash band index uses. The band value embeds the band number
    AND the fingerprint length (different lengths never collide). One
    narrow table, n_bands rows per fingerprint."""
    blen = F.length(bit_col)
    seg = F.ceil(blen / n_bands)
    return fps.select(
        F.col("key"), F.col(bit_col).alias("bits"),
        F.explode(
            F.array(*[
                F.concat(
                    F.lit(f"{i}:"), blen.cast("string"), F.lit(":"),
                    F.substring(
                        bit_col,
                        (F.lit(i) * seg + 1).cast("int"),
                        seg.cast("int"),
                    ),
                )
                for i in range(n_bands)
            ])
        ).alias("band"),
    )


def _bits_hamming(a_col: str, b_col: str) -> F.Column:
    """Chunked 31-bit Hamming distance between two bit-string columns,
    conv-safe (31 bits can never overflow a signed bigint) and
    length-safe: chunk offsets are derived from the ACTUAL string
    length via aggregate-over-sequence, so arbitrarily long
    fingerprints (video temporal bits are n_frames-1 long, unbounded)
    are covered in full — a fixed offset list silently ignores bits
    past its window and understates distance. Unequal lengths are
    PREFIX-aligned: both strings are right-padded with '0' to the
    common length first (without the pad, conv right-aligns the
    shorter one's final partial chunk within its 31-bit window and the
    distance is neither prefix- nor suffix-aligned). All banded
    callers in this module embed the length in the band key, so
    unequal-length pairs only reach this via direct calls."""
    def _chunk(col: F.Column, off: F.Column) -> F.Column:
        return F.coalesce(
            F.conv(F.substring(col, off, F.lit(31)), 2, 10).cast("bigint"),
            F.lit(0),
        )

    maxlen = F.greatest(F.length(F.col(a_col)), F.length(F.col(b_col)))
    # rpad via call_function: the pure-python F.rpad pins `len` to int in
    # some releases; call_function takes a column length expression AND
    # keeps the column references structured (an f-string-spliced F.expr
    # breaks on qualified/backticked/non-identifier column names)
    a = F.call_function("rpad", F.col(a_col), maxlen, F.lit("0"))
    b = F.call_function("rpad", F.col(b_col), maxlen, F.lit("0"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(maxlen / 31).cast("int"),
    )
    return F.aggregate(
        F.sequence(F.lit(0), n_chunks - 1),
        F.lit(0),
        lambda acc, i: acc + F.bit_count(
            _chunk(a, i * 31 + 1).bitwiseXOR(_chunk(b, i * 31 + 1))
        ).cast("int"),
    )


def incremental_fingerprint_pairs(
    index: DataFrame,
    batch_fps: DataFrame,
    bit_col: str = "dhash",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup pairs for a NEW batch of fingerprints against an
    existing band index WITHOUT re-hashing the corpus — the media
    analogue of ``incremental_minhash_pairs``, completing the
    incremental family for the image/audio/video fingerprints.
    Returns ``(pairs, batch_bands)``: pairs are (key_a, key_b,
    hamming) covering corpus×batch AND batch-internal collisions
    (key_a < key_b), ``batch_bands`` appends to the index. Equality
    contract (tested): pairs == the full-corpus banded join restricted
    to pairs touching ≥ 1 batch key."""
    if max_hamming > n_bands - 1:
        raise ValueError("need max_hamming <= n_bands - 1 for recall")
    bb = fingerprint_band_index(batch_fps, bit_col, n_bands)
    probe = index.select(
        F.col("key").alias("key_i"), F.col("bits").alias("bits_i"), "band"
    ).join(
        bb.select(
            F.col("key").alias("key_b"), F.col("bits").alias("bits_b"),
            "band",
        ),
        "band",
    ).filter(F.col("key_i") != F.col("key_b"))
    cross = probe.select(
        F.least("key_i", "key_b").alias("key_a"),
        F.greatest("key_i", "key_b").alias("key_b"),
        F.when(F.col("key_i") < F.col("key_b"), F.col("bits_i"))
        .otherwise(F.col("bits_b")).alias("f_a"),
        F.when(F.col("key_i") < F.col("key_b"), F.col("bits_b"))
        .otherwise(F.col("bits_i")).alias("f_b"),
    )
    intra = (
        bb.select(F.col("key").alias("key_a"),
                  F.col("bits").alias("f_a"), "band")
        .join(
            bb.select(F.col("key").alias("key_b"),
                      F.col("bits").alias("f_b"), "band"),
            "band",
        )
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "f_a", "f_b")
    )
    pairs = (
        cross.unionByName(intra)
        .distinct()
        .withColumn("hamming", _bits_hamming("f_a", "f_b").cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("key_a", "key_b", "hamming")
    )
    return pairs, bb


def media_dedup_resolve(
    blobs: DataFrame,
    pairs: DataFrame,
    key_col: str = "key",
    content_col: str = "content",
    prefer: Column | None = None,
    algorithm: str = "label",
) -> DataFrame:
    """Cluster resolution for media near-dup PAIRS — the missing stage
    between this module's pairwise fingerprint joins (``dhash_near_pairs``
    / ``audio_near_pairs`` / ``video_near_pairs`` /
    ``incremental_fingerprint_pairs`` — all emit ``(key_a, key_b,
    hamming)``) and a deduplicated asset catalog. Real pipelines dedupe
    media by CLUSTER, not pairwise: a re-encode chain (original → q75
    JPEG → resized copy) connects only transitively, and greedy
    pair-dropping either keeps two of the three or drops all three
    depending on pair order.

    Closes pairs transitively (``dedup.dedup_components`` — min-label
    propagation, or large-star/small-star with ``algorithm='star'`` for
    long chains), then elects ONE canonical asset per cluster: highest
    ``prefer`` wins, ties broken by MIN key. The default ``prefer`` is
    the blob's byte size — among near-duplicate variants the largest
    encoding is the least-degraded source (highest resolution / least
    recompressed), the media analogue of text resolution's
    keep-the-longest-document policy.

    Returns one row per input asset:
    ``(key, component, canonical, is_canonical)`` — filter
    ``is_canonical`` for the kept corpus, or join the casualty rows
    back for provenance.

    Scale shape: identical to the text resolver it delegates to —
    component closure is O(cluster diameter) equi-join rounds (near-dup
    media clusters are re-encode fans, diameter ≤ 2-3), election is one
    partially-aggregated struct-min shuffle on ``component``; no
    windows over the corpus, no collects. Fingerprint-agnostic: any
    pair frame with ``(key_a, key_b)`` works, including mixed batches
    from the incremental band index."""
    from storage_spark.operators.dedup import resolve_canonical

    if prefer is None:
        prefer = F.octet_length(F.col(content_col)).cast("bigint")
    out = resolve_canonical(
        blobs,
        pairs,
        id_col=key_col,
        prefer=prefer,
        doc_a="key_a",
        doc_b="key_b",
        algorithm=algorithm,
    )
    return out.select(
        F.col("doc").alias(key_col), "component", "canonical", "is_canonical"
    )


def band_candidate_estimate(
    n_keys: int, n_bands: int, n_bits: int = 64
) -> int:
    """Expected random-collision CANDIDATE pairs of the banded Hamming
    join — the number that prices the stage at scale (the Hamming math
    on candidates is ~free next to the shuffle that carries them):

        E[candidates] ≈ n_bands · C(n_keys, 2) / 2^seg,   seg = ⌈n_bits/n_bands⌉

    for uniform fingerprints (the worst case for volume; real media
    corpora cluster, which skews buckets but lowers the random floor).
    Measured within 0.1 % at 1M keys / 4 bands and within the planted-
    structure margin at the narrow settings (r11 probe,
    tools/probe_r11_media_scale.py: 31.1M predicted vs 31.1M measured
    at 1M/(4, ≤3); 96.7M measured vs 64.6M uniform-predicted at
    200k/(6, ≤5) — planted near-dups add structured collisions).

    Sizing rule this encodes: the floor multiplies by 2^(seg_wide −
    seg_narrow) when bands narrow — ×32 going 4 → 6 bands on 64 bits,
    ×256 going 4 → 8 — so at scale use the FEWEST bands the recall
    guarantee allows, n_bands = max_hamming + 1, and buy recall with a
    better fingerprint before buying it with narrower bands."""
    seg = -(-n_bits // n_bands)
    return int(n_bands) * n_keys * (n_keys - 1) // 2 // (1 << seg)
