"""Dependency-free PNG/WAV codecs: encode→decode round-trips, all five
PNG filter types verified against hand-built IDAT streams, reference
resize semantics, and WAV decode against known signals. Pure-local (no
Spark) — the Spark-stage integration lives in test_sources_multimodal."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from storage_spark.functions.imagecodec import (
    _chunk,
    png_decode,
    png_encode,
    png_pixel_codec,
    resize_image,
    wav_decode,
    wav_features,
    wav_parse_meta,
)

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _rand(h, w, ch, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(ch):
    img = _rand(13, 7, ch, seed=ch)
    out = png_decode(png_encode(img))
    assert out.shape == img.shape and (out == img).all()


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-serialize a PNG whose row y uses filter filters[y] — the
    encoder-side filter math mirrors the spec so the decoder is tested
    against an independent construction."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        f = filters[y]
        line = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = int(cur[x - ch]) if x >= ch else 0
            up = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (a + up) >> 1
            else:  # Paeth
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
            line[x] = (int(cur[x]) - pred) & 0xFF
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_png_decode_all_five_filters():
    img = _rand(10, 6, 3, seed=9)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    out = png_decode(_png_with_filters(img, filters))
    assert (out == img).all()


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"JFIF whatever")
    # 16-bit depth: valid PNG, unsupported here
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    b = _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
    with pytest.raises(NotImplementedError, match="bit depth"):
        png_decode(b + _chunk(b"IEND", b""))


def test_resize_semantics():
    img = _rand(40, 20, 3)
    assert resize_image(img, 10, 10, "fill").shape == (10, 10, 3)
    # cover: scale to cover (max ratio) then center-crop to the box
    assert resize_image(img, 10, 10, "cover").shape == (10, 10, 3)
    # contain: fits inside, aspect preserved -> 20x40 box gives 5x10
    assert resize_image(img, 10, 10, "contain").shape == (10, 5, 3)
    with pytest.raises(ValueError):
        resize_image(img, 10, 10, "stretch")


def test_resize_is_deterministic_index_math():
    img = _rand(8, 8, 1)
    a = resize_image(img, 4, 4, "fill")
    b = resize_image(img, 4, 4, "fill")
    assert (a == b).all()
    # 2x downscale with pixel-center sampling picks rows/cols 1,3,5,7
    assert (a[:, :, 0] == img[1::2, 1::2, 0]).all()


def test_png_pixel_codec_end_to_end():
    img = _rand(30, 30, 4)
    out = png_decode(png_pixel_codec(png_encode(img), 15, 10, "fill", 80))
    assert out.shape == (10, 15, 4)
    # lossless + fixed zlib level: identical input -> identical bytes
    assert png_pixel_codec(png_encode(img), 8, 8, "cover", 80) == png_pixel_codec(
        png_encode(img), 8, 8, "cover", 80
    )


def _wav(rate, samples, ch=1, width=2):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        if width == 2:
            raw = b"".join(struct.pack("<h", s) for s in samples)
        else:
            raw = bytes((s + 128) & 0xFF for s in samples)
        wf.writeframes(raw)
    return buf.getvalue()


def test_wav_parse_meta_and_decode():
    b = _wav(16000, [0, 16384, -16384, 0] * 100)
    rate, n, ch = wav_parse_meta(b)
    assert (rate, n, ch) == (16000, 400, 1)
    rate2, x = wav_decode(b)
    assert rate2 == 16000 and len(x) == 400
    assert abs(x[1] - 0.5) < 1e-9 and abs(x[2] + 0.5) < 1e-9


def test_wav_stereo_downmix():
    # interleaved L/R: (1000, 3000) per frame -> mono mean 2000
    b = _wav(8000, [1000, 3000] * 50, ch=2)
    _, x = wav_decode(b)
    assert len(x) == 50 and abs(x[0] - 2000 / 32768.0) < 1e-9


def test_wav_features_known_signal():
    b = _wav(8000, [16384, -16384] * 400)
    rate, n, dur, rms, zc = wav_features(b)
    assert (rate, n, dur) == (8000, 800, 100)
    assert rms == 500_000  # |x| = 0.5 everywhere
    assert zc == 799  # sign flips between every adjacent pair


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError):
        wav_parse_meta(b"OggS....")
