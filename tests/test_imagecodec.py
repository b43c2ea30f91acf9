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


# ---------------------------------------------------------------------------
# GIF / LZW
# ---------------------------------------------------------------------------


def test_lzw_roundtrip_property():
    from storage_spark.functions.imagecodec import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(11)
    for min_code in (2, 3, 5, 8):
        for _ in range(4):
            n = int(rng.integers(1, 15000))
            idx = rng.integers(0, 1 << min_code, size=n).tolist()
            assert _lzw_decode(_lzw_encode(idx, min_code), min_code) == idx
    # long low-entropy runs drive the table to the 4096 ceiling and force
    # a mid-stream CLEAR; width growth to 12 bits is on this path
    runs = ([0] * 3000 + [1] * 3000 + list(range(4)) * 2000)
    assert _lzw_decode(_lzw_encode(runs, 2), 2) == runs


def test_gif_multiframe_roundtrip_exact():
    from storage_spark.functions.imagecodec import (
        gif_decode,
        gif_encode,
        gif_parse_meta,
    )

    frames = []
    for f in range(5):
        a = np.zeros((13, 17, 3), dtype=np.uint8)
        a[:, :, 0] = (f * 40) % 256
        a[f % 13, :, 1] = 200
        frames.append(a)
    g = gif_encode(frames)
    assert gif_parse_meta(g) == (17, 13, 5)
    for f in range(5):
        assert np.array_equal(gif_decode(g, frame=f), frames[f]), f
    with pytest.raises(ValueError):
        gif_decode(g, frame=5)


def test_gif_256_color_palette_and_limits():
    from storage_spark.functions.imagecodec import gif_decode, gif_encode

    yy, xx = np.mgrid[0:16, 0:16]
    a = (yy * 16 + xx).astype(np.uint8)
    img = np.stack([a, 255 - a, np.full_like(a, 7)], axis=2)
    assert np.array_equal(gif_decode(gif_encode([img])), img)
    over = np.zeros((20, 20, 3), dtype=np.uint8)
    over[:, :, 0] = np.arange(400).reshape(20, 20) % 256
    over[:, :, 1] = np.arange(400).reshape(20, 20) // 2 % 256
    with pytest.raises(ValueError, match="distinct colors"):
        gif_encode([over])


def test_gif_rejects_garbage():
    from storage_spark.functions.imagecodec import gif_parse_meta

    with pytest.raises(ValueError):
        gif_parse_meta(b"NOTAGIF" + b"\x00" * 20)


# ---------------------------------------------------------------------------
# Baseline JPEG
# ---------------------------------------------------------------------------


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / max(w - 1, 1),
            yy * 255 / max(h - 1, 1),
            (xx + yy) * 255 / max(w + h - 2, 1),
        ],
        axis=2,
    ).astype(np.uint8)


def test_jpeg_roundtrip_444_gradient_tight():
    from storage_spark.functions.imagecodec import jpeg_decode, jpeg_encode

    img = _gradient(40, 56)
    dec = jpeg_decode(jpeg_encode(img, quality=95, subsampling="444"))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 4, err.max()


def test_jpeg_roundtrip_420_exercises_upsampling():
    from storage_spark.functions.imagecodec import jpeg_decode, jpeg_encode

    img = _gradient(40, 56)
    enc444 = jpeg_encode(img, quality=95, subsampling="444")
    enc420 = jpeg_encode(img, quality=95, subsampling="420")
    assert len(enc420) < len(enc444)  # chroma really is quarter-size
    dec = jpeg_decode(enc420)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() <= 3.0


def test_jpeg_flat_color_is_exact():
    from storage_spark.functions.imagecodec import jpeg_decode, jpeg_encode

    flat = np.full((16, 24, 3), (200, 30, 90), dtype=np.uint8)
    for sub in ("444", "420"):
        dec = jpeg_decode(jpeg_encode(flat, quality=90, subsampling=sub))
        assert np.abs(dec.astype(int) - flat.astype(int)).max() <= 1, sub


def test_jpeg_grayscale_roundtrip():
    from storage_spark.functions.imagecodec import jpeg_decode, jpeg_encode

    g = _gradient(33, 47)[:, :, 0]
    dec = jpeg_decode(jpeg_encode(g, quality=95))
    assert dec.shape == (33, 47, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 3


def test_jpeg_odd_dimensions_pad_and_crop():
    from storage_spark.functions.imagecodec import jpeg_decode, jpeg_encode

    img = _gradient(37, 53)  # not multiples of 8 or 16
    for sub in ("444", "420"):
        dec = jpeg_decode(jpeg_encode(img, quality=95, subsampling=sub))
        assert dec.shape == img.shape, sub


def test_jpeg_restart_intervals_decode_identically():
    from storage_spark.functions.imagecodec import jpeg_decode, jpeg_encode

    img = _gradient(40, 56)
    base = jpeg_decode(jpeg_encode(img, quality=92, subsampling="420"))
    for ri in (1, 2, 5):
        withrst = jpeg_decode(
            jpeg_encode(img, quality=92, subsampling="420", restart_interval=ri)
        )
        assert np.array_equal(base, withrst), ri


def test_jpeg_quality_monotone_in_size_and_error():
    from storage_spark.functions.imagecodec import jpeg_decode, jpeg_encode

    img = _rand(32, 32, 3, seed=3)
    e95 = jpeg_encode(img, quality=95)
    e30 = jpeg_encode(img, quality=30)
    assert len(e30) < len(e95)
    err95 = np.abs(jpeg_decode(e95).astype(int) - img.astype(int)).mean()
    err30 = np.abs(jpeg_decode(e30).astype(int) - img.astype(int)).mean()
    assert err95 < err30


def test_jpeg_byte_stuffing_survives():
    from storage_spark.functions.imagecodec import jpeg_decode, jpeg_encode

    # many blocks of varied content make 0xFF bytes in the entropy
    # stream overwhelmingly likely across seeds; decode must unstuff
    for seed in range(3):
        img = _rand(48, 48, 3, seed=seed)
        enc = jpeg_encode(img, quality=75)
        dec = jpeg_decode(enc)
        assert dec.shape == img.shape


def test_jpeg_header_parses_via_multimodal_sniffer():
    from storage_spark.functions.imagecodec import jpeg_encode
    from storage_spark.operators.multimodal import parse_image_header

    enc = jpeg_encode(_gradient(21, 34), quality=80)
    assert parse_image_header(enc) == ("image/jpeg", 34, 21, 1)


def test_jpeg_rejects_garbage_and_arithmetic():
    from storage_spark.functions.imagecodec import jpeg_decode, jpeg_encode

    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg at all")
    # flip SOF0 to SOF9 (arithmetic-coded sequential) — must raise
    enc = bytearray(jpeg_encode(_gradient(16, 16)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(enc))


def _hand_jpeg(entropy_bits: str, ac_bits_vals) -> bytes:
    """Hand-assemble a minimal spec JPEG (8x8 grayscale, flat quant=16,
    STANDARD Annex-K DC luminance Huffman table typed here independently
    of the codec module) — pins the decoder to the T.81 spec rather than
    to our own encoder's understanding of it."""
    import struct as _s

    def seg(marker, payload):
        return _s.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = bytes([0]) + bytes([16] * 64)
    sof = _s.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    # Annex K.3.1 DC luminance: BITS then HUFFVAL 0..11
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    ac_bits, ac_vals = ac_bits_vals
    dht = (
        bytes([0x00]) + bytes(dc_bits) + bytes(range(12))
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    bits = entropy_bits + "1" * (-len(entropy_bits) % 8)
    data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    return (
        b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof) + seg(0xC4, dht)
        + seg(0xDA, sos) + data + b"\xff\xd9"
    )


def test_jpeg_decodes_hand_built_dc_only_spec_stream():
    from storage_spark.functions.imagecodec import jpeg_decode

    # DC diff=8: category 4 -> canonical Annex-K DC code '101' (3rd code
    # of length 3), magnitude bits '1000'; AC table = one EOB code '00'.
    # Expected: F[0,0]=8*16=128 -> every pixel 128/8=16 over the +128
    # level shift = 144 exactly.
    jpg = _hand_jpeg(
        "101" + "1000" + "00",
        ([0, 1] + [0] * 14, [0x00]),
    )
    out = jpeg_decode(jpg)
    assert out.shape == (8, 8, 1)
    assert (out == 144).all(), out[:, :, 0]


def test_jpeg_zigzag_and_idct_orientation_against_spec():
    from storage_spark.functions.imagecodec import jpeg_decode

    # DC diff=0 (code '00'); one AC coefficient at SCAN position 1 —
    # zigzag natural index 1 = horizontal frequency (v=0, u=1). AC table:
    # length-2 codes EOB='00', symbol 0x02 (run 0, size 2)='01'; value
    # bits '10' = +2 -> dequantized 32. Spatial = 128 + 11.31*cos((2x+1)
    # pi/16): rows identical, columns strictly decreasing. A transposed
    # zigzag or IDCT would put the gradient along y instead.
    jpg = _hand_jpeg(
        "00" + "01" + "10" + "00",
        ([0, 2] + [0] * 14, [0x00, 0x02]),
    )
    out = jpeg_decode(jpg)[:, :, 0].astype(int)
    assert (out == out[0]).all(), "gradient must be horizontal"
    assert all(out[0, x] > out[0, x + 1] for x in range(7)), out[0]
    assert out[0, 0] > 128 > out[0, 7]


def test_gif_decodes_hand_packed_lzw_spec_stream():
    from storage_spark.functions.imagecodec import gif_decode, gif_parse_meta

    # 4x1 image, 2-entry-ish palette (GCT sized 4), indices [0,1,1,0].
    # LZW min_code=2: CLEAR=4 EOI=5, width 3. Encoder-agnostic hand
    # packing of codes [CLEAR, 0, 1, 1, 0, EOI] LSB-first. Width grows
    # to 4 bits BEFORE the 4th data code: the decoder's table reaches 8
    # entries (6 initial + 2 learned) right after the 3rd — the exact
    # spec point the self-paired round-trips cannot pin.
    codes = [(4, 3), (0, 3), (1, 3), (1, 3), (0, 4), (5, 4)]
    acc = nbits = 0
    data = bytearray()
    for c, w in codes:
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    gct = bytes([10, 20, 30, 200, 100, 50, 0, 0, 0, 0, 0, 0])
    gif = (
        b"GIF89a"
        + struct.pack("<HH", 4, 1)
        + bytes([0x81, 0, 0])  # GCT present, 4 entries
        + gct
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 1) + b"\x00"
        + bytes([2])  # LZW min code size
        + bytes([len(data)]) + bytes(data) + b"\x00"
        + b"\x3b"
    )
    assert gif_parse_meta(gif) == (4, 1, 1)
    out = gif_decode(gif)
    assert out.shape == (1, 4, 3)
    assert out[0].tolist() == [
        [10, 20, 30], [200, 100, 50], [200, 100, 50], [10, 20, 30],
    ]


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_decodes_identically_to_baseline():
    from storage_spark.functions.imagecodec import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(5)
    cases = [
        _gradient(40, 56),
        rng.integers(0, 256, (24, 24, 3), dtype=np.uint8).astype(np.uint8),
        np.full((16, 16, 3), (200, 30, 90), np.uint8),
        _gradient(37, 53),  # odd dims
        _gradient(33, 47)[:, :, 0],  # grayscale
        rng.integers(0, 256, (48, 48, 3), dtype=np.uint8).astype(np.uint8),
    ]
    # identical quantized coefficients -> identical pixels, bit for bit;
    # low quality drives heavy EOBRUN/ZRL/correction-bit traffic through
    # the successive-approximation scans
    for img in cases:
        for q in (95, 60, 15):
            base = jpeg_decode(jpeg_encode(img, quality=q, subsampling="444"))
            prog = jpeg_decode(jpeg_encode_progressive(img, quality=q))
            assert np.array_equal(base, prog), (img.shape, q)


def test_progressive_stream_structure():
    from storage_spark.functions.imagecodec import jpeg_encode_progressive

    enc = jpeg_encode_progressive(_gradient(24, 24), quality=80)
    assert enc.count(b"\xff\xc2") == 1  # SOF2, not SOF0
    assert enc.count(b"\xff\xc0") == 0
    # scan script: DC first + DC refine + 3x AC first + 3x AC refine
    assert enc.count(b"\xff\xda") == 8
    gray = jpeg_encode_progressive(_gradient(24, 24)[:, :, 0], quality=80)
    assert gray.count(b"\xff\xda") == 4


def test_progressive_prefix_scans_decode_and_converge():
    from storage_spark.functions.imagecodec import (
        jpeg_decode,
        jpeg_encode_progressive,
    )

    img = _gradient(32, 40)
    enc = jpeg_encode_progressive(img, quality=90)
    # split at SOS boundaries; a truncated-progressive stream (any scan
    # prefix) must still decode, and error vs the full decode must be
    # non-increasing as scans are added — the format's defining property
    positions = []
    i = 0
    while True:
        i = enc.find(b"\xff\xda", i + 1)
        if i < 0:
            break
        positions.append(i)
    full = jpeg_decode(enc).astype(int)
    errs = []
    for n_scans in range(1, len(positions) + 1):
        cut = (
            enc[: positions[n_scans] if n_scans < len(positions) else -2]
            + b"\xff\xd9"
        )
        partial = jpeg_decode(cut).astype(int)
        errs.append(np.abs(partial - full).mean())
    assert errs[-1] == 0.0
    assert all(a >= b - 1e-9 for a, b in zip(errs, errs[1:])), errs


def test_jpeg_pixel_codec_and_dispatch():
    from storage_spark.functions.imagecodec import (
        image_pixel_codec,
        jpeg_decode,
        jpeg_encode,
        png_decode,
        png_encode,
    )

    img = _gradient(40, 60)
    out = image_pixel_codec(jpeg_encode(img, quality=95), 20, 20, "cover", 90)
    assert out[:2] == b"\xff\xd8"  # JPEG in → JPEG out
    assert jpeg_decode(out).shape == (20, 20, 3)
    pout = image_pixel_codec(png_encode(img), 20, 20, "cover", 90)
    assert pout.startswith(_MAGIC)  # PNG in → PNG out
    assert png_decode(pout).shape == (20, 20, 3)
    from storage_spark.functions.imagecodec import gif_decode, gif_encode

    anim = gif_encode(
        [np.full((30, 30, 3), (f * 50 % 256, 3, 9), dtype=np.uint8)
         for f in range(3)]
    )
    gout = image_pixel_codec(anim, 10, 10, "fill", 80)
    assert gout[:6] == b"GIF89a"  # GIF in → single-frame GIF out
    arr = gif_decode(gout)
    assert arr.shape == (10, 10, 3)
    assert np.array_equal(arr, np.full((10, 10, 3), (0, 3, 9), np.uint8))
    # WebP (lossless) in → WebP out, as of the r9 VP8L codec
    from storage_spark.functions.webpcodec import webp_decode, webp_encode

    wout = image_pixel_codec(webp_encode(img), 20, 20, "cover", 90)
    assert wout[0:4] == b"RIFF" and wout[8:12] == b"WEBP"
    assert webp_decode(wout).shape == (20, 20, 4)
    # corrupt WebP container → decode error, not misdispatch
    with pytest.raises(ValueError):
        image_pixel_codec(b"RIFFxxxxWEBPxxxx", 8, 8, "fill", 80)
    # genuinely unsupported magic still refuses honestly
    with pytest.raises(NotImplementedError):
        image_pixel_codec(b"II*\x00 tiff-ish", 8, 8, "fill", 80)


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


# ---------------------------------------------------------------------------
# MJPEG-in-AVI container
# ---------------------------------------------------------------------------


def test_avi_round_trip_meta_and_frames():
    from storage_spark.functions.imagecodec import (
        avi_decode_frame,
        avi_encode_mjpeg,
        avi_frame_bytes,
        avi_parse_meta,
        jpeg_encode,
    )

    vals = [0, 7, 130, 255]
    frames = [
        jpeg_encode(np.full((16, 24, 3), v, dtype=np.uint8),
                    quality=95, subsampling="444")
        for v in vals
    ]
    avi = avi_encode_mjpeg(frames, 24, 16, fps=12)
    assert avi_parse_meta(avi) == (24, 16, 4, 12000)
    # payloads survive the container byte-for-byte (word-aligned chunks)
    assert [bytes(p) for p in avi_frame_bytes(avi)] == frames
    for i, v in enumerate(vals):
        a = avi_decode_frame(avi, i)
        assert a.shape == (16, 24, 3)
        # flat gray is exact through q95 (DC error < 1/2 px after IDCT)
        assert np.unique(a).tolist() == [v]


def test_avi_flat_gray_exact_all_values_q95():
    from storage_spark.functions.imagecodec import jpeg_decode, jpeg_encode

    for v in range(0, 256, 17):
        a = jpeg_decode(
            jpeg_encode(np.full((8, 8, 3), v, dtype=np.uint8),
                        quality=95, subsampling="444")
        )
        assert np.unique(a).tolist() == [v], v


def test_avi_odd_sized_frame_payload_word_alignment():
    from storage_spark.functions.imagecodec import (
        avi_encode_mjpeg,
        avi_frame_bytes,
        avi_parse_meta,
    )

    # force an odd-length payload: the chunk walk must word-align
    odd = b"\xff\xd8" + b"x" * 7  # 9 bytes (not decodable, walk-only)
    even = b"\xff\xd8" + b"y" * 8
    avi = avi_encode_mjpeg([odd, even, odd], 4, 4, fps=5)
    assert avi_parse_meta(avi)[2] == 3
    assert [bytes(p) for p in avi_frame_bytes(avi)] == [odd, even, odd]


def test_avi_rejects_garbage_and_bad_args():
    from storage_spark.functions.imagecodec import (
        avi_decode_frame,
        avi_encode_mjpeg,
        avi_parse_meta,
        jpeg_encode,
    )

    with pytest.raises(ValueError):
        avi_parse_meta(b"RIFFxxxxWAVE")  # RIFF but not AVI
    with pytest.raises(ValueError):
        avi_parse_meta(b"nope")
    with pytest.raises(ValueError):
        avi_encode_mjpeg([], 4, 4)
    with pytest.raises(ValueError):
        avi_encode_mjpeg([b"\xff\xd8"], 4, 4, fps=0)
    f = jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8))
    avi = avi_encode_mjpeg([f], 8, 8)
    with pytest.raises(IndexError):
        avi_decode_frame(avi, 1)
    # truncated chunk: length field larger than the remaining bytes
    with pytest.raises(ValueError):
        avi_parse_meta(avi[:40])


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law and IMA ADPCM audio
# ---------------------------------------------------------------------------


def test_g711_known_table_values():
    from storage_spark.functions.imagecodec import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    # classic extrema: mu-law decodes to +-8031, A-law to +-4032
    assert ulaw_decode(ulaw_encode(np.array([8158]))).tolist() == [8031]
    assert ulaw_decode(ulaw_encode(np.array([-8192]))).tolist() == [-8031]
    assert alaw_decode(alaw_encode(np.array([4095]))).tolist() == [4032]
    assert alaw_decode(alaw_encode(np.array([-4096]))).tolist() == [-4032]
    # zero maps to zero (mu) / +-1 (A — no zero codeword, spec behavior)
    assert ulaw_decode(ulaw_encode(np.array([0]))).tolist() == [0]
    assert abs(alaw_decode(alaw_encode(np.array([0])))[0]) == 1


def test_g711_quantization_error_bounds():
    from storage_spark.functions.imagecodec import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    x = np.arange(-8192, 8192, 7)
    e = np.abs(ulaw_decode(ulaw_encode(x)) - x)
    # segment half-steps: top mu-law segment step is 256, clamp adds 161
    assert e.max() <= 161
    xa = np.arange(-4096, 4096, 3)
    ea = np.abs(alaw_decode(alaw_encode(xa)) - xa)
    assert ea.max() <= 64  # top A-law segment step 128 → half-step 64


def test_g711_codewords_are_idempotent_quantizers():
    from storage_spark.functions.imagecodec import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    # decode∘encode must be a projection: re-encoding a decoded value
    # returns the same codeword (quantizer fixed points)
    x = np.arange(-8192, 8192, 11)
    c1 = ulaw_encode(x)
    assert np.array_equal(ulaw_encode(ulaw_decode(c1)), c1)
    xa = np.arange(-4096, 4096, 5)
    c2 = alaw_encode(xa)
    assert np.array_equal(alaw_encode(alaw_decode(c2)), c2)


def test_ima_adpcm_tracks_smooth_signal_and_blocks():
    from storage_spark.functions.imagecodec import (
        ima_adpcm_decode,
        ima_adpcm_encode,
    )

    t = np.arange(1600)
    sig = (6000 * np.sin(t / 25)).astype(np.int64)
    enc = ima_adpcm_encode(sig, block_samples=505)
    dec = ima_adpcm_decode(enc, 1600, block_align=256)
    assert len(dec) == 1600
    # block heads carry the exact sample (predictor = first sample)
    assert dec[0] == sig[0] and dec[505] == sig[505] and dec[1010] == sig[1010]
    # the adaptive quantizer tracks a smooth signal within ~1 step
    assert np.abs(dec - sig).max() < 1500
    with pytest.raises(ValueError):
        ima_adpcm_encode(sig, block_samples=4)  # even → invalid layout


def test_wav_encode_decode_all_codecs():
    from storage_spark.functions.imagecodec import (
        wav_decode_int,
        wav_encode,
        wav_features,
        wav_parse_meta_v2,
    )

    rng = np.random.default_rng(7)
    s = rng.integers(-20000, 20000, 333)
    for codec, tag, bound in [
        ("pcm16", 1, 0),
        ("ulaw", 7, 161 << 2),
        ("alaw", 6, (64 << 3) + 7),  # +7: the >>3 truncation itself
    ]:
        w = wav_encode(s, 8000, codec)
        assert wav_parse_meta_v2(w) == (tag, 8000, 333, 1)
        rate, dec = wav_decode_int(w)
        assert rate == 8000 and len(dec) == 333
        assert np.abs(dec - s).max() <= bound
        # features run on every codec (n_samples/duration exact)
        f = wav_features(w)
        assert f[0] == 8000 and f[1] == 333 and f[2] == (333 * 1000) // 8000
    w = wav_encode((4000 * np.sin(np.arange(900) / 20)).astype(np.int64),
                   16000, "ima")
    assert wav_parse_meta_v2(w) == (17, 16000, 900, 1)
    rate, dec = wav_decode_int(w)
    assert rate == 16000 and len(dec) == 900


def test_wav_v2_rejects_unknown_format():
    from storage_spark.functions.imagecodec import wav_encode, wav_parse_meta_v2

    w = bytearray(wav_encode(np.zeros(4, dtype=np.int64), 8000, "pcm16"))
    w[20] = 85  # fmt tag 0x55 = MP3
    with pytest.raises(NotImplementedError):
        wav_parse_meta_v2(bytes(w))
    with pytest.raises(ValueError):
        wav_parse_meta_v2(b"junk")


# ---------------------------------------------------------------------------
# FLAC (Rice-coded lossless audio)
# ---------------------------------------------------------------------------


def test_flac_lossless_round_trip_profiles():
    from storage_spark.functions.imagecodec import (
        flac_decode,
        flac_encode,
        flac_parse_meta,
    )

    rng = np.random.default_rng(3)
    t = np.arange(10_000)
    cases = [
        (6000 * np.sin(t / 17) + rng.integers(-50, 50, t.size)).astype(np.int64),
        np.full(500, -123, dtype=np.int64),           # constant blocks
        rng.integers(-32768, 32768, 3000),            # incompressible
        np.array([7], dtype=np.int64),                # single sample
        np.arange(-300, 300, dtype=np.int64) * 55,    # pure ramp (order 2)
    ]
    for sig in cases:
        f = flac_encode(sig, 16000, block_size=4096)
        assert flac_parse_meta(f) == (16000, len(sig), 1, 16)
        rate, dec = flac_decode(f)
        assert rate == 16000
        assert np.array_equal(dec, sig)


def test_flac_compresses_tonal_signals():
    from storage_spark.functions.imagecodec import flac_encode

    t = np.arange(20_000)
    sig = (8000 * np.sin(t / 29)).astype(np.int64)
    f = flac_encode(sig, 8000)
    assert len(f) < 2 * len(sig) * 0.6  # beats raw PCM by >40% on a tone


def test_flac_multiblock_frame_numbers_and_crc():
    from storage_spark.functions.imagecodec import flac_decode, flac_encode

    sig = np.arange(1000, dtype=np.int64) % 251 - 125
    f = bytearray(flac_encode(sig, 8000, block_size=192))  # 6 frames
    rate, dec = flac_decode(bytes(f))
    assert np.array_equal(dec, sig)
    # flip one payload bit → the frame CRC-16 must catch it
    f[-20] ^= 0x10
    with pytest.raises(ValueError, match="CRC|sync|trunc"):
        flac_decode(bytes(f))


def test_flac_decoder_handles_hand_built_escape_partition():
    """A stream the ENCODER never emits: a Rice escape partition (raw
    5-bit-width residuals) — decoder must follow RFC 9639 §9.2.7."""
    import struct as _s

    from storage_spark.functions.imagecodec import (
        _crc8,
        _crc16,
        _FlacBitWriter,
        flac_decode,
    )

    samples = [3, -4, 5, -6]
    si = _FlacBitWriter()
    si.put(4, 16); si.put(4, 16); si.put(0, 24); si.put(0, 24)
    si.put(8000, 20); si.put(0, 3); si.put(15, 5); si.put(len(samples), 36)
    si.align()
    head = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si.buf) + bytes(16)

    fw = _FlacBitWriter()
    fw.put(0b11111111111110, 14); fw.put(0, 1); fw.put(0, 1)
    fw.put(0b0111, 4)   # 16-bit blocksize at end
    fw.put(0b1101, 4)   # 16-bit rate at end
    fw.put(0, 4); fw.put(0b100, 3); fw.put(0, 1)
    hdr = bytes(fw.buf) + bytes([0]) + _s.pack(">H", 3) + _s.pack(">H", 8000)
    hdr += bytes([_crc8(hdr)])

    body = _FlacBitWriter()
    body.put(0, 1); body.put(0b001000, 6); body.put(0, 1)  # FIXED order 0
    body.put(0, 2)       # Rice 4-bit method
    body.put(0, 4)       # partition order 0
    body.put(0xF, 4)     # ESCAPE
    body.put(5, 5)       # raw width 5 bits
    for v in samples:
        body.put(v & 0x1F, 5)
    body.align()
    frame = hdr + bytes(body.buf)
    frame += _s.pack(">H", _crc16(frame))

    rate, dec = flac_decode(head + frame)
    assert rate == 8000 and dec.tolist() == samples


def test_flac_feature_and_meta_dispatch():
    from storage_spark.functions.imagecodec import (
        flac_encode,
        wav_features,
    )

    sig = (2000 * np.sin(np.arange(4000) / 11)).astype(np.int64)
    f = flac_encode(sig, 8000)
    feats = wav_features(f)
    assert feats[0] == 8000 and feats[1] == 4000
    assert feats[2] == 500  # ms
    assert feats[4] > 100   # a real tone crosses zero plenty


# ---------------------------------------------------------------------------
# decoder robustness: poison blobs must raise cleanly, never hang/crash
# ---------------------------------------------------------------------------


def test_all_decoders_survive_truncations_and_bit_flips():
    """The multimodal stages' poison-blob contract rests on decoders
    raising PYTHON exceptions for malformed input. Feed every decoder
    truncated prefixes and single-byte corruptions of VALID streams,
    plus deterministic pseudorandom garbage — any exception type is
    fine, crashes/hangs are not."""
    import numpy as np

    from storage_spark.functions.imagecodec import (
        avi_decode_frame,
        avi_encode_mjpeg,
        flac_decode,
        flac_encode,
        gif_decode,
        gif_encode,
        jpeg_decode,
        jpeg_encode,
        png_decode,
        png_encode,
        wav_decode_int,
        wav_encode,
    )
    from storage_spark.functions.webpcodec import webp_decode, webp_encode

    img = np.stack([np.arange(16 * 24).reshape(16, 24) % 256] * 3,
                   axis=2).astype(np.uint8)
    sig = (3000 * np.sin(np.arange(700) / 9)).astype(np.int64)
    cases = [
        (png_decode, png_encode(img)),
        (jpeg_decode, jpeg_encode(img, quality=90)),
        (gif_decode, gif_encode([(img // 64) * 64])),
        (webp_decode, webp_encode(img)),
        (flac_decode, flac_encode(sig, 8000)),
        (wav_decode_int, wav_encode(sig, 8000, "ulaw")),
        (lambda b: avi_decode_frame(b, 0),
         avi_encode_mjpeg([jpeg_encode(img, quality=90)], 24, 16)),
    ]
    rng = np.random.default_rng(42)
    for decode, valid in cases:
        decode(valid)  # sanity: the valid stream decodes
        # truncations at structural points
        for cut in (1, 4, 12, 20, len(valid) // 2, len(valid) - 3):
            try:
                decode(valid[:cut])
            except Exception:
                pass  # any raise is acceptable; crash/hang is not
        # single-byte corruptions sprinkled through the stream
        for pos in range(5, len(valid) - 1, max(7, len(valid) // 40)):
            mutated = bytearray(valid)
            mutated[pos] ^= 0x55
            try:
                decode(bytes(mutated))
            except Exception:
                pass
        # pure garbage with the right magic prefix (parser must not
        # trust the magic)
        garbage = bytes(valid[:8]) + rng.integers(
            0, 256, 200, dtype=np.uint8
        ).tobytes()
        try:
            decode(garbage)
        except Exception:
            pass
