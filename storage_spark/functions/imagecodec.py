"""Dependency-free pixel/audio codecs: PNG (decode/encode/resize) and PCM
WAV (decode/features), pure stdlib (zlib, struct, wave) + numpy.

This container has no Pillow/libvips/ffmpeg, and round 8 shipped the media
stages with the pixel step honestly raising. PNG and PCM WAV need neither:
PNG is zlib-compressed filtered scanlines (PNG spec, RFC 2083 / W3C
PNG §9: filters None/Sub/Up/Average/Paeth) and WAV is a RIFF header over
raw PCM — both decodable with numpy vector math. That makes the engine's
render path (reference src/storage/renderer/image.ts:298-355 — resize
cover/contain/fill with clamped dimensions) REAL for the most common
lossless format, and the audio metadata/feature stages real for PCM.
JPEG/WebP/video stay honestly absent (entropy decoders are codec-library
territory).

Scale notes: these run inside the Arrow-batched ``mapInPandas`` stages of
``operators.multimodal`` — one Python worker decodes a batch of blobs with
vectorized unfiltering (the per-row loop is over SCANLINES, unavoidable:
each row's unfilter depends on the previous row's output; everything
within a row is numpy). Resize is pure integer index math (nearest) —
deterministic across platforms, no resampling-kernel float divergence.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type (8-bit depth only; palette needs PLTE)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_decode(b: bytes) -> np.ndarray:
    """PNG bytes → HxWxC uint8 array. Supports bit depth 8, color types
    greyscale/RGB/grey+alpha/RGBA, no interlace — the shapes encoders
    (including ``png_encode``) actually emit. Raises ValueError on
    malformed bytes and NotImplementedError on unsupported-but-valid
    variants (16-bit, palette, Adam7)."""
    b = bytes(b)
    if not b.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG (bad magic)")
    pos, n = 8, len(b)
    width = height = None
    ctype = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,), tag = struct.unpack(">I", b[pos : pos + 4]), b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if ctype not in _CHANNELS:
                raise NotImplementedError(f"PNG color type {ctype} (palette?)")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlace")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        line = raw[y, 1:].astype(np.int32)
        f = filters[y]
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            # Sub/Average/Paeth need the in-row left neighbor — sequential
            # in the pixel axis but vectorized over channels via the
            # per-pixel loop below (rows are short; the y-loop dominates)
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0  # left (same channel)
                up = int(prev[x])
                if f == 1:  # Sub
                    v = line[x] + a
                elif f == 3:  # Average
                    v = line[x] + ((a + up) >> 1)
                elif f == 4:  # Paeth
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    v = line[x] + pred
                else:
                    raise ValueError(f"bad PNG filter {f}")
                cur[x] = v & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out.reshape(height, width, ch)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """HxWxC (or HxW) uint8 array → PNG bytes, filter 0 scanlines."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    lines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * ch)], axis=1
    )
    idat = zlib.compress(lines.tobytes(), level)
    return _PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _resize_nearest(a: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index math (pixel-center
    sampling) — deterministic everywhere, no float kernel divergence."""
    h, w = a.shape[:2]
    ys = ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64).clip(0, h - 1)
    xs = ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64).clip(0, w - 1)
    return a[ys][:, xs]


def resize_image(a: np.ndarray, width: int, height: int, mode: str = "cover") -> np.ndarray:
    """The reference's three resize semantics (image.ts:298-355 →
    imgproxy resizing types): ``fill`` stretches to exactly (w, h);
    ``cover`` scales to fully cover then center-crops to (w, h);
    ``contain`` scales to fit inside (result keeps aspect, may be
    smaller than the box on one axis)."""
    h, w = a.shape[:2]
    if mode == "fill":
        return _resize_nearest(a, width, height)
    if mode == "cover":
        scale = max(width / w, height / h)
        tw, th = max(1, round(w * scale)), max(1, round(h * scale))
        big = _resize_nearest(a, tw, th)
        x0 = (tw - width) // 2
        y0 = (th - height) // 2
        return big[y0 : y0 + height, x0 : x0 + width]
    if mode == "contain":
        scale = min(width / w, height / h)
        tw, th = max(1, round(w * scale)), max(1, round(h * scale))
        return _resize_nearest(a, tw, th)
    raise ValueError(f"unknown resize mode {mode!r}")


def png_pixel_codec(b: bytes, width: int, height: int, resize: str, quality: int) -> bytes:
    """The ``transform_images`` codec callable, for PNG inputs: decode →
    resize (cover/contain/fill) → re-encode. ``quality`` is accepted for
    signature parity and ignored — PNG is lossless (zlib level is fixed
    so identical inputs give identical bytes)."""
    return png_encode(resize_image(png_decode(b), width, height, resize))


# ---------------------------------------------------------------------------
# PCM WAV
# ---------------------------------------------------------------------------


def wav_parse_meta(b: bytes) -> tuple[int, int, int]:
    """RIFF/WAVE header → (sample_rate, n_samples, n_channels) without
    decoding samples: walk chunks for fmt (PCM only) and data."""
    b = bytes(b)
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(b)
    rate = channels = bits = None
    data_len = None
    while pos + 8 <= n:
        tag = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if tag == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", b[pos + 8 : pos + 16])
            bits = struct.unpack("<H", b[pos + 22 : pos + 24])[0]
            if fmt != 1:
                raise NotImplementedError(f"WAV format {fmt} (PCM only)")
        elif tag == b"data":
            data_len = length
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    n_samples = data_len // (channels * (bits // 8))
    return rate, n_samples, channels


def wav_decode(b: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV bytes → (sample_rate, float64 mono signal in [-1, 1]).
    Multi-channel input is mean-downmixed. 8/16/32-bit PCM."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(b))) as wf:
        rate = wf.getframerate()
        ch = wf.getnchannels()
        sw = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"sample width {sw}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return rate, x


def wav_features(b: bytes) -> tuple[int, int, int, int, int]:
    """Deterministic PCM features, integer-scaled for engine-exact
    comparison: (sample_rate, n_samples, duration_ms, rms_1e6,
    zero_crossings)."""
    rate, x = wav_decode(b)
    n = len(x)
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zc = int(np.count_nonzero(np.diff(np.signbit(x)))) if n > 1 else 0
    return rate, n, (n * 1000) // rate if rate else 0, round(rms * 1_000_000), zc
