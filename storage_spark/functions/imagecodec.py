"""Dependency-free pixel/audio codecs: PNG (decode/encode/resize), JPEG
(baseline AND progressive decode, baseline + progressive encode), GIF
(LZW decode/encode, animated), and PCM WAV (decode/features) — pure
stdlib (zlib, struct, wave) + numpy.

This container has no Pillow/libvips/ffmpeg, and round 8 shipped the media
stages with the pixel step honestly raising. PNG and PCM WAV need neither:
PNG is zlib-compressed filtered scanlines (PNG spec, RFC 2083 / W3C
PNG §9: filters None/Sub/Up/Average/Paeth) and WAV is a RIFF header over
raw PCM — both decodable with numpy vector math. Baseline JPEG (ITU-T
T.81 sequential DCT, the format the reference's imgproxy renderer most
often serves — image.ts:298-355) is likewise self-contained: canonical
Huffman entropy decode, dequantize + 2-D IDCT (separable float matrix),
per-component subsampled planes upsampled and YCbCr→RGB converted per
JFIF. The encoders emit spec-valid JPEG with Annex-K quant
tables scaled by the libjpeg quality rule and FIXED uniform-length
Huffman tables (valid canonical tables read from the DHT segments like
any other; entropy-optimal tables are a compression-ratio concern, not a
correctness one). Progressive (SOF2) is fully supported as of this
round: the decoder accumulates per-component coefficient stores across
DC/AC first and refinement scans (EOBRUN, ZRL windows, buffered
correction bits — T.81 G.1.2.3), and ``jpeg_encode_progressive`` emits
the classic successive-approximation scan script whose decode is
bit-identical to the baseline path's. Video is real for MJPEG-in-AVI
(this module's writer + RIFF walker + the JPEG decoder per frame — the
container every camera-adjacent toolchain can emit without an entropy
codec beyond JPEG itself); WebP and inter-frame video codecs (H.26x/VPx/
AV1) stay honestly absent — those are entropy-coder + motion-compensation
territory.

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
# Baseline JPEG (ITU-T T.81 sequential DCT, Huffman, 8-bit)
# ---------------------------------------------------------------------------


def _zigzag_natural() -> list[int]:
    """Scan position i → natural (row-major) coefficient index, generated
    by the classic zigzag walk rather than hand-typed (64 chances for a
    typo the tests would chase for hours)."""
    out, x, y = [], 0, 0
    for _ in range(64):
        out.append(y * 8 + x)
        if (x + y) % 2 == 0:  # moving up-right
            if x == 7:
                y += 1
            elif y == 0:
                x += 1
            else:
                x += 1
                y -= 1
        else:  # moving down-left
            if y == 7:
                x += 1
            elif x == 0:
                y += 1
            else:
                x -= 1
                y += 1
    return out


_ZIGZAG = _zigzag_natural()

#: Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
_QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)


def _dct_matrix() -> np.ndarray:
    """M[u, x] = c(u)/2 · cos((2x+1)uπ/16): spatial = Mᵀ·F·M,
    frequency = M·f·Mᵀ (the separable 8×8 DCT pair)."""
    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = cu / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


_DCT_M = _dct_matrix()


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality→table scaling: 5000/q below 50, 200−2q above."""
    q = min(100, max(1, int(quality)))
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    return np.clip(np.floor((base * scale + 50.0) / 100.0), 1, 255)


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, byte-aligns and
    consumes RSTn at restart boundaries."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.bit = 0

    def _byte(self) -> int:
        return self.d[self.pos]

    def read_bit(self) -> int:
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1]
            if nxt != 0x00:
                raise ValueError(f"marker 0xFF{nxt:02x} inside entropy data")
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if b == 0xFF else 1  # skip the stuffed 0x00
        return v

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume the expected RSTn marker."""
        if self.bit:
            self.bit = 0
            self.pos += 2 if self.d[self.pos] == 0xFF else 1
        if not (
            self.d[self.pos] == 0xFF and 0xD0 <= self.d[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RST marker at restart interval")
        self.pos += 2


def _huff_extend(v: int, s: int) -> int:
    """DC/AC value extension (T.81 F.2.2.1): s-bit magnitude → signed."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _build_huff(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: (code_length, code) → symbol."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def jpeg_decode(b: bytes) -> np.ndarray:
    """JPEG bytes → HxWx3 uint8 RGB (or HxWx1 for grayscale). Supports
    baseline/extended sequential (SOF0/SOF1) AND progressive (SOF2)
    Huffman streams: 8-bit samples, 1 or 3 components, restart
    intervals, and any sampling factors where the max factor is a
    multiple of each component's (covers 4:4:4, 4:2:2, 4:2:0, 4:1:1).
    Every scan decodes into a per-component coefficient store (baseline
    is simply the one full-band scan), then one shared finisher
    dequantizes, IDCTs, upsamples, and color-converts. Arithmetic
    coding, lossless/hierarchical SOFs, 12-bit, and CMYK raise
    NotImplementedError — honestly, like the other codecs."""
    b = bytes(b)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos, n = 2, len(b)
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = None
    dri = 0
    progressive = False
    coefs: list[np.ndarray] | None = None
    geom: dict | None = None
    while pos + 2 <= n:
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        data = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 15
                if pq == 0:
                    tbl = np.frombuffer(
                        data[i + 1 : i + 65], dtype=np.uint8
                    ).astype(np.float64)
                    i += 65
                else:  # 16-bit precision
                    tbl = np.frombuffer(
                        data[i + 1 : i + 129], dtype=">u2"
                    ).astype(np.float64)
                    i += 129
                nat = np.zeros(64)
                nat[np.array(_ZIGZAG)] = tbl  # stored in zigzag order
                qt[tq] = nat
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential or progressive
            progressive = marker == 0xC2
            depth = data[0]
            if depth != 8:
                raise NotImplementedError(f"JPEG sample precision {depth}")
            height, width = struct.unpack(">HH", data[1:5])
            nc = data[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG (CMYK?)")
            comps = []
            for c in range(nc):
                cid, hv, tq = data[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (sequential/progressive Huffman only)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 15
                bits = list(data[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(data[i + 17 : i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            if geom is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                for c in comps:
                    if hmax % c["h"] or vmax % c["v"]:
                        raise NotImplementedError(
                            f"non-divisor sampling {c['h']}x{c['v']}"
                            f" vs {hmax}x{vmax}"
                        )
                geom = {
                    "hmax": hmax,
                    "vmax": vmax,
                    "width": width,
                    "height": height,
                    "mcux": -(-width // (8 * hmax)),
                    "mcuy": -(-height // (8 * vmax)),
                }
                coefs = [
                    np.zeros(
                        (geom["mcuy"] * c["v"], geom["mcux"] * c["h"], 64),
                        dtype=np.int32,
                    )
                    for c in comps
                ]
            ns = data[0]
            scan = []
            for c in range(ns):
                cs, tt = data[1 + 2 * c], data[2 + 2 * c]
                ci = next(i for i, x in enumerate(comps) if x["id"] == cs)
                scan.append(
                    {
                        "ci": ci,
                        **comps[ci],
                        "dc": huff_dc.get(tt >> 4),
                        "ac": huff_ac.get(tt & 15),
                    }
                )
            ss, se, a = data[1 + 2 * ns], data[2 + 2 * ns], data[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            pos = _jpeg_decode_scan(
                b, pos + 2 + seglen, scan, coefs, geom,
                ss, se, ah, al, dri, progressive,
            )
            continue
        pos += 2 + seglen
    if coefs is None:
        raise ValueError("no SOS segment")
    return _jpeg_finish(coefs, comps, qt, geom, width, height)


def _next_marker(b: bytes, pos: int) -> int:
    """First position at/after ``pos`` of a real marker (0xFF followed by
    neither 0x00 stuffing nor an RSTn)."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] == 0xFF and b[pos + 1] != 0x00 and not (
            0xD0 <= b[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return n


def _jpeg_decode_scan(
    b: bytes,
    pos: int,
    scan: list[dict],
    coefs: list[np.ndarray],
    geom: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    dri: int,
    progressive: bool,
) -> int:
    """Decode ONE entropy-coded scan into the coefficient store and
    return the stream position of the next marker.

    Baseline is the ss=0, se=63, ah=al=0 interleaved case of the same
    machinery (its EOB is an EOBRUN of length 1). Progressive scans are
    the four T.81 shapes: DC first / DC refine (interleaved allowed),
    AC first / AC refine (single component, non-interleaved, EOBRUN
    spans blocks). Point transforms follow the spec's asymmetry: DC
    shifts with sign; AC magnitudes shift and re-sign."""
    r = _BitReader(b, pos)
    zz_idx = np.array(_ZIGZAG)
    preds = [0] * len(scan)
    state = {"eobrun": 0}

    def decode_block_first(c: dict, blk: np.ndarray) -> None:
        # DC (only when the scan includes position 0)
        if ss == 0:
            s = _huff_decode(r, c["dc"])
            diff = _huff_extend(r.receive(s), s)
            preds[c["_si"]] += diff
            blk[0] = preds[c["_si"]] << al
        if se == 0:
            return
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = max(ss, 1)
        while k <= se:
            rs = _huff_decode(r, c["ac"])
            rr, s = rs >> 4, rs & 15
            if s == 0:
                if rr == 15:  # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << rr) - 1
                if rr:
                    state["eobrun"] += r.receive(rr)
                return
            k += rr
            if k > se:
                raise ValueError("AC coefficient index past band end")
            blk[zz_idx[k]] = _huff_extend(r.receive(s), s) << al
            k += 1

    def decode_dc_refine(c: dict, blk: np.ndarray) -> None:
        if r.read_bit():
            # DC refinement adds the next lower bit; DC values are
            # two's-complement shifted, so OR-ing the bit is exact
            blk[0] |= 1 << al

    def refine_nonzero(blk: np.ndarray, k: int) -> None:
        if r.read_bit():
            v = blk[zz_idx[k]]
            if v > 0 and not (v & (1 << al)):
                blk[zz_idx[k]] = v + (1 << al)
            elif v < 0 and not (-v & (1 << al)):
                blk[zz_idx[k]] = v - (1 << al)

    def decode_ac_refine(c: dict, blk: np.ndarray) -> None:
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _huff_decode(r, c["ac"])
                rr, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if rr != 15:  # EOBRUN
                        state["eobrun"] = (1 << rr)
                        if rr:
                            state["eobrun"] += r.receive(rr)
                        break
                    # ZRL: skip 16 zero-history positions
                elif s == 1:
                    newval = (1 << al) if r.read_bit() else -(1 << al)
                else:
                    raise ValueError("AC refine size must be 0 or 1")
                while k <= se:
                    if blk[zz_idx[k]] != 0:
                        refine_nonzero(blk, k)
                    else:
                        if rr == 0:
                            break
                        rr -= 1
                    k += 1
                if newval and k <= se:
                    blk[zz_idx[k]] = newval
                k += 1
        if state["eobrun"] > 0:
            # correction bits for remaining nonzero-history positions
            while k <= se:
                if blk[zz_idx[k]] != 0:
                    refine_nonzero(blk, k)
                k += 1
            state["eobrun"] -= 1

    if ah == 0:
        decode_block = decode_block_first
    elif ss == 0:
        decode_block = decode_dc_refine
    else:
        decode_block = decode_ac_refine

    for si, c in enumerate(scan):
        c["_si"] = si

    unit_i = 0

    def maybe_restart() -> None:
        nonlocal preds, unit_i
        if dri and unit_i and unit_i % dri == 0:
            r.restart()
            preds[:] = [0] * len(scan)
            state["eobrun"] = 0
        unit_i += 1

    if len(scan) > 1:
        # interleaved MCU traversal (any multi-component scan)
        for my in range(geom["mcuy"]):
            for mx in range(geom["mcux"]):
                maybe_restart()
                for c in scan:
                    arr = coefs[c["ci"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            decode_block(
                                c, arr[my * c["v"] + by, mx * c["h"] + bx]
                            )
    else:
        # non-interleaved: the component's own block grid, row-major
        # (T.81 A.2.2 — single-component scans never use the MCU grid)
        c = scan[0]
        bw, bh = _noninterleaved_blocks(geom, c)
        arr = coefs[c["ci"]]
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                decode_block(c, arr[by, bx])
    return _next_marker(b, r.pos if r.bit == 0 else r.pos + 1)


def _noninterleaved_blocks(geom: dict, c: dict) -> tuple[int, int]:
    """Block-grid dims of a single-component (non-interleaved) scan:
    ceil(component samples / 8) per axis (T.81 A.2.2)."""
    cw = -(-geom["width"] * c["h"] // geom["hmax"])
    ch = -(-geom["height"] * c["v"] // geom["vmax"])
    return -(-cw // 8), -(-ch // 8)


def _jpeg_finish(
    coefs: list[np.ndarray],
    comps: list[dict],
    qt: dict[int, np.ndarray],
    geom: dict,
    width: int,
    height: int,
) -> np.ndarray:
    mt = _DCT_M.T
    out_planes = []
    for ci, c in enumerate(comps):
        arr = coefs[ci]
        bh, bw = arr.shape[:2]
        plane = np.zeros((bh * 8, bw * 8))
        q = qt[c["tq"]]
        for by in range(bh):
            for bx in range(bw):
                nat = arr[by, bx].astype(np.float64) * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    mt @ nat.reshape(8, 8) @ _DCT_M
                )
        p = plane + 128.0
        p = np.repeat(
            np.repeat(p, geom["vmax"] // c["v"], axis=0),
            geom["hmax"] // c["h"],
            axis=1,
        )
        out_planes.append(p[:height, :width])
    if len(out_planes) == 1:
        return (
            np.clip(np.round(out_planes[0]), 0, 255)
            .astype(np.uint8)[:, :, None]
        )
    y, cb, cr = out_planes
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _encode_huff_tables() -> tuple[dict, dict, bytes]:
    """Fixed uniform-length canonical tables: 12 DC categories at 4 bits,
    all 162 sequential AC run/size symbols PLUS the 14 progressive EOBn
    symbols (r<<4 for r=1..14) at 8 bits. Kraft-feasible (176/256),
    never all-ones, and read back through the DHT segment like any
    table — spec-valid, just not entropy-optimal."""
    dc_vals = list(range(12))
    dc_bits = [0] * 16
    dc_bits[3] = 12  # 12 codes of length 4
    ac_vals = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ] + [r << 4 for r in range(1, 15)]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)  # all at length 8
    def enc_map(bits, vals):
        m, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                m[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return m
    dht = (
        bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    )
    return enc_map(dc_bits, dc_vals), enc_map(ac_bits, ac_vals), dht


def _csize(v: int) -> int:
    """Magnitude category: bits needed for |v| (0 → 0)."""
    return int(abs(v)).bit_length()


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 RGB (or HxW / HxWx1 grayscale) uint8 → baseline JPEG bytes.
    ``subsampling``: '444' (every component full-res) or '420' (chroma
    halved both ways — the common camera/web layout, exercising the
    decoder's upsampling path). Quality scales the Annex K tables by the
    libjpeg rule. ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every N MCUs (predictors reset, writer byte-aligned)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in (1, 3):
        raise ValueError(f"unsupported channel count {ch}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    qlum = _quality_scale(_QUANT_LUM, quality)
    qchrom = _quality_scale(_QUANT_CHROM, quality)
    if ch == 3:
        rf = a[:, :, 0].astype(np.float64)
        gf = a[:, :, 1].astype(np.float64)
        bf = a[:, :, 2].astype(np.float64)
        planes = [
            0.299 * rf + 0.587 * gf + 0.114 * bf,
            128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf,
            128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf,
        ]
        sub = 2 if subsampling == "420" else 1
        factors = [(sub, sub), (1, 1), (1, 1)]
        qtabs = [qlum, qchrom, qchrom]
        if sub == 2:
            for i in (1, 2):
                p = planes[i]
                ph = p[: (p.shape[0] // 2) * 2, : (p.shape[1] // 2) * 2]
                if ph.size == 0:  # 1-pixel-wide/tall edge case: pad first
                    ph = np.pad(
                        p,
                        ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                        mode="edge",
                    )
                planes[i] = (
                    ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )
    else:
        planes = [a[:, :, 0].astype(np.float64)]
        factors = [(1, 1)]
        qtabs = [qlum]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad every plane to its MCU-aligned block grid (edge replicate)
    padded = []
    for p, (fh, fv) in zip(planes, factors):
        th, tw = mcuy * fv * 8, mcux * fh * 8
        padded.append(
            np.pad(
                p,
                ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                mode="edge",
            )
        )
    dc_map, ac_map, dht_payload = _encode_huff_tables()
    bw = _BitWriter()
    preds = [0] * len(padded)
    zz_idx = np.array(_ZIGZAG)
    mcu_i = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                bw.out.extend((0xFF, 0xD0 + rst))
                rst = (rst + 1) & 7
                preds = [0] * len(padded)
            mcu_i += 1
            for ci, (p, (fh, fv), q) in enumerate(
                zip(padded, factors, qtabs)
            ):
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        freq = _DCT_M @ blk @ _DCT_M.T
                        coef = np.round(freq.reshape(64) / q).astype(np.int64)
                        zz = coef[zz_idx]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        s = _csize(diff)
                        code, ln = dc_map[s]
                        bw.put(code, ln)
                        if s:
                            bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_map[0xF0]  # ZRL
                                bw.put(code, ln)
                                run -= 16
                            s = _csize(v)
                            code, ln = ac_map[(run << 4) | s]
                            bw.put(code, ln)
                            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
                        if run:
                            code, ln = ac_map[0x00]  # EOB
                            bw.put(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = (
        bytes([0]) + bytes(qlum[zz_idx].astype(np.uint8))
        + bytes([1]) + bytes(qchrom[zz_idx].astype(np.uint8))
    )
    ncomp = len(padded)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # every component: DC table 0, AC 0
    sos += bytes([0, 63, 0])  # full spectral selection, no approximation
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + seg(0xE0, jfif)
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht_payload)
        + dri
        + seg(0xDA, sos)
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def jpeg_encode_progressive(arr: np.ndarray, quality: int = 85) -> bytes:
    """HxWx3 RGB (or HxW / HxWx1 grayscale) uint8 → PROGRESSIVE (SOF2)
    JPEG, 4:4:4, with the classic successive-approximation scan script:
    DC first (Al=1) interleaved → DC refine → per-component AC first
    (band 1-63, Al=1, EOBRUN-accumulated) → per-component AC refine
    (Ah=1→Al=0, buffered correction bits — the T.81 G.1.2.3 algorithm).
    The quantized coefficients are identical to ``jpeg_encode``'s at the
    same quality, so progressive and baseline decodes of the same image
    must produce bit-identical pixels — the property the tests pin."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in (1, 3):
        raise ValueError(f"unsupported channel count {ch}")
    qlum = _quality_scale(_QUANT_LUM, quality)
    qchrom = _quality_scale(_QUANT_CHROM, quality)
    if ch == 3:
        rf, gf, bf = (a[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * rf + 0.587 * gf + 0.114 * bf,
            128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf,
            128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf,
        ]
        qtabs = [qlum, qchrom, qchrom]
    else:
        planes = [a[:, :, 0].astype(np.float64)]
        qtabs = [qlum]
    bw_blocks, bh_blocks = -(-w // 8), -(-h // 8)
    zz_idx = np.array(_ZIGZAG)
    coefs = []  # per comp: [bh, bw, 64] int64 in ZIGZAG order
    for p, q in zip(planes, qtabs):
        pad = np.pad(
            p, ((0, bh_blocks * 8 - h), (0, bw_blocks * 8 - w)), mode="edge"
        )
        cc = np.zeros((bh_blocks, bw_blocks, 64), dtype=np.int64)
        for by in range(bh_blocks):
            for bx in range(bw_blocks):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                freq = _DCT_M @ blk @ _DCT_M.T
                cc[by, bx] = np.round(freq.reshape(64) / q).astype(np.int64)[
                    zz_idx
                ]
        coefs.append(cc)

    dc_map, ac_map, dht_payload = _encode_huff_tables()

    def put_val(bw_, v, s):
        bw_.put(v if v >= 0 else v + (1 << s) - 1, s)

    def scan_dc_first(al):
        bw_ = _BitWriter()
        preds = [0] * len(coefs)
        for by in range(bh_blocks):
            for bx in range(bw_blocks):
                for ci, cc in enumerate(coefs):
                    v = int(cc[by, bx, 0]) >> al  # arithmetic shift (sign)
                    diff = v - preds[ci]
                    preds[ci] = v
                    s = _csize(diff)
                    code, ln = dc_map[s]
                    bw_.put(code, ln)
                    if s:
                        put_val(bw_, diff, s)
        bw_.flush()
        return bytes(bw_.out)

    def scan_dc_refine(al):
        bw_ = _BitWriter()
        for by in range(bh_blocks):
            for bx in range(bw_blocks):
                for cc in coefs:
                    bw_.put((int(cc[by, bx, 0]) >> al) & 1, 1)
        bw_.flush()
        return bytes(bw_.out)

    def scan_ac_first(ci, ss, se, al):
        bw_ = _BitWriter()
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            if eobrun == 0:
                return
            rbits = eobrun.bit_length() - 1
            code, ln = ac_map[rbits << 4]
            bw_.put(code, ln)
            if rbits:
                bw_.put(eobrun - (1 << rbits), rbits)
            eobrun = 0

        cc = coefs[ci]
        for by in range(bh_blocks):
            for bx in range(bw_blocks):
                # AC point transform truncates MAGNITUDE toward zero
                band = [
                    (abs(int(cc[by, bx, k])) >> al)
                    * (1 if cc[by, bx, k] >= 0 else -1)
                    for k in range(ss, se + 1)
                ]
                if not any(band):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
                    continue
                flush_eobrun()
                run = 0
                last_nz = max(i for i, v in enumerate(band) if v)
                for i, v in enumerate(band):
                    if i > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_map[0xF0]
                        bw_.put(code, ln)
                        run -= 16
                    s = _csize(v)
                    code, ln = ac_map[(run << 4) | s]
                    bw_.put(code, ln)
                    put_val(bw_, v, s)
                    run = 0
                if last_nz < len(band) - 1:
                    eobrun += 1  # trailing zeros = this block's EOB
        flush_eobrun()
        bw_.flush()
        return bytes(bw_.out)

    def scan_ac_refine(ci, ss, se, ah, al):
        # T.81 G.1.2.3 successive-approximation AC refinement, written
        # against the DECODER's consumption contract: the decoder's
        # advance loop passes band positions in order, reading ONE
        # correction bit per already-significant position it passes, and
        # a ZRL consumes exactly 16 zero-history positions. So the
        # encoder keeps a pending, position-ordered event list ('z' =
        # zero-history, ('b', bit) = correction) and emits, with each
        # symbol, exactly the bits the decoder reads in that symbol's
        # window; block leftovers buffer into the EOBRUN sweep.
        bw_ = _BitWriter()
        eobrun = 0
        br_global: list[int] = []  # correction bits for the EOB sweep

        def flush_eobrun():
            nonlocal eobrun
            if eobrun == 0:
                return
            rbits = eobrun.bit_length() - 1
            code, ln = ac_map[rbits << 4]
            bw_.put(code, ln)
            if rbits:
                bw_.put(eobrun - (1 << rbits), rbits)
            for bit in br_global:
                bw_.put(bit, 1)
            br_global.clear()
            eobrun = 0

        cc = coefs[ci]
        for by in range(bh_blocks):
            for bx in range(bw_blocks):
                pending: list = []  # 'z' or ('b', bit), in position order
                for k in range(ss, se + 1):
                    v = int(cc[by, bx, k])
                    m = abs(v) >> al
                    if m == 0:
                        pending.append("z")
                        continue
                    if m > 1:
                        pending.append(("b", m & 1))
                        continue
                    # newly significant coefficient
                    flush_eobrun()
                    nzeros = sum(1 for p in pending if p == "z")
                    while nzeros > 15:
                        code, ln = ac_map[0xF0]
                        bw_.put(code, ln)
                        consumed = 0
                        rest = []
                        for j, p in enumerate(pending):
                            if p == "z":
                                consumed += 1
                                if consumed == 16:
                                    rest = pending[j + 1 :]
                                    break
                            else:
                                bw_.put(p[1], 1)
                        pending = rest
                        nzeros -= 16
                    code, ln = ac_map[(nzeros << 4) | 1]
                    bw_.put(code, ln)
                    bw_.put(0 if v < 0 else 1, 1)
                    for p in pending:
                        if p != "z":
                            bw_.put(p[1], 1)
                    pending = []
                if pending:
                    br_global.extend(p[1] for p in pending if p != "z")
                    eobrun += 1
                    if eobrun == 0x7FFF or len(br_global) > 900:
                        flush_eobrun()
        flush_eobrun()
        bw_.flush()
        return bytes(bw_.out)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = (
        bytes([0]) + bytes(qlum[zz_idx].astype(np.uint8))
        + bytes([1]) + bytes(qchrom[zz_idx].astype(np.uint8))
    )
    ncomp = len(coefs)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])

    def sos(comp_ids, ss, se, ah, al):
        p = bytes([len(comp_ids)])
        for cid in comp_ids:
            p += bytes([cid, 0x00])
        return seg(0xDA, p + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, dqt)
        + seg(0xC2, sof)
        + seg(0xC4, dht_payload)
    )
    all_ids = list(range(1, ncomp + 1))
    out += sos(all_ids, 0, 0, 0, 1) + scan_dc_first(1)
    out += sos(all_ids, 0, 0, 1, 0) + scan_dc_refine(0)
    for ci in range(ncomp):
        out += sos([ci + 1], 1, 63, 0, 1) + scan_ac_first(ci, 1, 63, 1)
    for ci in range(ncomp):
        out += sos([ci + 1], 1, 63, 1, 0) + scan_ac_refine(ci, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_pixel_codec(
    b: bytes, width: int, height: int, resize: str, quality: int
) -> bytes:
    """``transform_images`` codec for JPEG inputs (baseline or
    progressive): decode → resize → re-encode at ``quality`` (4:4:4
    baseline output — the transform output favors fidelity and broad
    decodability; the input may have been any supported subsampling or
    scan script)."""
    a = jpeg_decode(b)
    if a.shape[2] == 1:
        a = a[:, :, 0]
    return jpeg_encode(resize_image(a, width, height, resize), quality=quality)


def gif_pixel_codec(
    b: bytes, width: int, height: int, resize: str, quality: int
) -> bytes:
    """``transform_images`` codec for GIF inputs: decode the FIRST frame
    → resize → re-encode as a single-frame GIF (the imgproxy static
    render of an animation). ``quality`` ignored — GIF is palette-exact,
    and nearest-neighbor resize introduces no new colors, so the output
    palette is a subset of the input's."""
    return gif_encode([resize_image(gif_decode(b, frame=0), width, height, resize)])


def image_pixel_codec(
    b: bytes, width: int, height: int, resize: str, quality: int
) -> bytes:
    """Magic-byte-dispatching pixel codec: PNG → PNG, JPEG → JPEG,
    GIF → single-frame GIF, lossless WebP → lossless WebP. The default
    codec of ``operators.multimodal.transform_images``."""
    b = bytes(b)
    if b.startswith(_PNG_MAGIC):
        return png_pixel_codec(b, width, height, resize, quality)
    if b[:2] == b"\xff\xd8":
        return jpeg_pixel_codec(b, width, height, resize, quality)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return gif_pixel_codec(b, width, height, resize, quality)
    if len(b) >= 12 and b[0:4] == b"RIFF" and b[8:12] == b"WEBP":
        from storage_spark.functions.webpcodec import webp_decode, webp_encode

        rgba = webp_decode(b)
        out = resize_image(rgba, width, height, resize)
        return webp_encode(out)
    raise NotImplementedError(
        "pixel transforms support PNG, JPEG (baseline + progressive), "
        "GIF, and lossless WebP; other formats (lossy WebP, HEIC, ...) "
        "need an external codec callable"
    )


# ---------------------------------------------------------------------------
# GIF (LZW, 87a/89a) — the multi-frame format that makes n_frames real
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code: int) -> list[int]:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/EOI codes, late
    width growth (width bumps when the decoder's next code reaches
    2^width, capped at 12 — the GIF rule, NOT TIFF's early change)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table: dict[int, list[int]] = {i: [i] for i in range(clear)}
    next_code = eoi + 1
    out: list[int] = []
    prev: list[int] | None = None
    bitpos, total = 0, len(data) * 8
    while bitpos + width <= total:
        code = 0
        for i in range(width):
            code |= ((data[bitpos >> 3] >> (bitpos & 7)) & 1) << i
            bitpos += 1
        if code == clear:
            width = min_code + 1
            table = {i: [i] for i in range(clear)}
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + [entry[0]]
                next_code += 1
        elif code == next_code:
            entry = prev + [prev[0]]
            if next_code < 4096:
                table[next_code] = entry
                next_code += 1
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out.extend(entry)
        prev = entry
        if next_code == (1 << width) and width < 12:
            width += 1
    return out


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    """GIF LZW compressor with late width change (mirrors the decoder:
    the width for code m depends on the table size BEFORE the entry the
    decoder learns from code m). Emits CLEAR and restarts at the 4096
    ceiling."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    acc = nbits = 0
    out = bytearray()

    def put(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear, width)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        put(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # late change: the decoder learns this entry only on the NEXT
            # code, so the width for the next emit bumps at 2^width + 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            put(clear, width)
            width = min_code + 1
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
        w = (int(k),)
    if w:
        put(table[w], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def gif_encode(frames: list[np.ndarray]) -> bytes:
    """List of HxWx3 uint8 frames (identical dims, ≤256 distinct colors
    across ALL frames) → animated GIF89a with one global color table.
    Every frame is full-screen at (0,0) — no disposal/composition state,
    so ``gif_decode(b, frame=k)`` is frame-independent by construction."""
    if not frames:
        raise ValueError("need at least one frame")
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = arrs[0].shape[:2]
    for a in arrs:
        if a.shape != (h, w, 3):
            raise ValueError("all frames must be HxWx3 with identical dims")
    colors = np.unique(np.concatenate([a.reshape(-1, 3) for a in arrs]), axis=0)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors (max 256)")
    # palette size = next power of two >= max(2, n_colors)
    pbits = max(1, int(len(colors) - 1).bit_length())
    pal = np.zeros((1 << pbits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (pbits - 1))  # GCT present, 2^pbits entries
    out.append(0)  # background color index
    out.append(0)  # pixel aspect ratio
    out += pal.tobytes()
    min_code = max(2, pbits)
    for a in arrs:
        out.append(0x2C)  # image descriptor
        out += struct.pack("<HHHH", 0, 0, w, h)
        out.append(0)  # no LCT, not interlaced
        idx = [lut[tuple(px)] for px in a.reshape(-1, 3)]
        out.append(min_code)
        out += _gif_subblocks(_lzw_encode(idx, min_code))
    out.append(0x3B)  # trailer
    return bytes(out)


def _gif_walk(b: bytes):
    """Yield (pos_of_descriptor, lzw_min_code, lzw_data, descriptor)
    per image block; extensions and color tables are skipped per spec."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad magic)")
    w, h = struct.unpack("<HH", b[6:10])
    flags = b[10]
    pos = 13
    gct_size = (2 << (flags & 7)) if flags & 0x80 else 0
    gct = b[pos : pos + gct_size * 3]
    pos += gct_size * 3
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:
            left, top, fw, fh = struct.unpack("<HHHH", b[pos + 1 : pos + 9])
            lflags = b[pos + 9]
            pos += 10
            lct_size = (2 << (lflags & 7)) if lflags & 0x80 else 0
            lct = b[pos : pos + lct_size * 3]
            pos += lct_size * 3
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                data.extend(b[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            yield {
                "screen": (w, h),
                "frame": (left, top, fw, fh),
                "interlaced": bool(lflags & 0x40),
                "palette": lct if lct_size else gct,
                "min_code": min_code,
                "data": bytes(data),
            }
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos}")


def gif_parse_meta(b: bytes) -> tuple[int, int, int]:
    """GIF bytes → (width, height, n_frames) — the header walk only; LZW
    data is length-skipped, never decoded."""
    b = bytes(b)
    w, h = struct.unpack("<HH", b[6:10]) if len(b) >= 10 else (0, 0)
    n = sum(1 for _ in _gif_walk(b))
    return w, h, n


def gif_decode(b: bytes, frame: int = 0) -> np.ndarray:
    """GIF bytes → HxWx3 uint8 of frame ``frame`` (full LZW decode +
    palette lookup + deinterlace). Frames are decoded independently onto
    the logical screen (no inter-frame disposal composition — partial
    frames land at their descriptor offset over palette entry 0)."""
    b = bytes(b)
    for i, img in enumerate(_gif_walk(b)):
        if i != frame:
            continue
        left, top, fw, fh = img["frame"]
        idx = _lzw_decode(img["data"], img["min_code"])
        if len(idx) < fw * fh:
            raise ValueError("LZW data short of frame size")
        a = np.array(idx[: fw * fh], dtype=np.int32).reshape(fh, fw)
        if img["interlaced"]:
            order = (
                list(range(0, fh, 8))
                + list(range(4, fh, 8))
                + list(range(2, fh, 4))
                + list(range(1, fh, 2))
            )
            de = np.zeros_like(a)
            de[order] = a
            a = de
        pal = np.frombuffer(img["palette"], dtype=np.uint8).reshape(-1, 3)
        sw, sh = img["screen"]
        screen = np.zeros((sh, sw), dtype=np.int32)
        screen[top : top + fh, left : left + fw] = a
        return pal[screen]
    raise ValueError(f"frame {frame} out of range")


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
    """Deterministic audio features, integer-scaled for engine-exact
    comparison: (sample_rate, n_samples, duration_ms, rms_1e6,
    zero_crossings). PCM decodes via the stdlib ``wave`` path; the
    compressed forms (G.711 A-law/mu-law, IMA ADPCM) via
    ``wav_decode_int`` normalized to [-1, 1]."""
    fmt_tag = 1
    if bytes(b)[0:4] == b"fLaC":
        rate, xi = flac_decode(b)
        x = xi.astype(np.float64) / 32768.0
        fmt_tag = None  # handled
    elif bytes(b)[0:4] == b"RIFF":
        try:
            fmt_tag = wav_parse_meta_v2(b)[0]
        except Exception:
            fmt_tag = 1  # let the PCM path raise its own error
    if fmt_tag is None:
        pass
    elif fmt_tag != 1:
        rate, xi = wav_decode_int(b)
        x = xi.astype(np.float64) / 32768.0
    else:
        rate, x = wav_decode(b)
    n = len(x)
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zc = int(np.count_nonzero(np.diff(np.signbit(x)))) if n > 1 else 0
    return rate, n, (n * 1000) // rate if rate else 0, round(rms * 1_000_000), zc


# ---------------------------------------------------------------------------
# MJPEG-in-AVI video container (AVI RIFF form, Microsoft "AVI RIFF File
# Reference"; MJPEG = one baseline/progressive JPEG per '00dc' chunk).
#
# This is the container that makes VIDEO real in this dependency-free
# environment: the chunk walk is pure struct (same discipline as the GIF
# block walk — frame COUNTING never touches entropy-coded bytes), and
# per-frame pixel decode composes the JPEG decoder above. The reference's
# renderer (src/storage/renderer/) treats video as an opaque passthrough;
# the training-data pipeline is what needs frame sampling, and
# `operators.multimodal.frame_sample_plan` lays the grid this extractor
# fills.
# ---------------------------------------------------------------------------


def avi_encode_mjpeg(frames_jpeg: list[bytes], width: int, height: int,
                     fps: int = 25) -> bytes:
    """Spec-valid AVI writer: LIST hdrl (avih + one 'vids'/'MJPG' stream
    with strh+strf), LIST movi of word-aligned '00dc' chunks, idx1 index.
    Frames are pre-encoded JPEG bytes (this module's encoders or any
    other baseline/progressive writer)."""
    nf = len(frames_jpeg)
    if nf == 0:
        raise ValueError("AVI needs at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def lst(four_cc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", four_cc + payload)

    max_bytes = max(len(f) for f in frames_jpeg)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,      # dwMicroSecPerFrame
        max_bytes * fps,       # dwMaxBytesPerSec (advisory)
        0,                     # dwPaddingGranularity
        0x10,                  # AVIF_HASINDEX
        nf, 0, 1,              # totalframes, initialframes, streams
        max_bytes,             # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,            # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                      1, fps,          # dwScale, dwRate → fps = rate/scale
                      0, nf,           # dwStart, dwLength (frames)
                      max_bytes, 0xFFFFFFFF, 0)  # bufsize, quality, samplesize
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    # BITMAPINFOHEADER with biCompression='MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    idx_entries = []
    for f in frames_jpeg:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((len(movi_body), len(f)))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
        for off, size in idx_entries
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_walk(b: bytes):
    """Yield (tag_or_listtype, payload_start, payload_len, is_list) for
    every top-level-and-nested RIFF chunk, depth-first. Pure struct —
    never reads entropy-coded frame bytes."""
    b = bytes(b)
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    def walk(pos: int, end: int):
        while pos + 8 <= end:
            tag = b[pos : pos + 4]
            (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            start = pos + 8
            if start + length > end:
                raise ValueError("truncated AVI chunk")
            if tag == b"LIST":
                yield (b[start : start + 4], start + 4, length - 4, True)
                yield from walk(start + 4, start + length)
            else:
                yield (tag, start, length, False)
            pos = start + length + (length & 1)

    yield from walk(12, len(b))


def avi_parse_meta(b: bytes) -> tuple[int, int, int, int]:
    """AVI header walk → ``(width, height, n_frames, fps_x1000)`` without
    decoding any frame. n_frames COUNTS the '00dc'/'00db' movi chunks (the
    ground truth; avih's dwTotalFrames is advisory and cross-checked only
    when present), fps comes from the video stream's dwRate/dwScale,
    scaled ×1000 so the value is engine-exact integer math."""
    b = bytes(b)
    w = h = None
    rate = scale = None
    n = 0
    for tag, start, length, is_list in _avi_walk(b):
        if tag == b"avih" and not is_list and length >= 40:
            vals = struct.unpack("<10I", b[start : start + 40])
            w, h = vals[8], vals[9]
        elif tag == b"strh" and not is_list and length >= 32:
            if b[start : start + 4] == b"vids":
                scale, rate = struct.unpack(
                    "<II", b[start + 20 : start + 28]
                )
        elif tag in (b"00dc", b"00db") and not is_list:
            n += 1
    if w is None:
        raise ValueError("missing avih header")
    fps_x1000 = (rate * 1000) // scale if rate and scale else 0
    return w, h, n, fps_x1000


def avi_frame_bytes(b: bytes):
    """Iterate the raw per-frame payloads ('00dc' compressed / '00db'
    uncompressed chunks) in stream order."""
    for tag, start, length, is_list in _avi_walk(bytes(b)):
        if tag in (b"00dc", b"00db") and not is_list:
            yield bytes(b)[start : start + length]


def avi_decode_frame(b: bytes, frame: int = 0) -> np.ndarray:
    """Decode frame ``frame`` of an MJPEG AVI to an RGB array: locate the
    n-th '00dc' chunk by pure struct walk, then JPEG-decode just that
    payload (baseline or progressive — both entropy decoders above)."""
    for i, payload in enumerate(avi_frame_bytes(b)):
        if i == frame:
            return jpeg_decode(payload)
    raise IndexError(f"frame {frame} out of range")


# ---------------------------------------------------------------------------
# Compressed audio: G.711 mu-law / A-law (ITU-T G.711, the formulas every
# public implementation — e.g. Sun's public-domain g711.c — encodes as
# segment/mantissa bit math) and IMA ADPCM (IMA "Recommended Practices for
# Enhancing Digital Audio Compatibility", the DVI4/WAV-fmt-17 block codec).
# All pure integer numpy; WAV plumbing below gains fmt tags 6/7/17 plus a
# spec-required `fact` chunk for the compressed forms.
# ---------------------------------------------------------------------------


def ulaw_encode(x14: np.ndarray) -> np.ndarray:
    """14-bit linear [-8192, 8191] → 8-bit mu-law codewords (uint8)."""
    x = np.asarray(x14, dtype=np.int64)
    sign = (x < 0).astype(np.int64)
    m = np.minimum(np.abs(x), 8158) + 33  # bias; max 8191
    exp = (np.floor(np.log2(m)).astype(np.int64) - 5).clip(0, 7)
    mant = (m >> (exp + 1)) & 0xF
    return (~((sign << 7) | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def ulaw_decode(code: np.ndarray) -> np.ndarray:
    """8-bit mu-law codewords → 14-bit linear (segment midpoints; max
    ±8031, the classic table values)."""
    c = ~np.asarray(code, dtype=np.int64) & 0xFF
    exp = (c >> 4) & 7
    mant = c & 0xF
    y = ((mant * 2 + 33) << exp) - 33
    return np.where(c & 0x80, -y, y).astype(np.int64)


def alaw_encode(x13: np.ndarray) -> np.ndarray:
    """13-bit linear [-4096, 4095] → 8-bit A-law codewords (uint8,
    even-bit inversion with 0x55 per G.711)."""
    x = np.asarray(x13, dtype=np.int64)
    sign = (x >= 0).astype(np.int64)  # A-law: 1 = positive
    a = np.minimum(np.abs(x), 4095)
    exp = np.where(
        a < 32, 0, (np.floor(np.log2(np.maximum(a, 1))).astype(np.int64) - 4)
    ).clip(0, 7)
    mant = np.where(exp == 0, a >> 1, (a >> exp) & 0xF)
    return (((sign << 7) | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


def alaw_decode(code: np.ndarray) -> np.ndarray:
    """8-bit A-law codewords → 13-bit linear (segment midpoints; max
    ±4032)."""
    c = (np.asarray(code, dtype=np.int64) ^ 0x55) & 0xFF
    exp = (c >> 4) & 7
    mant = c & 0xF
    y = np.where(exp == 0, mant * 2 + 1, (mant * 2 + 1 + 32) << (exp - 1))
    return np.where(c & 0x80, y, -y).astype(np.int64)


#: IMA ADPCM step-size table (89 entries) and index-adjust table — from the
#: IMA Digital Audio Compatibility recommendation (also RFC 3551 DVI4).
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, index: int, sample: int) -> tuple[int, int, int]:
    """One IMA ADPCM encode step: (nibble, new_pred, new_index)."""
    step = _IMA_STEPS[index]
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    # bit-exact spec quantize/reconstruct (no float): diffq mirrors the
    # decoder so encoder state never drifts from the decoder's
    diffq = step >> 3
    if diff >= step:
        nibble |= 4
        diff -= step
        diffq += step
    step >>= 1
    if diff >= step:
        nibble |= 2
        diff -= step
        diffq += step
    step >>= 1
    if diff >= step:
        nibble |= 1
        diffq += step
    pred = pred - diffq if nibble & 8 else pred + diffq
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_ADJ[nibble & 7]))
    return nibble, pred, index


def ima_adpcm_encode(samples: np.ndarray, block_samples: int = 505) -> bytes:
    """int16 mono → IMA ADPCM WAV-fmt-17 block stream. Each block: 4-byte
    header (predictor int16 = the block's FIRST sample verbatim, step
    index uint8, reserved) + 4-bit nibbles low-nibble-first.
    ``block_samples`` must be odd (1 header sample + pairs of nibbles);
    the canonical 2041-byte block holds 505."""
    if block_samples % 2 == 0:
        raise ValueError("block_samples must be odd (header + nibble pairs)")
    x = np.asarray(samples, dtype=np.int64)
    out = bytearray()
    index = 0
    for b0 in range(0, len(x), block_samples):
        blk = x[b0 : b0 + block_samples]
        pred = int(blk[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in blk[1:]:
            nib, pred, index = _ima_step(pred, index, int(s))
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)  # pad the final pair
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out)


def ima_adpcm_decode(data: bytes, n_samples: int,
                     block_align: int = 256) -> np.ndarray:
    """IMA ADPCM block stream → int16 mono. ``block_align`` is the WAV
    fmt chunk's nBlockAlign (bytes per block)."""
    data = bytes(data)
    out: list[int] = []
    pos = 0
    while pos + 4 <= len(data) and len(out) < n_samples:
        pred, index, _ = struct.unpack("<hBB", data[pos : pos + 4])
        pos += 4
        out.append(pred)
        body = data[pos : pos + block_align - 4]
        pos += block_align - 4
        for byte in body:
            for nib in (byte & 0xF, byte >> 4):
                if len(out) >= n_samples:
                    break
                step = _IMA_STEPS[index]
                diffq = step >> 3
                if nib & 4:
                    diffq += step
                if nib & 2:
                    diffq += step >> 1
                if nib & 1:
                    diffq += step >> 2
                pred = pred - diffq if nib & 8 else pred + diffq
                pred = max(-32768, min(32767, pred))
                index = max(0, min(88, index + _IMA_INDEX_ADJ[nib & 7]))
                out.append(pred)
    return np.array(out[:n_samples], dtype=np.int64)


_WAV_FMT_PCM, _WAV_FMT_ALAW, _WAV_FMT_ULAW, _WAV_FMT_IMA = 1, 6, 7, 17
_WAV_CODECS = {"pcm16": _WAV_FMT_PCM, "alaw": _WAV_FMT_ALAW,
               "ulaw": _WAV_FMT_ULAW, "ima": _WAV_FMT_IMA}
_IMA_BLOCK_SAMPLES = 505  # canonical: 4-byte header + 252 nibble bytes
_IMA_BLOCK_ALIGN = 4 + (_IMA_BLOCK_SAMPLES - 1) // 2


def wav_encode(samples: np.ndarray, sample_rate: int,
               codec: str = "pcm16") -> bytes:
    """Mono WAV writer for PCM16 / G.711 A-law / mu-law / IMA ADPCM.
    ``samples`` are int16-domain values for every codec (mu-law encodes
    the >>2 14-bit form, A-law the >>3 13-bit form — the G.711 PCM
    mapping); compressed forms carry the spec-required ``fact`` chunk
    with the true sample count."""
    if codec not in _WAV_CODECS:
        raise ValueError(f"codec must be one of {sorted(_WAV_CODECS)}")
    x = np.asarray(samples, dtype=np.int64)
    fmt_tag = _WAV_CODECS[codec]
    n = len(x)
    if codec == "pcm16":
        data = x.astype("<i2").tobytes()
        block_align, bits = 2, 16
    elif codec == "ulaw":
        data = ulaw_encode(x >> 2).tobytes()
        block_align, bits = 1, 8
    elif codec == "alaw":
        data = alaw_encode(x >> 3).tobytes()
        block_align, bits = 1, 8
    else:  # ima
        data = ima_adpcm_encode(x, _IMA_BLOCK_SAMPLES)
        block_align, bits = _IMA_BLOCK_ALIGN, 4

    avg_bps = sample_rate * block_align if codec != "ima" else (
        sample_rate * _IMA_BLOCK_ALIGN // _IMA_BLOCK_SAMPLES
    )
    fmt_body = struct.pack(
        "<HHIIHH", fmt_tag, 1, sample_rate, avg_bps, block_align, bits
    )
    if codec == "ima":
        # cbSize + wSamplesPerBlock extension (fmt 17 requires it)
        fmt_body += struct.pack("<HH", 2, _IMA_BLOCK_SAMPLES)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    body = b"WAVE" + chunk(b"fmt ", fmt_body)
    if codec != "pcm16":
        body += chunk(b"fact", struct.pack("<I", n))
    body += chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_parse_meta_v2(b: bytes) -> tuple[int, int, int, int]:
    """RIFF/WAVE header walk → (fmt_tag, sample_rate, n_samples,
    n_channels) for PCM / A-law / mu-law / IMA ADPCM, without decoding.
    n_samples honors the ``fact`` chunk when present (required for the
    compressed forms), else derives from data length."""
    b = bytes(b)
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(b)
    fmt_tag = rate = channels = bits = block_align = None
    data_len = fact_n = None
    while pos + 8 <= n:
        tag = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if tag == b"fmt ":
            fmt_tag, channels, rate, _bps, block_align, bits = struct.unpack(
                "<HHIIHH", b[pos + 8 : pos + 24]
            )
        elif tag == b"fact" and length >= 4:
            (fact_n,) = struct.unpack("<I", b[pos + 8 : pos + 12])
        elif tag == b"data":
            data_len = length
        pos += 8 + length + (length & 1)
    if rate is None or data_len is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_tag not in (_WAV_FMT_PCM, _WAV_FMT_ALAW, _WAV_FMT_ULAW,
                       _WAV_FMT_IMA):
        raise NotImplementedError(f"WAV format {fmt_tag}")
    if fact_n is not None:
        n_samples = fact_n
    elif fmt_tag == _WAV_FMT_IMA:
        spb = (block_align - 4 * channels) * 2 // channels + 1
        n_samples = (data_len // block_align) * spb
    else:
        n_samples = data_len // (channels * max(1, bits // 8))
    return fmt_tag, rate, n_samples, channels


def wav_decode_int(b: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int64 mono samples in the int16
    domain) for PCM16 / A-law / mu-law / IMA ADPCM. G.711 decodes are
    shifted back up (<<2 / <<3) so every codec yields comparable
    16-bit-domain integers — the exact values the SQL oracles replay."""
    b = bytes(b)
    fmt_tag, rate, n_samples, channels = wav_parse_meta_v2(b)
    if channels != 1 and fmt_tag != _WAV_FMT_PCM:
        raise NotImplementedError("compressed WAV: mono only")
    # locate data chunk + block align again (cheap second walk)
    pos = 12
    data = None
    block_align = 2
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if tag == b"fmt ":
            block_align = struct.unpack("<H", b[pos + 20 : pos + 22])[0]
        elif tag == b"data":
            data = b[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
    if fmt_tag == _WAV_FMT_PCM:
        rate2, x = wav_decode(b)
        return rate2, np.round(x * 32768.0).astype(np.int64)
    if fmt_tag == _WAV_FMT_ULAW:
        return rate, ulaw_decode(np.frombuffer(data, dtype=np.uint8)
                                 [:n_samples]) << 2
    if fmt_tag == _WAV_FMT_ALAW:
        return rate, alaw_decode(np.frombuffer(data, dtype=np.uint8)
                                 [:n_samples]) << 3
    return rate, ima_adpcm_decode(data, n_samples, block_align)


# ---------------------------------------------------------------------------
# FLAC (the free lossless audio codec, format spec at xiph.org — RFC 9639):
# a REAL entropy-coded audio format, dependency-free. The decoder covers
# the full fixed-prediction profile (constant / verbatim / fixed order 0-4
# subframes, Rice residual partitions of any order incl. the 5-bit escape,
# mono + left/right/mid-side stereo decorrelation, CRC-8 header and CRC-16
# frame checks, UTF-8-coded frame numbers); the encoder emits spec-valid
# streams any FLAC decoder reads (16-bit, fixed order 0-2 chosen per
# block by residual magnitude, Rice parameter from the mean residual,
# partition order 0). Lossless: decode(encode(x)) == x bit-for-bit, which
# is exactly what the driver oracle asserts through the Rice bitstream.
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (FLAC frame-header CRC)."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (FLAC whole-frame CRC)."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _FlacBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)


class _FlacBitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style variable-length number (frame/sample index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF00 >> nbytes) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _utf8_decode(r: _FlacBitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        n = (n << 6) | (r.read(8) & 0x3F)
    return n


#: fixed-predictor residual: res[i] = x[i] - sum(coef_j * x[i-1-j])
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _rice_write(w: _FlacBitWriter, res: np.ndarray, param: int) -> None:
    for v in res:
        u = (int(v) << 1) ^ (int(v) >> 63)  # zigzag
        w.put_unary(u >> param)
        if param:
            w.put(u & ((1 << param) - 1), param)


def flac_encode(samples: np.ndarray, sample_rate: int,
                block_size: int = 4096) -> bytes:
    """Mono 16-bit FLAC writer: STREAMINFO + one frame per block, each
    frame a single subframe — CONSTANT when the block is flat, else the
    FIXED order (0-2) with the smallest summed |residual|, Rice-coded at
    the parameter matching the mean residual magnitude (partition order
    0). Spec-valid per RFC 9639 (CRCs, UTF-8 frame numbers, uncommon
    block-size/rate headers)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.size == 0:
        raise ValueError("FLAC needs at least one sample")
    if np.abs(x).max() > 32767:
        raise ValueError("16-bit domain required")
    n = len(x)

    # STREAMINFO (34 bytes, bit-packed)
    si = _FlacBitWriter()
    si.put(block_size, 16)
    si.put(block_size, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(sample_rate, 20)
    si.put(0, 3)   # channels - 1
    si.put(15, 5)  # bits per sample - 1
    si.put(n, 36)
    si.align()
    head = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si.buf) + bytes(16)

    out = bytearray(head)
    for fi, b0 in enumerate(range(0, n, block_size)):
        blk = x[b0 : b0 + block_size]
        bs = len(blk)
        fw = _FlacBitWriter()
        fw.put(0b11111111111110, 14)
        fw.put(0, 1)   # reserved
        fw.put(0, 1)   # fixed blocksize strategy (frame number coded)
        fw.put(0b0111, 4)  # block size: 16 bits at end of header - 1
        fw.put(0b1101, 4)  # sample rate: 16 bits in Hz at end of header
        fw.put(0, 4)   # mono
        fw.put(0b100, 3)  # 16 bits per sample
        fw.put(0, 1)
        hdr = bytes(fw.buf)
        hdr += _utf8_code(fi)
        hdr += struct.pack(">H", bs - 1)
        hdr += struct.pack(">H", sample_rate)
        hdr += bytes([_crc8(hdr)])

        body = _FlacBitWriter()
        if np.all(blk == blk[0]):
            # subframe header: 1 reserved bit, 6-bit type (CONSTANT =
            # 0b000000), 1 wasted-bit flag; then one raw sample
            body.put(0, 1)
            body.put(0b000000, 6)
            body.put(0, 1)
            body.put(int(blk[0]) & 0xFFFF, 16)
        else:
            best_order, best_res, best_cost = 0, None, None
            for order in (0, 1, 2):
                if bs <= order:
                    continue
                res = blk[order:].astype(np.int64).copy()
                for j, c in enumerate(_FIXED_COEFS[order]):
                    res = res - c * blk[order - 1 - j : bs - 1 - j]
                cost = int(np.abs(res).sum())
                if best_cost is None or cost < best_cost:
                    best_order, best_res, best_cost = order, res, cost
            order, res = best_order, best_res
            mean = max(1, int(np.abs(res).mean() * 2))
            param = min(14, max(0, int(mean).bit_length() - 1))
            body = _FlacBitWriter()
            body.put(0, 1)
            body.put(0b001000 | order, 6)  # FIXED subframe type
            body.put(0, 1)
            for w0 in blk[:order]:  # warmup, raw 16-bit
                body.put(int(w0) & 0xFFFF, 16)
            body.put(0, 2)  # residual coding method: Rice (4-bit params)
            body.put(0, 4)  # partition order 0
            body.put(param, 4)
            _rice_write(body, res, param)
        body.align()
        frame = hdr + bytes(body.buf)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)


def flac_parse_meta(b: bytes) -> tuple[int, int, int, int]:
    """STREAMINFO → (sample_rate, n_samples, channels, bits_per_sample)
    without decoding any frame."""
    b = bytes(b)
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    while pos + 4 <= len(b):
        btype = b[pos] & 0x7F
        last = bool(b[pos] & 0x80)
        length = int.from_bytes(b[pos + 1 : pos + 4], "big")
        if btype == 0:  # STREAMINFO
            r = _FlacBitReader(b, pos + 4)
            r.read(16); r.read(16); r.read(24); r.read(24)
            rate = r.read(20)
            ch = r.read(3) + 1
            bits = r.read(5) + 1
            total = r.read(36)
            return rate, total, ch, bits
        pos += 4 + length
        if last:
            break
    raise ValueError("missing STREAMINFO")


def flac_decode(b: bytes) -> tuple[int, np.ndarray]:
    """FLAC → (sample_rate, int array of samples; stereo interleaved to
    mono-mean is NOT applied — mono in this profile returns the raw
    channel, stereo returns shape (n, ch)). Covers constant/verbatim/
    fixed subframes, Rice partitions (both 4- and 5-bit parameter forms
    incl. escapes), L/R-side and mid-side stereo, CRC-16 verification."""
    b = bytes(b)
    rate, total, ch, bits = flac_parse_meta(b)
    # skip metadata blocks
    pos = 4
    while True:
        last = bool(b[pos] & 0x80)
        length = int.from_bytes(b[pos + 1 : pos + 4], "big")
        pos += 4 + length
        if last:
            break
    out = []
    while pos < len(b) and len(out) < total:
        frame_start = pos
        r = _FlacBitReader(b, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        r.read(1)
        r.read(1)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        _fnum = _utf8_decode(r)
        if bs_code == 1:
            bs = 192
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        sbits = {0b100: 16, 0b001: 8, 0b010: 12, 0b101: 20, 0b110: 24}.get(
            ss_code, bits
        )
        r.read(8)  # header CRC-8 (validated by frame CRC-16 below)
        nch = 2 if ch_code >= 8 else ch_code + 1
        chans = []
        for ci in range(nch):
            extra = 0
            if ch_code == 8 and ci == 1:   # left/side: side has +1 bit
                extra = 1
            elif ch_code == 9 and ci == 0:  # right/side
                extra = 1
            elif ch_code == 10 and ci == 1:  # mid/side
                extra = 1
            chans.append(_flac_subframe(r, bs, sbits + extra))
        r.align()
        crc_read = (b[r.pos] << 8) | b[r.pos + 1]
        if _crc16(b[frame_start : r.pos]) != crc_read:
            raise ValueError("FLAC frame CRC mismatch")
        pos = r.pos + 2
        if ch_code == 8:    # left/side → right = left - side
            left, side = chans
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # side/right → left = side + right
            side, right = chans
            chans = [[s + rr for s, rr in zip(side, right)], right]
        elif ch_code == 10:  # mid/side
            mid, side = chans
            left = [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)]
            chans = [left, [l - s for l, s in zip(left, side)]]
        if nch == 1:
            out.extend(chans[0])
        else:
            out.extend(zip(*chans))
    arr = np.array(out[: total if total else len(out)], dtype=np.int64)
    return rate, arr


def _flac_subframe(r: _FlacBitReader, bs: int, sbits: int) -> list[int]:
    if r.read(1):
        raise ValueError("invalid subframe padding bit")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()

    def sext(v: int, nb: int) -> int:
        return v - (1 << nb) if v >= (1 << (nb - 1)) else v

    eff = sbits - wasted
    if stype == 0:  # CONSTANT
        v = sext(r.read(eff), eff)
        samp = [v] * bs
    elif stype == 1:  # VERBATIM
        samp = [sext(r.read(eff), eff) for _ in range(bs)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        samp = [sext(r.read(eff), eff) for _ in range(order)]
        res = _flac_residual(r, bs, order)
        coefs = _FIXED_COEFS[order]
        for i, e in enumerate(res):
            pred = sum(c * samp[len(samp) - 1 - j] for j, c in enumerate(coefs))
            samp.append(pred + e)
    elif stype >= 32:  # LPC
        order = stype - 31
        samp = [sext(r.read(eff), eff) for _ in range(order)]
        prec = r.read(4) + 1
        shift = sext(r.read(5), 5)
        coefs = [sext(r.read(prec), prec) for _ in range(order)]
        res = _flac_residual(r, bs, order)
        for e in res:
            pred = sum(
                c * samp[len(samp) - 1 - j] for j, c in enumerate(coefs)
            ) >> shift
            samp.append(pred + e)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        samp = [s << wasted for s in samp]
    return samp


def _flac_residual(r: _FlacBitReader, bs: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    res: list[int] = []
    for p in range(nparts):
        cnt = bs >> porder
        if p == 0:
            cnt -= order
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(cnt):
                v = r.read(raw) if raw else 0
                res.append(v - (1 << raw) if raw and v >= (1 << (raw - 1)) else v)
        else:
            for _ in range(cnt):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                res.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return res
