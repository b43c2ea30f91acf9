"""Dependency-free WebP LOSSLESS (VP8L) codec — the last image format on
the engine's codec-gated list with a tractable pure-spec implementation.

Decoder: the full VP8L profile per the public WebP Lossless Bitstream
Specification (RFC 9649 §4) — LSB-first bit reading, simple and
code-length-coded Huffman codes (incl. 16/17/18 repeats and the
max_symbol cap), meta-Huffman entropy images, LZ77 backward references
with the 2D distance-neighbor mapping, color cache, and all four
transforms (predictor's 14 modes, cross-color, subtract-green,
color-indexing incl. sub-byte pixel bundling).

Encoder: spec-valid streams any WebP decoder reads — no transforms, one
Huffman group, left-run LZ77 (distance 1, written as dist_code
distance+120 so the neighbor map is not needed on the write side),
canonical Huffman codes emitted via the simple form (≤2 symbols) or the
code-length form (literal lengths, no repeats — valid, just not
minimal). Lossless by construction: decode(encode(x)) == x, which is
what the driver oracle gates on.

VP8 (lossy WebP) is perceptual-codec territory (boolean arithmetic
coder + DCT + loop filter) and stays honestly absent, like MP3/H.26x.

Pixels are numpy (h, w, 4) uint8 RGBA arrays at the API surface;
internally VP8L works in ARGB words.
"""

from __future__ import annotations

import struct

import numpy as np


class _LsbBitReader:
    """VP8L reads bits LSB-first from little-endian bytes (DEFLATE-style)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class _LsbBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def align(self) -> None:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0


#: code-length-code symbol order (RFC 9649 §4.2.1.1)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

#: 2D distance-neighbor map for dist codes 1..120 (RFC 9649 §4.2.2.3):
#: the 120 nearest (dx, dy) offsets in the window x∈[-8,8], y∈[0,7]
#: (above or left of the current pixel), ordered by squared Euclidean
#: distance, ties by |dx| then positive-dx-first — the ordering the
#: spec's published table follows (its first rows (0,1),(1,0),(1,1),
#: (-1,1),(0,2),(2,0),(1,2),(-1,2),(2,1),(-2,1)... pin it, and the
#: window yields exactly 127 candidates of which the nearest 120 are
#: listed).
def _distance_map() -> list[tuple[int, int]]:
    cand = []
    for y in range(0, 8):
        for x in range(-8, 9):
            if y == 0 and x <= 0:
                continue
            cand.append((x, y))
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return cand[:120]


_DIST_MAP = _distance_map()


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    # RFC 9649 §4.2.2.3: dist = xoffset + yoffset * xsize, with positive
    # xoffset meaning LEFT of the current pixel — the same sign convention
    # _DIST_MAP stores, so dx ADDS. (2,0) → 2, (-1,1) → xsize-1,
    # (1,1) → xsize+1; clamped to ≥1 per the spec.
    return max(1, dy * xsize + dx)


class _Huff:
    """Canonical Huffman decoder: MSB-first code packing inside the
    LSB-first stream (DEFLATE convention, which VP8L follows)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]) -> None:
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("empty Huffman code")
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = None
            return
        self.single = None
        # canonical assignment: shorter codes first, then symbol order
        kraft = sum(1 << (15 - l) for _s, l in nz)
        if kraft > (1 << 15):
            raise ValueError("over-subscribed Huffman code")
        code = 0
        table: dict[tuple[int, int], int] = {}
        for length in range(1, 16):
            for sym, l in nz:
                if l == length:
                    table[(length, code)] = sym
                    code += 1
            code <<= 1
        self.table = table

    def read(self, r: _LsbBitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | r.read(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in VP8L stream")


def _read_huffman_code(r: _LsbBitReader, alphabet_size: int) -> _Huff:
    if r.read(1):  # simple code
        num_symbols = r.read(1) + 1
        if r.read(1):
            sym0 = r.read(8)
        else:
            sym0 = r.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = r.read(8)
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1  # becomes a 0-bit single-symbol code
        return _Huff(lengths)
    # code-length-coded lengths
    num_codes = r.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = r.read(3)
    cl_huff = _Huff(cl_lengths)
    lengths = [0] * alphabet_size
    if r.read(1):  # use max_symbol cap
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = alphabet_size
    sym = 0
    prev_len = 8
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_huff.read(r)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + r.read(2)
            for _ in range(rep):
                if sym < alphabet_size:
                    lengths[sym] = prev_len
                    sym += 1
        elif cl == 17:
            sym += 3 + r.read(3)
        else:  # 18
            sym += 11 + r.read(7)
    return _Huff(lengths)


def _lz77_prefix(r: _LsbBitReader, code: int) -> int:
    """LZ77 length/distance prefix decode (RFC 9649 §4.2.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.read(extra) + 1


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image_stream(r: _LsbBitReader, w: int, h: int,
                         is_level0: bool) -> tuple[np.ndarray, list]:
    """Core VP8L image-stream decoder → (argb uint32 array (h, w),
    transforms list applied later in reverse)."""
    transforms = []
    xsize = w
    if is_level0:
        seen = set()
        while r.read(1):
            ttype = r.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # PREDICTOR / COLOR
                size_bits = r.read(3) + 2
                bw = _subsample_size(xsize, size_bits)
                bh = _subsample_size(h, size_bits)
                sub, _ = _decode_image_stream(r, bw, bh, False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append((2, None, None))
            else:  # COLOR_INDEXING
                n_colors = r.read(8) + 1
                pal, _ = _decode_image_stream(r, n_colors, 1, False)
                pal = pal[0]
                # palette entries are delta-coded component-wise
                out = pal.copy()
                for i in range(1, n_colors):
                    out[i] = _add_pixels(out[i - 1], pal[i])
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, (width_bits, out), None))
                xsize = _subsample_size(xsize, width_bits)

    cache_bits = 0
    if r.read(1):
        cache_bits = r.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("invalid color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    entropy_image = None
    num_groups = 1
    ent_bits = 0
    if is_level0 and r.read(1):
        ent_bits = r.read(3) + 2
        ew = _subsample_size(xsize, ent_bits)
        eh = _subsample_size(h, ent_bits)
        entropy_image, _ = _decode_image_stream(r, ew, eh, False)
        meta_idx = ((entropy_image >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta_idx.max()) + 1
        entropy_image = meta_idx

    groups = []
    green_size = 256 + 24 + cache_size
    for _ in range(num_groups):
        g = _read_huffman_code(r, green_size)
        red = _read_huffman_code(r, 256)
        blue = _read_huffman_code(r, 256)
        alpha = _read_huffman_code(r, 256)
        dist = _read_huffman_code(r, 40)
        groups.append((g, red, blue, alpha, dist))

    n = xsize * h
    pix = np.zeros(n, dtype=np.uint32)
    cache = [0] * cache_size
    pos = 0
    while pos < n:
        if num_groups > 1:
            x, y = pos % xsize, pos // xsize
            grp = groups[int(entropy_image[y >> ent_bits, x >> ent_bits])]
        else:
            grp = groups[0]
        g_huff, r_huff, b_huff, a_huff, d_huff = grp
        s = g_huff.read(r)
        if s < 256:
            red = r_huff.read(r)
            blue = b_huff.read(r)
            alpha = a_huff.read(r)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            pix[pos] = argb
            if cache_size:
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            pos += 1
        elif s < 256 + 24:
            length = _lz77_prefix(r, s - 256)
            dist_code = _lz77_prefix(r, d_huff.read(r))
            dist = _plane_code_to_distance(xsize, dist_code)
            if dist > pos or pos + length > n:
                raise ValueError("invalid VP8L back-reference")
            for _ in range(length):
                argb = int(pix[pos - dist])
                pix[pos] = argb
                if cache_size:
                    cache[(0x1E35A7BD * argb & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = argb
                pos += 1
        else:
            pix[pos] = cache[s - 256 - 24]
            pos += 1
    return pix.reshape(h, xsize), transforms


def _add_pixels(a: int, b: int) -> int:
    """Per-channel mod-256 add of two ARGB words. Callers may pass
    numpy uint32 scalars — promote to python ints so the top-lane sum
    can't trip numpy's overflow warning (the & masks make the math
    mod-256 either way)."""
    a, b = int(a), int(b)
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | (((a >> 16) + (b >> 16)) & 0xFF) << 16
        | (((a >> 8) + (b >> 8)) & 0xFF) << 8
        | ((a + b) & 0xFF)
    )


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.uint16) + b.astype(np.uint16)) // 2).astype(np.uint8)


def _inverse_predictor(res: np.ndarray, sub: np.ndarray,
                       size_bits: int) -> np.ndarray:
    """Predictor transform inverse (RFC 9649 §4.1.1): 14 modes chosen
    per block, scalar scan (each pixel depends on already-reconstructed
    neighbors). res/out are (h, w, 4) uint8 in ARGB channel order."""
    h, w = res.shape[:2]
    out = np.zeros_like(res)
    modes = (sub >> 8) & 0xFF

    def clamp_add_sub_full(l, t, tl):
        v = l.astype(np.int32) + t.astype(np.int32) - tl.astype(np.int32)
        return np.clip(v, 0, 255).astype(np.uint8)

    def clamp_add_sub_half(ave, tl):
        a = ave.astype(np.int32)
        v = a + (a - tl.astype(np.int32)) // 2
        return np.clip(v, 0, 255).astype(np.uint8)

    black = np.array([0xFF, 0, 0, 0], dtype=np.uint8)  # ARGB 0xff000000
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # TR at the rightmost column: libwebp predicts in one
                # linear buffer, so top[x+1] at x==w-1 lands on index
                # y*w — the CURRENT row's leftmost pixel (already
                # reconstructed at that point), which the spec codifies.
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                if mode == 0:
                    pred = black
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    # Select: whichever of L/T is closer to the gradient
                    p = (L.astype(np.int32) + T.astype(np.int32)
                         - TL.astype(np.int32))
                    pl = int(np.abs(p - L.astype(np.int32)).sum())
                    pt = int(np.abs(p - T.astype(np.int32)).sum())
                    pred = L if pl < pt else T
                elif mode == 12:
                    pred = clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    pred = clamp_add_sub_half(_avg2(L, T), TL)
                else:
                    raise ValueError(f"invalid predictor mode {mode}")
            out[y, x] = res[y, x] + pred  # uint8 wraps mod 256
    return out


def _inverse_color_transform(px: np.ndarray, sub: np.ndarray,
                             size_bits: int) -> np.ndarray:
    """Cross-color transform inverse (RFC 9649 §4.1.2). px is (h, w, 4)
    ARGB uint8; the transform element's channels carry green_to_red
    (blue channel), green_to_blue (green), red_to_blue (red)."""
    h, w = px.shape[:2]
    out = px.copy()
    g2r = (sub & 0xFF).astype(np.int8)
    g2b = ((sub >> 8) & 0xFF).astype(np.int8)
    r2b = ((sub >> 16) & 0xFF).astype(np.int8)

    def delta(t: int, c: int) -> int:
        # both operands signed 8-bit, product >> 5 (arithmetic)
        return (int(t) * (c if c < 128 else c - 256)) >> 5

    for y in range(h):
        by = y >> size_bits
        for x in range(w):
            bx = x >> size_bits
            g = int(out[y, x, 2])
            red = (int(out[y, x, 1]) + delta(g2r[by, bx], g)) & 0xFF
            out[y, x, 1] = red
            blue = (int(out[y, x, 3]) + delta(g2b[by, bx], g)
                    + delta(r2b[by, bx], red)) & 0xFF
            out[y, x, 3] = blue
    return out


def webp_decode(b: bytes) -> np.ndarray:
    """WebP lossless bytes → (h, w, 4) uint8 RGBA."""
    b = bytes(b)
    if len(b) < 20 or b[0:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    payload = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if tag == b"VP8L":
            payload = b[pos + 8 : pos + 8 + length]
            break
        if tag == b"VP8 " or tag == b"VP8X":
            raise NotImplementedError(
                "lossy/extended WebP needs a perceptual codec — only "
                "lossless (VP8L) ships in this environment"
            )
        pos += 8 + length + (length & 1)
    if payload is None:
        raise ValueError("missing VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    r = _LsbBitReader(payload, 1)
    w = r.read(14) + 1
    h = r.read(14) + 1
    r.read(1)  # alpha hint
    if r.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    argb_words, transforms = _decode_image_stream(r, w, h, True)

    # unpack ARGB words to (h, w', 4) uint8 [A, R, G, B]
    px = np.stack(
        [
            (argb_words >> 24) & 0xFF,
            (argb_words >> 16) & 0xFF,
            (argb_words >> 8) & 0xFF,
            argb_words & 0xFF,
        ],
        axis=2,
    ).astype(np.uint8)

    # apply inverse transforms in reverse order of appearance
    for ttype, arg, sub in reversed(transforms):
        if ttype == 3:  # color indexing
            width_bits, palette = arg
            if width_bits:
                per_byte = 1 << width_bits       # pixels bundled per byte
                idx_bits = 8 >> width_bits       # bits per palette index
                mask = (1 << idx_bits) - 1
                green = px[:, :, 2]
                cols = []
                for i in range(per_byte):
                    cols.append((green >> (i * idx_bits)) & mask)
                idx = np.stack(cols, axis=2).reshape(px.shape[0], -1)[:, :w]
            else:
                idx = px[:, :, 2].astype(np.int64)
            pal_words = palette
            words = pal_words[np.clip(idx, 0, len(pal_words) - 1)]
            px = np.stack(
                [
                    (words >> 24) & 0xFF,
                    (words >> 16) & 0xFF,
                    (words >> 8) & 0xFF,
                    words & 0xFF,
                ],
                axis=2,
            ).astype(np.uint8)
        elif ttype == 2:  # subtract green
            px[:, :, 1] = px[:, :, 1] + px[:, :, 2]  # uint8 wrap
            px[:, :, 3] = px[:, :, 3] + px[:, :, 2]
        elif ttype == 1:  # cross-color
            px = _inverse_color_transform(px, sub, arg)
        elif ttype == 0:  # predictor
            px = _inverse_predictor(px, sub, arg)

    # ARGB → RGBA
    return px[:, :, [1, 2, 3, 0]]


def webp_parse_meta(b: bytes) -> tuple[int, int, bool]:
    """WebP header walk → (width, height, is_lossless) without decoding."""
    b = bytes(b)
    if len(b) < 20 or b[0:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if tag == b"VP8L" and length >= 5:
            r = _LsbBitReader(b, pos + 9)
            if b[pos + 8] != 0x2F:
                raise ValueError("bad VP8L signature")
            return r.read(14) + 1, r.read(14) + 1, True
        pos += 8 + length + (length & 1)
    raise ValueError("missing VP8L chunk")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _build_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Canonical Huffman code lengths from frequencies (heap build +
    Kraft repair under the 15-bit cap)."""
    import heapq

    syms = [s for s, f in freqs.items() if f > 0]
    if len(syms) <= 1:
        return {s: 1 for s in syms}
    heap = [(f, i, [s]) for i, (s, f) in enumerate(
        (s, freqs[s]) for s in sorted(syms))]
    heapq.heapify(heap)
    lengths = {s: 0 for s in syms}
    nxt = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, nxt, s1 + s2))
        nxt += 1
    # cap at max_len and repair Kraft
    for s in lengths:
        lengths[s] = min(lengths[s], max_len)
    def kraft() -> float:
        return sum(2.0 ** -l for l in lengths.values())
    while kraft() > 1.0:
        # lengthen the shortest-of-the-longest fixables
        s = min((s for s in lengths if lengths[s] < max_len),
                key=lambda s: lengths[s])
        lengths[s] += 1
    return lengths


def _canon_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    code = 0
    out = {}
    for length in range(1, 16):
        for sym in sorted(s for s, l in lengths.items() if l == length):
            out[sym] = (code, length)
            code += 1
        code <<= 1
    return out


def _write_huffman_code(w: _LsbBitWriter, lengths: dict[int, int],
                        alphabet_size: int) -> None:
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        w.write(1, 1)  # simple
        w.write(len(syms) - 1, 1)
        if syms[0] > 1:
            w.write(1, 1)
            w.write(syms[0], 8)
        else:
            w.write(0, 1)
            w.write(syms[0], 1)
        if len(syms) == 2:
            w.write(syms[1], 8)
        return
    # full: code-length code with literal lengths only (valid, non-minimal)
    all_lengths = [lengths.get(s, 0) for s in range(alphabet_size)]
    # trim trailing zeros under the max_symbol cap
    last = max(s for s, l in enumerate(all_lengths) if l > 0)
    used = all_lengths[: last + 1]
    cl_freq: dict[int, int] = {}
    for l in used:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths = _build_lengths(cl_freq, max_len=7)
    cl_codes = _canon_codes(cl_lengths)
    w.write(0, 1)  # not simple
    w.write(19 - 4, 4)  # emit all 19 slots
    for sym in _CL_ORDER:
        w.write(cl_lengths.get(sym, 0), 3)
    if len(cl_lengths) == 1:
        # single-symbol CL code reads as 0-bit; symbols need no bits,
        # but we still must bound the count: use the max_symbol cap
        only = next(iter(cl_lengths))
        w.write(1, 1)  # use cap
        # length_nbits = 2 + 2*slot; pick the smallest slot that fits
        need = len(used) - 2
        slot = 0
        while need >= (1 << (2 + 2 * slot)):
            slot += 1
        w.write(slot, 3)
        w.write(need, 2 + 2 * slot)
        _ = only  # each symbol consumes zero bits
        return
    w.write(1, 1)  # use max_symbol cap (lets us stop after `used`)
    need = len(used) - 2
    slot = 0
    while need >= (1 << (2 + 2 * slot)):
        slot += 1
    w.write(slot, 3)
    w.write(need, 2 + 2 * slot)
    for l in used:
        code, ln = cl_codes[l]
        # MSB-first packing of the Huffman code into the LSB stream
        for i in range(ln - 1, -1, -1):
            w.write((code >> i) & 1, 1)


def _write_sym(w: _LsbBitWriter, codes: dict[int, tuple[int, int]],
               sym: int, single: bool) -> None:
    if single:
        return  # 0-bit code
    code, ln = codes[sym]
    for i in range(ln - 1, -1, -1):
        w.write((code >> i) & 1, 1)


def _lz77_prefix_encode(value: int) -> tuple[int, int, int]:
    """value (≥1) → (prefix_code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 1
    # code = 2*nbits + second-MSB
    second = (v >> (nbits - 1)) & 1
    code = 2 * nbits + second
    extra_count = nbits - 1
    base = (2 + second) << extra_count
    return code, v - base, extra_count


def _encode_stream(
    w: _LsbBitWriter, words: np.ndarray, level0: bool,
    cache_bits: int | None = None,
) -> None:
    """Emit one VP8L image stream for a flat uint32 ARGB array: color
    cache (auto-sized, below), entropy-image bit (level0 only, 0), the
    five prefix codes, then cache-ref/literal/run tokens (dist=1 LZ77 —
    flat rows collapse to one literal + a run). Shared by the main
    image and the transform sub-images (which per the spec have no
    entropy-image bit).

    Color cache (RFC 9649 §4.2.3, r11 encode side — decode has handled
    it since r9): a 2^cache_bits slot table indexed by the spec's
    0x1E35A7BD multiplicative hash; a pixel equal to its slot emits ONE
    green symbol (256 + 24 + idx) instead of four channel symbols. The
    encoder mirrors the decoder's state machine exactly — insert on
    literal and on run-copied values (a hit leaves the slot unchanged:
    re-inserting the same value is the identity), so eviction chains
    replay bit-for-bit. ``cache_bits=None`` auto-sizes: palette-ish
    streams (2 ≤ distinct ≤ 1024) get one slot-doubling above the
    palette size (collisions rare, table cheap); high-entropy streams
    (photo residuals) get no cache — each slot write would evict the
    last, pure overhead."""
    if cache_bits is None:
        # Distinct count with an early bail: the cache is only worth
        # sizing for palette-ish streams (<=1024 distinct), so stop
        # counting the moment a chunk proves the stream high-entropy —
        # photo residual streams exit after ONE 4096-word chunk instead
        # of paying a full O(n log n) unique pass (r11 ADVICE).
        seen = np.empty(0, dtype=words.dtype)
        for start in range(0, len(words), 4096):
            seen = np.union1d(seen, words[start:start + 4096])
            if len(seen) > 1024:
                break
        d = len(seen)
        cache_bits = (
            min(11, max(1, (2 * d - 1).bit_length())) if 2 <= d <= 1024
            else 0
        )
        if cache_bits and (d == len(words) or len(words) < 32):
            # all-distinct words can never hit, and a tiny stream (the
            # palette delta sub-image) can't amortize the code-table pad
            cache_bits = 0
        if cache_bits and all(
            len(np.unique((words >> s) & 0xFF)) == 1 for s in (24, 16, 0)
        ):
            # exact dominance: when R, B and A are each constant their
            # single-symbol codes cost 0 bits, so a literal is already
            # ONE green symbol — a cache ref can't be cheaper and the
            # bigger green alphabet only pads the code table (seen on
            # the color-indexed and predictor-mode streams)
            cache_bits = 0
    if cache_bits:
        w.write(1, 1)
        w.write(cache_bits, 4)
    else:
        w.write(0, 1)  # no color cache
    cache_size = (1 << cache_bits) if cache_bits else 0
    shift = 32 - cache_bits if cache_bits else 0
    cache: list[int] = [-1] * cache_size
    if level0:
        w.write(0, 1)  # no entropy image (single group)

    # ('lit', argb) | ('run', length) | ('cache', idx)
    tokens: list[tuple] = []
    i, n = 0, len(words)
    while i < n:
        if i > 0 and words[i] == words[i - 1]:
            j = i
            while j < n and words[j] == words[i - 1] and j - i < 4096:
                j += 1
            tokens.append(("run", j - i))
            if cache_size:  # decoder inserts every copied pixel
                v = int(words[i - 1])
                cache[(0x1E35A7BD * v & 0xFFFFFFFF) >> shift] = v
            i = j
        else:
            argb = int(words[i])
            if cache_size:
                idx = (0x1E35A7BD * argb & 0xFFFFFFFF) >> shift
                if cache[idx] == argb:
                    tokens.append(("cache", idx))
                    i += 1
                    continue
                cache[idx] = argb
            tokens.append(("lit", argb))
            i += 1

    gfreq: dict[int, int] = {}
    rfreq: dict[int, int] = {}
    bfreq: dict[int, int] = {}
    afreq: dict[int, int] = {}
    dfreq: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            argb = t[1]
            gfreq[(argb >> 8) & 0xFF] = gfreq.get((argb >> 8) & 0xFF, 0) + 1
            rfreq[(argb >> 16) & 0xFF] = rfreq.get((argb >> 16) & 0xFF, 0) + 1
            bfreq[argb & 0xFF] = bfreq.get(argb & 0xFF, 0) + 1
            afreq[argb >> 24] = afreq.get(argb >> 24, 0) + 1
        elif t[0] == "cache":
            s = 256 + 24 + t[1]
            gfreq[s] = gfreq.get(s, 0) + 1
        else:
            code, _, _ = _lz77_prefix_encode(t[1])
            gfreq[256 + code] = gfreq.get(256 + code, 0) + 1
            dcode, _, _ = _lz77_prefix_encode(121)  # distance 1 → code 121
            dfreq[dcode] = dfreq.get(dcode, 0) + 1
    for f in (rfreq, bfreq, afreq, dfreq):
        if not f:
            f[0] = 1  # every code must exist even if unused

    glen = _build_lengths(gfreq)
    rlen = _build_lengths(rfreq)
    blen = _build_lengths(bfreq)
    alen = _build_lengths(afreq)
    dlen = _build_lengths(dfreq)

    _write_huffman_code(w, glen, 256 + 24 + cache_size)
    _write_huffman_code(w, rlen, 256)
    _write_huffman_code(w, blen, 256)
    _write_huffman_code(w, alen, 256)
    _write_huffman_code(w, dlen, 40)

    gcodes, rcodes = _canon_codes(glen), _canon_codes(rlen)
    bcodes, acodes = _canon_codes(blen), _canon_codes(alen)
    dcodes = _canon_codes(dlen)
    gs, rs = len(glen) == 1, len(rlen) == 1
    bs, as_, ds = len(blen) == 1, len(alen) == 1, len(dlen) == 1
    for t in tokens:
        if t[0] == "lit":
            argb = t[1]
            _write_sym(w, gcodes, (argb >> 8) & 0xFF, gs)
            _write_sym(w, rcodes, (argb >> 16) & 0xFF, rs)
            _write_sym(w, bcodes, argb & 0xFF, bs)
            _write_sym(w, acodes, argb >> 24, as_)
        elif t[0] == "cache":
            _write_sym(w, gcodes, 256 + 24 + t[1], gs)
        else:
            code, extra, nbits = _lz77_prefix_encode(t[1])
            _write_sym(w, gcodes, 256 + code, gs)
            if nbits:
                w.write(extra, nbits)
            dcode, dextra, dnbits = _lz77_prefix_encode(121)
            _write_sym(w, dcodes, dcode, ds)
            if dnbits:
                w.write(dextra, dnbits)


def _forward_predictor(
    px: np.ndarray, size_bits: int
) -> tuple[np.ndarray, np.ndarray]:
    """Forward predictor transform (the encode side of
    ``_inverse_predictor``): per-block best of all 14 modes by centered
    residual magnitude (deterministic ties → lowest mode). ``px`` is
    (h, w, 4) uint8 ARGB. Returns (residuals, block_modes).

    Neighbors are the ORIGINAL pixels: lossless residuals are exact
    mod-256, so the decoder's sequential reconstruction reproduces the
    original at every step and forward prediction may vectorize over
    the untransformed image — no sequential dependency on the encode
    side. Edge pixels use the same fixed rules as the inverse ((0,0)
    black, y==0 left, x==0 top; TR at x==w-1 is the current row's
    leftmost pixel) regardless of block mode."""
    h, w = px.shape[:2]
    black = np.zeros_like(px)
    black[:, :, 0] = 0xFF  # ARGB 0xff000000

    # neighbor grids (garbage at the fixed-rule edges, masked below)
    L = np.empty_like(px)
    L[:, 1:] = px[:, :-1]
    L[:, 0] = 0
    T = np.empty_like(px)
    T[1:] = px[:-1]
    T[0] = 0
    TL = np.zeros_like(px)
    TL[1:, 1:] = px[:-1, :-1]
    TR = np.zeros_like(px)
    if w > 1:
        TR[1:, :-1] = px[:-1, 1:]
    TR[1:, w - 1] = px[1:, 0]  # right edge: current row's leftmost

    def caf(l, t, tl):  # clamp_add_sub_full
        v = l.astype(np.int32) + t.astype(np.int32) - tl.astype(np.int32)
        return np.clip(v, 0, 255).astype(np.uint8)

    def cah(ave, tl):  # clamp_add_sub_half
        a32 = ave.astype(np.int32)
        v = a32 + (a32 - tl.astype(np.int32)) // 2
        return np.clip(v, 0, 255).astype(np.uint8)

    p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
    pl = np.abs(p - L.astype(np.int32)).sum(axis=2, keepdims=True)
    pt = np.abs(p - T.astype(np.int32)).sum(axis=2, keepdims=True)
    select = np.where(pl < pt, L, T)

    preds = np.stack([
        black, L, T, TR, TL,
        _avg2(_avg2(L, TR), T),
        _avg2(L, TL),
        _avg2(L, T),
        _avg2(TL, T),
        _avg2(T, TR),
        _avg2(_avg2(L, TL), _avg2(T, TR)),
        select,
        caf(L, T, TL),
        cah(_avg2(L, T), TL),
    ])  # (14, h, w, 4)

    res14 = (px[None].astype(np.int16) - preds.astype(np.int16)) % 256
    centered = np.minimum(res14, 256 - res14).sum(axis=3)  # (14, h, w)
    centered[:, 0, :] = 0   # fixed-rule pixels: mode-independent
    centered[:, :, 0] = 0

    bs = 1 << size_bits
    bh = (h + bs - 1) // bs
    bw = (w + bs - 1) // bs
    padded = np.zeros((14, bh * bs, bw * bs), dtype=np.int64)
    padded[:, :h, :w] = centered
    blocks = padded.reshape(14, bh, bs, bw, bs).sum(axis=(2, 4))
    modes = np.argmin(blocks, axis=0).astype(np.uint8)  # ties → lowest

    modes_px = np.repeat(np.repeat(modes, bs, axis=0), bs, axis=1)[:h, :w]
    idx = modes_px[None, :, :, None].astype(np.intp)
    pred = np.take_along_axis(preds, idx, axis=0)[0]
    # fixed edge rules override the block mode
    pred[0, :] = L[0, :]
    pred[1:, 0] = T[1:, 0]
    pred[0, 0] = black[0, 0]
    res = (px.astype(np.int16) - pred.astype(np.int16)) % 256
    return res.astype(np.uint8), modes


def _argb_words(px: np.ndarray) -> np.ndarray:
    return (
        (px[:, :, 0].astype(np.uint32) << 24)
        | (px[:, :, 1].astype(np.uint32) << 16)
        | (px[:, :, 2].astype(np.uint32) << 8)
        | px[:, :, 3].astype(np.uint32)
    )


def _payload_writer(w0: int, h: int) -> _LsbBitWriter:
    w = _LsbBitWriter()
    w.write(w0 - 1, 14)
    w.write(h - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version
    return w


def _vp8l_payload_pred(px: np.ndarray, w0: int, h: int,
                       use_transforms: bool) -> bytes:
    """The r10 strategy: [subtract-green, predictor] (or no transforms)
    + entropy stage."""
    px = px.copy()
    w = _payload_writer(w0, h)
    if use_transforms:
        # stream order [SG, PRED]; the decoder inverts in reverse read
        # order (predictor inverse first, then add-green), matching the
        # forward pipeline orig → subtract-green → predictor
        w.write(1, 1)
        w.write(2, 2)  # SUBTRACT_GREEN
        g = px[:, :, 2]
        px[:, :, 1] = px[:, :, 1] - g  # uint8 wrap: R' = R - G
        px[:, :, 3] = px[:, :, 3] - g  # B' = B - G
        size_bits = 4
        w.write(1, 1)
        w.write(0, 2)  # PREDICTOR
        w.write(size_bits - 2, 3)
        res, modes = _forward_predictor(px, size_bits)
        mode_words = (
            (np.uint32(0xFF) << 24) | (modes.astype(np.uint32) << 8)
        ).reshape(-1)
        _encode_stream(w, mode_words, level0=False)
        px = res
    w.write(0, 1)  # no more transforms
    _encode_stream(w, _argb_words(px).reshape(-1), level0=True)
    w.align()
    return bytes([0x2F]) + bytes(w.buf)


def _vp8l_payload_palette(px: np.ndarray, w0: int, h: int,
                          colors: np.ndarray) -> bytes:
    """The r11 strategy: COLOR_INDEXING transform (RFC 9649 §4.2.4) —
    delta-coded palette sub-image, indices in the GREEN channel,
    sub-byte pixel bundling for palettes ≤ 16 colors (8/4/2 indices per
    byte for ≤2/≤4/≤16 colors). The decoder has handled this since the
    r10 hand-built fixture; this is the emit side. ``colors`` is the
    deterministic (sorted-unique) palette, ≤ 256 entries."""
    n_colors = len(colors)
    w = _payload_writer(w0, h)
    w.write(1, 1)
    w.write(3, 2)  # COLOR_INDEXING
    w.write(n_colors - 1, 8)
    # palette entries are component-wise delta-coded: entry 0 verbatim,
    # entry i = pal[i] - pal[i-1] per uint8 lane (inverse: _add_pixels)
    pal8 = np.stack(
        [
            (colors >> 24) & 0xFF, (colors >> 16) & 0xFF,
            (colors >> 8) & 0xFF, colors & 0xFF,
        ],
        axis=1,
    ).astype(np.uint8)
    delta = pal8.copy()
    delta[1:] = pal8[1:] - pal8[:-1]  # uint8 wrap
    delta_words = (
        (delta[:, 0].astype(np.uint32) << 24)
        | (delta[:, 1].astype(np.uint32) << 16)
        | (delta[:, 2].astype(np.uint32) << 8)
        | delta[:, 3].astype(np.uint32)
    )
    _encode_stream(w, delta_words, level0=False)
    w.write(0, 1)  # no more transforms

    if n_colors <= 2:
        width_bits = 3
    elif n_colors <= 4:
        width_bits = 2
    elif n_colors <= 16:
        width_bits = 1
    else:
        width_bits = 0
    idx = np.searchsorted(colors, _argb_words(px))  # palette is sorted
    if width_bits:
        per_byte = 1 << width_bits
        idx_bits = 8 >> width_bits
        bw = _subsample_size(w0, width_bits)
        padded = np.zeros((h, bw * per_byte), dtype=np.uint32)
        padded[:, :w0] = idx
        packed = np.zeros((h, bw), dtype=np.uint32)
        for i in range(per_byte):
            packed |= padded[:, i::per_byte] << (i * idx_bits)
    else:
        packed = idx.astype(np.uint32)
    words = ((np.uint32(0xFF) << 24) | (packed << 8)).reshape(-1)
    _encode_stream(w, words, level0=True)
    w.align()
    return bytes([0x2F]) + bytes(w.buf)


def webp_encode(rgba: np.ndarray, use_transforms: bool = True) -> bytes:
    """(h, w, 4) uint8 RGBA (or (h, w, 3) RGB) → lossless WebP bytes.
    With ``use_transforms`` (default) the encoder picks the SMALLER of
    two deterministic strategies:

    - subtract-green + per-block predictor (16×16 blocks, best of all
      14 modes) — the photographic/gradient path (r10, measured ~2-4×
      on gradients);
    - COLOR_INDEXING (r11, when ≤ 256 distinct colors): delta-coded
      palette + green-channel indices with sub-byte bundling (8/4/2
      px per byte at ≤2/≤4/≤16 colors) + the color cache — the
      palette/icon path.

    Set ``use_transforms=False`` for the r9 transform-free stream (all
    strategies decode identically through ``webp_decode``). One Huffman
    group, left-run LZ77, canonical codes, auto-sized color cache."""
    a = np.asarray(rgba, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=2)
    if a.shape[2] == 3:
        a = np.concatenate(
            [a, np.full(a.shape[:2] + (1,), 255, dtype=np.uint8)], axis=2
        )
    h, w0 = a.shape[:2]
    if not (1 <= w0 <= 16384 and 1 <= h <= 16384):
        raise ValueError("WebP dimensions must be in [1, 16384]")
    # (h, w, 4) ARGB planes
    px = a[:, :, [3, 0, 1, 2]].copy()

    payload = _vp8l_payload_pred(px, w0, h, use_transforms)
    if use_transforms:
        colors = np.unique(_argb_words(px))
        if len(colors) <= 256:
            pal = _vp8l_payload_palette(px, w0, h, colors)
            if len(pal) < len(payload):
                payload = pal
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body
