"""VP8L (lossless WebP) codec: encoder round-trips + hand-built spec
streams exercising decoder features the encoder never emits (transforms,
color cache, distance mapping, code-length repeats)."""

from __future__ import annotations

import numpy as np
import pytest

from storage_spark.functions.webpcodec import (
    _LsbBitWriter,
    webp_decode,
    webp_encode,
    webp_parse_meta,
)


def _rt(img):
    out = webp_decode(webp_encode(img))
    if img.shape[2] == 3:
        img = np.concatenate(
            [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2
        )
    return np.array_equal(out, img)


def test_round_trip_profiles():
    rng = np.random.default_rng(5)
    h, w = 16, 20
    yy, xx = np.mgrid[0:h, 0:w]
    cases = [
        np.full((8, 12, 4), [10, 200, 30, 255], dtype=np.uint8),
        np.stack([(xx * 13) % 256, (yy * 7) % 256, (xx + yy) % 256],
                 axis=2).astype(np.uint8),
        rng.integers(0, 256, (9, 11, 4)).astype(np.uint8),
        np.array([[[1, 2, 3, 4]]], dtype=np.uint8),
        rng.integers(0, 256, (1, 300, 4)).astype(np.uint8),  # long runs absent
        np.repeat(rng.integers(0, 256, (1, 7, 4)), 40, axis=0
                  ).reshape(40, 7, 4).astype(np.uint8),
    ]
    for img in cases:
        assert _rt(img), img.shape


def test_flat_image_compresses_via_runs():
    img = np.full((64, 64, 4), [7, 8, 9, 255], dtype=np.uint8)
    b = webp_encode(img)
    assert len(b) < 200  # 16k pixels → a handful of run tokens
    assert webp_parse_meta(b) == (64, 64, True)


def test_transform_encoder_shrinks_gradients_and_roundtrips():
    """r10: the transform-side encoder (subtract-green + per-block
    predictor, all 14 modes scored) must shrink smooth content hard and
    stay lossless; the transform-free stream stays available and both
    decode identically."""
    import numpy as np

    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack(
        [(xx * 3 + yy) % 256, (yy * 2) % 256, (xx + yy * 2) % 256], axis=2
    ).astype(np.uint8)
    b_plain = webp_encode(grad, use_transforms=False)
    b_tr = webp_encode(grad)
    assert np.array_equal(webp_decode(b_tr)[:, :, :3], grad)
    assert np.array_equal(webp_decode(b_plain)[:, :, :3], grad)
    assert len(b_tr) < len(b_plain) / 4  # measured ~35x; gate at 4x


def test_forward_predictor_uses_multiple_modes():
    """A mixed image (vertical bands / horizontal bands / diagonal
    gradient) should select different predictor modes per block, and
    the full encode→decode round-trip proves forward ≡ inverse for
    every mode chosen — including TR/averages at the right edge."""
    import numpy as np

    from storage_spark.functions.webpcodec import _forward_predictor

    h, w = 48, 48
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :16] = np.stack([xx[:, :16] * 9 % 256] * 3, axis=2)   # L-predictable
    img[:, 16:32] = np.stack([yy[:, 16:32] * 7 % 256] * 3, axis=2)  # T
    img[:, 32:] = np.stack([(xx[:, 32:] + yy[:, 32:]) * 5 % 256] * 3, axis=2)
    px = img[:, :, [0, 0, 1, 2]].copy()
    px[:, :, 0] = 255
    res, modes = _forward_predictor(px, 4)
    assert len(np.unique(modes)) > 1
    assert np.array_equal(webp_decode(webp_encode(img))[:, :, :3], img)


def test_transform_roundtrip_adversarial_shapes():
    import numpy as np

    rng = np.random.default_rng(11)
    cases = [
        rng.integers(0, 256, (1, 1, 4)),       # single pixel
        rng.integers(0, 256, (1, 37, 4)),      # single row
        rng.integers(0, 256, (37, 1, 4)),      # single column
        rng.integers(0, 256, (17, 19, 4)),     # non-multiple of block
        rng.integers(0, 256, (33, 16, 3)),     # block-boundary + RGB
    ]
    for img in cases:
        img = img.astype(np.uint8)
        out = webp_decode(webp_encode(img))
        want = img if img.shape[2] == 4 else np.concatenate(
            [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2
        )
        assert np.array_equal(out, want), img.shape


def test_rejects_garbage_and_lossy():
    with pytest.raises(ValueError):
        webp_decode(b"not webp")
    with pytest.raises(ValueError):
        webp_parse_meta(b"RIFF\x00\x00\x00\x00WAVE")
    # a VP8 (lossy) chunk: honestly refused, not misparsed
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + bytes(8)
    with pytest.raises(NotImplementedError):
        webp_decode(lossy)


# ---------------------------------------------------------------------------
# hand-built streams — decoder features beyond the encoder's profile
# ---------------------------------------------------------------------------


def _container(payload_bits: _LsbBitWriter) -> bytes:
    import struct

    payload_bits.align()
    payload = bytes([0x2F]) + bytes(payload_bits.buf)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _header(w, width, height, n_transform_bits=()):
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version


def _simple_code_1(w, sym):
    """Emit a 1-symbol 'simple' Huffman code (0 bits per read)."""
    w.write(1, 1)       # simple
    w.write(0, 1)       # one symbol
    if sym > 1:
        w.write(1, 1)
        w.write(sym, 8)
    else:
        w.write(0, 1)
        w.write(sym, 1)


def _simple_code_2(w, s0, s1):
    w.write(1, 1)
    w.write(1, 1)       # two symbols
    w.write(1, 1)
    w.write(s0, 8)
    w.write(s1, 8)


def test_hand_built_subtract_green():
    w = _LsbBitWriter()
    _header(w, 1, 1)
    w.write(1, 1)   # transform present
    w.write(2, 2)   # SUBTRACT_GREEN
    w.write(0, 1)   # no more transforms
    w.write(0, 1)   # no cache
    w.write(0, 1)   # no entropy image
    # literal ARGB stored: G=50, R=(120-50)%256=70, B=(200-50)%256=150, A=255
    _simple_code_1(w, 50)    # green
    _simple_code_1(w, 70)    # red
    _simple_code_1(w, 150)   # blue
    _simple_code_1(w, 255)   # alpha
    _simple_code_1(w, 0)     # distance (unused)
    out = webp_decode(_container(w))
    assert out[0, 0].tolist() == [120, 50, 200, 255]  # RGBA


def test_hand_built_distance_map_code1_copies_row_above():
    # 2x2 image: row0 = two literals (two-symbol green code), then one
    # LZ77 (length 2, dist_code 1 → (0,1) → distance = xsize) copies row0
    w = _LsbBitWriter()
    _header(w, 2, 2)
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no cache
    w.write(0, 1)  # no entropy image
    # green code: symbols {10, 20, 256+1 (length code 1 → length 2)}
    # three symbols → full code-length path is overkill; use lengths:
    # craft with a 2-level code via code-length coding: lengths 1,2,2
    w.write(0, 1)           # not simple
    w.write(19 - 4, 4)      # all 19 cl slots
    # cl code: we need lengths {1:?, 2:?} over symbols {10:1? ...}
    # simpler: cl lengths — symbol '1' and '2' used, '0' heavily used.
    # give cl lengths: len(0)=1, len(1)=2, len(2)=2
    cl = {0: 1, 1: 2, 2: 2}
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]
    for sym in order:
        w.write(cl.get(sym, 0), 3)
    # canonical cl codes: 0→'0', 1→'10', 2→'11'
    # use max_symbol cap: need lengths up to symbol 257 → 258 entries
    w.write(1, 1)
    # need = 258 - 2 = 256 → smallest slot with 2+2*slot bits ≥ 9 → slot 4
    w.write(4, 3)
    w.write(256, 10)
    # emit: sym10 len1, sym20 len2, sym257 len2, everything else 0
    def put_bits_msb(code, ln):
        for i in range(ln - 1, -1, -1):
            w.write((code >> i) & 1, 1)

    cl_codes = {0: (0, 1), 1: (0b10, 2), 2: (0b11, 2)}
    seq = [0] * 10 + [1] + [0] * 9 + [2] + [0] * 236 + [2]
    assert len(seq) == 258 and seq[10] == 1 and seq[20] == 2 and seq[257] == 2
    for s in seq:
        c, ln = cl_codes[s]
        put_bits_msb(c, ln)
    # green canonical codes: sym10 len1 → '0'; sym20 len2 → '10';
    # sym257 len2 → '11'
    _simple_code_1(w, 0)    # red (all 0)
    _simple_code_1(w, 0)    # blue
    _simple_code_1(w, 255)  # alpha
    # distance code: single symbol 0 → prefix value 1 → dist_code 1
    # → neighbor (0,1) → distance = xsize
    _simple_code_1(w, 0)
    # pixels: row0 = [sym10 → G=10, sym20 → G=20]; then sym257 = length
    # code 1 → length 2; distance sym 0 → dist_code 1 → (0,1) → xsize=2
    put_bits_msb(0b0, 1)     # green literal 10
    put_bits_msb(0b10, 2)    # green literal 20
    put_bits_msb(0b11, 2)    # length code
    out = webp_decode(_container(w))
    g = out[:, :, 1]
    assert g.tolist() == [[10, 20], [10, 20]]


def test_hand_built_distance_map_dx_nonzero():
    # 3x2 image pinning the SIGN of the distance-map formula
    # (dist = dy*xsize + dx, positive dx = LEFT — RFC 9649 §4.2.2.3):
    # row0 = literals G=[10,20,30]; row1 = literal G=40, then one LZ77
    # (length 2, dist_code 4 → (-1,1) → distance 1*3 + (-1) = 2) which
    # copies linear positions 2,3 → G=[30,40]. Under the flipped sign
    # (dy*xsize - dx = 4) the copy would start at position 0 → [10,20].
    w = _LsbBitWriter()
    _header(w, 3, 2)
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no cache
    w.write(0, 1)  # no entropy image
    # green code over symbols {10, 20, 30, 40, 257 (length code 1)}:
    # lengths 10→1, 20/30/40/257→3 (complete). Canonical: 10→'0',
    # 20→'100', 30→'101', 40→'110', 257→'111'.
    w.write(0, 1)           # not simple
    w.write(19 - 4, 4)
    cl = {0: 1, 1: 2, 3: 2}
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]
    for sym in order:
        w.write(cl.get(sym, 0), 3)

    def put_bits_msb(code, ln):
        for i in range(ln - 1, -1, -1):
            w.write((code >> i) & 1, 1)

    cl_codes = {0: (0, 1), 1: (0b10, 2), 3: (0b11, 2)}
    w.write(1, 1)           # max_symbol cap
    w.write(4, 3)           # slot 4 → 10 bits
    w.write(256, 10)        # max_symbol = 258
    seq = [0] * 258
    seq[10] = 1
    seq[20] = seq[30] = seq[40] = seq[257] = 3
    for s in seq:
        c, ln = cl_codes[s]
        put_bits_msb(c, ln)
    _simple_code_1(w, 0)    # red
    _simple_code_1(w, 0)    # blue
    _simple_code_1(w, 255)  # alpha
    # distance: single symbol 3 → prefix value 4 → dist_code 4 → (-1,1)
    _simple_code_1(w, 3)
    put_bits_msb(0b0, 1)    # G=10
    put_bits_msb(0b100, 3)  # G=20
    put_bits_msb(0b101, 3)  # G=30
    put_bits_msb(0b110, 3)  # G=40
    put_bits_msb(0b111, 3)  # length code 1 → length 2; dist read: 0 bits
    out = webp_decode(_container(w))
    assert out[:, :, 1].tolist() == [[10, 20, 30], [40, 30, 40]]


def test_hand_built_predictor_TR_right_edge():
    # 2x2, predictor mode 3 (TR). At x == w-1 the spec (libwebp's
    # linear-buffer prediction) defines TR as the CURRENT row's leftmost
    # pixel out[y][0], not the row above's. Want G [[5, 9], [12, 20]]:
    # (1,1) res = 20 - G(out[1,0]) = 8; under the old out[y-1,0] reading
    # the result would be 5 + 8 = 13, not 20.
    w = _LsbBitWriter()
    _header(w, 2, 2)
    w.write(1, 1)
    w.write(0, 2)          # PREDICTOR
    w.write(4 - 2, 3)      # size_bits = 4 → one block
    w.write(0, 1)          # sub: no cache
    _simple_code_1(w, 3)   # green = mode 3 (TR)
    _simple_code_1(w, 0)   # red
    _simple_code_1(w, 0)   # blue
    _simple_code_1(w, 255)
    _simple_code_1(w, 0)   # distance
    w.write(0, 1)          # no more transforms
    w.write(0, 1)          # no cache
    w.write(0, 1)          # no entropy image
    # G residuals: (0,0)=5 (pred black), (0,1)=9-5=4 (pred L),
    # (1,0)=12-5=7 (pred T), (1,1)=20-12=8 (pred TR = out[1,0]).
    # lengths {4,5,7,8} all 2 (complete): 4→'00',5→'01',7→'10',8→'11'
    w.write(0, 1)
    w.write(19 - 4, 4)
    cl = {0: 1, 2: 1}
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]
    for sym in order:
        w.write(cl.get(sym, 0), 3)

    def put_bits_msb(code, ln):
        for i in range(ln - 1, -1, -1):
            w.write((code >> i) & 1, 1)

    cl_codes = {0: (0, 1), 2: (1, 1)}
    w.write(1, 1)
    w.write(1, 3)          # slot 1 → 4 bits
    w.write(9 - 2, 4)      # max_symbol = 9 (lengths up to symbol 8)
    seq = [0, 0, 0, 0, 2, 2, 0, 2, 2]
    for s in seq:
        c, ln = cl_codes[s]
        put_bits_msb(c, ln)
    _simple_code_1(w, 0)   # red residuals 0
    _simple_code_1(w, 0)   # blue
    _simple_code_1(w, 0)   # alpha residuals 0 (pred A=255 everywhere)
    _simple_code_1(w, 0)   # distance
    for code, ln in [(0b01, 2), (0b00, 2), (0b10, 2), (0b11, 2)]:
        put_bits_msb(code, ln)  # G residuals 5, 4, 7, 8
    out = webp_decode(_container(w))
    assert out[:, :, 1].tolist() == [[5, 9], [12, 20]]
    assert out[:, :, 3].tolist() == [[255, 255], [255, 255]]


def test_hand_built_color_cache():
    # 3x1 image: literal A, literal B, cache hit for A
    w = _LsbBitWriter()
    _header(w, 3, 1)
    w.write(0, 1)   # no transforms
    w.write(1, 1)   # cache present
    cache_bits = 4
    w.write(cache_bits, 4)
    argb_a = (255 << 24) | (1 << 16) | (2 << 8) | 3
    idx_a = ((0x1E35A7BD * argb_a) & 0xFFFFFFFF) >> (32 - cache_bits)
    w.write(0, 1)   # no entropy image
    # green alphabet = 256+24+16; symbols: 2 (lit G), 5 (lit G),
    # 256+24+idx_a (cache) → need a real code; use two-symbol simple for
    # greens only if cache sym ≤ 255 — it isn't. Use code-length path.
    alpha_size = 256 + 24 + 16
    cache_sym = 256 + 24 + idx_a
    # lengths: G=2 →1, G=5 →2, cache_sym →2
    w.write(0, 1)
    w.write(19 - 4, 4)
    cl = {0: 1, 1: 2, 2: 2}
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]
    for sym in order:
        w.write(cl.get(sym, 0), 3)
    def put_bits_msb(code, ln):
        for i in range(ln - 1, -1, -1):
            w.write((code >> i) & 1, 1)
    cl_codes = {0: (0, 1), 1: (0b10, 2), 2: (0b11, 2)}
    w.write(1, 1)  # cap
    need = (cache_sym + 1) - 2
    slot = 0
    while need >= (1 << (2 + 2 * slot)):
        slot += 1
    w.write(slot, 3)
    w.write(need, 2 + 2 * slot)
    seq = [0] * alpha_size
    seq[2] = 1
    seq[5] = 2
    seq[cache_sym] = 2
    for s in seq[: cache_sym + 1]:
        c, ln = cl_codes[s]
        put_bits_msb(c, ln)
    _simple_code_2(w, 1, 9)    # red: two symbols (1 for A, 9 for B)
    _simple_code_2(w, 3, 11)   # blue
    _simple_code_1(w, 255)     # alpha
    _simple_code_1(w, 0)       # distance unused
    # pixel 1: literal G=2 ('0'), R: code '0'→sym1, B: '0'→sym3
    put_bits_msb(0, 1)   # green 2
    put_bits_msb(0, 1)   # red 1
    put_bits_msb(0, 1)   # blue 3
    # pixel 2: literal G=5 ('10'), R '1'→9, B '1'→11
    put_bits_msb(0b10, 2)
    put_bits_msb(1, 1)
    put_bits_msb(1, 1)
    # pixel 3: cache hit ('11')
    put_bits_msb(0b11, 2)
    out = webp_decode(_container(w))
    assert out[0, 0].tolist() == [1, 2, 3, 255]
    assert out[0, 1].tolist() == [9, 5, 11, 255]
    assert out[0, 2].tolist() == [1, 2, 3, 255]  # via cache


def test_hand_built_color_indexing_with_bundling():
    # 6x1 image, 3-color palette -> width_bits=2 (4 indices/byte, 2 bits
    # each); packed width = ceil(6/4) = 2. Palette rows are delta-coded:
    # p0=(A255,10,10,10), d1=(0,10,10,10), d2=(0,10,10,10) gives the
    # grayscale ramp 10/20/30.
    w = _LsbBitWriter()
    _header(w, 6, 1)
    w.write(1, 1)              # transform present
    w.write(3, 2)              # COLOR_INDEXING
    w.write(3 - 1, 8)          # n_colors - 1
    # palette sub-stream (3x1, not level0: starts at the cache bit)
    w.write(0, 1)              # no color cache
    _simple_code_1(w, 10)      # green: always 10
    _simple_code_1(w, 10)      # red
    _simple_code_1(w, 10)      # blue
    _simple_code_2(w, 0, 255)  # alpha: 255 for p0, 0 for the deltas
    _simple_code_1(w, 0)       # distance (unused)
    # palette pixels consume only alpha bits (other codes are 0-bit):
    # canonical two-symbol code: sym0 -> '0', sym255 -> '1'
    w.write(1, 1)              # p0 alpha = 255
    w.write(0, 1)              # d1 alpha = 0
    w.write(0, 1)              # d2 alpha = 0
    w.write(0, 1)              # no more transforms
    # level0 continues: cache bit, entropy-image bit
    w.write(0, 1)
    w.write(0, 1)
    # main packed image: 2x1 "pixels" whose green bundles 4 2-bit
    # indices: want indices [0,1,2,0, 1,0] -> byte0 = 0|1<<2|2<<4|0<<6
    # = 36; byte1 = 1|0<<2 = 1
    _simple_code_2(w, 36, 1)   # green
    _simple_code_1(w, 0)       # red
    _simple_code_1(w, 0)       # blue
    _simple_code_1(w, 255)     # alpha
    _simple_code_1(w, 0)       # distance
    w.write(1, 1)              # green '1' -> ... canonical: sym1 -> '0',
    # sym36 -> '1' (symbol order!), so byte0=36 needs '1', byte1=1 '0'
    w.write(0, 1)
    out = webp_decode(_container(w))
    assert out.shape == (1, 6, 4)
    assert out[0, :, 0].tolist() == [10, 20, 30, 10, 20, 10]
    assert out[0, :, 1].tolist() == [10, 20, 30, 10, 20, 10]
    assert out[0, :, 3].tolist() == [255] * 6


def test_hand_built_predictor_mode_T():
    # 2x2, predictor transform with one block, mode 2 (T = top).
    # residuals: row0 raw-ish (top row predicts from L after (0,0)=black)
    w = _LsbBitWriter()
    _header(w, 2, 2)
    w.write(1, 1)
    w.write(0, 2)          # PREDICTOR
    w.write(4 - 2, 3)      # size_bits = 4 → one 16x16 block
    # sub-image 1x1: mode in GREEN channel = 2
    w.write(0, 1)          # sub: no cache
    _simple_code_1(w, 2)   # green = mode 2
    _simple_code_1(w, 0)   # red
    _simple_code_1(w, 0)   # blue
    _simple_code_1(w, 255) # alpha (ignored)
    _simple_code_1(w, 0)   # distance
    w.write(0, 1)          # no more transforms
    w.write(0, 1)          # no cache
    w.write(0, 1)          # no entropy image
    # residual pixels (ARGB): want final G plane [[5, 9], [12, 14]]
    # (0,0): pred black (A=255,RGB=0) → res G=5, A must add to 255 → 0
    # (0,1): y==0 → pred = left = (255,?,5,?) → res G = 9-5 = 4
    # (1,0): x==0 → pred = top → res G = 12-5 = 7
    # (1,1): mode 2 → pred = T = out[0,1] G=9 → res G = 14-9 = 5
    # greens: [5, 4, 7, 5] — symbols {5:2 times, 4, 7}
    # use code-length path: lengths 5→1, 4→2, 7→2
    w.write(0, 1)
    w.write(19 - 4, 4)
    cl = {0: 1, 1: 2, 2: 2}
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]
    for sym in order:
        w.write(cl.get(sym, 0), 3)
    def put_bits_msb(code, ln):
        for i in range(ln - 1, -1, -1):
            w.write((code >> i) & 1, 1)
    cl_codes = {0: (0, 1), 1: (0b10, 2), 2: (0b11, 2)}
    w.write(1, 1)
    need = 8 - 2  # lengths up to symbol 7
    w.write(1, 3)  # slot 1 → 4 bits
    w.write(need, 4)
    seq = [0, 0, 0, 0, 2, 1, 0, 2]  # sym4 len2, sym5 len1, sym7 len2
    for s in seq:
        c, ln = cl_codes[s]
        put_bits_msb(c, ln)
    # canonical: sym5 len1 → '0'; sym4 len2 → '10'; sym7 len2 → '11'
    _simple_code_1(w, 0)    # red residuals all 0
    _simple_code_1(w, 0)    # blue
    _simple_code_2(w, 0, 255)  # alpha residuals: first 0? (0,0) needs
    # A: res + pred_black(255) = 255 → res 0; others pred A=255 → res 0
    # → single symbol 0 suffices; keep two-symbol to exercise the code
    _simple_code_1(w, 0)    # distance
    # pixels: G residuals 5,4,7,5; alpha '0' each (sym0)
    put_bits_msb(0, 1)      # G=5
    put_bits_msb(0, 1)      # alpha 0
    put_bits_msb(0b10, 2)   # G=4
    put_bits_msb(0, 1)
    put_bits_msb(0b11, 2)   # G=7
    put_bits_msb(0, 1)
    put_bits_msb(0, 1)      # G=5
    put_bits_msb(0, 1)
    out = webp_decode(_container(w))
    assert out[:, :, 1].tolist() == [[5, 9], [12, 14]]
    assert out[:, :, 3].tolist() == [[255, 255], [255, 255]]


def test_encode_color_cache_roundtrip_and_shrink():
    """r11 (VERDICT r10 #6): the encoder now EMITS the color cache the
    decoder has handled since r9. Palette-heavy images must round-trip
    bit-exact through the REAL decoder AND come out measurably smaller
    than the cache-off stream on the transform-free path (with
    transforms the COLOR_INDEXING strategy dominates palette content
    and the cache auto-disables on the single-varying-channel index
    stream — the exact-dominance rule); high-entropy streams
    auto-disable the cache (no size regression anywhere)."""
    import numpy as np

    import storage_spark.functions.webpcodec as wc

    yy, xx = np.mgrid[0:64, 0:64]
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0],
         [0, 255, 255], [255, 0, 255], [30, 60, 90], [200, 100, 50]],
        np.uint8,
    )
    img = pal[(xx * 7 + yy * 13) % 8]          # 8-color non-adjacent tiling
    grad = np.stack(
        [(xx * 3 + yy * 5) % 256, (xx * 7) % 256, (yy * 11) % 256], axis=2
    ).astype(np.uint8)

    orig = wc._encode_stream

    def no_cache(w, words, level0, cache_bits=None):
        return orig(w, words, level0, cache_bits=0)

    try:
        for im in (img, grad):
            for tr in (True, False):
                b = wc.webp_encode(im, use_transforms=tr)
                out = wc.webp_decode(b)
                assert np.array_equal(out[:, :, :3], im)
                assert (out[:, :, 3] == 255).all()
                wc._encode_stream = no_cache
                b0 = wc.webp_encode(im, use_transforms=tr)
                wc._encode_stream = orig
                assert np.array_equal(wc.webp_decode(b0)[:, :, :3], im)
                if im is img and not tr:
                    # measured r11: 0.75x on the transform-free palette
                    # tiling (with transforms the palette strategy wins
                    # in BOTH arms, so the ratio is 1.0 by design)
                    assert len(b) < 0.85 * len(b0), (tr, len(b), len(b0))
                else:
                    assert len(b) <= len(b0)
    finally:
        wc._encode_stream = orig


def test_encode_color_cache_eviction_chain_replays():
    """Hash-slot evictions must replay identically in the decoder: more
    distinct colors than cache slots forces insert/evict/re-insert
    chains (cache_bits is auto-capped, distinct=48 -> 7 bits here, so
    collisions are possible but the state machines must agree
    regardless)."""
    import numpy as np

    from storage_spark.functions.webpcodec import webp_decode, webp_encode

    yy, xx = np.mgrid[0:32, 0:48]
    # 48 distinct colors cycling with stride 5 — revisits after evictions
    idx = (xx * 5 + yy * 11) % 48
    img = np.stack(
        [(idx * 37) % 256, (idx * 91 + 13) % 256, (idx * 53 + 201) % 256],
        axis=2,
    ).astype(np.uint8)
    for tr in (True, False):
        out = webp_decode(webp_encode(img, use_transforms=tr))
        assert np.array_equal(out[:, :, :3], img)


def test_encode_color_indexing_roundtrip_bundling_and_shrink():
    """r11: the encoder emits the COLOR_INDEXING transform the decoder
    has handled since the hand-built fixture — delta-coded palette,
    green-channel indices, sub-byte bundling at <=16 colors. Every
    palette class round-trips through the real decoder, odd widths
    exercise the bundling tail pad, and the palette stream must beat
    the predictor stream on palette content (the encoder picks the
    smaller payload, so the all-strategy floor only goes down)."""
    import numpy as np

    from storage_spark.functions.webpcodec import webp_decode, webp_encode

    yy, xx = np.mgrid[0:64, 0:64]
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0],
         [0, 255, 255], [255, 0, 255], [30, 60, 90], [200, 100, 50]],
        np.uint8,
    )
    cases = {
        # (image, max expected size) — measured r11: 162/390/960/1016
        "pal2": (np.where(((xx + yy) % 2)[:, :, None].astype(bool),
                          np.array([255, 255, 255], np.uint8),
                          np.array([0, 0, 0], np.uint8)), 400),
        "pal3": (pal[:3][(xx * 5 + yy) % 3], 700),
        "pal8": (pal[(xx * 7 + yy * 13) % 8], 1400),
        "pal8_odd_width": (pal[(xx * 7 + yy * 13) % 8][:, :61], 1500),
    }
    for name, (img, cap) in cases.items():
        b = webp_encode(img)
        out = webp_decode(b)
        assert np.array_equal(out[:, :, :3], img), name
        assert (out[:, :, 3] == 255).all(), name
        assert len(b) <= cap, (name, len(b))
    # the r10 predictor-only stream for pal8 measured 3,766 bytes; the
    # palette stream must land far under it
    assert len(webp_encode(pal[(xx * 7 + yy * 13) % 8])) < 1500


def test_encode_palette_with_alpha_and_256_colors():
    import numpy as np

    from storage_spark.functions.webpcodec import webp_decode, webp_encode

    # RGBA palette (distinct alphas count as distinct colors)
    yy, xx = np.mgrid[0:16, 0:16]
    img = np.zeros((16, 16, 4), np.uint8)
    img[:, :, 0] = ((xx * 37) % 4) * 80
    img[:, :, 3] = np.where((xx + yy) % 2 == 0, 255, 128)
    assert np.array_equal(webp_decode(webp_encode(img)), img)

    # exactly 256 colors: width_bits=0, one index byte per pixel
    v = (xx * 16 + yy).astype(np.uint8)  # 256 distinct
    img256 = np.stack([v, (v * 7) % 256, (v * 13) % 256], axis=2).astype(np.uint8)
    out = webp_decode(webp_encode(img256))
    assert np.array_equal(out[:, :, :3], img256)
