"""Accelerated-codec dispatch (functions.fastcodec): flag/selection
logic, geometry parity with the pure resize math, and the PIL glue
exercised through an injected fake provider built on the pure codecs
(this container ships no codec library — the glue must still be
tested, not just gated)."""

from __future__ import annotations

import io

import numpy as np
import pytest

from storage_spark.functions.fastcodec import (
    _target_geometry,
    accelerated_pixel_codec,
    pil_available,
    select_pixel_codec,
)
from storage_spark.functions.imagecodec import (
    image_pixel_codec,
    jpeg_decode,
    jpeg_encode,
    png_decode,
    png_encode,
    resize_image,
)
from storage_spark.operators.multimodal import parse_image_header


class _FakeImage:
    """PIL.Image-compatible shim delegating to the pure codecs: proves
    the glue's open/convert/resize/crop/save sequence is coherent."""

    def __init__(self, arr: np.ndarray, fmt: str):
        self._a = arr  # (h, w, 3|4) uint8 RGB(A)
        self.format = fmt

    @property
    def size(self):
        return self._a.shape[1], self._a.shape[0]

    def convert(self, mode: str):
        a = self._a
        if mode == "RGB":
            a = a[:, :, :3]
        elif mode == "RGBA" and a.shape[2] == 3:
            a = np.concatenate(
                [a, np.full(a.shape[:2] + (1,), 255, np.uint8)], axis=2
            )
        out = _FakeImage(a, self.format)
        return out

    def resize(self, wh):
        from storage_spark.functions.imagecodec import _resize_nearest

        return _FakeImage(_resize_nearest(self._a, wh[0], wh[1]), self.format)

    def crop(self, box):
        x0, y0, x1, y1 = box
        return _FakeImage(self._a[y0:y1, x0:x1], self.format)

    def save(self, buf, format=None, **kw):
        if format == "JPEG":
            buf.write(jpeg_encode(self._a[:, :, :3], quality=kw.get("quality", 90)))
        elif format == "PNG":
            buf.write(png_encode(self._a))
        else:
            raise AssertionError(f"fake provider: unexpected format {format}")


class _FakeImageModule:
    @staticmethod
    def open(fp):
        b = fp.read()
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            return _FakeImage(png_decode(b), "PNG")
        if b[:2] == b"\xff\xd8":
            return _FakeImage(jpeg_decode(b), "JPEG")
        raise AssertionError("fake provider: unknown magic")


def test_selection_defaults_to_pure_codec(monkeypatch):
    monkeypatch.delenv("STORAGE_SPARK_FAST_CODECS", raising=False)
    assert select_pixel_codec() is image_pixel_codec
    # flag set but PIL absent in this container → still the pure codec
    monkeypatch.setenv("STORAGE_SPARK_FAST_CODECS", "1")
    if not pil_available():
        assert select_pixel_codec() is image_pixel_codec
        with pytest.raises(RuntimeError):
            select_pixel_codec(accelerated=True)


def test_target_geometry_matches_pure_resize():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (30, 50, 4)).astype(np.uint8)
    for mode in ("fill", "cover", "contain"):
        for (tw, th) in [(16, 16), (64, 20), (7, 33)]:
            pure = resize_image(img, tw, th, mode)
            rw, rh, crop = _target_geometry(mode, 50, 30, tw, th)
            out_w = crop[2] - crop[0] if crop else rw
            out_h = crop[3] - crop[1] if crop else rh
            assert (pure.shape[1], pure.shape[0]) == (out_w, out_h), (
                mode, tw, th,
            )
    with pytest.raises(ValueError):
        _target_geometry("zoom", 1, 1, 1, 1)


def test_accelerated_glue_via_fake_provider_png():
    yy, xx = np.mgrid[0:24, 0:32]
    img = np.stack([(xx * 5) % 256, (yy * 3) % 256, (xx + yy) % 256],
                   axis=2).astype(np.uint8)
    b = png_encode(img)
    out = accelerated_pixel_codec(
        b, 16, 16, "cover", 90, image_module=_FakeImageModule
    )
    kind, w, h, _ = parse_image_header(out)
    assert (kind, w, h) == ("image/png", 16, 16)
    # the fake provider delegates to the pure nearest resize, so this
    # path is pixel-equal to the pure codec — full glue parity
    pure = image_pixel_codec(b, 16, 16, "cover", 90)
    # RGB-equal (the glue normalizes to RGBA; the pure path keeps the
    # source's 3 channels — alpha is constant 255 either way)
    assert np.array_equal(
        png_decode(out)[:, :, :3], png_decode(pure)[:, :, :3]
    )


def test_accelerated_glue_via_fake_provider_jpeg_contain():
    img = np.full((20, 40, 3), 130, np.uint8)
    b = jpeg_encode(img, quality=95, subsampling="444")
    out = accelerated_pixel_codec(
        b, 10, 10, "contain", 95, image_module=_FakeImageModule
    )
    kind, w, h, _ = parse_image_header(out)
    # contain keeps aspect: 40x20 into 10x10 → 10x5
    assert (kind, w, h) == ("image/jpeg", 10, 5)


def test_accelerated_without_pil_raises():
    if pil_available():
        pytest.skip("PIL present — the no-PIL error path is moot here")
    with pytest.raises(RuntimeError):
        accelerated_pixel_codec(b"\x89PNG\r\n\x1a\n" + b"x", 8, 8)
