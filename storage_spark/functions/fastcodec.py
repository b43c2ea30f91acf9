"""Optional accelerated pixel codec — PIL when importable, pure-Python
always available.

The engine's codecs (``functions.imagecodec`` / ``functions.webpcodec``)
are dependency-free by design: every decode is replayable under the
DuckDB oracle and runs anywhere. That buys correctness, not throughput —
pure-Python entropy decode is the measured envelope (~600-1,100 img/s on
32 cores for small images; per-format MB/s in COVERAGE.md §media). At
100 TB of images the decode stage needs a native codec, and the stage
shape (Arrow ``mapInPandas``, a ``codec(bytes, w, h, resize, quality) →
bytes`` callable) is exactly what a native codec inherits — this module
is that dispatch.

Contract of the accelerated path: SAME formats (PNG / JPEG / GIF /
lossless WebP), SAME resize-mode geometry (fill / cover / contain target
dimensions computed with the identical rounding), format preserved
in/out. NOT bitwise-equal pixels — PIL's resampling and encoders differ
from the pure path's deterministic nearest/fixed-table choices, so
oracle-graded rows always run the pure codec; parity is at the
metadata/geometry level (asserted in tests via an injected fake
provider, since this container ships no codec library).

Selection: ``select_pixel_codec()`` honors the
``STORAGE_SPARK_FAST_CODECS=1`` environment flag when PIL imports;
explicit ``accelerated=True`` without PIL raises loudly rather than
silently degrading.
"""

from __future__ import annotations

import io
import os
from typing import Callable


def pil_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _target_geometry(
    mode: str, w0: int, h0: int, width: int, height: int
) -> tuple[int, int, tuple[int, int, int, int] | None]:
    """(resize_w, resize_h, crop_box) with the SAME rounding as
    ``imagecodec.resize_image`` — geometry parity is the testable half
    of the accelerated contract."""
    if mode == "fill":
        return width, height, None
    if mode == "cover":
        scale = max(width / w0, height / h0)
        tw, th = max(1, round(w0 * scale)), max(1, round(h0 * scale))
        x0 = (tw - width) // 2
        y0 = (th - height) // 2
        return tw, th, (x0, y0, x0 + width, y0 + height)
    if mode == "contain":
        scale = min(width / w0, height / h0)
        return max(1, round(w0 * scale)), max(1, round(h0 * scale)), None
    raise ValueError(f"unknown resize mode {mode!r}")


def accelerated_pixel_codec(
    b: bytes,
    width: int,
    height: int,
    resize: str = "cover",
    quality: int = 90,
    image_module=None,
) -> bytes:
    """PIL-backed ``transform_images`` codec callable. ``image_module``
    injects a PIL.Image-compatible provider (tests use a fake built on
    the pure codecs; production leaves it None → real PIL)."""
    if image_module is None:
        try:
            from PIL import Image as image_module  # type: ignore
        except ImportError as e:
            raise RuntimeError(
                "accelerated codec requested but PIL is not importable; "
                "install Pillow or use the pure-Python default"
            ) from e
    img = image_module.open(io.BytesIO(bytes(b)))
    fmt = (img.format or "").upper()
    if fmt not in ("PNG", "JPEG", "GIF", "WEBP"):
        raise NotImplementedError(f"unsupported format {fmt!r}")
    img = img.convert("RGB" if fmt == "JPEG" else "RGBA")
    w0, h0 = img.size
    tw, th, crop = _target_geometry(resize, w0, h0, width, height)
    img = img.resize((tw, th))
    if crop is not None:
        img = img.crop(crop)
    buf = io.BytesIO()
    if fmt == "JPEG":
        img.save(buf, format="JPEG", quality=quality)
    elif fmt == "WEBP":
        img.save(buf, format="WEBP", lossless=True)  # VP8L-only contract
    else:
        img.save(buf, format=fmt)
    return buf.getvalue()


def select_pixel_codec(
    accelerated: bool | None = None,
) -> Callable[[bytes, int, int, str, int], bytes]:
    """The codec ``transform_images`` should run: the pure magic-
    dispatching codec by default; the PIL path when ``accelerated=True``
    (raises without PIL) or when ``accelerated=None`` and both the
    ``STORAGE_SPARK_FAST_CODECS=1`` flag is set and PIL imports."""
    from storage_spark.functions.imagecodec import image_pixel_codec

    if accelerated is None:
        accelerated = (
            os.environ.get("STORAGE_SPARK_FAST_CODECS") == "1"
            and pil_available()
        )
    if not accelerated:
        return image_pixel_codec
    if not pil_available():
        raise RuntimeError(
            "accelerated=True but PIL is not importable; install Pillow"
        )
    return accelerated_pixel_codec
