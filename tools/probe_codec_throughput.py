"""Measure the pure-Python codec envelope: per-format decode (and
encode) throughput in MB/s and items/s, single process. The Arrow
mapInPandas stages parallelize this across cores, so stage throughput
~= cores x these numbers. Records the envelope VERDICT r9 #6 asks for;
results go into COVERAGE.md §media."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from storage_spark.functions.imagecodec import (  # noqa: E402
    flac_decode,
    flac_encode,
    gif_decode,
    gif_encode,
    jpeg_decode,
    jpeg_encode,
    jpeg_encode_progressive,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)
from storage_spark.functions.webpcodec import webp_decode, webp_encode  # noqa: E402


def _time(fn, blobs, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for b in blobs:
            fn(b)
        best = min(best, time.perf_counter() - t0)
    total_bytes = sum(len(b) for b in blobs)
    return len(blobs) / best, total_bytes / best / 1e6


def main() -> None:
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.stack(
        [(xx * 5) % 256, (yy * 3) % 256, (xx + yy) % 256], axis=2
    ).astype(np.uint8)
    noisy = (img.astype(np.int16) + rng.integers(0, 24, img.shape)).astype(
        np.uint8
    )
    n_img = 40
    pcm = (
        np.sin(np.arange(48_000) * 0.05) * 12_000
    ).astype(np.int16)  # 1 s @ 48 kHz

    cases = {
        "png": ([png_encode(noisy)] * n_img, png_decode),
        "jpeg-baseline": (
            [jpeg_encode(noisy, quality=90, subsampling="420")] * n_img,
            jpeg_decode,
        ),
        "jpeg-progressive": (
            [jpeg_encode_progressive(noisy, quality=90)] * n_img,
            jpeg_decode,
        ),
        "gif": (
            [gif_encode([(noisy // 32) * 32])] * n_img,
            gif_decode,
        ),
        "webp-vp8l": ([webp_encode(noisy)] * n_img, webp_decode),
        "webp-vp8l-notransform": (
            [webp_encode(noisy, use_transforms=False)] * n_img,
            webp_decode,
        ),
        "wav-pcm16": ([wav_encode(pcm, 48_000)] * 10, wav_decode),
        "flac": ([flac_encode(pcm, 48_000)] * 10, flac_decode),
    }
    print(f"{'format':24s} {'items/s':>10s} {'MB/s':>8s} {'bytes/item':>10s}")
    for name, (blobs, dec) in cases.items():
        ips, mbs = _time(dec, blobs)
        print(f"{name:24s} {ips:10.1f} {mbs:8.2f} {len(blobs[0]):10d}")

    # encode side (one line each, informational)
    print("\nencode:")
    enc_cases = {
        "png": (noisy, png_encode),
        "jpeg-baseline": (noisy, lambda a: jpeg_encode(a, quality=90)),
        "webp-vp8l+transforms": (noisy, webp_encode),
        "flac": (pcm, lambda a: flac_encode(a, 48_000)),
    }
    for name, (src, enc) in enc_cases.items():
        t0 = time.perf_counter()
        for _ in range(10):
            out = enc(src)
        dt = (time.perf_counter() - t0) / 10
        print(f"{name:24s} {1 / dt:10.1f} items/s  out={len(out)} B")


if __name__ == "__main__":
    main()
