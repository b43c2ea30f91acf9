"""Planted-near-dup media recall probe (VERDICT r9 #8).

The r9 fingerprint driver rows are oracle-green on corpora whose pair
structure comes from the generation rule — this probe measures what the
oracle can't: do REAL near-duplicates (re-encoded / resized /
quality-shifted / codec-roundtripped copies) stay within the banded
join's Hamming threshold, and do unrelated items stay out?

For each fingerprint kind the reported-pair semantics replicate the
operators exactly: candidates from the 4-band pigeonhole equi-join,
verification at hamming <= 3. With equal-length fingerprints and 4
bands the pigeonhole makes candidate-recall 1.0 for hamming <= 3 by
construction, so the real question is the HAMMING DISTRIBUTION of
planted variants per transformation — the table this prints — and the
false-pair rate across bases.

Run: python tools/probe_r10_media_recall.py
"""

from __future__ import annotations

import sys
from collections import Counter

import numpy as np

sys.path.insert(0, ".")

from storage_spark.functions.imagecodec import (  # noqa: E402
    _resize_nearest,
    alaw_decode,
    alaw_encode,
    avi_encode_mjpeg,
    ima_adpcm_decode,
    ima_adpcm_encode,
    jpeg_encode,
    png_encode,
    ulaw_decode,
    ulaw_encode,
    wav_encode,
)
from storage_spark.operators.multimodal import (  # noqa: E402
    audio_fingerprint_bits,
    dhash_bits,
    video_fingerprint_bits,
)


def _ham(a: str, b: str) -> int:
    if len(a) != len(b):
        return 10**9  # different lengths never pair (band key embeds len)
    return sum(x != y for x, y in zip(a, b))


def _report(kind: str, fps: dict, planted: list, max_h: int = 3):
    """fps: key -> bits; planted: [(key_a, key_b, variant_name)]."""
    dist: dict[str, Counter] = {}
    hits = 0
    for a, b, v in planted:
        h = _ham(fps[a], fps[b])
        dist.setdefault(v, Counter())[min(h, 20)] += 1
        hits += h <= max_h
    keys = sorted(fps)
    planted_set = {(min(a, b), max(a, b)) for a, b, _ in planted}
    false_pairs = 0
    total_cross = 0
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            if (a, b) in planted_set or a.split("/")[0] == b.split("/")[0]:
                continue  # same base → related by construction
            total_cross += 1
            false_pairs += _ham(fps[a], fps[b]) <= max_h
    print(f"\n== {kind}: planted recall @ hamming<={max_h}: "
          f"{hits}/{len(planted)} = {hits / len(planted):.3f}; "
          f"false pairs {false_pairs}/{total_cross} "
          f"= {false_pairs / max(1, total_cross):.4f}")
    for v in sorted(dist):
        c = dist[v]
        line = " ".join(f"h={h}:{n}" for h, n in sorted(c.items()))
        rec = sum(n for h, n in c.items() if h <= max_h) / sum(c.values())
        print(f"   {v:28s} recall={rec:.3f}  [{line}]")


def images(n_bases: int = 50):
    fps: dict[str, str] = {}
    planted = []
    for k in range(n_bases):
        yy, xx = np.mgrid[0:48, 0:48]
        # structured, base-specific content: rotated gradient + sinusoid
        # + a block — NOT invariant under the transformations below
        ang = k * 0.13
        g = (xx * np.cos(ang) + yy * np.sin(ang)) * (3 + k % 5)
        s = 40 * np.sin(xx / (2 + k % 7)) + 40 * np.cos(yy / (2 + (k * 3) % 6))
        img = np.stack([(g + s) % 256, (g * 2 + 31 * (k % 8)) % 256,
                        (s * 2 + k) % 256], axis=2).astype(np.uint8)
        img[8 + k % 16: 20 + k % 16, 5 + k % 20: 17 + k % 20] = (
            (k * 37) % 256
        )
        base_key = f"{k}/base"
        fps[base_key] = dhash_bits(png_encode(img))
        # exact 3/4 area resample (what real resizers approximate):
        # upsample x3 by repeat, box-average 4x4 blocks — 48 -> 36
        up = np.repeat(np.repeat(img.astype(np.int64), 3, 0), 3, 1)
        area36 = (
            up.reshape(36, 4, 36, 4, 3).sum(axis=(1, 3)) // 16
        ).astype(np.uint8)
        variants = {
            "jpeg-q75": jpeg_encode(img, quality=75, subsampling="420"),
            "jpeg-q90": jpeg_encode(img, quality=90, subsampling="444"),
            "resize-nearest-75pct": png_encode(_resize_nearest(img, 36, 36)),
            "resize-area-75pct": png_encode(area36),
            "brightness+12": png_encode(
                np.clip(img.astype(np.int16) + 12, 0, 255).astype(np.uint8)
            ),
        }
        for v, b in variants.items():
            key = f"{k}/{v}"
            fps[key] = dhash_bits(b)
            planted.append((base_key, key, v))
    _report("image dHash (64-bit), default (4 bands, <=3)", fps, planted)
    # the resize-robust setting the distribution demands: 6 bands, <=5
    _report("image dHash (64-bit), resize-robust (6 bands, <=5)",
            fps, planted, max_h=5)


def audio(n_bases: int = 40):
    fps: dict[str, str] = {}
    planted = []
    t = np.arange(16_384)
    for k in range(n_bases):
        f1, f2 = 0.01 + 0.002 * (k % 9), 0.07 + 0.003 * (k % 7)
        env = 0.4 + 0.6 * np.abs(np.sin(t * (0.0007 + 0.0001 * (k % 11))))
        # stay inside the 13/14-bit G.711 domains so the roundtrips are
        # quantization, not clipping
        x = (
            (np.sin(t * f1) * 5000 + np.sin(t * f2) * 2500) * env
        ).astype(np.int16)
        base_key = f"{k}/base"
        fps[base_key] = audio_fingerprint_bits(wav_encode(x, 16_000))
        variants = {
            "ulaw-roundtrip": ulaw_decode(ulaw_encode(x)),
            "alaw-roundtrip": alaw_decode(alaw_encode(x)),
            "adpcm-roundtrip": ima_adpcm_decode(
                ima_adpcm_encode(x), len(x)
            ),
            "gain-0.9x": (x * 0.9).astype(np.int16),
        }
        for v, y in variants.items():
            key = f"{k}/{v}"
            fps[key] = audio_fingerprint_bits(
                wav_encode(np.asarray(y, np.int16), 16_000)
            )
            planted.append((base_key, key, v))
    _report("audio energy-gradient (32-bit)", fps, planted)


def video(n_bases: int = 30):
    fps: dict[str, str] = {}
    planted = []
    for k in range(n_bases):
        vals = [
            int((np.sin(f * (0.3 + 0.04 * (k % 13))) * 90
                 + f * (k % 5) * 3 + k * 17) % 256)
            for f in range(17)
        ]

        def clip_bytes(vv, q):
            frames = [
                jpeg_encode(np.full((16, 16, 3), v, np.uint8),
                            quality=q, subsampling="444")
                for v in vv
            ]
            return avi_encode_mjpeg(frames, 16, 16, fps=8)

        base_key = f"{k}/base"
        fps[base_key] = video_fingerprint_bits(clip_bytes(vals, 95))
        variants = {
            "reencode-q85": clip_bytes(vals, 85),
            "reencode-q70": clip_bytes(vals, 70),
            "jitter+2": clip_bytes([(v + 2) % 256 for v in vals], 95),
            "one-frame-bump": clip_bytes(
                [v if f != 8 else (v + 60) % 256 for f, v in enumerate(vals)],
                95,
            ),
        }
        for v, b in variants.items():
            key = f"{k}/{v}"
            fps[key] = video_fingerprint_bits(b)
            planted.append((base_key, key, v))
    _report("video temporal-envelope (16-bit)", fps, planted)


if __name__ == "__main__":
    images()
    audio()
    video()
