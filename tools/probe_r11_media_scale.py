"""r11 probe (VERDICT r10 #7): scale behavior of the banded fingerprint
pair joins — the jl_refine_for discipline applied to media near-dup.

Generates N synthetic 64-bit fingerprints (xxhash64 of the key → 64-bit
two's-complement bit string — uniform, the WORST case for banding:
real image corpora cluster, so their bucket skew is higher but their
random-collision floor is lower), plants `n_planted` near-dup variants
at Hamming ≤ 3, and measures per (n_bands, max_hamming) setting:

- candidate volume (distinct band-join pairs BEFORE the Hamming gate —
  the number that prices the stage),
- wall for the full pairs computation,
- recall of the planted pairs.

Expected-candidate law for uniform bits: each band is a seg-bit value
(seg = ceil(64/n_bands)), so E[candidates] ≈ n_bands · C(N,2) / 2^seg.
Narrower bands (more bands → shorter segments) are exponentially more
collision-prone: (4, ≤3) has 16-bit bands (floor ~N²·2/2^16·2), while
(6, ≤5) has 11-bit bands — 32× the random-collision floor — and
(8, ≤7) 8-bit bands, 256×. The sizing rule this probe ships
(`multimodal.band_candidate_estimate`) makes that law available to a
planner before the shuffle happens.

Run: python tools/probe_r11_media_scale.py  (optionally N as argv[1])
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from storage_spark.operators.multimodal import dhash_near_pairs
    from storage_spark.session import get_spark

    spark = get_spark("probe_r11_media_scale", cpus=32)

    def fingerprints(n: int, n_planted: int):
        base = spark.range(n).select(
            F.col("id").cast("string").alias("key"),
            F.lpad(F.bin(F.xxhash64(F.col("id"))), 64, "0").alias("dhash"),
        )
        # planted variants: key 'p<i>' = fingerprint of key i with up to 3
        # bits flipped at deterministic positions (i%61, i%59+2, i%53+7 —
        # all < 64; positions may collide, which only LOWERS the planted
        # distance — hamming <= 3 is what matters)
        pl = spark.range(n_planted).select(
            F.concat(F.lit("p"), F.col("id").cast("string")).alias("key"),
            F.lpad(F.bin(F.xxhash64(F.col("id"))), 64, "0").alias("h"),
            (F.col("id") % 61).cast("int").alias("p0"),
            (F.col("id") % 59 + 2).cast("int").alias("p1"),
            (F.col("id") % 53 + 7).cast("int").alias("p2"),
        )
        flip_sql = (
            "concat(substring(h, 1, {p}), "
            "case when substring(h, {p} + 1, 1) = '0' then '1' else '0' end, "
            "substring(h, {p} + 2, 64 - {p} - 1))"
        )
        pl = pl.withColumn("h", F.expr(flip_sql.format(p="p0")))
        pl = pl.withColumn("h", F.expr(flip_sql.format(p="p1")))
        pl = pl.withColumn("h", F.expr(flip_sql.format(p="p2")))
        planted = pl.select("key", F.col("h").alias("dhash"))
        return base.unionByName(planted).localCheckpoint(eager=True)

    n_planted = 10_000
    # per-setting corpus sizes: the candidate floor grows 32x from
    # (4, ≤3) to (6, ≤5) and 256x to (8, ≤7), so the narrow settings
    # get smaller corpora — the law itself is what the probe verifies
    # (argv[1] overrides all three for smoke runs)
    settings = [(4, 3, 1_000_000), (6, 5, 200_000), (8, 7, 50_000)]
    if len(sys.argv) > 1:
        settings = [(b, h, int(sys.argv[1])) for b, h, _ in settings]

    fps_cache: dict[int, object] = {}
    for n_bands, max_h, n in settings:
        if n not in fps_cache:
            fps_cache[n] = fingerprints(n, n_planted)
        fps = fps_cache[n]
        print(f"--- N={n:,} (+{n_planted:,} planted)")
        seg = -(-64 // n_bands)
        exp_cand = n_bands * (n + n_planted) ** 2 / 2 / 2 ** seg
        # candidate volume: replicate the band join without the gate
        bands = fps.select(
            "key", "dhash",
            F.explode(F.array(*[
                F.concat(F.lit(f"{i}:"), F.substring("dhash", i * seg + 1, seg))
                for i in range(n_bands)
            ])).alias("band"),
        )
        a = bands.select(F.col("key").alias("key_a"), "band")
        b = bands.select(F.col("key").alias("key_b"), "band")
        t0 = time.time()
        cand = (
            a.join(b, "band").filter(F.col("key_a") < F.col("key_b"))
            .select("key_a", "key_b").distinct().count()
        )
        t_cand = time.time() - t0
        t0 = time.time()
        pairs = dhash_near_pairs(fps, max_hamming=max_h, n_bands=n_bands)
        found = pairs.filter(
            F.col("key_b") == F.concat(F.lit("p"), F.col("key_a"))
        ).count()
        t_pairs = time.time() - t0
        print(
            f"bands={n_bands} seg={seg} max_h={max_h}: "
            f"candidates={cand:,} (expected~{exp_cand:,.0f}) "
            f"cand_wall={t_cand:.1f}s full_pairs_wall={t_pairs:.1f}s "
            f"planted_recall={found}/{n_planted}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
