"""Round-7 sf1 probes (run ad hoc, results recorded in NOTES_r7.md):

1. MinHash banding defaults (VERDICT r6 #5a): candidate-pair and
   bucket-occupancy growth for the static (n_hashes=8, band_size=2)
   default vs the matched-threshold-0.5 family (24,3) and (64,4), at
   12.5k / 25k / 50k docs — is pair growth superlinear at r=2, and what
   does sharpening the S-curve cost in encode time?
2. interval_join bin_width (VERDICT r6 #5b): blow-up factor
   (exploded interval rows + bin-bucket join candidates) and wall for
   W in {60s, 10min, 1h default, derived-median} against a realistic
   skewed interval-length workload.
3. Keys-only LSH postings on FAT embeddings (VERDICT r6 #8): dim-768
   float32 random vectors (uncompressible) — measured index bytes and
   query wall, inline vs store_vectors=False, replacing the
   extrapolated 12kB-vs-32B claim with measured bytes.
4. pq_rerank bench bimodality (VERDICT r6 #4): per-trial walls of the
   exact bench entry shape to find which stage doubles on cold runs.

Usage: python tools/probe_r7.py [1|2|3|4 ...]  (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF1 = os.environ.get("SF1_DIR", "/tmp/sf1")


def get_spark():
    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.1f}s  ({out})", flush=True)
    return dt


def probe_minhash_banding(spark):
    from storage_spark.operators.dedup import (
        band_threshold,
        minhash_band_index,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{SF1}/documents.parquet").select(
        "doc_id", "text"
    )
    print("probe 1: minhash banding occupancy/blow-up at sf1", flush=True)
    for n_docs in (12_500, 25_000, 50_000):
        # sf1 doc_ids are SPARSE (0..905k over 50k rows): subset by rank
        sub = docs.orderBy("doc_id").limit(n_docs).localCheckpoint(eager=True)
        for n_hashes, band_size in ((8, 2), (24, 3), (64, 4)):
            t = band_threshold(n_hashes, band_size)
            bands = minhash_band_index(
                sub, n_hashes=n_hashes, band_size=band_size
            )
            occ = (
                bands.groupBy("band", "sig")
                .count()
                .agg(
                    F.max("count").alias("max_occ"),
                    F.expr("percentile_approx(count, 0.999)").alias("p999"),
                    F.sum(
                        F.col("count") * (F.col("count") - 1) / 2
                    ).cast("bigint").alias("join_work"),
                )
                .first()
            )
            t0 = time.time()
            pairs = minhash_lsh_pairs(
                sub, n_hashes=n_hashes, band_size=band_size
            ).count()
            wall = time.time() - t0
            print(
                f"  N={n_docs} ({n_hashes},{band_size}) t={t:.2f}: "
                f"pairs={pairs} max_occ={occ['max_occ']} "
                f"p999={occ['p999']} join_work={occ['join_work']} "
                f"wall={wall:.1f}s",
                flush=True,
            )


def probe_interval_binwidth(spark):
    from storage_spark.operators.temporal import interval_join

    print("probe 2: interval_join bin_width blow-up at sf1", flush=True)
    ev = spark.read.parquet(f"{SF1}/events.parquet").select(
        # sf1 events ship TIMESTAMP_NTZ (TESTDATA gotcha) — cast first
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t"),
        "event_id", "user_id",
    ).localCheckpoint(eager=True)
    # realistic skewed interval lengths: per-user activity windows —
    # first/last event of each (user, day) slice; lengths span seconds
    # to ~a day (the honest mixed workload a fixed W mis-sizes)
    ivs = (
        ev.groupBy("user_id", F.floor(F.col("t") / 86_400_000).alias("d"))
        .agg(F.min("t").alias("s"), F.max("t").alias("e"))
        .filter(F.col("e") > F.col("s"))
        .localCheckpoint(eager=True)
    )
    stats = ivs.agg(
        F.count("*"),
        F.expr("percentile_approx(e - s, 0.5)"),
        F.avg("e" ) - F.avg("s"),
        F.max("e") - F.min("s"),
    ).first()
    n_iv, med_len = stats[0], int(stats[1])
    print(
        f"  intervals={n_iv} median_len={med_len}ms "
        f"mean_len={float(stats[2]):.0f}ms span={int(stats[3])}ms",
        flush=True,
    )
    for label, w in (
        ("60s", 60_000),
        ("10min", 600_000),
        ("1h-default", 3_600_000),
        ("median-derived", max(1, med_len)),
    ):
        exploded = ivs.select(
            (F.floor(F.col("e") / w) - F.floor(F.col("s") / w) + 1).alias("k")
        ).agg(F.sum("k")).first()[0]
        # bin-bucket join candidates = sum over bins of pts_in_bin *
        # ivs_covering_bin (cheap aggregate replay of the join shape)
        p_b = ev.groupBy(F.floor(F.col("t") / w).alias("b")).count()
        i_b = (
            ivs.select(
                F.explode(
                    F.sequence(
                        F.floor(F.col("s") / w), F.floor(F.col("e") / w)
                    )
                ).alias("b")
            )
            .groupBy("b")
            .count()
            .withColumnRenamed("count", "ic")
        )
        cand = (
            p_b.join(i_b, "b")
            .agg(F.sum(F.col("count") * F.col("ic")))
            .first()[0]
        )
        t0 = time.time()
        n = interval_join(
            ev, ivs, "t", "s", "e", on="user_id", bin_width=w
        ).count()
        wall = time.time() - t0
        print(
            f"  W={label}: exploded_iv_rows={exploded} "
            f"join_candidates(unkeyed)={cand} out_rows={n} wall={wall:.1f}s",
            flush=True,
        )


def probe_keysonly_fat(spark):
    import shutil
    import subprocess
    import tempfile

    from storage_spark.sources.annindex import (
        ann_index_search,
        build_ann_index,
    )

    print("probe 3: keys-only postings, dim-768 float32 random", flush=True)
    dim, n_vec = 768, 20_000
    # deterministic pseudo-random floats in [-1, 1): uncompressible, the
    # honest fat-embedding stand-in (sf1 embeddings are dim-64)
    v = (
        spark.range(n_vec)
        .select(
            F.col("id").cast("string").alias("key"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(2_000_000))
                    / 1_000_000.0
                    - 1.0
                ).cast("float"),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    qs = v.filter(F.col("key").cast("bigint") < 50).select(
        F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
    )
    base = tempfile.mkdtemp(prefix="probe_fat_")
    try:
        for mode, store in (("inline", True), ("keys-only", False)):
            path = os.path.join(base, mode)
            t0 = time.time()
            build_ann_index(
                v, path, kind="lsh", dim=dim, n_planes=9, n_tables=4,
                store_vectors=store, n_vectors=n_vec,
            )
            bt = time.time() - t0
            du = {
                d: int(
                    subprocess.run(
                        ["du", "-sb", os.path.join(path, d)],
                        capture_output=True, text=True,
                    ).stdout.split()[0]
                )
                for d in os.listdir(path)
                if os.path.isdir(os.path.join(path, d))
            }
            t0 = time.time()
            n = ann_index_search(
                spark, path, qs, k=10, probe_radius=1
            ).count()
            qt = time.time() - t0
            t0 = time.time()
            n = ann_index_search(
                spark, path, qs, k=10, probe_radius=1
            ).count()
            qt2 = time.time() - t0
            t0 = time.time()
            ann_index_search(
                spark, path, qs, k=10, probe_radius=1, arrow=True
            ).count()
            qa = time.time() - t0
            t0 = time.time()
            ann_index_search(
                spark, path, qs, k=10, probe_radius=1, arrow=True
            ).count()
            qa2 = time.time() - t0
            print(
                f"  {mode}: build={bt:.1f}s bytes={du} "
                f"query={qt:.1f}s/{qt2:.1f}s "
                f"arrow={qa:.1f}s/{qa2:.1f}s rows={n}",
                flush=True,
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def probe_pq_bimodal(spark):
    from storage_spark.functions.vectors import (
        pq_codebooks,
        pq_encode,
        pq_search_rerank,
    )

    print("probe 4: pq_rerank per-trial walls (bench shape, sf0.1)", flush=True)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    vectors = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        F.col("vec_id").cast("string").alias("key"), "embedding"
    )
    books = pq_codebooks(64, 8, 16)
    codes = pq_encode(vectors, books).localCheckpoint(eager=True)
    queries_df = (
        vectors.orderBy("key")
        .limit(50)
        .select(F.col("key").alias("q_key"), F.col("embedding").alias("q_vec"))
    )
    walls = []
    for i in range(6):
        t0 = time.time()
        pq_search_rerank(
            queries_df, codes, vectors, books, k=10,
            refine_factor=20, arrow=True,
        ).count()
        walls.append(round(time.time() - t0, 2))
        spark._jvm.System.gc()
        time.sleep(0.5)
    print(f"  trials: {walls}", flush=True)


def probe_derived_geometry_sf1(spark):
    """VERDICT r6 #1 done-criterion: measured sf1 before/after for the
    ANN index default path — old static geometry vs the corpus-derived
    one at 20k vectors, query wall AND recall vs brute force."""
    import shutil
    import tempfile

    from storage_spark.functions.vectors import knn_join
    from storage_spark.sources.annindex import (
        ann_index_search,
        build_ann_index,
        ivf_probe_for,
    )

    print("probe 5: static vs derived index geometry at sf1 (20k vectors)",
          flush=True)
    v = (
        spark.read.parquet(f"{SF1}/embeddings.parquet")
        .select(F.col("vec_id").cast("string").alias("key"), "embedding")
        .localCheckpoint(eager=True)
    )
    qs = v.filter(F.col("key").cast("bigint") < 50).select(
        F.col("key").alias("q_key"), F.col("embedding").alias("q_vec")
    ).localCheckpoint(eager=True)
    truth = {
        (r["q_key"], r["key"])
        for r in knn_join(qs, v, k=10).select("q_key", "key").collect()
    }
    base = tempfile.mkdtemp(prefix="probe_geo_")

    def run(tag, build_kw, search_kw):
        path = f"{base}/{tag}"
        t0 = time.time()
        cfg = build_ann_index(v, path, **build_kw)
        bt = time.time() - t0
        for _ in range(2):  # second run = steady state
            t0 = time.time()
            got = ann_index_search(spark, path, qs, k=10, **search_kw)
            rows = got.select("q_key", "key").collect()
            qt = time.time() - t0
        rec = len({(r["q_key"], r["key"]) for r in rows} & truth) / len(truth)
        geo = {k: cfg.get(k) for k in
               ("n_planes", "n_tables", "n_cells", "suggested_n_probe")
               if cfg.get(k) is not None}
        print(f"  {tag}: {geo} build={bt:.1f}s query={qt:.1f}s "
              f"recall@10={rec:.3f}", flush=True)

    try:
        run("lsh-static-r6", dict(kind="lsh", dim=64, n_planes=8, n_tables=1),
            dict(probe_radius=1))
        run("lsh-derived", dict(kind="lsh", dim=64), dict(probe_radius=1))
        run("ivf-static-r6",
            dict(kind="ivf", dim=64, n_cells=16, kmeans_iterations=2),
            dict(n_probe=2))
        run("ivf-derived", dict(kind="ivf", dim=64, kmeans_iterations=2),
            dict())  # n_probe=None -> suggested_n_probe
    finally:
        shutil.rmtree(base, ignore_errors=True)


def probe_lsh_cliff_1m(spark):
    """The LSH static-default cliff at the scale AND regime it bites: 1M
    dim-64 vectors, 2000 planted-neighbor queries (each query = an
    indexed vector, lightly perturbed — true neighbor known by
    construction, no brute-force truth needed). The per-QUERY cost is
    probes x tables x bucket-size distance evals, so static (8,1)
    buckets of n/256 ≈ 3.9k vectors mean ~35k candidates/query — at
    2000 queries that is ~70M distance evals vs the derived geometry's
    ~4M. The 20-query variant of this probe is scan-dominated and shows
    the OPPOSITE ordering — recorded in NOTES_r7 as the honest regime
    boundary (indexes amortize over many queries; that is why they
    exist)."""
    import shutil
    import tempfile

    from storage_spark.sources.annindex import (
        ann_index_search,
        build_ann_index,
        lsh_planes_for,
        lsh_tables_for,
    )

    print("probe 6: lsh static-vs-derived, 1M vectors dim 64, 2000 planted "
          "queries", flush=True)
    dim, n_vec, n_q = 64, 1_000_000, 200
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id"), i), F.lit(2_000_000))
            / 1_000_000.0
            - 1.0
        ).cast("float"),
    )
    v = (
        spark.range(n_vec)
        .select(F.col("id").cast("string").alias("key"), emb.alias("embedding"))
        .localCheckpoint(eager=True)
    )
    # planted queries: indexed vector i nudged by +2% on coordinate 0 —
    # cosine-near its source, so the source IS the expected hit
    # query ids offset from the source ids: the ranker excludes
    # key == q_key (self-search convention), so the planted hit must
    # carry a DIFFERENT id than its source vector
    qs = (
        spark.range(n_q)
        .select(
            (F.col("id") + 10_000_000).cast("string").alias("q_key"),
            F.transform(
                emb, lambda x, i: F.when(i == 0, x + F.lit(0.02)).otherwise(x)
            ).alias("q_vec"),
        )
        .localCheckpoint(eager=True)
    )
    p = lsh_planes_for(n_vec)
    base = tempfile.mkdtemp(prefix="probe_cliff_")
    try:
        for tag, planes, tables in (
            ("static-r6", 8, 1),
            ("derived", p, lsh_tables_for(p)),
        ):
            path = f"{base}/{tag}"
            t0 = time.time()
            build_ann_index(
                v, path, kind="lsh", dim=dim, n_planes=planes,
                n_tables=tables, n_vectors=n_vec,
            )
            bt = time.time() - t0
            t0 = time.time()
            rows = ann_index_search(
                spark, path, qs, k=10, probe_radius=1
            ).select("q_key", "key").collect()
            qt = time.time() - t0
            hits = {
                r["q_key"]
                for r in rows
                if int(r["q_key"]) - 10_000_000 == int(r["key"])
            }
            print(
                f"  {tag} ({planes},{tables}): build={bt:.1f}s "
                f"query({n_q})={qt:.1f}s planted-recall={len(hits) / n_q:.3f}",
                flush=True,
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def probe_pq_sampled_training(spark):
    """PQ codebook training cost, sampled (default, k x 256 = 4096 rows)
    vs full-corpus, at 500k dim-64 vectors / m=8 / k=16 / 2 Lloyd rounds
    — the same shape as the r7 IVF quantizer measurement. Also records
    the resulting codebooks' quantization MSE over a fixed 20k-row
    holdout so the speedup is shown NOT to cost quality."""
    print("probe 7: pq sampled-vs-full training, 500k vectors dim 64", flush=True)
    from storage_spark.functions.vectors import pq_codebooks, pq_codebooks_kmeans

    dim, n_vec = 64, 500_000
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id"), i), F.lit(2_000_000))
            / 1_000_000.0
            - 1.0
        ).cast("float"),
    )
    v = (
        spark.range(n_vec)
        .select(F.col("id").cast("string").alias("key"), emb.alias("embedding"))
        .localCheckpoint(eager=True)
    )
    holdout = v.limit(20_000).localCheckpoint(eager=True)

    import importlib

    tv = importlib.import_module("tests.test_vectors")
    results = {}
    for tag, sample in (("sampled-256/code", 256), ("full", None)):
        t0 = time.time()
        books = pq_codebooks_kmeans(
            v, m=8, k=16, iterations=2, dim=dim, train_sample_per_code=sample
        )
        dt = time.time() - t0
        mse = tv._pq_mean_sq_error(holdout, books)
        results[tag] = (dt, mse)
        print(f"  {tag}: train={dt:.1f}s holdout-mse={mse:.5f}", flush=True)
    base_mse = tv._pq_mean_sq_error(holdout, pq_codebooks(dim, 8, 16))
    print(f"  unrefined deterministic books: holdout-mse={base_mse:.5f}", flush=True)


def probe_sq8_sf1(spark):
    """SQ8 tier at sf1 (20k dim-64 embeddings): index bytes on disk
    (codes vs pq codes vs raw vectors), recall@10 of the RAW
    reconstruction ranking (no rerank) vs brute force over 50 real
    queries, and steady-state query wall for sq8 vs pq at the same
    shape — grounding the 'reconstructions rank near-exactly' claim
    with measured recall."""
    import shutil
    import tempfile

    from storage_spark.functions.vectors import knn_join
    from storage_spark.sources.annindex import ann_index_search, build_ann_index

    print("probe 8: sq8 at sf1 (20k vectors dim 64)", flush=True)
    v = (
        spark.read.parquet(f"{SF1}/embeddings.parquet")
        .select(F.col("vec_id").cast("string").alias("key"), "embedding")
        .localCheckpoint(eager=True)
    )
    n = v.count()
    qs = (
        v.filter(F.col("key").cast("bigint") < 50)
        .select(F.col("key").alias("q_key"), F.col("embedding").alias("q_vec"))
        .localCheckpoint(eager=True)
    )
    exact = {
        (r.q_key, r.key)
        for r in knn_join(qs, v, k=10).select("q_key", "key").collect()
    }
    base = tempfile.mkdtemp(prefix="probe_sq8_")

    def _bytes(d):
        t = 0
        for root, _, files in os.walk(d):
            t += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return t

    try:
        for kind, kw, skw in (
            ("sq8", {}, dict(refine_factor=None)),
            ("pq", dict(kmeans_iterations=0), dict(refine_factor=None)),
        ):
            p = os.path.join(base, kind)
            t0 = time.time()
            build_ann_index(v, p, kind=kind, dim=64, n_vectors=n, **kw)
            bt = time.time() - t0
            cb = _bytes(os.path.join(p, "codes"))
            vb = _bytes(os.path.join(p, "vectors"))
            # steady state: run twice, report the second
            for _ in range(2):
                t0 = time.time()
                got = ann_index_search(spark, p, qs, k=10, **skw)
                hits = {
                    (r[0], r[1]) for r in got.select("q_key", "key").collect()
                }
                qt = time.time() - t0
            rec = len(hits & exact) / len(exact)
            print(
                f"  {kind}: build={bt:.1f}s codes={cb/1e6:.1f}MB "
                f"vectors={vb/1e6:.1f}MB raw-rank query={qt:.1f}s "
                f"recall@10(no rerank)={rec:.3f}",
                flush=True,
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


PROBES = {
    "1": probe_minhash_banding,
    "2": probe_interval_binwidth,
    "3": probe_keysonly_fat,
    "4": probe_pq_bimodal,
    "5": probe_derived_geometry_sf1,
    "6": probe_lsh_cliff_1m,
    "7": probe_pq_sampled_training,
    "8": probe_sq8_sf1,
}

if __name__ == "__main__":
    which = sys.argv[1:] or sorted(PROBES)
    spark = get_spark()
    for k in which:
        PROBES[k](spark)
