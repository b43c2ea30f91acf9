"""Round-9 probes (run ad hoc, results recorded in NOTES_r9.md):

1. jl_lsh at real scale (VERDICT r8 #8): the r8 dim-768 pair was
   measured at 4,096 rows; this runs the r7-style 1M-vector probe on a
   CLUSTERED corpus (1,024 planted centers + 0.15 noise — the corpus
   shape where recall is measurable) — build wall, index bytes, query
   wall (3 reps), and recall@10 vs exact, for kind='jl_lsh' (arrow
   encode) vs kind='lsh' store_vectors=False at dim 768.

Usage: python tools/probe_r9.py [n_vectors]  (default 1_000_000)
"""

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DIM = 768
N_CENTERS = 1024
NOISE = 0.15
N_QUERIES = 50
K = 10


def get_spark():
    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def make_clustered(spark, n, path):
    """Deterministic clustered corpus: key i -> center (i % N_CENTERS) +
    per-coordinate noise, all seeded off (i, coord) so any run rebuilds
    the identical table."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((N_CENTERS, DIM)).astype(np.float32)
    bc = spark.sparkContext.broadcast(centers)

    def gen(batches):
        cs = bc.value
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            g = np.random.default_rng(ids[0] + 1)
            noise = g.standard_normal((len(ids), DIM)).astype(np.float32) * NOISE
            vecs = cs[ids % N_CENTERS] + noise
            yield pd.DataFrame(
                {"key": ids.astype(str), "embedding": list(vecs)}
            )

    df = spark.range(0, n, 1, 128).mapInPandas(
        gen, "key string, embedding array<float>"
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def du_mb(path):
    out = subprocess.run(["du", "-sb", path], capture_output=True, text=True)
    return round(int(out.stdout.split()[0]) / 1e6, 1)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark()
    from storage_spark.sources.annindex import ann_index_search, build_ann_index

    base = f"/tmp/probe_r9_{os.getpid()}"
    os.makedirs(base, exist_ok=True)
    print(f"probe 1: jl_lsh vs keys-only at n={n}, dim={DIM}", flush=True)
    t0 = time.time()
    corpus = make_clustered(spark, n, f"{base}/corpus.parquet")
    print(f"  corpus gen+write: {time.time()-t0:.1f}s", flush=True)

    queries = (
        corpus.filter((F.col("key").cast("bigint") % (n // N_QUERIES)) == 7)
        .limit(N_QUERIES)
        .select(F.col("key").alias("q_key"), F.col("embedding").alias("q_vec"))
        .localCheckpoint(eager=True)
    )

    # exact ground truth: map-side numpy cosine top-(K+1) per partition
    # (the Arrow crossJoin at 1M x 50 would move ~300 GB; a broadcast
    # query matrix + per-partition matmul moves only local top-k rows),
    # finalized driver-side with self-hits excluded (knn_join's
    # exclude_self contract, which ann_index_search shares)
    import numpy as np
    import pandas as pd

    qrows = queries.collect()
    Q = np.stack([np.asarray(r.q_vec, dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qkeys = [r.q_key for r in qrows]
    bcq = spark.sparkContext.broadcast(Qn)

    def local_topk(batches):
        for pdf in batches:
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = Vn @ bcq.value.T  # (n, nq)
            kk = min(K + 1, S.shape[0])
            idx = np.argpartition(-S, kk - 1, axis=0)[:kk]
            rows = []
            for qi in range(S.shape[1]):
                for i in idx[:, qi]:
                    rows.append((qi, pdf["key"].iloc[int(i)], float(S[int(i), qi])))
            yield pd.DataFrame(rows, columns=["qi", "key", "score"])

    t0 = time.time()
    local = corpus.mapInPandas(
        local_topk, "qi int, key string, score double"
    ).toPandas()
    truth = set()
    for qi, grp in local.groupby("qi"):
        qk = qkeys[qi]
        grp = grp[grp["key"] != qk].sort_values(
            ["score", "key"], ascending=[False, True]
        ).head(K)
        truth |= {(qk, k_) for k_ in grp["key"]}
    print(f"  exact ground truth (numpy map-side): {time.time()-t0:.1f}s "
          f"({len(truth)} pairs)", flush=True)

    results = {}
    for label, kwargs in (
        ("jl_lsh", dict(kind="jl_lsh", encode_arrow=True)),
        ("lsh_keysonly", dict(kind="lsh", store_vectors=False)),
    ):
        path = f"{base}/idx_{label}"
        t0 = time.time()
        cfg = build_ann_index(corpus, path, dim=DIM, **kwargs)
        build_s = round(time.time() - t0, 1)
        bytes_mb = {
            d: du_mb(os.path.join(path, d))
            for d in os.listdir(path)
            if os.path.isdir(os.path.join(path, d))
        }
        walls = []
        hits = 0
        for rep in range(3):
            t0 = time.time()
            out = ann_index_search(
                spark, path, queries, k=K, probe_radius=1, arrow=True
            ).collect()
            walls.append(round(time.time() - t0, 1))
            if rep == 0:
                hits = sum((r.q_key, r.key) in truth for r in out)
        recall = round(hits / len(truth), 3) if truth else None
        results[label] = {
            "build_s": build_s,
            "bytes_mb": bytes_mb,
            "query_walls_s": walls,
            "recall_at_10": recall,
            "geometry": {
                k_: cfg.get(k_)
                for k_ in ("n_planes", "n_tables", "out_dim")
                if cfg.get(k_) is not None
            },
        }
        print(f"  {label}: {json.dumps(results[label])}", flush=True)

    print(json.dumps({"n": n, "dim": DIM, "results": results}))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
