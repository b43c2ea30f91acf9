"""Persistent ANN index — build once, query many times.

Every ANN path in ``functions.vectors`` splits into a corpus-side encode
(signatures / cell assignments / PQ codes — one full scan) and a query-side
probe (tiny). Without persistence each query call re-runs the encode; the
reference's vector surface keeps its index PERSISTENT (pgvector: the index
is a table maintained across queries, src/storage/vector/adapters/
pgvector/index.ts:458-475 — queries only probe). This module is that
analogue, in the same shape as the MinHash band index
(``operators.dedup.minhash_band_index``): the index is parquet + a JSON
config, and queries run the identical ranking code against the stored
tables, so persisted-vs-recomputed results are EQUAL by construction
(asserted in tests/test_annindex.py).

Layout under ``path/``:

- ``config.json`` — kind + the exact build parameters (and the learned
  centroids / codebooks, which are the bounded driver-side objects any
  implementation must hold).
- ``centroids/`` (ivf, only when ``n_cells > _CENTROIDS_INLINE_MAX``) —
  the quantizer as a (cell, centroid float32) parquet table: a 65536-cell
  quantizer is data, not config.json payload.
- ``postings/``  (lsh)  — the exploded multi-table posting rows of
  ``lsh_corpus_postings``: (key, embedding, _cn, _sig) inline, or
  (key, _cn, _sig) in keys-only mode (``store_vectors=False`` — for
  fat embeddings where the ×n_tables vector duplication dominates).
- ``assigned/``  (ivf)  — (key, embedding, cell), partitioned by cell so
  a probe reads only its cells' files (partition pruning = the inverted
  list seek).
- ``codes/``     (pq)   — (key, codes array<int>), m bytes/vector.
- ``codes/``     (sq8)  — (key, codes array<int>, scale), dim
  bytes/vector + one float scale (per-row symmetric max-abs SQ — the
  pgvector halfvec compressed-storage analogue; no training pass).
- ``vectors/``   (pq, and lsh keys-only) — (key, embedding)
  full-precision rows, fetched per deduped candidate at rank time (pq:
  only refine_factor*k candidates per query).

At 100 TB the build is the one full-corpus job (exactly the scan any
single query would have paid); incremental maintenance appends new rows'
postings/codes the same way ``minhash_band_index`` ingests batches.
"""

from __future__ import annotations

import json
import math
import os
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ----------------------------------------------------------------------
# Corpus-sized geometry (the same discipline as dedup.sig_bits_for /
# embedding_planes_for: static defaults are the measured scale cliff —
# NOTES_r5 quantified 391 s vs 6.5 s for the simhash analogue — so the
# DEFAULT derives from the corpus and explicit under-sizing warns).
# ----------------------------------------------------------------------

def lsh_planes_for(n_vectors: int, target_bucket: int = 64) -> int:
    """Posting-table signature width that keeps the average bucket
    bounded: occupancy is ``n / 2^n_planes``, so
    ``n_planes = log2(n / target_bucket)``, clamped to [4, 24].
    Per-query candidate work is ``bucket x n_tables`` distance evals
    (LINEAR in bucket size — unlike the banded dedup joins' square-law
    pair counts), so 64 keeps a top-10 probe's candidate set comfortably
    above k yet one codegen batch wide. The static ``n_planes=8`` this
    replaces put 2^-8 of the corpus in EVERY bucket — ~4M candidates per
    query at 10^9 vectors."""
    return min(24, max(4, math.ceil(math.log2(max(2, n_vectors // max(1, target_bucket))))))


def lsh_tables_for(n_planes: int) -> int:
    """Recall compensation for a finer signature: a near neighbor must
    match ALL ``n_planes`` bits of one table, so single-table recall
    falls as the width grows. One extra table per 8 bits of width
    (capped at 4) holds recall roughly flat; query-time
    ``probe_radius>=1`` composes on top."""
    return min(4, max(1, math.ceil(n_planes / 8)))


def ivf_cells_for(n_vectors: int) -> int:
    """IVF cell count ``~ sqrt(n)`` (the standard balance point: probe
    cost ``n_probe * n/n_cells`` vs centroid-scan cost ``n_cells``),
    clamped to [16, 65536]. Above ``_CENTROIDS_INLINE_MAX`` cells the
    centroids live in a parquet side table instead of config.json, so
    the cap is the practical ceiling of a broadcastable quantizer
    (65536 x 768 floats = 200 MB), not a serialization limit."""
    return min(65536, max(16, math.ceil(math.sqrt(max(1, n_vectors)))))


def ivf_probe_for(n_cells: int) -> int:
    """Suggested ``n_probe`` for a cell count: ``~ sqrt(n_cells)/2``
    (recall tracks the probed fraction; as cells grow, a constant probe
    count covers a vanishing fraction). Recorded in config.json at build
    so ``ann_index_search`` defaults to the width the geometry was sized
    for."""
    return max(2, round(math.sqrt(n_cells) / 2))


def pq_m_for(dim: int) -> int:
    """Subquantizer count from the dimension: prefer 8-dim subvectors
    (the common operating point), falling back through widths that
    divide ``dim`` evenly — m must divide dim exactly."""
    for sub in (8, 4, 16, 2, 1):
        if dim % sub == 0:
            return max(1, dim // sub)
    return dim


def pq_codes_for(n_vectors: int) -> int:
    """Codebook size per subquantizer: largest power of two with ~39
    training vectors per centroid (the standard k-means training floor),
    clamped to [16, 256] (256 = byte codes, the PQ ceiling)."""
    if n_vectors <= 39 * 16:
        return 16
    return min(256, 1 << int(math.log2(n_vectors / 39)))


def jl_out_dim_for(dim: int, n_vectors: int) -> int:
    """Projected dimension for a ``jl_lsh`` index: at least a 4×
    reduction of the original dim (the projection must pay for itself
    in scan bytes and distance math — below that, index the original),
    never above the corpus's JL distortion bound ``jl_dim_for(n)``
    (past which extra coordinates buy no fidelity the bound can
    certify), floor 8. For top-k retrieval the JL bound is conservative
    — the exact rerank on the originals restores recall lost to much
    smaller projections (NOTES_r7 keys-only probe: at dim 768 the
    distance math dominates; the 16/64 projection in the r7 composite
    ran recall-clean under a 6× rerank window) — so the dim/4 term is
    what usually binds.

    Raises for ``dim < 32``: the floor of 8 would otherwise meet or
    exceed ``dim/4``'s intent (at dim 4 it would EXPAND the vector) —
    below 32 a projection cannot pay for itself; index the original
    (``kind='lsh'``)."""
    from storage_spark.functions.vectors import jl_dim_for

    if dim < 32:
        raise ValueError(
            f"jl_lsh needs dim >= 32 to buy a >=4x reduction (got {dim});"
            " use kind='lsh' on the original vectors instead"
        )
    return max(8, min(jl_dim_for(n_vectors), dim // 4))


def jl_refine_for(
    n_vectors: int,
    k: int,
    n_planes: int,
    n_tables: int,
    probe_radius: int,
) -> int:
    """Rerank-window factor for a jl_lsh search: size the projected-L2
    cut to the EXPECTED admitted-candidate volume
    ``n/2^planes × |Hamming ball| × tables`` so the cut acts as a
    hot-bucket skew guard, not a ranking stage — projected distances
    carry JL distortion, and cutting hard on them at scale silently
    discards true neighbors the exact rerank would have kept. Measured
    at 1M×768 (tools/probe_r9.py sweep, NOTES_r9): the constant 6 the
    r8 default used gives recall@10 0.358; windows at ≥~55% of the
    admitted volume plateau at 0.968 (= the bucket-admission ceiling;
    keys-only lsh on the originals reads 0.972) with NO measurable
    wall penalty even at 4× the plateau window. Floor 6 preserves the
    r8 behavior for tiny corpora."""
    ball = sum(math.comb(n_planes, i) for i in range(probe_radius + 1))
    expected = n_vectors / (2 ** n_planes) * ball * n_tables
    return max(6, math.ceil(expected / max(1, k)))


def build_ann_index(
    corpus: DataFrame,
    path: str,
    kind: str,
    dim: int,
    key_col: str = "key",
    vector_col: str = "embedding",
    # lsh
    n_planes: int | None = None,
    n_tables: int | None = None,
    store_vectors: bool = True,
    # ivf
    n_cells: int | None = None,
    kmeans_iterations: int = 2,
    metric: str | None = None,
    # pq
    m: int | None = None,
    k_codes: int | None = None,
    # sq8
    bits: int = 8,
    # jl_lsh
    out_dim: int | None = None,
    jl_seed: int = 271_828_182,
    encode_arrow: bool = False,
    n_vectors: int | None = None,
) -> dict:
    """One corpus scan → a persisted index at ``path``. Returns the
    config dict (also written to ``path/config.json``).

    Geometry defaults are CORPUS-SIZED: omitted ``n_planes``/``n_tables``
    /``n_cells``/``m``/``k_codes`` derive from the corpus size via the
    ``*_for`` rules above (``n_vectors`` given, or one count — the build
    already scans the corpus, so the count is noise next to the encode).
    The derivation is recorded in config.json (``n_vectors_at_build``,
    ``derived_geometry``, and for ivf ``suggested_n_probe``) so later
    maintenance can re-derive as the corpus grows; an explicit value more
    than 2x under its rule warns (checkable when the count is known).

    ``metric`` defaults per kind: cosine for lsh/ivf/sq8, l2 for pq
    (PQ/ADC scores squared-L2 throughout — an explicit non-l2 metric
    with kind='pq' RAISES rather than silently ranking by l2).

    ``kind='sq8'`` is the scalar-quantized flat tier (pgvector halfvec
    analogue): int8 codes + per-vector scale, no training pass and no
    geometry to derive — searches rank the reconstructions (1
    byte/coordinate scanned) and optionally exact-rerank.

    ``kind='jl_lsh'`` is the fat-embedding recipe as a managed index
    (VERDICT r7 #5): vectors JL-project to ``out_dim`` coordinates at
    build (``jl_out_dim_for`` when omitted — corpus-sized like the
    rest), the LSH posting table is built ON THE PROJECTION (posting
    rows carry the small projected vector — the ×n_tables duplication
    that made keys-only necessary for fat embeddings shrinks
    out_dim/dim-fold instead), and one full-precision copy lands in
    ``path/vectors`` for the exact rerank every search ends with.
    Candidate ranking runs in projected L2 (what JL preserves);
    ``metric`` is the RERANK metric. ``jl_seed`` defaults away from
    the LSH table seeds (42 + 1_000_003·t) so projection planes and
    bucket planes stay independent — the md5 generator keys on
    (seed, plane, coord) only, and a shared seed would make bucket
    plane t's signs a prefix of projection plane t's (the correlated-
    generator lesson, NOTES_r4)."""
    from storage_spark.functions import vectors as V

    if kind not in ("lsh", "ivf", "pq", "sq8", "jl_lsh"):
        raise ValueError(f"kind must be lsh|ivf|pq|sq8|jl_lsh, got {kind!r}")
    if kind == "pq":
        if metric not in (None, "l2"):
            raise ValueError(
                f"kind='pq' ranks by squared-L2 (ADC); metric={metric!r} "
                "is not supported — build an lsh/ivf index for cosine"
            )
        metric = "l2"
    elif metric is None:
        metric = "cosine"
    omitted = {
        "lsh": {"n_planes": n_planes, "n_tables": n_tables},
        "ivf": {"n_cells": n_cells},
        "pq": {"m": m, "k_codes": k_codes},
        "sq8": {},  # nothing corpus-sized: codes are per-row exact
        "jl_lsh": {
            "out_dim": out_dim, "n_planes": n_planes, "n_tables": n_tables
        },
    }[kind]
    derived = sorted(k for k, v in omitted.items() if v is None)
    # Count the corpus ONLY for the knobs that need it (n_tables derives
    # from n_planes and pq's m from dim), so e.g. kind='pq' with explicit
    # k_codes must not eagerly re-execute an expensive corpus plan just
    # to record n_vectors_at_build (review r7).
    if {"n_planes", "n_cells", "k_codes", "out_dim"} & set(derived) and n_vectors is None:
        n_vectors = corpus.count()
    if kind == "jl_lsh":
        if out_dim is not None and out_dim >= dim:
            raise ValueError(
                f"jl_lsh out_dim={out_dim} must be < dim={dim} — a projection"
                " that does not reduce has no reason to exist (use kind='lsh')"
            )
        if out_dim is None:
            out_dim = jl_out_dim_for(dim, n_vectors)
        elif n_vectors is not None and jl_out_dim_for(dim, n_vectors) > 2 * out_dim:
            warnings.warn(
                f"out_dim={out_dim} is >2x under the sizing rule for "
                f"dim={dim}, n_vectors={n_vectors} (rule: "
                f"{jl_out_dim_for(dim, n_vectors)}); projected distances "
                "lose the JL fidelity the candidate ranking relies on — "
                "see annindex.jl_out_dim_for",
                stacklevel=2,
            )
        # bucket geometry sizes exactly like a plain lsh index — the
        # postings live in projected space but bucket occupancy is
        # corpus-sized, not dimension-sized
        if n_planes is None:
            n_planes = lsh_planes_for(n_vectors)
        if n_tables is None:
            n_tables = lsh_tables_for(n_planes)
    if kind == "lsh":
        if n_planes is None:
            n_planes = lsh_planes_for(n_vectors)
        elif n_vectors is not None and lsh_planes_for(n_vectors) > 2 * n_planes:
            warnings.warn(
                f"n_planes={n_planes} is >2x under the sizing rule for "
                f"n_vectors={n_vectors} (rule: {lsh_planes_for(n_vectors)}); "
                "posting buckets will blow up — see annindex.lsh_planes_for",
                stacklevel=2,
            )
        if n_tables is None:
            n_tables = lsh_tables_for(n_planes)
    elif kind == "ivf":
        if n_cells is None:
            n_cells = ivf_cells_for(n_vectors)
        elif n_vectors is not None and ivf_cells_for(n_vectors) > 2 * n_cells:
            warnings.warn(
                f"n_cells={n_cells} is >2x under the sizing rule for "
                f"n_vectors={n_vectors} (rule: {ivf_cells_for(n_vectors)}); "
                "every probe scans n/n_cells vectors — see "
                "annindex.ivf_cells_for",
                stacklevel=2,
            )
    elif kind == "pq":
        if m is None:
            m = pq_m_for(dim)
        if k_codes is None:
            k_codes = pq_codes_for(n_vectors)
    elif kind == "sq8" and not 2 <= bits <= 8:
        raise ValueError(f"bits must be in [2, 8], got {bits}")
    cfg: dict = {
        "kind": kind,
        "dim": dim,
        "key_col": key_col,
        "vector_col": vector_col,
        "metric": metric,
    }
    if n_vectors is not None:
        cfg["n_vectors_at_build"] = n_vectors
    if derived:
        cfg["derived_geometry"] = derived
    src = corpus.select(
        F.col(key_col).alias("key"), F.col(vector_col).alias("embedding")
    )
    if kind == "lsh":
        cfg.update(
            n_planes=n_planes, n_tables=n_tables, store_vectors=store_vectors
        )
        V.lsh_corpus_postings(
            src, dim, n_planes, n_tables, store_vectors=store_vectors
        ).write.mode("overwrite").parquet(os.path.join(path, "postings"))
        if not store_vectors:
            # one full-precision copy (not xn_tables) for rank-time fetch
            src.write.mode("overwrite").parquet(os.path.join(path, "vectors"))
    elif kind == "ivf":
        cfg.update(
            n_cells=n_cells,
            kmeans_iterations=kmeans_iterations,
            suggested_n_probe=ivf_probe_for(n_cells),
        )
        cents = V.ivf_centroids_kmeans(
            src, n_cells, iterations=kmeans_iterations, metric=metric
        )
        # Pin centroids to float32 BEFORE the build-time assignment: the
        # persisted store reloads them as array<float>, and an
        # empty-cell centroid (kept as a raw corpus vector) or an
        # iterations=0 build on a double-typed corpus would otherwise be
        # double here but float on reload — assignments near cell
        # boundaries would diverge, breaking persisted ≡ recomputed.
        cents = cents.select(
            "cell", F.col("centroid").cast("array<float>").alias("centroid")
        )
        if n_cells > _CENTROIDS_INLINE_MAX:
            # big quantizer: centroids live in a parquet side table, not
            # config.json (65536 x dim floats is data, not config). The
            # write below materializes the kmeans plan exactly once.
            cfg["centroids_store"] = "parquet"
            cents.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(path, "centroids")
            )
        else:
            cfg["centroids"] = [
                [float(x) for x in r["centroid"]]
                for r in sorted(cents.collect(), key=lambda r: r["cell"])
            ]
        # Rebuild the centroid frame FROM the persisted store (collected
        # config values / the just-written parquet): the kmeans plan runs
        # exactly once (the collect or write above) instead of
        # re-executing for the assignment write and the drift agg below,
        # and build-time assignment provably uses the very values every
        # later reload will — not merely cast-equal ones.
        cents = _centroids_df(corpus.sparkSession, cfg, path)
        (
            V.ivf_assign(src, cents, metric)
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(path, "assigned"))
        )
        # build-time fit quality: the drift baseline ivf_reindex_policy
        # compares against (one agg over the just-written table)
        assigned = corpus.sparkSession.read.parquet(
            os.path.join(path, "assigned")
        )
        row = (
            assigned.join(F.broadcast(cents), "cell")
            .select(
                V._metric_distance(
                    metric, F.col("embedding"), F.col("centroid")
                ).alias("_d")
            )
            .agg(F.avg("_d"))
            .first()
        )
        cfg["build_mean_distance"] = (
            float(row[0]) if row and row[0] is not None else None
        )
    elif kind == "pq":  # metric already resolved to 'l2' above
        cfg.update(m=m, k_codes=k_codes, kmeans_iterations=kmeans_iterations)
        books = V.pq_codebooks_kmeans(
            src, m=m, k=k_codes, iterations=kmeans_iterations, dim=dim
        )
        cfg["codebooks"] = books  # floats JSON-roundtrip exactly (repr)
        V.pq_encode(src, books).write.mode("overwrite").parquet(
            os.path.join(path, "codes")
        )
        src.write.mode("overwrite").parquet(os.path.join(path, "vectors"))
    elif kind == "jl_lsh":
        # encode_arrow: the Arrow-batched projection (bitwise-identical
        # to the expression fold — see project_embeddings) — recorded in
        # config so appends inherit the same encode throughput choice
        cfg.update(
            out_dim=out_dim, n_planes=n_planes, n_tables=n_tables,
            jl_seed=jl_seed, encode_arrow=bool(encode_arrow),
        )
        proj = V.project_embeddings(
            src, out_dim, dim, vector_col="embedding", out_col="_proj",
            seed=jl_seed, arrow=encode_arrow,
        ).select("key", F.col("_proj").alias("embedding"))
        # postings carry the PROJECTED vector inline: ×n_tables
        # duplication of out_dim floats, not dim — the join-free probe
        # at the small-vector price
        V.lsh_corpus_postings(
            proj, out_dim, n_planes, n_tables, store_vectors=True
        ).write.mode("overwrite").parquet(os.path.join(path, "postings"))
        src.write.mode("overwrite").parquet(os.path.join(path, "vectors"))
    else:  # sq8: row-local encode, no learned state beyond the codes
        cfg.update(bits=bits)
        V.sq_encode(src, bits=bits).write.mode("overwrite").parquet(
            os.path.join(path, "codes")
        )
        src.write.mode("overwrite").parquet(os.path.join(path, "vectors"))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as fh:
        json.dump(cfg, fh)
    return cfg


def load_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as fh:
        return json.load(fh)


_CENTROIDS_INLINE_MAX = 1024


def _centroids_df(spark: SparkSession, cfg: dict, path: str) -> DataFrame:
    """The stored ivf centroids as the (cell, centroid) frame every
    consumer (build-time assign, append, search, stats) ranks against —
    one definition so they are bit-identical by construction. Small
    quantizers inline in config.json; above ``_CENTROIDS_INLINE_MAX``
    cells they live in ``path/centroids`` parquet (float32 round-trips
    exactly either way)."""
    if cfg.get("centroids_store") == "parquet":
        return spark.read.parquet(os.path.join(path, "centroids")).select(
            "cell", F.col("centroid").cast("array<float>").alias("centroid")
        )
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cfg["centroids"])],
        "cell int, centroid array<float>",
    )


def ann_index_append(batch: DataFrame, path: str) -> None:
    """Incremental maintenance: encode ONLY the batch with the index's
    stored parameters and append its rows — the corpus is never
    re-encoded (the same monotonic-ingest shape as the MinHash band
    index). For lsh/pq/sq8/jl_lsh, append-then-query EQUALS a full
    rebuild over the unioned corpus (projection and encode are
    row-local; asserted in tests). For ivf
    the batch is assigned to the EXISTING centroids — cell boundaries do
    not move, the standard staleness trade of every IVF build; re-run
    ``build_ann_index`` when drift accumulates (the analogue of
    REINDEX)."""
    from storage_spark.functions import vectors as V

    cfg = load_config(path)
    src = batch.select(
        F.col(cfg["key_col"]).alias("key"),
        F.col(cfg["vector_col"]).alias("embedding"),
    )
    kind = cfg["kind"]
    if kind == "lsh":
        V.lsh_corpus_postings(
            src, cfg["dim"], cfg["n_planes"], cfg["n_tables"],
            store_vectors=cfg.get("store_vectors", True),
        ).write.mode("append").parquet(os.path.join(path, "postings"))
        if not cfg.get("store_vectors", True):
            src.write.mode("append").parquet(os.path.join(path, "vectors"))
    elif kind == "ivf":
        cents = _centroids_df(batch.sparkSession, cfg, path)
        (
            V.ivf_assign(src, cents, cfg["metric"])
            .write.mode("append")
            .partitionBy("cell")
            .parquet(os.path.join(path, "assigned"))
        )
    elif kind == "pq":  # codebooks stay fixed — codes are row-local
        V.pq_encode(src, cfg["codebooks"]).write.mode("append").parquet(
            os.path.join(path, "codes")
        )
        src.write.mode("append").parquet(os.path.join(path, "vectors"))
    elif kind == "jl_lsh":  # projection + encode both row-local:
        # append ≡ rebuild, same guarantee as lsh (asserted in tests)
        proj = V.project_embeddings(
            src, cfg["out_dim"], cfg["dim"], vector_col="embedding",
            out_col="_proj", seed=cfg["jl_seed"],
            arrow=cfg.get("encode_arrow", False),
        ).select("key", F.col("_proj").alias("embedding"))
        V.lsh_corpus_postings(
            proj, cfg["out_dim"], cfg["n_planes"], cfg["n_tables"],
            store_vectors=True,
        ).write.mode("append").parquet(os.path.join(path, "postings"))
        src.write.mode("append").parquet(os.path.join(path, "vectors"))
    else:  # sq8: per-row scale — encode is row-local by construction
        V.sq_encode(src, bits=cfg.get("bits", 8)).write.mode(
            "append"
        ).parquet(os.path.join(path, "codes"))
        src.write.mode("append").parquet(os.path.join(path, "vectors"))


def ann_index_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    query_key: str = "q_key",
    query_vec: str = "q_vec",
    probe_radius: int = 0,
    n_probe: int | None = None,
    refine_factor: int | None = None,
    arrow: bool | None = None,
) -> DataFrame:
    """Top-k against a persisted index — the query-only cost: no corpus
    encode, just the probe join + exact ranking. Returns the same
    ``(q_key, key, distance|score, rank)`` frame the recompute path
    produces, row-for-row (same ranking code, same stored parameters).

    - lsh: ``probe_radius`` composes with the stored n_tables.
    - ivf: ``n_probe`` cells per query (default: the build-time
      ``suggested_n_probe`` sized for the index's cell count, falling
      back to 2 on configs that predate the sizing rules); the
      cell-partitioned layout makes the probe a partition-pruned read.
    - pq: raw ADC top-k, or exact rerank of ``refine_factor * k``
      candidates when ``refine_factor`` is given.
    - sq8: reconstruction-ranked top-k, or exact rerank when
      ``refine_factor`` is given (4x suffices — reconstructions are
      per-coordinate exact to scale/254).
    - jl_lsh: queries project with the stored planes, probe the
      projected-space postings (``probe_radius`` composes as for lsh),
      candidates rank by projected L2, and the top ``refine_factor*k``
      (default 6 — the r7 composite's measured window) exact-rerank
      against the full-precision vectors under the stored metric. The
      search ALWAYS ends in the exact rerank: projected distances are
      JL approximations and are never returned.
    """
    from storage_spark.functions import vectors as V

    cfg = load_config(path)
    kind = cfg["kind"]
    if kind == "lsh":
        postings = spark.read.parquet(os.path.join(path, "postings"))
        corpus_vectors = (
            None
            if cfg.get("store_vectors", True)
            else spark.read.parquet(os.path.join(path, "vectors"))
        )
        return V._lsh_rank_against_postings(
            postings, queries, k, cfg["dim"], cfg["n_planes"],
            metric=cfg["metric"], query_key=query_key, query_vec=query_vec,
            arrow=arrow, probe_radius=probe_radius,
            n_tables=cfg["n_tables"], corpus_vectors=corpus_vectors,
        )
    if kind == "jl_lsh":
        postings = spark.read.parquet(os.path.join(path, "postings"))
        vectors = spark.read.parquet(os.path.join(path, "vectors"))
        # query projection follows the index's encode choice: at fat
        # dim the EXPRESSION projection's plan alone (out_dim arrays of
        # dim literals each) costs tens of seconds to compile per query
        # job — measured 30 s vs 7 s query wall at dim 768 (NOTES_r8);
        # the Arrow path is bitwise-identical so results don't change
        projq = V.project_embeddings(
            queries.select(query_key, query_vec),
            cfg["out_dim"], cfg["dim"], vector_col=query_vec,
            out_col="_pq", seed=cfg["jl_seed"],
            arrow=cfg.get("encode_arrow", False),
        ).select(query_key, F.col("_pq").alias(query_vec))
        if refine_factor is not None:
            rf = refine_factor
        elif "n_vectors_at_build" in cfg:
            rf = jl_refine_for(
                cfg["n_vectors_at_build"], k, cfg["n_planes"],
                cfg["n_tables"], probe_radius,
            )
        else:
            # explicit-geometry build never counted the corpus; the r8
            # constant stands but the caller should size it (NOTES_r9)
            warnings.warn(
                "jl_lsh index has no n_vectors_at_build; refine_factor"
                " defaults to 6, which loses recall at scale — pass"
                " refine_factor= (see annindex.jl_refine_for)",
                stacklevel=2,
            )
            rf = 6
        cands = V._lsh_rank_against_postings(
            postings, projq, rf * k, cfg["out_dim"], cfg["n_planes"],
            metric="l2", query_key=query_key, query_vec=query_vec,
            arrow=arrow, probe_radius=probe_radius,
            n_tables=cfg["n_tables"],
        ).select(query_key, "key")
        # rerank distances run at the FULL stored dimension — resolve
        # the arrow auto-flag from cfg["dim"], not the projected out_dim
        # the candidate-rank stage used (bitwise-identical either way)
        return V._exact_rerank(
            cands, queries, vectors, k, cfg["metric"],
            query_key, query_vec, "key", "embedding",
            arrow=V._arrow_auto(arrow, cfg["dim"]),
        )
    if kind == "ivf":
        assigned = spark.read.parquet(os.path.join(path, "assigned"))
        cents = _centroids_df(spark, cfg, path)
        if n_probe is None:
            n_probe = cfg.get("suggested_n_probe", 2)
        return V.ivf_search(
            queries, assigned, cents, k, n_probe=n_probe,
            metric=cfg["metric"], query_key=query_key, query_vec=query_vec,
            arrow=arrow,
        )
    codes = spark.read.parquet(os.path.join(path, "codes"))
    if kind == "sq8":
        bits = cfg.get("bits", 8)
        if refine_factor is None:
            return V.sq_topk(
                queries, codes, k, bits=bits, metric=cfg["metric"],
                query_key=query_key, query_vec=query_vec, arrow=arrow,
            )
        vectors = spark.read.parquet(os.path.join(path, "vectors"))
        return V.sq_search_rerank(
            queries, codes, vectors, k, refine_factor=refine_factor,
            bits=bits, metric=cfg["metric"],
            query_key=query_key, query_vec=query_vec, arrow=arrow,
        )
    books = cfg["codebooks"]
    if refine_factor is None:
        return V.pq_adc_topk(
            queries, codes, books, k,
            query_key=query_key, query_vec=query_vec, arrow=arrow,
        )
    vectors = spark.read.parquet(os.path.join(path, "vectors"))
    return V.pq_search_rerank(
        queries, codes, vectors, books, k, refine_factor=refine_factor,
        metric="l2", query_key=query_key, query_vec=query_vec, arrow=arrow,
    )


_INDEX_TABLES = {
    "lsh": [("postings", None)],
    "ivf": [("assigned", "cell")],
    "pq": [("codes", None), ("vectors", None)],
    "sq8": [("codes", None), ("vectors", None)],
    "jl_lsh": [("postings", None), ("vectors", None)],
}


def ann_index_compact(
    spark: SparkSession, path: str, n_files: int | None = None
) -> dict:
    """Re-pack the small files ``ann_index_append`` accumulates (one-plus
    per appended batch) into a clean layout: partitioned tables (ivf's
    cell-partitioned assignments) keep their partition layout — one file
    per cell by default, so probes stay partition-pruned single-file
    reads; flat tables re-pack to ``n_files`` (default: the session's
    parallelism). ROW-preserving by construction (read → repartition →
    write, no projection or filter), so query results are unchanged —
    asserted byte-for-byte in tests. Swap is write-aside + two renames
    with explicit crash recovery at entry (a crash in any window leaves
    either the live dir or its ``__old`` sibling complete; the next
    call restores and cleans — tested); the
    reference analogue is vacuuming the pgvector index's pages
    (src/storage/vector/adapters/pgvector/index.ts:458-475 keeps its
    index compact on insert; the parquet shape compacts out-of-band).

    Returns ``{table: {"files_before": n, "files_after": m}}``."""
    import shutil

    cfg = load_config(path)
    tables = list(_INDEX_TABLES[cfg["kind"]])
    if cfg["kind"] == "lsh" and not cfg.get("store_vectors", True):
        tables.append(("vectors", None))
    def _count(d: str) -> int:
        return sum(
            1
            for _root, _dirs, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    report: dict = {}
    for name, part_col in tables:
        src = os.path.join(path, name)
        tmp = src + "__compacting"
        bak = src + "__old"
        # crash recovery BEFORE touching anything, covering every
        # window of the two-rename swap below:
        # - src missing + bak present: died between the renames — the
        #   bak IS the live table; restore it (tmp, if complete, is
        #   discarded: re-compacting is cheaper than proving it whole)
        # - src present + bak present: died after the swap before the
        #   cleanup — bak is the superseded copy; drop it
        # - tmp leftover: incomplete write; live dir intact; drop it
        if not os.path.isdir(src) and os.path.isdir(bak):
            os.rename(bak, src)
        if os.path.isdir(bak):
            shutil.rmtree(bak)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        before = _count(src)
        df = spark.read.parquet(src)
        if part_col is not None:
            (
                df.repartition(F.col(part_col))
                .write.partitionBy(part_col)
                .parquet(tmp)
            )
        else:
            n = n_files or spark.sparkContext.defaultParallelism
            df.repartition(n).write.parquet(tmp)
        os.rename(src, bak)
        os.rename(tmp, src)
        shutil.rmtree(bak)
        report[name] = {"files_before": before, "files_after": _count(src)}
    return report


def ivf_reindex_policy(
    cell_stats: list,
    n_cells: int,
    build_mean_distance: float | None = None,
    max_occupancy_factor: float = 4.0,
    drift_factor: float = 1.5,
) -> dict:
    """REINDEX decision for an appended ivf index, from ``ivf_cell_stats``
    rows: rebuild when (a) the hottest cell holds more than
    ``max_occupancy_factor`` x the balanced share N/n_cells — probes into
    it scan that multiple of their fair share — or (b) the corpus-wide
    mean distance-to-centroid has drifted past ``drift_factor`` x its
    build-time value (stored in config at build), i.e. the centroids no
    longer describe the data. Pure function so the policy is unit-testable
    without an index on disk."""
    rows = [(int(r["n_vectors"]), float(r["mean_distance"])) for r in cell_stats]
    total = sum(n for n, _ in rows)
    if total == 0:
        return {"rebuild": False, "reason": "empty index"}
    hot = max(n for n, _ in rows)
    share = total / max(1, n_cells)
    if hot > max_occupancy_factor * share:
        return {
            "rebuild": True,
            "reason": f"hot cell holds {hot} vectors > "
            f"{max_occupancy_factor}x balanced share {share:.1f}",
        }
    mean_d = sum(n * d for n, d in rows) / total
    if (
        build_mean_distance is not None
        and build_mean_distance > 0
        and mean_d > drift_factor * build_mean_distance
    ):
        return {
            "rebuild": True,
            "reason": f"mean distance {mean_d:.4f} > {drift_factor}x "
            f"build-time {build_mean_distance:.4f}",
        }
    return {"rebuild": False, "reason": "within policy"}


def ann_index_maintain(
    spark: SparkSession,
    path: str,
    max_occupancy_factor: float = 4.0,
    drift_factor: float = 1.5,
    n_files: int | None = None,
) -> dict:
    """One maintenance tick: for an ivf index, evaluate the REINDEX
    policy and REBUILD (re-run ``build_ann_index`` over the indexed rows
    with the stored parameters — fresh centroids) when it trips;
    otherwise compact the appended files. lsh/pq/sq8/jl_lsh appends
    are row-local (append ≡ rebuild), so their maintenance is
    compaction only. Returns
    ``{"action": "rebuilt"|"compacted", "policy": ..., "compaction": ...}``."""
    cfg = load_config(path)
    if cfg["kind"] == "ivf":
        stats = ivf_cell_stats(spark, path).collect()
        decision = ivf_reindex_policy(
            stats,
            cfg["n_cells"],
            build_mean_distance=cfg.get("build_mean_distance"),
            max_occupancy_factor=max_occupancy_factor,
            drift_factor=drift_factor,
        )
        if decision["rebuild"]:
            corpus = spark.read.parquet(os.path.join(path, "assigned")).select(
                F.col("key").alias(cfg["key_col"]),
                F.col("embedding").alias(cfg["vector_col"]),
            )
            # localCheckpoint: the rebuild overwrites the files this
            # plan reads — materialize the rows first
            corpus = corpus.localCheckpoint(eager=True)
            # Geometry derived at build re-derives here: the corpus has
            # grown since (that's usually WHY the policy tripped), so a
            # rebuild pinned to the old n_cells would re-create the
            # under-sized index. Explicit build geometry stays explicit.
            rederive = "n_cells" in cfg.get("derived_geometry", [])
            build_ann_index(
                corpus,
                path,
                kind="ivf",
                dim=cfg["dim"],
                key_col=cfg["key_col"],
                vector_col=cfg["vector_col"],
                n_cells=None if rederive else cfg["n_cells"],
                kmeans_iterations=cfg["kmeans_iterations"],
                metric=cfg["metric"],
            )
            return {"action": "rebuilt", "policy": decision}
        out = {"policy": decision}
    else:
        out = {}
    out.update(
        action="compacted",
        compaction=ann_index_compact(spark, path, n_files=n_files),
    )
    return out


def ivf_cell_stats(spark: SparkSession, path: str) -> DataFrame:
    """Operational staleness/skew diagnostic for an ivf index: per-cell
    row count and mean distance-to-centroid. Appends assign to the
    EXISTING centroids, so drift shows up here first — hot cells
    (occupancy ≫ N/n_cells) waste probe IO, and a rising mean distance
    says the centroids no longer fit the data. When either degrades,
    rebuild (``build_ann_index`` — the REINDEX motion). One aggregate
    over the assigned table; no collect beyond the n_cells result."""
    from storage_spark.functions.vectors import _metric_distance

    cfg = load_config(path)
    if cfg["kind"] != "ivf":
        raise ValueError(f"ivf_cell_stats needs an ivf index, got {cfg['kind']}")
    assigned = spark.read.parquet(os.path.join(path, "assigned"))
    cents = _centroids_df(spark, cfg, path)
    d = _metric_distance(cfg["metric"], F.col("embedding"), F.col("centroid"))
    return (
        assigned.join(F.broadcast(cents), "cell")
        .withColumn("_d", d)
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.avg("_d").alias("mean_distance"),
        )
        .orderBy("cell")
    )
