"""Vector store operators — distance expressions, top-k query, segment scan,
k-NN join, and an LSH-bucketed ANN path for scale.

Reference: the pgvector adapter (src/storage/protocols/vector/adapter/
pgvector/index.ts): cosine ``<=>`` / L2 ``<->`` distance selection
(:325-334, :760-785), metadata filter integration (:740-804), hash-segmented
parallel listing ``mod(abs(hashtext(key)), n) = i`` (:860-865), HNSW +
ef_search tuning (:458-475, :666-672).

Spark stance: exact distributed top-k is the default (better recall than
HNSW, embarrassingly parallel — Catalyst lowers orderBy+limit to
TakeOrderedAndProject, so each partition keeps only k candidates). The LSH
bucket join is the 100-TB path: candidates meet only within matching
hyperplane-sign buckets, turning the O(N·Q) scan into a bucketed equi-join.

Numeric determinism: distances fold the array strictly left-to-right in
double precision (``F.aggregate``), so the same input yields bit-identical
doubles regardless of partitioning — aggregation order never varies.
No Python UDFs; everything is codegen'd higher-order functions.
"""

from __future__ import annotations

import pandas as pd  # module-level: resolves pandas_udf type hints

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in double precision (order-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """pgvector ``<=>`` (pgvector/index.ts:325-334)."""
    return F.lit(1.0) - cosine_similarity(a, b)


def l2_distance(a: Column, b: Column) -> Column:
    """pgvector ``<->``: sqrt of left-folded squared-difference sum."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_distance_arrow(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Arrow-vectorized cosine distance for pair-heavy stages: Spark's
    higher-order ``aggregate`` is interpreted per element (~100x slower
    than native per pair at 64 dims), so candidate-pair stages burning
    millions of distance evaluations move the arithmetic into one
    pandas_udf batch. Bitwise-compatible with the expression path:
    ``np.add.accumulate`` folds strictly left-to-right in double, exactly
    like ``F.aggregate`` — verified against the HOF path in tests."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dist(va: pd.Series, vb: pd.Series, sa: pd.Series, sb: pd.Series) -> pd.Series:
        import numpy as np

        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        # left-fold sum (ufunc.accumulate is sequential) == F.aggregate
        dots = np.add.accumulate(A * B, axis=1)[:, -1]
        return pd.Series(1.0 - dots / (sa.to_numpy() * sb.to_numpy()))

    return _dist(a, b, na, nb)


def l2_distance_arrow(a: Column, b: Column) -> Column:
    """Arrow-vectorized L2 — same bitwise contract as cosine_distance_arrow
    (sequential left-fold of (x-y)^2, then sqrt)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dist(va: pd.Series, vb: pd.Series) -> pd.Series:
        import numpy as np

        A = np.stack(va.to_numpy()).astype(np.float64)
        B = np.stack(vb.to_numpy()).astype(np.float64)
        d = A - B
        return pd.Series(np.sqrt(np.add.accumulate(d * d, axis=1)[:, -1]))

    return _dist(a, b)


def _metric_distance(metric: str, a: Column, b: Column) -> Column:
    if metric == "cosine":
        return cosine_distance(a, b)
    if metric in ("euclidean", "l2"):
        return l2_distance(a, b)
    raise ValueError(f"unknown distance metric: {metric}")


def _pair_distance(
    metric: str, a: Column, b: Column, na: Column, nb: Column, arrow: bool
) -> Column:
    """Per-candidate-pair distance with norms precomputed per ROW (cosine's
    denominators never recompute per pair); ``arrow=True`` routes the
    arithmetic through the bitwise-identical vectorized path."""
    if metric == "cosine":
        if arrow:
            return cosine_distance_arrow(a, b, na, nb)
        return F.lit(1.0) - dot(a, b) / (na * nb)
    if metric in ("euclidean", "l2"):
        return l2_distance_arrow(a, b) if arrow else l2_distance(a, b)
    raise ValueError(f"unknown distance metric: {metric}")


def query_vectors(
    vectors: DataFrame,
    query_vec: list[float],
    top_k: int,
    metric: str = "cosine",
    vector_col: str = "embedding",
    key_col: str = "key",
    filter_ast: dict | None = None,
    metadata_col: str | None = None,
    non_filterable: set[str] | None = None,
    return_distance: bool = True,
) -> DataFrame:
    """QueryVectors (pgvector/index.ts:740-804): optional metadata filter →
    distance → ORDER BY distance LIMIT top_k (ties broken by key for a total
    order). Exact scan — the Spark analogue of the adapter's exact-scan
    fallback (:678-682), parallelized per partition."""
    df = vectors
    if filter_ast is not None:
        from storage_spark.functions.jsonmeta import compile_filter

        df = df.filter(
            compile_filter(filter_ast, metadata_col or "metadata", non_filterable)
        )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = df.withColumn("distance", _metric_distance(metric, F.col(vector_col), q))
    df = df.orderBy(F.col("distance").asc(), F.col(key_col).asc()).limit(top_k)
    if not return_distance:
        df = df.drop("distance")
    return df


def list_vectors(
    vectors: DataFrame,
    segment_count: int = 1,
    segment_index: int = 0,
    key_col: str = "key",
    next_key: str | None = None,
    max_results: int | None = None,
    segment_expr: Column | None = None,
) -> DataFrame:
    """ListVectors with hash-segmented parallel scan + keyset pagination
    (pgvector/index.ts:860-865: ``mod(abs(hashtext(key)), n) = i``).

    ``segment_expr`` defaults to xxhash64 of the key — any deterministic
    int expression works; segments are disjoint and covering. In Spark the
    deeper point is that *partitions already are the segments*; this
    operator exists for protocol parity.
    """
    df = vectors
    if segment_count > 1:
        seg = segment_expr if segment_expr is not None else F.xxhash64(F.col(key_col))
        df = df.filter(F.pmod(F.abs(seg), F.lit(segment_count)) == segment_index)
    if next_key is not None:
        df = df.filter(F.col(key_col) > next_key)
    df = df.orderBy(key_col)
    if max_results is not None:
        df = df.limit(max_results)
    return df


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    metric: str = "cosine",
    query_key: str = "q_key",
    query_vec: str = "q_vec",
    corpus_key: str = "key",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
    arrow: bool = False,
) -> DataFrame:
    """Top-k neighbors for every query row — broadcast the (small) query
    side, window-rank per query. This is the brute-force baseline for
    similarity search / embedding near-dup; the LSH path below replaces the
    crossJoin with a bucketed equi-join at scale. Norms are precomputed per
    row (never per pair); ``arrow=True`` moves the per-pair arithmetic into
    the bitwise-identical vectorized path."""
    c = corpus.withColumn("_cn", norm(F.col(corpus_vec)))
    q = queries.withColumn("_qn", norm(F.col(query_vec)))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col(query_key) != F.col(corpus_key))
    joined = joined.withColumn(
        "distance",
        _pair_distance(
            metric, F.col(corpus_vec), F.col(query_vec),
            F.col("_cn"), F.col("_qn"), arrow,
        ),
    )
    w = Window.partitionBy(query_key).orderBy(
        F.col("distance").asc(), F.col(corpus_key).asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key, corpus_key, "distance", "rank")
    )


# ----------------------------------------------------------------------
# LSH (random-hyperplane signatures) — the scale path for ANN
# ----------------------------------------------------------------------


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 pseudo-random hyperplanes (no RNG state needed —
    reproducible across engines and runs). Signs come from one md5 per
    (seed, plane, coordinate): the previous linear-congruence pattern
    made ADJACENT PLANES nearly identical (pairwise cosine 0.69-1.0,
    some exactly 1.0), which collapsed LSH signatures into two
    mega-buckets holding ~60% of a uniform corpus — candidate "pruning"
    that kept 64% of all pairs. Hash-derived signs are independent:
    measured pairwise plane cosine now ~N(0, 1/dim)."""
    import hashlib

    out = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()
            row.append(1.0 if h[0] & 1 else -1.0)
        out.append(row)
    return out


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bit-sign signature: one bit per hyperplane (dot-product sign),
    packed into a string bucket id."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for p in planes
    ]
    return F.concat(*bits)


def _first_n_by_key(
    corpus: DataFrame, n: int, key_col: str, vector_col: str
) -> DataFrame:
    """The distributed corpus pass behind ``ivf_centroids``: lowers to
    TakeOrderedAndProject (each partition keeps a local top-n, the driver
    merges n rows) — never a global sort or single-partition Window."""
    return (
        corpus.select(F.col(key_col).alias("_k"), F.col(vector_col).alias("centroid"))
        .orderBy("_k")
        .limit(n)
    )


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int,
    key_col: str = "key",
    vector_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer: the first ``n_cells`` vectors in key
    order act as centroids (k-means would refine them; determinism matters
    more here and the IVF *mechanics* are identical).

    Scale shape: the corpus pass is ``orderBy(key).limit(n_cells)`` —
    TakeOrderedAndProject, distributed — and only the resulting ``n_cells``
    rows are materialized driver-side to stamp cell ids 0..n-1. That
    materialization is the same n_cells-row footprint ``broadcast(centroids)``
    pays anyway in ivf_assign / ivf_search; the former implementation's
    no-partition Window pulled the WHOLE corpus through one task.
    """
    spark = corpus.sparkSession
    rows = _first_n_by_key(corpus, n_cells, key_col, vector_col).collect()
    rows.sort(key=lambda r: r["_k"])  # collect order is plan-dependent; pin it
    schema = corpus.select(F.col(vector_col).alias("centroid")).schema
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        [StructField("cell", IntegerType(), False), schema.fields[0]]
    )
    return spark.createDataFrame(
        [(i, r["centroid"]) for i, r in enumerate(rows)], out_schema
    )


def ivf_centroids_kmeans(
    corpus: DataFrame,
    n_cells: int,
    iterations: int = 2,
    metric: str = "cosine",
    key_col: str = "key",
    vector_col: str = "embedding",
) -> DataFrame:
    """Lloyd-refined coarse quantizer: start from the deterministic
    first-n centroids, then ``iterations`` rounds of assign → elementwise
    mean. Each round is fully distributed — posexplode to (cell, pos, val),
    partial-aggregated avg per dimension, re-assembled per cell (two
    shuffles per round, rows×dim exploded once). Empty cells keep their
    previous centroid. Balanced cells cut IVF probe cost: with random
    first-n seeds a hot cell can hold most of the corpus; a few Lloyd
    rounds spread it (recall per probe rises accordingly)."""
    cents = ivf_centroids(corpus, n_cells, key_col, vector_col)
    for _ in range(iterations):
        assigned = ivf_assign(corpus, cents, metric, key_col, vector_col)
        dim_means = (
            assigned.select("cell", F.posexplode(F.col(vector_col)).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
        )
        refined = (
            dim_means.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"].cast("float"),
                ).alias("centroid")
            )
        )
        # empty cells (no assigned members) keep their previous centroid
        cents = (
            cents.select("cell", F.col("centroid").alias("_prev"))
            .join(refined, "cell", "left")
            .select(
                "cell",
                F.coalesce(F.col("centroid"), F.col("_prev")).alias("centroid"),
            )
            .localCheckpoint(eager=True)
        )
    return cents


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    metric: str = "cosine",
    key_col: str = "key",
    vector_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid cell (broadcast
    the tiny centroid table, window-min per key). One pass, one shuffle."""
    d = _metric_distance(metric, F.col(vector_col), F.col("centroid"))
    w = Window.partitionBy(key_col).orderBy(F.col("_cd").asc(), F.col("cell").asc())
    return (
        corpus.crossJoin(F.broadcast(centroids))
        .withColumn("_cd", d)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key_col, vector_col, "cell")
    )


def ivf_search(
    queries: DataFrame,
    assigned_corpus: DataFrame,
    centroids: DataFrame,
    k: int,
    n_probe: int = 2,
    metric: str = "cosine",
    query_key: str = "q_key",
    query_vec: str = "q_vec",
    corpus_key: str = "key",
    corpus_vec: str = "embedding",
    arrow: bool = False,
) -> DataFrame:
    """IVF ANN: rank centroids per query, probe only the ``n_probe``
    nearest cells, exact-rank within the probed subset.

    The at-scale property: the corpus is pre-partitioned by ``cell``, so a
    query touches n_probe/n_cells of the data — an equi-join on ``cell``
    replaces the full scan, and recall is tuned by ``n_probe``. The probed
    candidate distances precompute norms per row; ``arrow=True`` uses the
    vectorized kernel for the candidate stage.
    """
    qd = _metric_distance(metric, F.col(query_vec), F.col("centroid"))
    wq = Window.partitionBy(query_key).orderBy(F.col("_qd").asc(), F.col("cell").asc())
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("_qd", qd)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select(query_key, query_vec, "cell")
        .withColumn("_qn", norm(F.col(query_vec)))
    )
    joined = probes.join(
        assigned_corpus.withColumn("_cn", norm(F.col(corpus_vec))), "cell"
    )
    joined = joined.filter(F.col(query_key) != F.col(corpus_key)).withColumn(
        "distance",
        _pair_distance(
            metric, F.col(corpus_vec), F.col(query_vec),
            F.col("_cn"), F.col("_qn"), arrow,
        ),
    )
    w = Window.partitionBy(query_key).orderBy(
        F.col("distance").asc(), F.col(corpus_key).asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key, corpus_key, "distance", "rank")
    )


def _flip_bit(sig: Column, i: int, n_planes: int) -> Column:
    """Signature with bit ``i`` (0-based) flipped — string surgery on the
    packed bit signature, stays a Column expression."""
    flipped = F.when(
        F.substring(sig, i + 1, 1) == "1", F.lit("0")
    ).otherwise(F.lit("1"))
    parts = []
    if i > 0:
        parts.append(F.substring(sig, 1, i))
    parts.append(flipped)
    if i < n_planes - 1:
        parts.append(F.substring(sig, i + 2, n_planes - i - 1))
    return F.concat(*parts)


def probe_signatures(sig: Column, n_planes: int, radius: int = 1) -> Column:
    """Multi-probe signature set (Lv et al., Multi-Probe LSH, VLDB'07):
    the exact bucket plus every bucket within Hamming distance ``radius``
    (radius <= 2 supported — beyond that multi-table repetition is the
    better recall lever). A vector near a hyperplane lands on either side
    nondeterministically; probing the neighbor buckets recovers those
    split pairs without growing the corpus-side shuffle at all — only the
    (tiny) query side explodes."""
    if radius not in (1, 2):
        raise ValueError(f"radius must be 1 or 2, got {radius}")
    sigs = [sig]
    for i in range(n_planes):
        sigs.append(_flip_bit(sig, i, n_planes))
    if radius == 2:
        for i in range(n_planes):
            fi = _flip_bit(sig, i, n_planes)
            for j in range(i + 1, n_planes):
                sigs.append(_flip_bit(fi, j, n_planes))
    return F.array(*sigs)


def lsh_ann_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 8,
    metric: str = "cosine",
    query_key: str = "q_key",
    query_vec: str = "q_vec",
    corpus_key: str = "key",
    corpus_vec: str = "embedding",
    arrow: bool = False,
    probe_radius: int = 0,
    n_tables: int = 1,
) -> DataFrame:
    """ANN via hyperplane-bucket equi-join: candidates share a bucket
    signature, then exact distance + window rank within candidates.

    At 100 TB this is the plan that survives: the corpus is scanned once,
    bucketed (shuffle on signature), and each bucket joins only its own
    queries — no all-pairs crossJoin. Three recall levers, composable:

    - ``n_planes``: fewer planes → bigger buckets → higher recall.
    - ``probe_radius`` (multi-probe, Lv et al. VLDB'07): each QUERY also
      probes every bucket within Hamming distance r of its signature —
      the query side explodes ×(1+n_planes[+C(n_planes,2)]), the
      corpus-side shuffle is unchanged. The cheap first lever.
    - ``n_tables`` (classic multi-table LSH): L independent plane sets;
      candidates match in ANY table. Recall 1-(1-p^b)^L; the corpus side
      explodes ×L, so spend probe_radius first, tables second.
    """
    probes = max(1, n_tables)
    c = corpus.withColumn("_cn", norm(F.col(corpus_vec)))
    q = queries.withColumn("_qn", norm(F.col(query_vec)))
    c_sigs, q_sigs = [], []
    for tbl in range(probes):
        planes = hyperplanes(dim, n_planes, seed=42 + 1_000_003 * tbl)
        sig_c = lsh_signature(F.col(corpus_vec), planes)
        sig_q = lsh_signature(F.col(query_vec), planes)
        c_sigs.append(F.concat(F.lit(f"{tbl}:"), sig_c))
        if probe_radius > 0:
            q_sigs.append(
                F.transform(
                    probe_signatures(sig_q, n_planes, probe_radius),
                    lambda s: F.concat(F.lit(f"{tbl}:"), s),
                )
            )
        else:
            q_sigs.append(F.array(F.concat(F.lit(f"{tbl}:"), sig_q)))
    c = c.withColumn("_sig", F.explode(F.array(*c_sigs)))
    q = q.withColumn("_sig", F.explode(F.flatten(F.array(*q_sigs))))
    joined = c.join(q, "_sig").filter(F.col(query_key) != F.col(corpus_key))
    if probes > 1 or probe_radius > 0:
        # a (query, corpus) pair can meet in several probed buckets /
        # tables — dedupe candidate IDENTITIES before the distance math;
        # single-probe single-table mode skips the extra shuffle
        joined = joined.select(
            query_key, query_vec, "_qn", corpus_key, corpus_vec, "_cn"
        ).dropDuplicates([query_key, corpus_key])
    joined = joined.withColumn(
        "distance",
        _pair_distance(
            metric, F.col(corpus_vec), F.col(query_vec),
            F.col("_cn"), F.col("_qn"), arrow,
        ),
    )
    w = Window.partitionBy(query_key).orderBy(
        F.col("distance").asc(), F.col(corpus_key).asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key, corpus_key, "distance", "rank")
    )
