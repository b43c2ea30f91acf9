"""Semantic (embedding-space) dedup — SemDeDup-style cluster-scoped
near-dup removal (dedup.semantic_dedup / semantic_cluster_pairs).

The ground truth is a NumPy brute-force replication of the full
cluster → rank → drop pipeline, plus hand-built corpora that pin the
planted-group behavior, the rank-vs-components divergence, the hot-cell
guard's keep-everything contract, and the cross-cell recall miss.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from storage_spark.operators.dedup import (
    semantic_cells_for,
    semantic_cluster_pairs,
    semantic_dedup,
)


def _unit(i: int, dim: int = 8, nudge: float = 0.0, coord: int = 1) -> list[float]:
    v = [0.0] * dim
    v[i % dim] = 1.0
    v[coord] += nudge
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _planted(spark):
    """4 deterministic centroid seeds (keys 00-03, far apart) + planted
    near-dup groups that each assign to one seed's cell."""
    rows = [
        ("00", _unit(0)),
        ("01", _unit(1)),
        ("02", _unit(2)),
        ("03", _unit(3)),
        # group near seed 0: 3 members (the seed + two nudged copies)
        ("10", _unit(0, nudge=0.02, coord=4)),
        ("11", _unit(0, nudge=0.03, coord=5)),
        # group near seed 1: 2 members
        ("20", _unit(1, nudge=0.02, coord=6)),
        # a loner near seed 2 but OUTSIDE eps
        ("30", _unit(2, nudge=0.8, coord=7)),
    ]
    return spark.createDataFrame(rows, "key string, embedding array<float>")


def test_rank_keeps_one_per_planted_group(spark):
    out = semantic_dedup(_planted(spark), eps=0.01, n_clusters=4).collect()
    by_doc = {r["doc"]: r for r in out}
    assert len(out) == 8  # one row per doc, always
    # group {00, 10, 11} all in cell 0: exactly one kept
    g0 = [d for d in ("00", "10", "11") if by_doc[d]["kept"]]
    assert len(g0) == 1
    # the survivor is the farthest-from-centroid member (cent_rank 1)
    assert by_doc[g0[0]]["cent_rank"] == 1
    # group {01, 20}: one kept
    assert sum(by_doc[d]["kept"] for d in ("01", "20")) == 1
    # outside-eps loner and bare seeds survive
    assert by_doc["30"]["kept"] and by_doc["02"]["kept"] and by_doc["03"]["kept"]


def _on_sphere(alpha: float, phi: float, dim: int = 8) -> list[float]:
    """Unit vector at polar angle ``alpha`` from e0, azimuth ``phi`` in
    the (e1, e2) plane — cosine distance between two such points is
    1 - (cos a1 cos a2 + sin a1 sin a2 cos(phi1-phi2))."""
    v = [0.0] * dim
    v[0] = math.cos(alpha)
    v[1] = math.sin(alpha) * math.cos(phi)
    v[2] = math.sin(alpha) * math.sin(phi)
    return v


def test_components_strict_vs_rank_conservative(spark):
    """The documented divergence: priority (cdist desc) A > C > B with
    pairs A~B and B~C but NOT A~C. Rank keeps C (its only eps-neighbor
    B is lower priority); components folds the whole chain into one
    group keeping only its maximum.

    Geometry (polar angle from the e0 centroid, azimuth): A=(0.13, pi),
    B=(0.10, 0), C=(0.12, 0); eps=0.028 sits between d(A,B)=0.0263 and
    d(A,C)=0.0311; the centroid seed itself is within eps of everything
    (lowest priority, so it drops under both resolutions via A)."""
    rows = [
        ("0", _unit(0)),  # centroid seed (n_clusters=1 -> cell 0 anchor)
        ("A", _on_sphere(0.13, math.pi)),
        ("B", _on_sphere(0.10, 0.0)),
        ("C", _on_sphere(0.12, 0.0)),
    ]
    df = spark.createDataFrame(rows, "key string, embedding array<float>")
    eps = 0.028

    # verify the planted geometry with the operator's own pair stage
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in semantic_cluster_pairs(df, eps=eps, n_clusters=1).collect()
    }
    assert pairs == {("0", "A"), ("0", "B"), ("0", "C"), ("A", "B"), ("B", "C")}

    rank = {
        r["doc"]: r["kept"]
        for r in semantic_dedup(df, eps=eps, n_clusters=1).collect()
    }
    comp = {
        r["doc"]: r["kept"]
        for r in semantic_dedup(
            df, eps=eps, n_clusters=1, resolution="components"
        ).collect()
    }
    assert rank == {"0": False, "A": True, "B": False, "C": True}
    assert comp == {"0": False, "A": True, "B": False, "C": False}
    # invariant: rank-dropped is a subset of components-dropped
    assert {d for d, k in rank.items() if not k} <= {
        d for d, k in comp.items() if not k
    }


def _rand_corpus(n: int = 60, dim: int = 8, n_dups: int = 12):
    rng = random.Random(42)
    rows = []
    for i in range(n):
        rows.append((f"{i:03d}", [rng.uniform(-1.0, 1.0) for _ in range(dim)]))
    # planted near-dups of existing docs (tiny nudge on one coordinate)
    for j in range(n_dups):
        src = rows[rng.randrange(n)][1]
        v = list(src)
        v[rng.randrange(dim)] += 0.001
        rows.append((f"d{j:02d}", v))
    return rows


def _brute_force_rank(rows, eps: float, n_clusters: int):
    """NumPy replication of the whole rank pipeline: first-n centroids,
    argmin-cosine assignment (tie: lowest cell), cdist-desc/doc-asc
    priority, drop iff a higher-priority same-cell doc is within eps."""
    import numpy as np

    keys = [k for k, _ in rows]
    # float32 ingest like array<float>, math in float64 like the engine
    vecs = {k: np.asarray(v, dtype=np.float32).astype(np.float64) for k, v in rows}

    def cdist(a, b):
        return 1.0 - float(np.dot(a, b)) / (
            math.sqrt(float(np.dot(a, a))) * math.sqrt(float(np.dot(b, b)))
        )

    cents = [vecs[k] for k in sorted(keys)[:n_clusters]]
    cell = {}
    own = {}
    for k in keys:
        ds = [cdist(vecs[k], c) for c in cents]
        cell[k] = min(range(len(cents)), key=lambda i: (ds[i], i))
        own[k] = ds[cell[k]]
    ranked = {}
    for c in set(cell.values()):
        members = sorted(
            (k for k in keys if cell[k] == c), key=lambda k: (-own[k], k)
        )
        for r, k in enumerate(members, 1):
            ranked[k] = r
    kept = {}
    for k in keys:
        drop = any(
            cell[j] == cell[k]
            and ranked[j] < ranked[k]
            and cdist(vecs[j], vecs[k]) < eps
            for j in keys
        )
        kept[k] = not drop
    return cell, ranked, kept


def test_rank_matches_brute_force(spark):
    rows = _rand_corpus()
    eps, n_clusters = 0.05, 6
    df = spark.createDataFrame(rows, "key string, embedding array<float>")
    got = {
        r["doc"]: (r["cell"], r["cent_rank"], r["kept"])
        for r in semantic_dedup(df, eps=eps, n_clusters=n_clusters).collect()
    }
    cell, ranked, kept = _brute_force_rank(rows, eps, n_clusters)
    want = {k: (cell[k], ranked[k], kept[k]) for k in cell}
    assert got == want
    # the corpus actually exercised the drop path
    assert sum(1 for _, _, k in got.values() if not k) >= 8


def test_rank_dropped_subset_of_components_dropped(spark):
    rows = _rand_corpus()
    df = spark.createDataFrame(rows, "key string, embedding array<float>")
    kw = dict(eps=0.05, n_clusters=6)
    rank_drop = {
        r["doc"]
        for r in semantic_dedup(df, **kw).collect()
        if not r["kept"]
    }
    comp_drop = {
        r["doc"]
        for r in semantic_dedup(df, resolution="components", **kw).collect()
        if not r["kept"]
    }
    assert rank_drop and rank_drop <= comp_drop


def test_cells_for_rule():
    import math

    # balanced sqrt rule: cells = ceil(sqrt(n/2)) — minimizes the
    # n*cells assignment scan + n*occupancy/2 pairing sum (r7 probe)
    assert semantic_cells_for(2) == 1
    assert semantic_cells_for(20_000) == 100
    assert semantic_cells_for(10**6) == 708
    assert semantic_cells_for(10**9) == math.ceil(math.sqrt(5 * 10**8))
    # broadcastability ceiling binds only past ~8.6e9 docs
    assert semantic_cells_for(10**10) == 65536
    # fixed-occupancy override for recall tuning
    assert semantic_cells_for(1280, target_cell=128) == 10
    assert semantic_cells_for(10**10, target_cell=128) == 65536
    # monotonic
    prev = 0
    for n in (1, 10, 10**3, 10**5, 10**7, 10**9):
        cur = semantic_cells_for(n)
        assert cur >= prev
        prev = cur


def test_undersized_explicit_clusters_warn(spark):
    df = _planted(spark)
    with pytest.warns(UserWarning, match="sizing rule"):
        semantic_dedup(df, eps=0.01, n_clusters=1, n_docs=100_000).collect()


def test_hot_cell_cap_keeps_docs(spark):
    """A capped (over-sized) cluster forms no pairs but every doc stays
    in the output as kept=true — the guard trades recall, never rows."""
    df = _planted(spark)
    out = semantic_dedup(df, eps=0.01, n_clusters=4, max_cell_size=1).collect()
    assert len(out) == 8
    assert all(r["kept"] for r in out)


def test_cross_cell_pair_is_missed(spark):
    """The documented recall trade: a near-dup pair SPLIT across a
    cluster boundary never meets. Two seeds, one doc exactly between
    them nudged toward seed 1's twin — the twin pairs within its cell,
    the cross-cell near-dup does not."""
    # seeds e0, e1; doc "x" is a near-dup of seed e1's twin but assigns
    # to cell 0 (built slightly closer to e0)
    rows = [
        ("0", _unit(0)),
        ("1", _unit(1)),
        ("t", _unit(1, nudge=0.01, coord=5)),  # twin of seed 1, cell 1
    ]
    df = spark.createDataFrame(rows, "key string, embedding array<float>")
    pairs = semantic_cluster_pairs(df, eps=0.01, n_clusters=2).collect()
    # within-cell pair found
    assert {(p["doc_a"], p["doc_b"]) for p in pairs} == {("1", "t")}
    # same corpus, 1 cluster: the pair survives (no boundary to split on)
    pairs1 = semantic_cluster_pairs(df, eps=0.01, n_clusters=1).collect()
    assert {(p["doc_a"], p["doc_b"]) for p in pairs1} == {("1", "t")}


def test_bad_resolution_raises(spark):
    with pytest.raises(ValueError, match="resolution"):
        semantic_dedup(_planted(spark), resolution="greedy", n_clusters=2)


def test_derived_clusters_from_corpus_count(spark):
    """n_clusters=None sizes from the corpus (eager count documented);
    derived run equals the same-value explicit run."""
    rows = _rand_corpus()
    df = spark.createDataFrame(rows, "key string, embedding array<float>")
    rule = semantic_cells_for(len(rows))
    derived = sorted(
        map(tuple, semantic_dedup(df, eps=0.05).collect())
    )
    explicit = sorted(
        map(tuple, semantic_dedup(df, eps=0.05, n_clusters=rule).collect())
    )
    assert derived == explicit


def test_kmeans_refined_clusters_still_dedup(spark):
    """Lloyd-refined quantizer path: same keep-one-per-group semantics,
    different (refined) cell boundaries."""
    out = semantic_dedup(
        _planted(spark), eps=0.01, n_clusters=4, kmeans_iterations=2
    ).collect()
    by_doc = {r["doc"]: r for r in out}
    assert len(out) == 8
    # the two planted groups still resolve to one survivor each when
    # their members share a refined cell; at minimum no group keeps all
    # members AND every doc appears exactly once
    assert sum(not r["kept"] for r in out) >= 2
    assert by_doc["30"]["kept"]


def _inc_setup(spark):
    from storage_spark.functions.vectors import ivf_assign, ivf_centroids

    # index: 4 seeds + settled docs; batch arrives later
    rows = [
        ("i0", _unit(0)),
        ("i1", _unit(1)),
        ("i2", _unit(2)),
        ("i3", _unit(3)),
        ("i4", _unit(0, nudge=0.5, coord=4)),  # settled, off the seed
    ]
    ixv = spark.createDataFrame(rows, "key string, embedding array<float>")
    cents = ivf_centroids(ixv, 4)
    index = ivf_assign(ixv, cents)
    return ixv, cents, index


def test_incremental_semantic_index_always_wins(spark):
    from storage_spark.operators.dedup import incremental_semantic_dedup

    _, cents, index = _inc_setup(spark)
    batch = spark.createDataFrame(
        [
            ("b0", _unit(0, nudge=0.01, coord=5)),  # near index seed i0 -> drop
            ("b1", _unit(5)),                       # novel direction -> keep
        ],
        "key string, embedding array<float>",
    )
    kept, newrows = incremental_semantic_dedup(batch, index, cents, eps=0.01)
    assert {r["key"] for r in kept.collect()} == {"b1"}
    nr = newrows.collect()
    assert [(r["key"],) for r in nr] == [("b1",)]
    assert set(newrows.columns) == {"key", "embedding", "cell"}


def test_incremental_semantic_batch_internal_rank_rule(spark):
    """Two batch near-dups sharing a cell: the farther-from-centroid
    member survives (the semantic_dedup priority), independent of id."""
    from storage_spark.operators.dedup import incremental_semantic_dedup

    _, cents, index = _inc_setup(spark)
    batch = spark.createDataFrame(
        [
            # both near seed-1's cell, b9 CLOSER to the centroid than ba
            ("b9", _unit(1, nudge=0.20, coord=5)),
            ("ba", _unit(1, nudge=0.23, coord=5)),
        ],
        "key string, embedding array<float>",
    )
    kept, _ = incremental_semantic_dedup(batch, index, cents, eps=0.01)
    assert {r["key"] for r in kept.collect()} == {"ba"}


def test_incremental_semantic_reingest_is_idempotent(spark):
    from storage_spark.operators.dedup import incremental_semantic_dedup

    _, cents, index = _inc_setup(spark)
    rows = [(f"b{i}", _unit(i, nudge=0.3, coord=(i + 3) % 8)) for i in range(6)]
    batch = spark.createDataFrame(rows, "key string, embedding array<float>")
    kept, newrows = incremental_semantic_dedup(batch, index, cents, eps=0.05)
    index2 = index.unionByName(newrows)
    kept2, new2 = incremental_semantic_dedup(
        kept.select("key", "embedding"), index2, cents, eps=0.05
    )
    assert kept2.count() == 0 and new2.count() == 0


def test_incremental_semantic_preserves_batch_columns(spark):
    from storage_spark.operators.dedup import incremental_semantic_dedup

    _, cents, index = _inc_setup(spark)
    batch = spark.createDataFrame(
        [("b1", _unit(5), "hello", 7)],
        "key string, embedding array<float>, text string, n int",
    )
    kept, _ = incremental_semantic_dedup(batch, index, cents, eps=0.01)
    row = kept.collect()[0]
    assert (row["text"], row["n"]) == ("hello", 7)


def test_incremental_empty_index_equals_batch_semantic_dedup(spark):
    """With an EMPTY index and the corpus's own first-n quantizer, the
    incremental gate reproduces semantic_dedup's rank decisions."""
    from storage_spark.functions.vectors import ivf_centroids
    from storage_spark.operators.dedup import (
        incremental_semantic_dedup,
        semantic_dedup,
    )

    rows = _rand_corpus()
    df = spark.createDataFrame(rows, "key string, embedding array<float>")
    cents = ivf_centroids(df, 6)
    empty = df.filter(F.lit(False)).select(
        "key", "embedding", F.lit(0).alias("cell")
    )
    kept, _ = incremental_semantic_dedup(df, empty, cents, eps=0.05)
    want = {
        r["doc"]
        for r in semantic_dedup(df, eps=0.05, n_clusters=6).collect()
        if r["kept"]
    }
    assert {r["key"] for r in kept.collect()} == want


def test_cluster_stats_integer_exact_replication(spark):
    """Per-cell stats replay from the brute-force assignment: quantized
    distances aggregated in integer math (sum/max/doubled-median)."""
    from storage_spark.operators.dedup import semantic_cluster_stats

    rows = _rand_corpus()
    df = spark.createDataFrame(rows, "key string, embedding array<float>")
    got = {
        r["cell"]: (
            r["n_docs"], r["mean_cdist_1e4"], r["max_cdist_1e4"],
            r["p50x2_cdist_1e4"],
        )
        for r in semantic_cluster_stats(df, n_clusters=6).collect()
    }
    import numpy as np

    keys = [k for k, _ in rows]
    vecs = {k: np.asarray(v, dtype=np.float32).astype(np.float64) for k, v in rows}

    def cdist(a, b):
        return 1.0 - float(np.dot(a, b)) / (
            math.sqrt(float(np.dot(a, a))) * math.sqrt(float(np.dot(b, b)))
        )

    cents = [vecs[k] for k in sorted(keys)[:6]]
    per_cell: dict[int, list[int]] = {}
    for k in keys:
        ds = [cdist(vecs[k], c) for c in cents]
        cell = min(range(6), key=lambda i: (ds[i], i))
        # python round is half-even; the engines round half away from
        # zero — replicate via floor(x + 0.5) for non-negative values
        per_cell.setdefault(cell, []).append(
            int(math.floor(ds[cell] * 10000 + 0.5))
        )
    want = {}
    for cell, cds in per_cell.items():
        cds.sort()
        n = len(cds)
        mean = int(math.floor(sum(cds) / n + 0.5))
        med2 = cds[n // 2] * 2 if n % 2 else cds[n // 2 - 1] + cds[n // 2]
        want[cell] = (n, mean, max(cds), med2)
    assert got == want
    assert sum(n for n, _, _, _ in got.values()) == len(rows)


def test_incremental_cap_never_skips_index_gate(spark):
    """Review-r7 regression: max_cell_size scopes the batch-INTERNAL
    pairing only — a capped hot cell must still be gated against the
    index, or re-ingest would re-append already-indexed docs."""
    from storage_spark.operators.dedup import incremental_semantic_dedup

    _, cents, index = _inc_setup(spark)
    # 3 batch docs flood seed-0's cell; one is a near-dup of index i0
    batch = spark.createDataFrame(
        [
            ("b0", _unit(0, nudge=0.005, coord=5)),  # ~i0 -> must drop
            ("b1", _unit(0, nudge=0.40, coord=6)),
            ("b2", _unit(0, nudge=0.40, coord=7)),
        ],
        "key string, embedding array<float>",
    )
    kept, newrows = incremental_semantic_dedup(
        batch, index, cents, eps=0.01, max_cell_size=1
    )
    kept_keys = {r["key"] for r in kept.collect()}
    assert "b0" not in kept_keys  # index always wins, even capped
    assert kept_keys == {"b1", "b2"}  # internal pairing capped away
    # idempotency survives the cap: re-ingest drops everything
    index2 = index.unionByName(newrows)
    kept2, _ = incremental_semantic_dedup(
        kept.select("key", "embedding"), index2, cents,
        eps=0.01, max_cell_size=1,
    )
    assert kept2.count() == 0
