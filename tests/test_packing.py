"""pack_sequences / packing_efficiency unit semantics.

The round-3 regression this file guards: building the applyInPandas output
schema with ``DataFrame.schema.add(...)`` mutated the input's cached schema
and broke column resolution on every call. These tests execute the operator
for real (schema construction AND the Arrow path), so any resolution bug
fails here, not in the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from storage_spark.operators.pipeline import pack_sequences, packing_efficiency


def _corpus(spark):
    rows = [
        # grp a: 60+60 fit a 128 bin; +30 overflows -> bin 1; 200 oversize
        # closes bin 1 and sits alone in bin 2; 10 opens bin 3.
        ("a", 1, 60),
        ("a", 2, 60),
        ("a", 3, 30),
        ("a", 4, 200),
        ("a", 5, 10),
        # grp b: independent walk, restarts at bin 0.
        ("b", 1, 128),
        ("b", 2, 1),
    ]
    return spark.createDataFrame(rows, "lang string, doc_id long, nt long")


def test_next_fit_walk_and_oversize(spark):
    out = pack_sequences(
        _corpus(spark),
        id_col="doc_id",
        token_col="nt",
        group_col="lang",
        max_tokens=128,
    )
    got = {
        (r["grp"], r["doc"]): r["bin"]
        for r in out.collect()
    }
    assert got == {
        ("a", 1): 0,
        ("a", 2): 0,
        ("a", 3): 1,
        ("a", 4): 2,
        ("a", 5): 3,
        ("b", 1): 0,
        ("b", 2): 1,
    }


def test_input_schema_not_mutated(spark):
    """DataFrame.schema of the INPUT must not grow a phantom 'bin' column
    after calling pack_sequences (the round-3 StructType.add bug)."""
    docs = _corpus(spark)
    before = [f.name for f in docs.schema.fields]
    packed = pack_sequences(
        docs, id_col="doc_id", token_col="nt", group_col="lang"
    )
    assert [f.name for f in docs.schema.fields] == before
    # and calling it twice on the same input still resolves
    again = pack_sequences(
        docs, id_col="doc_id", token_col="nt", group_col="lang"
    )
    assert packed.count() == again.count() == 7


def test_token_col_default_counts_whitespace_tokens(spark):
    docs = spark.createDataFrame(
        [("a", 1, "one two three"), ("a", 2, "four")],
        "lang string, doc_id long, text string",
    )
    out = pack_sequences(
        docs, id_col="doc_id", group_col="lang", max_tokens=3
    )
    rows = {r["doc"]: (r["n_tokens"], r["bin"]) for r in out.collect()}
    assert rows == {1: (3, 0), 2: (1, 1)}


def test_next_fit_invariants_random_corpus(spark):
    """Invariants that hold for ANY corpus (seeded pseudo-random here):
    bin ids are contiguous from 0 per group; bin ids never decrease in
    id order; every bin's total fits max_tokens unless it holds exactly
    one oversize doc."""
    import random

    rng = random.Random(7)
    max_tokens = 100
    rows = [
        (f"g{rng.randrange(3)}", i, rng.choice([1, 5, 40, 60, 99, 150, 250]))
        for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "lang string, doc_id long, nt long")
    out = pack_sequences(
        docs, id_col="doc_id", token_col="nt", group_col="lang",
        max_tokens=max_tokens,
    ).collect()
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r["grp"], []).append(r)
    assert sum(len(v) for v in by_group.values()) == 300
    for grp, rs in by_group.items():
        rs.sort(key=lambda r: r["doc"])
        bins = [r["bin"] for r in rs]
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
        totals: dict = {}
        counts: dict = {}
        for r in rs:
            totals[r["bin"]] = totals.get(r["bin"], 0) + r["n_tokens"]
            counts[r["bin"]] = counts.get(r["bin"], 0) + 1
        for b, total in totals.items():
            assert total <= max_tokens or counts[b] == 1, (grp, b, total)


def test_chunk_documents_windows_and_overlap(spark):
    from storage_spark.operators.pipeline import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "only three tokens"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap_tokens=1)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 1: stride 3 -> ceil((10-1)/3)=3 chunks: [0:4),[3:7),[6:10)
    assert [rows[(1, i)].text_chunk for i in range(3)] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
    ]
    # every token appears in at least one chunk; overlap duplicates t3/t6
    all_toks = " ".join(rows[(1, i)].text_chunk for i in range(3)).split()
    assert set(all_toks) == {f"t{i}" for i in range(10)}
    # short doc: single partial chunk
    assert rows[(2, 0)].text_chunk == "only three tokens"
    assert rows[(2, 0)].n_chunk_tokens == 3
    assert (2, 1) not in rows
    # single-token doc still emits one chunk
    assert rows[(3, 0)].text_chunk == "x"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap_tokens=4)
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)


def test_packing_efficiency_math(spark):
    packed = pack_sequences(
        _corpus(spark),
        id_col="doc_id",
        token_col="nt",
        group_col="lang",
        max_tokens=128,
    )
    eff = {r["grp"]: r.asDict() for r in
           packing_efficiency(packed, max_tokens=128).collect()}
    a = eff["a"]
    # bins: {0: 120, 1: 30, 2: 200, 3: 10} -> 4 bins, 360 tokens, 1 oversize
    assert (a["n_bins"], a["n_docs"], a["total_tokens"]) == (4, 5, 360)
    assert a["n_oversize_bins"] == 1
    assert a["util_1e4"] == round(360 / (4 * 128) * 10000)
    b = eff["b"]
    assert (b["n_bins"], b["n_docs"], b["total_tokens"]) == (2, 2, 129)
    assert b["n_oversize_bins"] == 0
