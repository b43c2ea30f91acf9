"""Embedding-provider dispatch (functions/embedder.py) — the fastcodec
pattern for extract_embeddings: selection rules, env-flag resolution,
injected-provider glue through the real Arrow stage, and fail-fast
validation of misbehaving providers."""

from __future__ import annotations

import pytest

from storage_spark.functions.embedder import (
    EMBEDDER_ENV,
    fake_embed_batch,
    select_embedder,
    validate_batch,
)


def test_selection_defaults_to_fake(monkeypatch):
    monkeypatch.delenv(EMBEDDER_ENV, raising=False)
    assert select_embedder() is fake_embed_batch


def test_explicit_callable_wins(monkeypatch):
    monkeypatch.setenv(
        EMBEDDER_ENV, "storage_spark.functions.embedder:fake_embed_batch"
    )
    fn = lambda batch, dim: [[0.0] * dim for _ in batch]  # noqa: E731
    assert select_embedder(fn) is fn


def test_env_flag_resolves_import_target(monkeypatch):
    monkeypatch.setenv(
        EMBEDDER_ENV, "storage_spark.functions.embedder:fake_embed_batch"
    )
    assert select_embedder() is fake_embed_batch
    # dotted form resolves too
    assert (
        select_embedder("storage_spark.functions.embedder.fake_embed_batch")
        is fake_embed_batch
    )


def test_bad_env_flag_raises_loudly(monkeypatch):
    for bad in ("no.such.module:fn",
                "storage_spark.functions.embedder:nope",
                "storage_spark.functions.embedder:EMBEDDER_ENV",
                "justonename"):
        with pytest.raises(RuntimeError):
            select_embedder(bad)


def test_fake_batch_matches_legacy_per_item_semantics():
    # identical bytes -> identical vector; range bound; exact dim
    vecs = fake_embed_batch([b"same", b"same", b"other"], 7)
    assert vecs[0] == vecs[1] != vecs[2]
    assert all(len(v) == 7 for v in vecs)
    assert all(-1.0 <= x <= 1.0 for v in vecs for x in v)


def test_validate_batch_fails_fast():
    with pytest.raises(ValueError):
        validate_batch([[0.0] * 4], 2, 4, "p")  # wrong count
    with pytest.raises(ValueError):
        validate_batch([[0.0] * 3, [0.0] * 4], 2, 4, "p")  # wrong dim
    with pytest.raises(ValueError):
        validate_batch([None, [0.0] * 4], 2, 4, "p")  # null vector
    got = validate_batch([[1, 2], [3, 4]], 2, 2, "p")
    assert got == [[1.0, 2.0], [3.0, 4.0]]


def test_stage_runs_injected_provider(spark):
    """The real Arrow stage dispatches an injected batch provider — the
    production shape for a deployment with an actual encoder, tested via
    a fake provider exactly like test_fastcodec."""
    from storage_spark.operators.multimodal import extract_embeddings

    def length_embedder(batch, dim):
        return [[float(len(b))] * dim for b in batch]

    blobs = spark.createDataFrame(
        [("a", b"xy"), ("b", b"xyzw")], "key string, content binary"
    )
    got = {
        r.key: r.embedding
        for r in extract_embeddings(
            blobs, dim=3, embedder=length_embedder
        ).collect()
    }
    assert got == {"a": [2.0, 2.0, 2.0], "b": [4.0, 4.0, 4.0]}


def test_stage_default_is_the_deterministic_fake(spark):
    from storage_spark.operators.multimodal import extract_embeddings

    blobs = spark.createDataFrame(
        [("a", b"payload")], "key string, content binary"
    )
    [row] = extract_embeddings(blobs, dim=8).collect()
    expected = fake_embed_batch([b"payload"], 8)[0]
    assert [pytest.approx(x, abs=1e-6) for x in expected] == list(row.embedding)


def test_stage_fails_fast_on_wrong_dim_provider(spark):
    from storage_spark.operators.multimodal import extract_embeddings

    def broken(batch, dim):
        return [[0.0] * (dim + 1) for _ in batch]

    blobs = spark.createDataFrame(
        [("a", b"x")], "key string, content binary"
    )
    with pytest.raises(Exception, match="dim|vector"):
        extract_embeddings(blobs, dim=4, embedder=broken).collect()
