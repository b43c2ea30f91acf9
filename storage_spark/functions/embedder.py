"""Optional real-embedding provider dispatch — the ``fastcodec`` pattern
applied to the multimodal → vector bridge.

``operators.multimodal.extract_embeddings`` ships a DETERMINISTIC FAKE
featurizer (md5-seeded floats) so every downstream near-dup / ANN / semdedup
operator runs for real against reproducible vectors — that is the
oracle-replayable default and stays the default. This module is the escape
hatch for deployments that HAVE a real encoder (CLIP / wav2vec / ...):
the same Arrow stage runs an injected batch embedder instead, with the
provider resolved exactly like ``fastcodec.select_pixel_codec``:

- an explicit callable wins;
- else the ``STORAGE_SPARK_EMBEDDER`` environment flag names a
  ``module:function`` (or ``module.function``) import target — resolution
  failures raise loudly rather than silently degrading to the fake;
- else the deterministic fake.

Contract of a provider: ``fn(batch: list[bytes], dim: int) ->
list[list[float]]`` — BATCH-at-a-time, because that is the real inference
shape (one Arrow batch per call; a provider that loads a model should
cache it at module level so the load is paid once per executor process,
not per batch). Output is validated: one vector per input, each exactly
``dim`` floats — a wrong-dim embedding would silently poison every
downstream ANN index, so the stage fails fast instead.

Tested via an injected fake provider (this container ships no encoder
library), exactly like test_fastcodec.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, List

#: provider signature: (batch of content bytes, dim) -> batch of vectors
Embedder = Callable[[List[bytes], int], List[List[float]]]

#: environment flag naming the provider import target
EMBEDDER_ENV = "STORAGE_SPARK_EMBEDDER"


def fake_embed_batch(batch: List[bytes], dim: int) -> List[List[float]]:
    """The deterministic fake: md5-seeded floats in [-1, 1]; identical
    bytes → identical vector (the property every oracle-graded row and
    downstream dedup/ANN test relies on)."""
    out = []
    for b in batch:
        vec: list[float] = []
        i = 0
        while len(vec) < dim:
            h = hashlib.md5(bytes(b) + i.to_bytes(4, "big")).digest()
            # 4 floats per digest: each uint32 → [-1, 1]
            for j in range(0, 16, 4):
                if len(vec) >= dim:
                    break
                u = int.from_bytes(h[j : j + 4], "big")
                vec.append((u / 2147483647.5) - 1.0)
            i += 1
        out.append(vec)
    return out


def _import_target(spec: str) -> Embedder:
    """Resolve ``pkg.mod:fn`` (preferred) or ``pkg.mod.fn`` to a callable."""
    import importlib

    if ":" in spec:
        mod_name, _, fn_name = spec.partition(":")
    else:
        mod_name, _, fn_name = spec.rpartition(".")
    if not mod_name or not fn_name:
        raise RuntimeError(
            f"{EMBEDDER_ENV}={spec!r} is not a module:function target"
        )
    try:
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, fn_name)
    except (ImportError, AttributeError) as e:
        raise RuntimeError(
            f"{EMBEDDER_ENV}={spec!r} did not resolve to an importable "
            "callable; fix the flag or unset it to use the deterministic "
            "fake"
        ) from e
    if not callable(fn):
        raise RuntimeError(f"{EMBEDDER_ENV}={spec!r} resolved to a non-callable")
    return fn


def select_embedder(provider: Embedder | str | None = None) -> Embedder:
    """The embedder ``extract_embeddings`` should run: an explicit
    callable wins; a string (or the ``STORAGE_SPARK_EMBEDDER`` flag) is
    an import target that must resolve or raise; else the deterministic
    fake."""
    if callable(provider):
        return provider
    spec = provider or os.environ.get(EMBEDDER_ENV)
    if spec:
        return _import_target(spec)
    return fake_embed_batch


def validate_batch(
    vecs: List[List[float]], n_in: int, dim: int, provider_name: str
) -> List[List[float]]:
    """Fail fast on a misbehaving provider — count and per-vector dim
    must match exactly."""
    if len(vecs) != n_in:
        raise ValueError(
            f"embedder {provider_name} returned {len(vecs)} vectors "
            f"for {n_in} inputs"
        )
    for v in vecs:
        if v is None or len(v) != dim:
            raise ValueError(
                f"embedder {provider_name} returned a "
                f"{'null' if v is None else len(v)}-dim vector, want {dim}"
            )
    return [[float(x) for x in v] for v in vecs]
