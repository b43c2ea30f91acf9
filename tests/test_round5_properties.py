"""Property tests for the round-5 operators: proportional_sample's
Hare-quota guarantee and containment_pairs vs a brute-force reference."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# bounded group-size profiles: 1-5 groups, 1-40 docs each
profiles = st.lists(
    st.integers(min_value=1, max_value=40), min_size=1, max_size=5
)


@settings(max_examples=12, deadline=None)
@given(sizes=profiles, k_frac=st.floats(min_value=0.05, max_value=1.0))
def test_proportional_sample_hare_quota_property(spark, sizes, k_frac):
    """Largest-remainder apportionment satisfies the Hare-quota bound:
    every group's allocation is floor(k*n_g/N) or ceil(k*n_g/N), and the
    total is exactly k. Holds for every size profile and budget."""
    from storage_spark.operators.pipeline import proportional_sample

    n_total = sum(sizes)
    k = max(1, min(n_total, int(round(k_frac * n_total))))
    rows = [
        (g * 1000 + i, f"g{g}")
        for g, n in enumerate(sizes)
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = proportional_sample(docs, "lang", total_k=k).groupBy("lang").agg(
        F.count("*").alias("n")
    )
    got = {r["lang"]: r["n"] for r in out.collect()}
    assert sum(got.values()) == k
    for g, n in enumerate(sizes):
        exact = k * n / n_total
        assert math.floor(exact) <= got.get(f"g{g}", 0) <= math.ceil(exact)


WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]
doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=12),
    min_size=2,
    max_size=6,
)


def _shingles(tokens, n=3):
    return {
        " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    }


@settings(max_examples=12, deadline=None)
@given(docs=doc_strategy)
def test_containment_pairs_equals_bruteforce(spark, docs):
    from storage_spark.operators.dedup import containment_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_in"], r["doc_out"]): round(r["containment"], 9)
        for r in containment_pairs(df, n=3, min_containment=0.3).collect()
    }
    want = {}
    sh = {i: _shingles(toks) for i, toks in enumerate(docs)}
    for a in sh:
        for b in sh:
            if a == b or not sh[a]:
                continue
            c = len(sh[a] & sh[b]) / len(sh[a])
            if c >= 0.3:
                want[(a, b)] = round(c, 9)
    assert got == want
