"""asof_join cross-validated against pandas.merge_asof — the canonical
single-node reference implementation — over randomized keyed frames, all
three directions, with and without tolerance.

Right timestamps are made UNIQUE per key so the comparison is
tiebreak-free (pandas resolves equal-timestamp ties by row order, ours by
the explicit tiebreak column; that semantic knob is pinned separately in
test_temporal.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from storage_spark.operators.temporal import asof_join


def _frames(seed: int):
    rng = np.random.RandomState(seed)
    n_l, n_r = 200, 120
    keys = np.array(["k%d" % i for i in range(6)])
    left = pd.DataFrame(
        {
            "k": rng.choice(keys, n_l),
            "t": rng.randint(0, 10_000, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(keys, n_r),
            "rt": rng.choice(
                np.arange(0, 10_000, 7, dtype="int64"), n_r, replace=False
            ),
            "payload": np.arange(n_r, dtype="int64") * 10,
        }
    )
    # unique rt per key (unique globally here) → tie-free comparison
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = tolerance
    exp = pd.merge_asof(
        left.sort_values(["t", "lid"]),
        right.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
        direction=direction,
        allow_exact_matches=True,
        **kw,
    )
    return {
        int(r.lid): (None if pd.isna(r.rt) else int(r.rt),
                     None if pd.isna(r.payload) else int(r.payload))
        for r in exp.itertuples(index=False)
    }


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("tolerance", [None, 500])
def test_asof_matches_pandas_merge_asof(spark, direction, seed, tolerance):
    left, right = _frames(seed)
    got_df = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_ts="t",
        right_ts="rt",
        right_cols=["payload"],
        direction=direction,
        tolerance=tolerance,
    )
    got = {
        int(r["lid"]): (r["rt"], r["payload"]) for r in got_df.collect()
    }
    exp = _pandas_asof(left, right, direction, tolerance)
    assert len(got) == len(exp) == len(left)
    diffs = {k: (got[k], exp[k]) for k in exp if got[k] != exp[k]}
    assert not diffs, f"first diffs: {dict(list(diffs.items())[:5])}"


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_bucketed_asof_equals_plain(spark, direction):
    """asof_join_bucketed (skew-splitting (key, time-bucket) windows) is
    row-identical to asof_join at the same tolerance."""
    from storage_spark.operators.temporal import asof_join_bucketed

    left, right = _frames(7)
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    kw = dict(
        on="k", left_ts="t", right_ts="rt",
        right_cols=["payload"], tolerance=700, direction=direction,
    )
    plain = {
        int(r["lid"]): (r["rt"], r["payload"])
        for r in asof_join(sl, sr, **kw).collect()
    }
    bucketed = {
        int(r["lid"]): (r["rt"], r["payload"])
        for r in asof_join_bucketed(sl, sr, **kw).collect()
    }
    assert plain == bucketed


def test_bucketed_asof_requires_tolerance(spark):
    from storage_spark.operators.temporal import asof_join_bucketed

    left, right = _frames(0)
    with pytest.raises(ValueError):
        asof_join_bucketed(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="k", left_ts="t", right_ts="rt", tolerance=0,
        )
