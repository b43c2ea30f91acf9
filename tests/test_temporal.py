"""As-of and interval join semantics (storage_spark/operators/temporal.py).

Cross-validated two ways: hand-built edge-case frames here, and the
documents/events-scale DuckDB oracles in tests/test_queries_parity.py
(`asof_latest_object`, `interval_upload_contention`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storage_spark.operators.temporal import asof_join, interval_join


def _asof(spark, **kw):
    left = spark.createDataFrame(
        [
            ("a", 100, "e1"),
            ("a", 205, "e2"),
            ("a", 300, "e3"),
            ("b", 50, "e4"),  # before any right row for b
            ("c", 999, "e5"),  # key absent on the right
        ],
        "k string, t long, ev string",
    )
    right = spark.createDataFrame(
        [
            ("a", 100, 1, "r-a-100"),  # equal-ts: inclusive
            ("a", 200, 2, "r-a-200-lo"),
            ("a", 200, 3, "r-a-200-hi"),  # equal right ts: tiebreak max wins
            ("a", 250, 4, "r-a-250"),
            ("b", 60, 5, "r-b-60"),
        ],
        "k string, rt long, rid long, payload string",
    )
    return asof_join(left, right, on="k", left_ts="t", right_ts="rt", **kw)


def test_asof_backward_inclusive_and_tiebreak(spark):
    out = {
        r["ev"]: (r["payload"], r["rt"])
        for r in _asof(spark, tiebreak="rid").collect()
    }
    assert out["e1"] == ("r-a-100", 100)  # rt == t matches (inclusive)
    assert out["e2"] == ("r-a-200-hi", 200)  # equal-ts winner = max rid
    assert out["e3"] == ("r-a-250", 250)
    assert out["e4"] == (None, None)  # left-outer: unmatched survives
    assert out["e5"] == (None, None)


def test_asof_tolerance_boundary(spark):
    rows = {
        r["ev"]: r["payload"]
        for r in _asof(spark, tiebreak="rid", tolerance=50).collect()
    }
    # e3: t=300, match rt=250, age 50 == tolerance → kept (<= semantics)
    assert rows["e3"] == "r-a-250"
    rows = {
        r["ev"]: r["payload"]
        for r in _asof(spark, tiebreak="rid", tolerance=49).collect()
    }
    assert rows["e3"] is None  # age 50 > 49 → nulled
    assert rows["e2"] == "r-a-200-hi"  # age 5 unaffected


def test_asof_single_shuffle_no_join(spark):
    plan = _asof(spark, tiebreak="rid")._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoop", "SortMergeJoin"):
        assert bad not in plan
    # one hash-partitioning exchange on the key (plus nothing else)
    assert plan.count("hashpartitioning") == 1


def test_interval_join_basic_and_closed(spark):
    pts = spark.createDataFrame(
        [(1, 100), (2, 150), (3, 200), (4, 5000)], "pid long, t long"
    )
    ivs = spark.createDataFrame(
        [("w1", 100, 200), ("w2", 140, 160)], "wid string, s long, e long"
    )
    got = {
        (r["pid"], r["wid"])
        for r in interval_join(
            pts, ivs, "t", "s", "e", bin_width=50
        ).collect()
    }
    # half-open [s, e): t=100 in w1, t=150 in both, t=200 (== e) excluded
    assert got == {(1, "w1"), (2, "w1"), (2, "w2")}
    got_closed = {
        (r["pid"], r["wid"])
        for r in interval_join(
            pts, ivs, "t", "s", "e", bin_width=50, closed="both"
        ).collect()
    }
    assert got_closed == got | {(3, "w1")}


def test_interval_join_matches_inequality_join(spark, sf_dir):
    """Bin-bucketed plan == the naive non-equi join, row for row."""
    from storage_spark.tables import load_all

    t = load_all(spark, sf_dir)
    pts = t["objects"].select("id", "created_at_ms").limit(500)
    ivs = t["multipart_uploads"].select(
        F.col("id").alias("upload_id"),
        F.col("created_at_ms").alias("w_start"),
        (F.col("created_at_ms") + F.col("in_progress_size")).alias("w_end"),
    )
    fast = interval_join(
        pts, ivs, "created_at_ms", "w_start", "w_end", bin_width=600_000
    )
    naive = pts.join(
        ivs,
        (pts.created_at_ms >= ivs.w_start) & (pts.created_at_ms < ivs.w_end),
        "inner",
    )
    assert fast.count() == naive.count()
    assert fast.exceptAll(naive.select(*fast.columns)).count() == 0


def test_interval_join_derived_width_equals_explicit(spark):
    """VERDICT r6 #5b: bin_width=None (the default) derives W from the
    median interval length — the RESULT is W-invariant, so derived and
    explicit runs must match row-for-row; empty interval side falls back
    without error."""
    pts = spark.createDataFrame(
        [(i, i * 37 % 1000) for i in range(200)], "pid long, t long"
    )
    ivs = spark.createDataFrame(
        [("w%d" % i, i * 90, i * 90 + 40 + (i % 3) * 300) for i in range(11)],
        "wid string, s long, e long",
    )
    want = sorted(
        (r["pid"], r["wid"])
        for r in interval_join(pts, ivs, "t", "s", "e", bin_width=50).collect()
    )
    got = sorted(
        (r["pid"], r["wid"])
        for r in interval_join(pts, ivs, "t", "s", "e").collect()
    )
    assert got == want and len(want) > 0
    empty = ivs.filter("s > 100000")
    assert interval_join(pts, empty, "t", "s", "e").count() == 0


def test_interval_join_plan_is_equi(spark):
    pts = spark.range(100).select(
        F.col("id").alias("pid"), (F.col("id") * 10).alias("t")
    )
    ivs = spark.range(10).select(
        F.col("id").alias("wid"),
        (F.col("id") * 100).alias("s"),
        (F.col("id") * 100 + 120).alias("e"),
    )
    plan = (
        interval_join(pts, ivs, "t", "s", "e", bin_width=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_interval_join_rejects_bad_closed(spark):
    pts = spark.range(1).select(F.col("id").alias("t"))
    with pytest.raises(ValueError):
        interval_join(pts, pts, "t", "t", "t", closed="right")


def test_asof_forward_direction(spark):
    out = {
        r["ev"]: (r["payload"], r["rt"])
        for r in _asof(spark, tiebreak="rid", direction="forward").collect()
    }
    assert out["e1"] == ("r-a-100", 100)  # rt == t still matches (inclusive)
    # e2 (t=205): earliest rt >= 205 is 250
    assert out["e2"] == ("r-a-250", 250)
    assert out["e3"] == (None, None)  # nothing at/after 300
    assert out["e4"] == ("r-b-60", 60)  # forward fills what backward missed
    assert out["e5"] == (None, None)


def test_asof_forward_tolerance(spark):
    rows = {
        r["ev"]: r["payload"]
        for r in _asof(
            spark, tiebreak="rid", direction="forward", tolerance=45
        ).collect()
    }
    # e2: match at 250, 45 ahead of t=205 → kept at tolerance 45 (<=)
    assert rows["e2"] == "r-a-250"
    rows = {
        r["ev"]: r["payload"]
        for r in _asof(
            spark, tiebreak="rid", direction="forward", tolerance=44
        ).collect()
    }
    assert rows["e2"] is None
    assert rows["e1"] == "r-a-100"  # zero-distance match unaffected


def test_asof_rejects_bad_direction(spark):
    import pytest

    with pytest.raises(ValueError):
        _asof(spark, direction="sideways")


def test_asof_nearest_direction(spark):
    out = {
        r["ev"]: (r["payload"], r["rt"])
        for r in _asof(spark, tiebreak="rid", direction="nearest").collect()
    }
    assert out["e1"] == ("r-a-100", 100)  # exact hit
    # e2 (t=205): backward 200 (Δ5) beats forward 250 (Δ45)
    assert out["e2"] == ("r-a-200-hi", 200)
    assert out["e3"] == ("r-a-250", 250)  # only backward exists
    assert out["e4"] == ("r-b-60", 60)  # only forward exists
    assert out["e5"] == (None, None)


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame([("a", 100, "e")], "k string, t long, ev string")
    right = spark.createDataFrame(
        [("a", 90, 1, "back"), ("a", 110, 2, "fwd")],
        "k string, rt long, rid long, payload string",
    )
    row = asof_join(
        left, right, on="k", left_ts="t", right_ts="rt",
        tiebreak="rid", direction="nearest",
    ).collect()[0]
    assert row["payload"] == "back"  # |Δ|=10 both ways → backward wins


def test_asof_nearest_tolerance_is_symmetric(spark):
    rows = {
        r["ev"]: r["payload"]
        for r in _asof(
            spark, tiebreak="rid", direction="nearest", tolerance=10
        ).collect()
    }
    assert rows["e2"] == "r-a-200-hi"  # Δ5 within 10
    assert rows["e4"] == "r-b-60"  # forward Δ10 == tolerance → kept
    rows9 = {
        r["ev"]: r["payload"]
        for r in _asof(
            spark, tiebreak="rid", direction="nearest", tolerance=9
        ).collect()
    }
    assert rows9["e4"] is None  # Δ10 > 9 → nulled, symmetric bound
    assert rows9["e2"] == "r-a-200-hi"


def test_asof_nearest_single_exchange(spark):
    plan = (
        _asof(spark, tiebreak="rid", direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("hashpartitioning") == 1  # two windows, ONE shuffle
    for bad in ("CartesianProduct", "BroadcastNestedLoop", "SortMergeJoin"):
        assert bad not in plan


def test_interval_join_with_equi_keys(spark):
    pts = spark.createDataFrame(
        [("u1", 1, 150), ("u2", 2, 150)], "k string, pid long, t long"
    )
    ivs = spark.createDataFrame(
        [("u1", "w1", 100, 200), ("u2", "w2", 100, 200), ("u1", "w3", 300, 400)],
        "k string, wid string, s long, e long",
    )
    got = {
        (r["pid"], r["wid"])
        for r in interval_join(
            pts, ivs, "t", "s", "e", on="k", bin_width=50
        ).collect()
    }
    # same timestamp, but the key keeps each point in its own window
    assert got == {(1, "w1"), (2, "w2")}


def test_asof_null_payload_is_not_filled_through(spark):
    """A genuinely-NULL payload field in the matched right row must come
    through as NULL — not be 'filled' by an older right row's value
    (row-atomic struct fill regression test)."""
    left = spark.createDataFrame(
        [("a", 300, "e1"), ("a", 150, "e2")], "k string, t long, ev string"
    )
    right = spark.createDataFrame(
        [("a", 100, 1, "x"), ("a", 200, 2, None)],
        "k string, rt long, rid long, payload string",
    )
    for direction in ("backward", "nearest"):
        out = {
            r["ev"]: (r["rt"], r["payload"])
            for r in asof_join(
                left, right, on="k", left_ts="t", right_ts="rt",
                tiebreak="rid", direction=direction,
            ).collect()
        }
        # e1 matches rt=200 whose payload IS null — must stay null
        assert out["e1"] == (200, None), direction
        # e2 matches rt=100 normally
        assert out["e2"] == (100, "x"), direction
    fwd = {
        r["ev"]: (r["rt"], r["payload"])
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="rt",
            tiebreak="rid", direction="forward",
        ).collect()
    }
    assert fwd["e2"] == (200, None)


def test_asof_tolerance_auto_routes_to_bucketed_plan(spark):
    """Skew policy: a tolerance auto-routes through the (key, time-bucket)
    windows — the per-task-bounded plan — unless bucketed=False forces
    the plain one. Detected via the bucket column in the analyzed plan;
    row-equality of the two plans is property-tested elsewhere."""
    left = spark.createDataFrame(
        [("a", t, t) for t in range(0, 1000, 7)], "k string, t long, ev long"
    )
    right = spark.createDataFrame(
        [("a", t, t) for t in range(0, 1000, 13)], "k string, rt long, rid long"
    )
    kw = dict(on="k", left_ts="t", right_ts="rt", tiebreak="rid")
    routed = asof_join(left, right, tolerance=100, **kw)
    plain = asof_join(left, right, tolerance=100, bucketed=False, **kw)
    assert "_asof_bucket" in routed._jdf.queryExecution().analyzed().toString()
    assert "_asof_bucket" not in plain._jdf.queryExecution().analyzed().toString()
    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_asof_bucketed_true_requires_tolerance(spark):
    left = spark.createDataFrame([("a", 1, 1)], "k string, t long, ev long")
    right = spark.createDataFrame([("a", 1, 1)], "k string, rt long, rid long")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(
            left, right, on="k", left_ts="t", right_ts="rt", bucketed=True
        )


def test_asof_max_rows_per_key_guard(spark):
    from storage_spark.operators.temporal import AsofSkewError

    left = spark.createDataFrame(
        [("hot", t, t) for t in range(200)] + [("cold", 1, 1)],
        "k string, t long, ev long",
    )
    right = spark.createDataFrame(
        [("hot", 5, 1), ("cold", 5, 2)], "k string, rt long, rid long"
    )
    kw = dict(on="k", left_ts="t", right_ts="rt", tiebreak="rid")
    with pytest.raises(AsofSkewError, match="201 rows"):
        asof_join(left, right, max_rows_per_key=100, **kw)
    # budget >= hottest key → runs fine
    assert asof_join(left, right, max_rows_per_key=201, **kw).count() == 201


def test_asof_reserved_column_names_raise(spark):
    right = spark.createDataFrame([("a", 1, 1)], "k string, rt long, rid long")
    for bad in ("_asof_bucket", "_r_pack", "_m", "_l_x"):
        left = spark.createDataFrame(
            [("a", 1, 1)], f"k string, t long, `{bad}` long"
        )
        with pytest.raises(ValueError, match="reserve"):
            asof_join(left, right, on="k", left_ts="t", right_ts="rt")
    from storage_spark.operators.temporal import asof_join_bucketed

    left = spark.createDataFrame(
        [("a", 1, 1)], "k string, t long, `_asof_bucket` long"
    )
    with pytest.raises(ValueError, match="reserve"):
        asof_join_bucketed(
            left, right, on="k", left_ts="t", right_ts="rt", tolerance=10
        )


def test_interval_join_corrupt_interval_costs_nothing(spark):
    """end < start would make sequence() step -1 and explode a huge
    descending bin array; the guard drops the row at the explode instead.
    start == epoch-ms magnitude so an unguarded explode would be ~850k
    rows — the fast return IS the assertion."""
    points = spark.createDataFrame([(50,), (0,)], "t long")
    intervals = spark.createDataFrame(
        [(0, 100, "ok"), (3_000_000_000_000, 0, "corrupt")],
        "s long, e long, iv string",
    )
    out = interval_join(
        points, intervals, point_ts="t", start_col="s", end_col="e",
        bin_width=3_600_000,
    )
    assert sorted(r["iv"] for r in out.collect()) == ["ok", "ok"]


def test_asof_suffixed_output_name_collision_raises(spark):
    """left has both 'rt' and 'rt_right': the matched-timestamp output
    name would duplicate the carried left column — raise, don't emit an
    ambiguous frame."""
    left = spark.createDataFrame(
        [("a", 1, 5, 6)], "k string, t long, rt long, rt_right long"
    )
    right = spark.createDataFrame([("a", 1, 1)], "k string, rt long, rid long")
    with pytest.raises(ValueError, match="suffix"):
        asof_join(left, right, on="k", left_ts="t", right_ts="rt")


def test_asof_tolerance_zero_stays_plain_and_matches_exact_only(spark):
    """tolerance=0 = exact-timestamp-only matching; it defines no bucket
    width, so it must run the plain plan, not raise through the router."""
    left = spark.createDataFrame(
        [("a", 100, "e1"), ("a", 150, "e2")], "k string, t long, ev string"
    )
    right = spark.createDataFrame(
        [("a", 100, 1, "x"), ("a", 140, 2, "y")],
        "k string, rt long, rid long, payload string",
    )
    out = {
        r["ev"]: r["payload"]
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="rt",
            tiebreak="rid", tolerance=0,
        ).collect()
    }
    assert out == {"e1": "x", "e2": None}


def test_asof_nearest_no_tiebreak_single_window_single_sort(spark):
    """VERDICT r5 #7: without a tiebreak the forward fill shares the
    backward fill's window spec (same partitioning AND same sort), so
    the whole nearest plan is ONE Window operator over one
    per-partition sort — the second sort only exists to elect the
    highest-tiebreak winner among equal-t' rights. Semantics are
    unchanged: equal-t rights leave the forward frame but win through
    the backward frame at delta=0 (ties go backward)."""
    left = spark.createDataFrame(
        [("a", 100, "e1"), ("a", 205, "e2"), ("b", 50, "e4")],
        "k string, t long, ev string",
    )
    right = spark.createDataFrame(
        [("a", 100, "exact"), ("a", 200, "back"), ("a", 250, "fwd"),
         ("b", 60, "after")],
        "k string, rt long, payload string",
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="rt", direction="nearest"
    )
    # inspect the plan BEFORE collect: post-execution AQE plan strings
    # repeat the exchange (query-stage + exchange node)
    plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    rows = {r["ev"]: (r["payload"], r["rt"]) for r in out.collect()}
    assert rows["e1"] == ("exact", 100)   # equal-t right wins via backward
    assert rows["e2"] == ("back", 200)    # d5 beats d45
    assert rows["e4"] == ("after", 60)    # forward-only
    assert plan.count("hashpartitioning") == 1
    # one Window node (both fills inside), one sort feeding it
    assert plan.count("Window [") == 1
    assert plan.count("Sort [") == 1
    # the tiebreak path still pays its documented second sort
    plan_tb = (
        _asof(spark, tiebreak="rid", direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan_tb.count("Window [") == 2
