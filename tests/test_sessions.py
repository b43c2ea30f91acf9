"""Sessionization: gaps-and-islands vs native session_window equivalence,
boundary semantics, and the streaming-capable plan draining correctly."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from storage_spark.operators.sessions import (
    session_stats,
    session_window_stats,
    sessionize,
)
from storage_spark.tables import load_all


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime(2024, 1, 1, 0, s // 60, s % 60), u, 1.0)
            for i, (u, s) in enumerate(rows)
        ],
        "event_id bigint, ts timestamp, user_id bigint, value double",
    )


def test_gap_boundary_is_half_open(spark):
    # events at t=0 and t=+gap exactly → TWO sessions (matches
    # session_window's [ts, ts+gap) extension); t=+gap-1s → one session
    df = _ev(spark, [(1, 0), (1, 30)])
    out = sessionize(df, gap_seconds=30)
    assert sorted(r["session_idx"] for r in out.collect()) == [0, 1]
    df2 = _ev(spark, [(1, 0), (1, 29)])
    out2 = sessionize(df2, gap_seconds=30)
    assert sorted(r["session_idx"] for r in out2.collect()) == [0, 0]


def test_sessions_are_per_key_and_zero_based(spark):
    df = _ev(spark, [(1, 0), (1, 100), (2, 0), (2, 5), (2, 200)])
    got = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in sessionize(df, gap_seconds=60).collect()
    }
    assert got[(1, 0)] == 0 and got[(1, 1)] == 1
    assert got[(2, 2)] == 0 and got[(2, 3)] == 0 and got[(2, 4)] == 1


def test_stats_match_native_session_window(spark, sf_dir):
    ev = load_all(spark, sf_dir)["events"]
    a = {
        (r["user_id"], r["start_ms"]): (r["n_events"], r["end_ms"], r["value_cents"])
        for r in session_stats(ev, gap_seconds=1800).collect()
    }
    b = {
        (r["user_id"], r["start_ms"]): (r["n_events"], r["end_ms"], r["value_cents"])
        for r in session_window_stats(ev, gap_seconds=1800).collect()
    }
    assert a == b and len(a) > 0


def test_session_window_runs_as_stream(spark, tmp_path, sf_dir):
    """The native plan is streaming-capable: drain the same events through
    readStream + watermark + session_window and match the batch rollup."""
    path = str(tmp_path / "ev")
    ev = load_all(spark, sf_dir)["events"]
    ev.write.parquet(path)
    stream = spark.readStream.schema(ev.schema).parquet(path)
    windowed = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "1800 seconds"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start")).alias("start_ms"),
            "n_events",
        )
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["user_id"], r["start_ms"]): r["n_events"]
        for r in spark.table("sessions_stream").collect()
    }
    batch = {
        (r["user_id"], r["start_ms"]): r["n_events"]
        for r in session_stats(ev, gap_seconds=1800).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_detect_gaps_bounds_and_threshold(spark):
    from storage_spark.operators.sessions import detect_gaps

    rows = [
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:30:00"),  # 30 min — below threshold
        (3, 1, "2024-01-01 02:30:00"),  # 2h gap — emitted
        (4, 2, "2024-01-01 00:00:00"),  # single event: no bounded gap
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string"
    ).select("event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = detect_gaps(ev, min_gap_ms=3_600_000).collect()
    assert len(out) == 1
    g = out[0]
    assert g["user_id"] == 1
    assert g["gap_ms"] == 2 * 3_600_000
    assert g["gap_end_ms"] - g["gap_start_ms"] == g["gap_ms"]


def test_cohort_retention_small_case(spark):
    from storage_spark.operators.sessions import cohort_retention

    day = 86_400_000
    rows = [
        # u1: first period 0, active again period 2
        (1, 1, 0), (2, 1, 5 * day // 1000 * 1000), (3, 1, 2 * 7 * day),
        # u2: first period 1 only
        (4, 2, 8 * day),
    ]
    ev = spark.createDataFrame(
        [(e, u, ms) for e, u, ms in rows], "event_id long, user_id long, ms long"
    ).select("event_id", "user_id", F.timestamp_millis(F.col("ms")).alias("ts"))
    out = {
        (r["cohort_period"], r["period_offset"]): r["n_active"]
        for r in cohort_retention(ev, period_ms=7 * day).collect()
    }
    assert out == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_funnel_ordering_and_horizon(spark):
    from storage_spark.operators.sessions import funnel_conversion

    def ev(eid, uid, ty, ms):
        return (eid, uid, ty, ms)

    rows = [
        # u1 completes A->B->C in order
        ev(1, 1, "A", 1000), ev(2, 1, "B", 2000), ev(3, 1, "C", 3000),
        # u2 has B BEFORE A: B does not count; no B after A
        ev(4, 2, "B", 500), ev(5, 2, "A", 1000), ev(6, 2, "C", 2000),
        # u3 completes but C beyond the horizon
        ev(7, 3, "A", 0), ev(8, 3, "B", 10), ev(9, 3, "C", 99_999),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ms long"
    ).select(
        "event_id", "user_id", "event_type",
        F.timestamp_millis(F.col("ms")).alias("ts"),
    )
    out = {
        r["step_name"]: r["n_users"]
        for r in funnel_conversion(
            df, ["A", "B", "C"], within_ms=50_000
        ).collect()
    }
    assert out == {"A": 3, "B": 2, "C": 1}
