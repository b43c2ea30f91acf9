"""Sessionization — event-stream session assignment and per-session
rollups (extension surface; the reference's queue layer is task-parallel
and has no event-time windows, SURVEY §2.10 T11).

Two equivalent formulations, cross-validated in tests:

- ``sessionize`` / ``session_stats``: the relational gaps-and-islands
  plan — per key, a new session opens when the gap to the previous event
  is >= ``gap_seconds`` (lag + running sum). One shuffle on the session
  key with a per-key sort; works identically on any engine, which is
  what the DuckDB oracle replays.
- ``session_window_stats``: Spark's native ``F.session_window``
  aggregation — the same semantics as a streaming-capable operator
  (works unchanged under ``readStream`` + watermark, where the state
  store merges windows incrementally instead of sorting partitions).

Boundary convention (both paths): an event exactly ``gap_seconds`` after
its predecessor starts a NEW session — matching ``session_window``'s
half-open [ts, ts+gap) extension.

At 100 TB: gaps-and-islands costs one hash shuffle on the key plus a
per-partition sort (Spark spills sorts; no driver state); the native
session_window path is the streaming answer where the corpus never
lands at rest. Skewed keys (one bot user = 10^9 events) are the hazard:
cap per-key event counts upstream or bucket the key with a time prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Assign ``session_idx`` (0-based per key, in time order) to every
    event row. Ties on the timestamp share a session regardless of
    tiebreak order (their gap is 0); the tiebreak only pins a total
    order for determinism of row-level lag."""
    ts_ms = F.unix_millis(F.col(ts_col))
    order = [F.col(ts_col).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    prev_ms = F.lag(ts_ms).over(w)
    opens = F.when(
        prev_ms.isNull() | (ts_ms - prev_ms >= gap_seconds * 1000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_idx",
        (F.sum(opens).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1).cast("bigint"),
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session rollup: event count, start/end (ms), duration. The
    aggregate after sessionize is map-side partial on (key, session)."""
    s = sessionize(events, key_col, ts_col, gap_seconds)
    ts_ms = F.unix_millis(F.col(ts_col))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_ms).alias("start_ms"),
        F.max(ts_ms).alias("end_ms"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("bigint")).alias(
                "value_cents"
            )
        )
    out = s.groupBy(key_col, "session_idx").agg(*aggs)
    return out.withColumn(
        "duration_ms", F.col("end_ms") - F.col("start_ms")
    )


def session_window_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    value_col: str | None = "value",
) -> DataFrame:
    """The same rollup via Spark's native session_window aggregation —
    streaming-capable (attach a watermark and this exact plan runs under
    writeStream with incremental window merge). Batch output is proven
    equal to session_stats in tests; ``start_ms`` matches, the native
    window end is last_event + gap so ``end_ms`` is normalized back to
    the last event timestamp."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.unix_millis(F.col(ts_col))).alias("end_ms"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("bigint")).alias(
                "value_cents"
            )
        )
    out = events.groupBy(
        F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
        F.col(key_col),
    ).agg(*aggs)
    return out.select(
        key_col,
        F.unix_millis(F.col("session_window.start")).alias("start_ms"),
        "end_ms",
        "n_events",
        *([ "value_cents"] if value_col is not None else []),
    ).withColumn("duration_ms", F.col("end_ms") - F.col("start_ms"))


def detect_gaps(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    min_gap_ms: int = 3_600_000,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Silence detection — the inverse of sessionization: per key, emit
    one row for every stretch of at least ``min_gap_ms`` with no events
    (heartbeat monitoring, feed-outage audits). ``lead`` over the same
    keyed sort sessionize uses — one shuffle on the key, integer
    epoch-ms arithmetic throughout (engine-exact; no timestamp
    subtraction semantics to disagree on).

    Returns (key, gap_start_ms, gap_end_ms, gap_ms): the last event
    before the silence and the first event after it. Trailing silence
    (after a key's last event) has no bounding successor and is a
    stream-time concern (watermarks), not a batch row.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    ms = F.unix_millis(F.col(ts_col))
    nxt = F.lead(ms).over(w)
    return (
        events.select(
            F.col(key_col),
            ms.alias("gap_start_ms"),
            nxt.alias("gap_end_ms"),
        )
        .where(
            F.col("gap_end_ms").isNotNull()
            & (F.col("gap_end_ms") - F.col("gap_start_ms") >= min_gap_ms)
        )
        .withColumn("gap_ms", F.col("gap_end_ms") - F.col("gap_start_ms"))
    )


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_ms: int = 604_800_000,
) -> DataFrame:
    """Cohort retention — the product-analytics staple: users grouped by
    the period of their FIRST event; for each (cohort, periods-since)
    offset, how many distinct cohort members were active.

    All period arithmetic is integer epoch-ms division (engine-exact;
    default period = 1 week). Plan: one distinct-activity aggregate per
    (user, period) — count(DISTINCT) is natively skew-safe in Spark —
    one tiny min-per-user aggregate for the cohort assignment, joined
    back on the user key, then the final (cohort, offset) rollup. Three
    shuffles, each keyed finer→coarser; no window functions, so no
    single-partition hazard at any fan-in.

    Returns (cohort_period, period_offset, n_active) with offset 0 being
    the cohort's own first period (n_active = cohort size).
    """
    ms = F.unix_millis(F.col(ts_col))
    activity = (
        events.select(
            F.col(key_col).alias("_k"),
            F.floor(ms / period_ms).cast("long").alias("_p"),
        )
        .distinct()
    )
    cohorts = activity.groupBy("_k").agg(F.min("_p").alias("_c"))
    return (
        activity.join(cohorts, "_k")
        .groupBy(
            F.col("_c").alias("cohort_period"),
            (F.col("_p") - F.col("_c")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_ms: int | None = None,
) -> DataFrame:
    """Ordered funnel analysis: how many users completed step 1, then
    step 2 strictly after their step-1 time, and so on — with an
    optional ``within_ms`` horizon from the FIRST step's timestamp.

    Earliest-entry semantics (the standard funnel definition): each
    step's timestamp is the user's EARLIEST qualifying event after the
    previous step — greedy-earliest maximizes conversion counts for
    strictly ordered funnels. Plan: ONE conditional-aggregation pass per
    step over the (already tiny) per-user event set — step i is
    ``min(ts) FILTER (type = steps[i] AND ts > t_{i-1})``, computed by
    re-aggregating the events joined to the accumulated per-user step
    times. len(steps) keyed aggregations + joins, no windows, integer
    epoch-ms throughout.

    Returns one row per step: (step_index, step_name, n_users).
    """
    ms = F.unix_millis(F.col(ts_col))
    ev = events.select(
        F.col(key_col).alias("_k"),
        F.col(type_col).alias("_ty"),
        ms.alias("_t"),
    )
    # per-user running state: _s{i} = earliest ms of step i after _s{i-1}
    state = (
        ev.filter(F.col("_ty") == steps[0])
        .groupBy("_k")
        .agg(F.min("_t").alias("_s0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        prev = f"_s{i - 1}"
        sel = ["_k", prev] if prev == "_s0" else ["_k", "_s0", prev]
        cond = F.col("_t") > F.col(prev)
        if within_ms is not None:
            # EVERY step must land inside the horizon from step 1
            cond &= F.col("_t") - F.col("_s0") <= within_ms
        nxt = (
            ev.filter(F.col("_ty") == step)
            .join(state.select(*sel), "_k")
            .filter(cond)
            .groupBy("_k")
            .agg(F.min("_t").alias(f"_s{i}"))
        )
        state = state.join(nxt, "_k", "left")
    counts = state.agg(
        *[
            F.count(F.col(f"_s{i}")).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    rows = [
        F.struct(
            F.lit(i).cast("long").alias("step_index"),
            F.lit(s).alias("step_name"),
            F.col(f"n{i}").alias("n_users"),
        )
        for i, s in enumerate(steps)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
