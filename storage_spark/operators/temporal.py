"""Temporal joins — as-of (point-in-time) and interval (range) joins.

Extension surface: the reference engine has no temporal-join operator (its
queries are exact-key lookups; see SURVEY.md §2.13 extensions), but a
training-data / analytics engine needs both constantly — "state as of event
time" backfills (feature stores, slowly-changing catalogs) and
point-in-interval attribution (events inside maintenance / upload windows).
Spark has no built-in ASOF JOIN either, so both are built as compositions
of shuffle-friendly primitives:

- ``asof_join``: the union + running ``last(..., ignorenulls)`` plan.
  Tag both inputs, union them, and take the running last right-side value
  over a window partitioned by the join key and ordered by time — right
  rows sort *before* left rows at equal timestamps, which yields inclusive
  (``right_ts <= left_ts``) backward-as-of semantics. ONE hash shuffle on
  the key plus a per-partition sort; no range explosion, no broadcast of
  either side, and the running frame (UnboundedPreceding → CurrentRow) is
  evaluated incrementally by Spark's window operator. This is the classic
  distributed as-of plan (same shape Flink's temporal join and
  pandas.merge_asof's sort-merge use) and it survives 100 TB: cost is
  union-scan + one shuffle, identical to a plain sort-merge join.
- ``interval_join``: point-in-interval via **bin bucketing**. Intervals
  are exploded to the fixed-width time bins they overlap
  (``sequence(floor(start/W), floor(end/W))``), points map to exactly one
  bin, and the join becomes an equi-join on ``bin`` followed by the exact
  range predicate. A point's single bin meets a given interval at most
  once, so no post-join dedup is needed. Without this, Spark plans a
  non-equi join as BroadcastNestedLoop/cartesian — the bin column turns
  it into a hash-partitioned equi-join that scales linearly. Bin width is
  the knob: ~the median interval length keeps the blow-up factor near 2×
  (an interval of length L explodes to ceil(L/W)+1 bins); pathological
  long intervals should be capped or routed to a broadcast side.

Skew note (100 TB): both operators shuffle on a user-chosen key (as-of)
or on time bins (interval). Hot as-of keys behave like any skewed
window — AQE cannot split a window partition, so cap per-key row counts
upstream; hot bins (flash-crowd seconds) are bounded by W.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class AsofSkewError(Exception):
    """Raised by ``asof_join(..., max_rows_per_key=N)`` when a key's row
    count exceeds the caller's sort budget — the alternative is a silent
    one-task window sort that OOMs at scale. Pass a ``tolerance`` (which
    auto-routes through the bucketed plan) or raise the budget."""


# Internal column names used by the union+window plan. Input columns may
# not collide with these (or with the "_l_"-prefixed carried-left names) —
# a silent collision would corrupt the select, so it raises instead.
_RESERVED = ("_r_pack", "_m", "_f")


def _check_reserved(left: DataFrame, right: DataFrame) -> None:
    for side, df in (("left", left), ("right", right)):
        bad = [
            c
            for c in df.columns
            if c in _RESERVED
            or c.startswith("_l_")
            or c.startswith("_asof_")
        ]
        if bad:
            raise ValueError(
                f"asof_join reserves internal column names; rename {side} "
                f"column(s) {bad} (reserved: {list(_RESERVED)} plus the "
                "'_l_' and '_asof_' prefixes)"
            )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
    tolerance: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    bucketed: bool | None = None,
    max_rows_per_key: int | None = None,
    _internal: bool = False,
) -> DataFrame:
    """As-of join: for each left row, attach the closest right row on the
    same key — ``direction='backward'`` (default) takes the latest right
    row with ``right_ts <= left_ts``; ``'forward'`` the earliest with
    ``right_ts >= left_ts``. Both inclusive.

    Parameters
    ----------
    on : join key column name(s) present in both inputs.
    left_ts / right_ts : ordering columns (same comparable type — use
        epoch-ms BIGINT for engine-portable semantics).
    right_cols : right payload columns to attach (default: all non-key,
        non-ts right columns). Each lands as ``<col><suffix>`` if the name
        collides with a left column, else under its own name.
    tiebreak : optional right column ordering equal-``right_ts`` rows;
        the one sorting LAST wins (e.g. a monotonically increasing id →
        the highest id wins). Without it, equal-ts winners are
        nondeterministic, so pass one whenever right_ts can collide.
    tolerance : optional max staleness (same unit as the ts columns);
        matches further than ``tolerance`` from ``left_ts`` (older, for
        backward; newer, for forward) are nulled out.
    direction : 'backward', 'forward', or 'nearest'. Forward runs the
        identical one-shuffle plan on NEGATED time columns (so they must
        be numeric — use epoch-ms BIGINT, the engine-wide convention)
        and un-negates the matched timestamp on the way out; at equal
        ``right_ts`` the tiebreak winner is the same (highest) either
        way. Nearest computes BOTH fills in the same single shuffle (a
        second window over the same partitioning, reverse sort — one
        extra per-partition sort, no extra exchange) and picks the
        smaller |Δt| per row, ties to the backward side; ``tolerance``
        then filters the chosen match (pandas merge_asof semantics).

    Returns the left rows (all of them — left-outer semantics) with the
    attached right payload plus ``<right_ts><suffix>`` (the matched row's
    timestamp, null when no match).

    Skew policy (``bucketed``): when ``tolerance`` is given the join
    AUTO-ROUTES through the (key, time-bucket) windows of
    ``asof_join_bucketed`` — proven row-identical for all three
    directions (tests/test_temporal.py), and the only plan whose
    per-task sort state stays bounded under a hot key. ``bucketed=False``
    forces the plain single-window-per-key plan (the hazard shape — a
    10^9-row key sorts in ONE task; kept for measurement and for inputs
    known skew-free); ``bucketed=True`` asserts a tolerance was given.
    Without a tolerance there is no bucket width to split on, so the
    plain plan runs; pass ``max_rows_per_key`` to make that explicit —
    it runs one cheap keyed count over both inputs and raises
    ``AsofSkewError`` instead of silently planning a one-task sort.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest', "
            f"got {direction!r}"
        )
    if not _internal:
        _check_reserved(left, right)
    if bucketed is True and not tolerance:
        raise ValueError(
            "bucketed=True requires a positive tolerance (bucket width)"
        )
    # tolerance=0 is a valid exact-timestamp-only match but defines no
    # bucket width — it stays on the plain plan
    if tolerance and bucketed is not False:
        return asof_join_bucketed(
            left,
            right,
            on=on,
            left_ts=left_ts,
            right_ts=right_ts,
            right_cols=right_cols,
            tiebreak=tiebreak,
            tolerance=tolerance,
            suffix=suffix,
            direction=direction,
        )
    if max_rows_per_key is not None:
        keys_ = [on] if isinstance(on, str) else list(on)
        worst = (
            left.select(*keys_)
            .unionAll(right.select(*keys_))
            .groupBy(*keys_)
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        if worst is not None and worst > max_rows_per_key:
            raise AsofSkewError(
                f"hottest as-of key holds {worst} rows > budget "
                f"{max_rows_per_key}; pass a tolerance (auto-routes to "
                "the bucketed plan) or raise max_rows_per_key"
            )
    if direction == "forward":
        neg_l = left.withColumn(left_ts, -F.col(left_ts))
        neg_r = right.withColumn(right_ts, -F.col(right_ts))
        out = asof_join(
            neg_l,
            neg_r,
            on=on,
            left_ts=left_ts,
            right_ts=right_ts,
            right_cols=right_cols,
            tiebreak=tiebreak,
            tolerance=tolerance,
            suffix=suffix,
            bucketed=False,
            _internal=True,
        )
        matched = right_ts + suffix if right_ts in left.columns else right_ts
        return out.withColumn(matched, -F.col(matched)).withColumn(
            left_ts, -F.col(left_ts)
        )

    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    right_cols = list(right_cols)
    if tiebreak is not None and tiebreak not in right_cols + [right_ts]:
        right_cols.append(tiebreak)

    # Output names for attached right columns (suffix only on collision).
    out_name = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }
    matched_ts = right_ts + suffix if right_ts in left.columns else right_ts
    # a left column that already carries a suffixed output name would
    # duplicate it in the result — ambiguous downstream; raise instead
    clashes = [
        o
        for o in [matched_ts, *out_name.values()]
        if o.endswith(suffix) and o in left.columns
    ]
    if clashes:
        raise ValueError(
            f"left columns {sorted(set(clashes))} collide with the "
            f"suffixed output names; pass a different suffix than "
            f"{suffix!r} or rename them"
        )

    t = "_asof_t"
    tag = "_asof_tag"  # right=0 sorts before left=1 at equal t → inclusive
    tb = "_asof_tb"

    # tb must be a concrete sortable type on BOTH union branches (a bare
    # NullType column can neither be unioned with a typed one nor sorted).
    tb_type = right.schema[tiebreak].dataType if tiebreak else None

    # The whole right payload travels as ONE struct (_r_pack): the fill
    # must be row-atomic. Filling each column independently with
    # last(ignorenulls) would let a genuinely-NULL payload field in the
    # matched right row be "filled through" by an OLDER right row's
    # value, stitching together a row that never existed. A struct from
    # a right row is non-null even when every field inside is null, so
    # one last(ignorenulls) over the struct picks a whole real row.
    from pyspark.sql import types as T

    pack_type = T.StructType(
        [T.StructField("ts", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(t),
        F.lit(0).alias(tag),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias(tb),
        F.struct(
            F.col(right_ts).alias("ts"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias("_r_pack"),
        *[F.lit(None).cast(left.schema[c].dataType).alias("_l_" + c)
          for c in left.columns if c not in keys],
    )
    l_ = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias(t),
        F.lit(1).alias(tag),
        (F.lit(None).cast(tb_type) if tb_type is not None else F.lit(0)).alias(tb),
        F.lit(None).cast(pack_type).alias("_r_pack"),
        *[F.col(c).alias("_l_" + c) for c in left.columns if c not in keys],
    )

    # Right rows first at equal t; among equal-t right rows the tiebreak
    # orders them so last() picks the highest. Left rows carry null tb →
    # asc_nulls_last keeps them stable after the rights.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(t).asc(), F.col(tag).asc(), F.col(tb).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l_)
    fill_cols = [
        F.last("_r_pack", ignorenulls=True).over(w).alias("_m"),
    ]
    if direction == "nearest":
        # Forward fill in the SAME pass: identical hash partitioning —
        # no second exchange — and, without a tiebreak, the SAME sort:
        # both fills then live in ONE Window operator over one
        # per-partition sort (the r5 sf1 probe measured the second sort
        # at ~10x asof_latest's cost on 1.2M unioned rows). Under the
        # shared ascending order an equal-t right row sorts BEFORE the
        # left row and so drops out of the forward frame — harmless: the
        # backward frame holds it at Δt=0 and |Δt| ties go backward, so
        # the equal-t right still wins. With a tiebreak the forward side
        # must elect the HIGHEST tiebreak among equal-t′ rights (the
        # same winner the backward side elects), which needs the tb-desc
        # sort — only that path pays the second per-partition sort.
        if tiebreak is None:
            wf = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        else:
            wf = (
                Window.partitionBy(*keys)
                .orderBy(
                    F.col(t).asc(),
                    F.col(tag).desc(),
                    F.col(tb).desc_nulls_last(),
                )
                .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
        fill_cols.append(
            F.first("_r_pack", ignorenulls=True).over(wf).alias("_f")
        )
    filled = unioned.select(
        *keys,
        F.col(t),
        F.col(tag),
        *fill_cols,
        *[F.col("_l_" + c) for c in left.columns if c not in keys],
    ).where(F.col(tag) == 1)

    if direction == "nearest":
        # Pick the closer side — the WHOLE packed row, atomically; |Δt|
        # ties go backward. Tolerance filters the CHOSEN match
        # (merge_asof semantics), symmetric in time.
        use_fwd = F.col("_m").isNull() | (
            F.col("_f").isNotNull()
            & ((F.col(t) - F.col("_m.ts")) > (F.col("_f.ts") - F.col(t)))
        )
        filled = filled.select(
            *keys,
            F.col(t),
            F.when(use_fwd, F.col("_f")).otherwise(F.col("_m")).alias("_m"),
            *[F.col("_l_" + c) for c in left.columns if c not in keys],
        )
        stale = (
            F.abs(F.col("_m.ts") - F.col(t)) > F.lit(tolerance)
            if tolerance is not None
            else F.lit(False)
        )
    else:
        stale = (
            F.col("_m.ts") < F.col(t) - F.lit(tolerance)
            if tolerance is not None
            else F.lit(False)
        )
    out_cols = [F.col(k) for k in keys]
    out_cols += [
        F.col("_l_" + c).alias(c) for c in left.columns if c not in keys
    ]
    out_cols.append(
        F.when(~stale, F.col("_m.ts")).alias(matched_ts)
    )
    out_cols += [
        F.when(~stale, F.col("_m")[c]).alias(out_name[c])
        for c in right_cols
    ]
    return filled.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: str | Sequence[str] | None = None,
    bin_width: int | None = None,
    closed: str = "left",
) -> DataFrame:
    """Inner point-in-interval join via fixed-width bin bucketing.

    Emits one row per (point, containing interval) pair — a point inside k
    overlapping intervals appears k times, matching the SQL inequality
    join ``ON p.t >= i.start AND p.t < i.end`` (``closed='left'``; 'both'
    makes the end inclusive). ``on`` optionally adds equi-key columns.

    ``bin_width`` is in the ts columns' unit. An interval of length L
    costs ceil(L/W)+1 exploded rows; a too-large W instead packs many
    intervals into each bin and the join fans out per point — W near the
    MEDIAN interval length balances the two, so the DEFAULT
    (``bin_width=None``) derives it from the data: one
    ``percentile_approx(end-start, 0.5)`` aggregate over ``intervals``
    (an EAGER job re-executing that side's lineage — pass an explicit
    width when ``intervals`` is an expensive plan or the call sits in a
    per-batch loop; the RESULT is identical for any W, only cost moves).
    Probe-measured at sf1 (NOTES_r7, 1M points x 40k intervals of ~8h
    median length): W=60s exploded the interval side 240x over the
    derived width and ran 31x slower; the old fixed 1h default was 4.5x
    the exploded rows / 1.3x the wall. The cliff is W far BELOW the
    median; W far above it instead packs many intervals per bin — that
    only bites UNKEYED joins (equi-keys already split the buckets), so
    pick an explicit sub-median W there if fan-out shows up. The join
    itself is a plain hash equi-join on (keys..., bin):
    shuffle-partitioned, AQE-skew-splittable, no BroadcastNestedLoop
    (plan-tested in tests/test_plans.py).
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    if bin_width is None:
        # median over STRICTLY POSITIVE lengths only: instantaneous
        # (end==start) or corrupt (end<start) rows — which the join
        # itself tolerates — must not drag the median to <=0 and derive
        # millisecond bins that explode every real interval (review r7:
        # an hour-long interval at W=1 is 3.6M exploded rows)
        row = intervals.filter(F.col(end_col) > F.col(start_col)).select(
            F.percentile_approx(
                F.col(end_col) - F.col(start_col), F.lit(0.5)
            ).alias("m")
        ).first()
        m = row["m"] if row is not None else None
        # no measurable lengths: any width is equally cheap — keep the
        # old fixed default
        bin_width = int(m) if m is not None and m > 0 else 3_600_000
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    binc = "_iv_bin"

    iv = intervals.withColumn(
        binc,
        # floor-div, not cast-truncate: pre-epoch (negative) timestamps
        # must round toward -inf or they'd land in the wrong bin.
        # The when() guard: a corrupt interval with end < start would make
        # sequence() default to step -1 and explode to a huge DESCENDING
        # bin array (end=0, start=epoch-ms → millions of rows); such an
        # interval can contain no point, so it explodes to NOTHING
        # (explode drops the NULL array).
        F.explode(
            F.when(
                F.col(end_col) >= F.col(start_col),
                F.sequence(
                    F.floor(F.col(start_col) / bin_width).cast("long"),
                    F.floor(F.col(end_col) / bin_width).cast("long"),
                ),
            )
        ),
    )
    pt = points.withColumn(
        binc, F.floor(F.col(point_ts) / bin_width).cast("long")
    )

    in_range = F.col(point_ts) >= F.col(start_col)
    in_range &= (
        F.col(point_ts) <= F.col(end_col)
        if closed == "both"
        else F.col(point_ts) < F.col(end_col)
    )
    return pt.join(iv, [binc] + keys, "inner").where(in_range).drop(binc)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance: int,
    direction: str = "backward",
    **kwargs,
) -> DataFrame:
    """Skew-splitting as-of join — identical results to ``asof_join`` with
    the same (required) ``tolerance``, but the window partitions on
    ``(key, time_bucket)`` instead of the bare key, so a hot key (one
    device emitting 10^9 events) spreads over ``timespan / tolerance``
    partitions instead of landing in ONE window task. This is the knob
    the plain operator's docstring warns about; use it when a key's rows
    exceed one executor's sort budget.

    Correctness: with tolerance T, a left row at t can only match rights
    in [t−T, t] (backward; mirrored forward, both sides for nearest) —
    that range spans at most two T-wide buckets, so each right row is
    duplicated into the adjacent bucket(s) on the direction's side and
    the per-bucket window sees every candidate the global window would
    keep. Candidates visible beyond the tolerance are nulled by the same
    filter in both variants, so outputs are row-identical — property-
    tested against ``asof_join`` for all three directions in
    tests/test_temporal.py. Cost: the right side is duplicated ×2 (×3
    for nearest) — buy partitioning with copies, the standard trade.
    """
    if tolerance is None or tolerance <= 0:
        raise ValueError("asof_join_bucketed requires a positive tolerance")
    offs = {
        "backward": (0, 1),
        "forward": (-1, 0),
        "nearest": (-1, 0, 1),
    }.get(direction)
    if offs is None:
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest', "
            f"got {direction!r}"
        )
    _check_reserved(left, right)
    keys = [on] if isinstance(on, str) else list(on)
    b = "_asof_bucket"
    lb = left.withColumn(
        b, F.floor(F.col(left_ts) / tolerance).cast("long")
    )
    rbase = F.floor(F.col(right_ts) / tolerance).cast("long")
    rb = right.withColumn(
        b, F.explode(F.array(*[rbase + F.lit(o) for o in offs]))
    )
    out = asof_join(
        lb,
        rb,
        on=keys + [b],
        left_ts=left_ts,
        right_ts=right_ts,
        tolerance=tolerance,
        direction=direction,
        bucketed=False,
        _internal=True,
        **kwargs,
    )
    return out.drop(b)
