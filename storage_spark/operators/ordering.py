"""Global ordering / ranking operators.

Training-data pipelines need TOTAL orders at corpus scale — curriculum
ordering (easy->hard), deterministic shard assignment, "give every
example a stable contiguous id". SQL expresses this as
``row_number() OVER (ORDER BY ...)`` — which in a distributed engine
funnels every row through ONE task (an empty-frame global window). These
operators produce the identical result with parallel plans.

Reference parity note: the reference has no global-id operator (Postgres
hands out ids transactionally); this is an extension for the
training-data workload (SURVEY §7 step 10), built from the same window
machinery as W1/W2 (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_global_ids(
    df: DataFrame,
    order_by: list[Column],
    group_col: str | Column | None = None,
    id_col: str = "global_id",
) -> DataFrame:
    """Contiguous ids ``0..n-1`` in total ``order_by`` order, without a
    single-task global sort.

    Plan (grouped prefix-sum): rows rank inside their ``group_col``
    partition (parallel across groups), and each group's rank offset is
    the prefix-sum of group counts — a tiny two-level aggregate joined
    back by broadcast. ``group_col`` must be the leading ``order_by``
    key; ``order_by`` must be a total order (include a unique tiebreak
    column like the primary key), otherwise ids inside a tie are
    nondeterministic.

    When ``group_col`` is None the leading order key's DISTINCT values
    act as the groups (same plan; the offset table is as big as the key's
    cardinality). Per-group data still sorts inside one task's window, so
    pick a grouping key whose largest group fits an executor — at 100 TB
    that means a composite like (lang, quality_decile) rather than lang
    alone. The payoff vs ``row_number() OVER (ORDER BY ...)``: Spark
    plans that as a SINGLE-partition window — the textbook scale-killer
    this operator exists to avoid.
    """
    if group_col is None:
        group_col = order_by[0]
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    tagged = df.withColumn("__grp", g)
    # Two passes BY DESIGN (examined r13, guide §2.4, kept): the counts
    # pass map-side partial-aggregates, so its exchange moves #groups ×
    # #tasks rows, and column pruning reduces its input scan to the
    # group column alone (columnar sources read one column). The
    # single-shuffle alternative — an explicit repartition by __grp
    # feeding both the count and the rank window — measured 2.8 → 5.3 s
    # at 10M rows/32 cores: column pruning specializes the counts
    # branch's exchange payload to __grp only, so the two exchanges
    # never canonicalize equal and ReusedExchange cannot fire, leaving
    # TWO full-row corpus shuffles and no partial aggregation.
    counts = tagged.groupBy("__grp").agg(F.count(F.lit(1)).alias("__n"))
    # offset(group) = sum of counts of all groups strictly before it in
    # group order — #groups rows, negligible.
    offsets = counts.select(
        "__grp",
        (
            F.sum("__n").over(
                Window.orderBy("__grp").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("__off"),
    ).fillna({"__off": 0})
    w = Window.partitionBy("__grp").orderBy(*order_by)
    return (
        tagged.join(F.broadcast(offsets), "__grp")
        .withColumn(
            id_col, (F.row_number().over(w) - 1 + F.col("__off")).cast("long")
        )
        .drop("__grp", "__off")
    )


def assign_shards(
    df: DataFrame,
    order_by: list[Column],
    n_shards: int,
    group_col: str | Column | None = None,
    total: int | None = None,
) -> DataFrame:
    """Contiguous shard assignment for training output: shard ``s`` holds
    the ``order_by``-order slice ``[s*ceil(n/k), (s+1)*ceil(n/k))``.
    Contiguity is the point — a curriculum order survives sharding, and
    each shard is one range-partitioned write. ``total`` skips the extra
    count job when the caller already knows n."""
    with_ids = assign_global_ids(df, order_by, group_col)
    if total is None:
        total = with_ids.count()
    per = -(-total // n_shards) if total else 1
    return with_ids.withColumn(
        "shard", (F.col("global_id") / F.lit(per)).cast("int")
    )


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-``n`` rows per group (e.g. the n largest objects per bucket —
    the storage-usage drill-down the A1 aggregate can't answer).

    A per-group window ranks inside each partition after one shuffle on
    the group key; with WindowGroupLimit (Spark 3.5+) the ``rn <= n``
    predicate pushes below the shuffle, so each map task forwards at most
    ``n`` rows per group it sees — the distributed analogue of the
    reference's per-folder LIMIT peek (SURVEY §2.5 W2)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )
