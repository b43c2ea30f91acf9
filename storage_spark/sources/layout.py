"""Physical layout utilities — the 100 TB table designs.

Two layouts matter for this engine (SURVEY §4 pushdown table):

1. **Listing layout**: partition by ``bucket_id``, sort files by ``name`` —
   prefix listings prune partitions and skip files via min/max stats
   (asserted in tests/test_plans.py::test_prefix_range_pushdown).
2. **Join layout**: bucket both sides of a recurring equi-join by the join
   key (``bucketBy`` + ``sortBy``) so the join co-locates without any
   Exchange — the reconciliation scan (objects ⋈ s3_keys on key) becomes
   shuffle-free, which at 10M+ keys per side is the difference between a
   network-bound and a scan-bound job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def morton_code(
    cols: list[Column],
    mins: list[float],
    maxs: list[float],
    bits: int = 16,
) -> Column:
    """Z-order (Morton) key: quantize each numeric column to ``bits``
    levels over its [min, max] range, then interleave the bits. Sorting
    by this key clusters rows so that EVERY dimension's values are
    locally narrow — parquet footer min/max then prunes files on
    predicates over ANY of the columns, where a lexicographic sort only
    skips on its leading key. Pure Column bit math (shift/and/or), fully
    codegen'd; the only non-local input is the per-column min/max pair
    (one tiny agg job — at 100 TB, a metadata lookup).

    Quantization is linear over the range — heavily skewed columns
    deserve a pre-transform (log, rank-bucket) before handing them in."""
    k = len(cols)
    top = (1 << bits) - 1
    terms: list[Column] = []
    for j, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        span = float(hi) - float(lo)
        if span <= 0:
            continue  # constant column: contributes nothing to the order
        scaled = F.least(
            F.lit(top),
            F.floor(
                (c.cast("double") - F.lit(float(lo))) * ((top + 1) / span)
            ),
        ).cast("long")
        for i in range(bits):
            bit = F.shiftright(scaled, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * k + j))
    if not terms:
        return F.lit(0).cast("long")
    z = terms[0]
    for t in terms[1:]:
        z = z + t  # disjoint bit positions: sum == bitwise OR
    return z


def write_listing_layout(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    bloom_filter_cols: list[str] | None = None,
    bloom_ndv: int = 1_000_000,
) -> None:
    """Bucket-partitioned, name-sorted parquet — the listing-optimal shape.

    ``bloom_filter_cols`` writes a parquet bloom filter per listed column
    (``parquet.bloom.filter.enabled#<col>``): point lookups on a
    non-sort-key column (``id``, ``version``) can then skip row groups
    that min/max stats can't exclude — the sort only narrows ``name``.
    Cost is ~``bloom_ndv`` bits per row group per column; size it to the
    expected distinct count per row group, not per table.

    Measured honestly (NOTES_r4, 20M rows, local NVMe): Spark's own
    vectorized scan gains ~nothing from the blooms here — a local
    equality scan is decode-CPU-bound, not IO-bound. The feature's value
    is the FILE FORMAT contract: remote object storage (skipped row
    groups = network bytes not fetched) and external parquet readers
    that do bloom-prune row groups."""
    w = (
        df.repartition("bucket_id")
        .sortWithinPartitions("name")
        .write.mode(mode)
    )
    for c in bloom_filter_cols or []:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(bloom_ndv)
        )
    w.partitionBy("bucket_id").parquet(path)


def compact_listing_layout(
    spark: SparkSession, src_path: str, dst_path: str
) -> None:
    """Small-file compaction (maintenance pass): incremental commits
    fragment a partition into many small files; rewriting through
    ``write_listing_layout`` into a NEW versioned directory restores one
    sorted file per bucket partition (hash repartition sends each bucket to
    exactly one task). At scale the swap is a metastore / table-format
    pointer flip — never an in-place overwrite of the live directory."""
    write_listing_layout(spark.read.parquet(src_path), dst_path)


def write_ivf_layout(
    assigned_corpus: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """IVF-optimal vector layout: the cell-assigned corpus partitioned BY
    CELL on disk. An ``ivf_search`` with ``n_probe`` cells then reads only
    ``n_probe / n_cells`` of the files — the equi-join on ``cell`` becomes
    a partition-pruned scan (PartitionFilters in the plan), which is the
    on-disk analogue of pgvector's per-cell inverted lists. Re-written
    whenever the quantizer is retrained (centroids are versioned with the
    layout)."""
    (
        assigned_corpus.repartition("cell")
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed, sorted managed table for co-located joins."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
