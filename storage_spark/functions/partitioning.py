"""Input-parallelism guard for per-row-expensive corpus passes.

A bench/test-scale table often arrives as ONE parquet file with ONE row
group. A row group is the split floor — ``spark.sql.files.
maxPartitionBytes`` / ``minPartitionNum`` cannot divide it — so the scan
is a single task, and every projection fused into the scan stage
(normalization regexes, gram explodes, hashing) serializes on one core.
Measured on langid_predict_docs at sf0.1: a 2.4 s single-task stage in a
4.5 s wall, at ANY core count — exactly the fixed-overhead floor behind
the ~1.0 8-vs-32-core scaling ratios of the text entries.

``spread_small_input`` inserts a round-robin repartition when (and only
when) the frame's file inputs number fewer than the session's default
parallelism, moving the expensive projection work above the exchange and
across the cores. At production scale the file count of any corpus table
dwarfs the core count, so the guard is a no-op there — scale-adaptive by
construction, not a local-mode tune. Row-preserving: results unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


# logical-plan nodes that already introduce a shuffle (and with it
# spark.sql.shuffle.partitions-sized parallelism) below the consumer —
# a frame whose lineage contains one is not starved by its scan, and
# composed pipelines must not re-shuffle a corpus an upstream operator
# already spread
_PARALLELIZING_NODES = (
    "Repartition",
    "Aggregate",
    "Window",
    "Join",
    "Deduplicate",
)


def spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its
    plan reads fewer files than that (see module docstring). Frames with
    no file inputs (ranges, local collections, checkpoints — already
    sized by their source) and frames whose lineage already shuffles
    (aggregates, joins, earlier repartitions) are returned unchanged."""
    sc = df.sparkSession.sparkContext
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — introspection is best-effort
        return df
    n = sc.defaultParallelism
    if not files or len(files) >= n:
        return df
    try:
        lineage = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001 — introspection is best-effort
        lineage = ""
    if any(node in lineage for node in _PARALLELIZING_NODES):
        return df
    return df.repartition(n)
