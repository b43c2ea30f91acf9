"""Write-side operators (M1-M8) as MERGE-semantics DataFrame transforms.

The reference's mutations are row-at-a-time SQL with ``ON CONFLICT`` /
``RETURNING`` (pg.ts:905-1253) plus advisory locks (pg.ts:1255-1423). In a
batch engine each becomes a set-oriented merge:

- M1 upsert        → anti-join survivors ∪ updates (full-row) or
                     column-coalesce merge (partial update)
- M2 create-fails-on-dup → overlap check then append
- M4 delete + RETURNING  → semi-join (the deleted rows) + anti-join (the
                     remaining table) — read-before-delete gives RETURNING
- M5 batched cascade delete → a single anti-join; the reference's 500-row
  batching (limits.ts:18-21) exists only to bound one transaction
- M8 advisory locks → not needed: table-format optimistic concurrency
  (Delta/Iceberg commit protocol) replaces lock-based serialization.

This container has no Delta; ``ParquetTable`` provides an
overwrite-on-commit table for tests and documents where a production
deployment would issue ``MERGE INTO`` against Delta/Iceberg instead.
Lifecycle events (T3) are derived as data: ``lifecycle_events`` diffs the
before/after states into ObjectCreated/Updated/Removed rows, which the
streaming layer fans out (src/storage/events/lifecycle/*.ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class KeyAlreadyExistsError(Exception):
    """M2: unique-violation surfaced as an error (pg.ts:1004-1041)."""


class NoSuchKeyError(Exception):
    """Source row absent where the reference raises NoSuchKey."""


class DirectDeleteError(Exception):
    """Engine analogue of 0055-prevent-direct-deletes.sql: the reference's
    protect_delete() trigger raises 42501 on any DELETE unless the
    transaction-local ``storage.allow_delete_query`` GUC is 'true' — which
    the API sets on every request (pg-connection.ts scopeConfigSetters).
    Here the flag is the ``api_mediated`` parameter: operator callers (the
    API path) leave it True; ad-hoc jobs deleting rows directly must assert
    it explicitly, making accidental bulk deletes a deliberate act."""


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """M1 full-row upsert: ``INSERT … ON CONFLICT (keys) DO UPDATE SET *``
    (pg.ts:905-961). Updates win on key match; everything else survives."""
    survivors = target.join(updates.select(*keys), keys, "left_anti")
    return survivors.unionByName(updates)


def merge_update_columns(
    target: DataFrame, updates: DataFrame, keys: list[str], update_cols: list[str]
) -> DataFrame:
    """M3 partial update: only ``update_cols`` change on matched keys, other
    columns and unmatched rows pass through (``UPDATE … RETURNING *`` shape,
    pg.ts:963-1002)."""
    renamed = updates.select(
        *keys, *[F.col(c).alias(f"_u_{c}") for c in update_cols]
    )
    joined = target.join(renamed, keys, "left")
    out_cols = []
    for c in target.columns:
        if c in update_cols:
            out_cols.append(F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def create_rows(target: DataFrame, new_rows: DataFrame, keys: list[str]) -> DataFrame:
    """M2: plain INSERT where a key collision is an error, not an update."""
    dup_count = new_rows.join(target, keys, "left_semi").limit(1).count()
    if dup_count:
        raise KeyAlreadyExistsError(f"duplicate key on {keys}")
    return target.unionByName(new_rows)


def merge_delete(
    target: DataFrame, probe: DataFrame, keys: list[str],
    api_mediated: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """M4/M5: returns ``(remaining, deleted)``. ``deleted`` is the
    RETURNING-parity set (semi-join), computed from the same snapshot as the
    anti-join remainder. ``api_mediated=False`` raises DirectDeleteError —
    the 0055 protect_delete() trigger's guard against direct deletes."""
    if not api_mediated:
        raise DirectDeleteError(
            "Direct deletion from storage tables is not allowed."
            " Use the Storage API instead."
        )
    deleted = target.join(probe.select(*keys), keys, "left_semi")
    remaining = target.join(probe.select(*keys), keys, "left_anti")
    return remaining, deleted


def delete_all_before(
    objects: DataFrame, before_ms: int, bucket_id: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """T4 as one batch job (object-admin-delete-all-before.ts:35-125): the
    reference loops 500-row transactions under a 10 s budget and re-enqueues
    itself; a batch engine expresses the whole thing as one partition-
    parallel anti-join pass."""
    cond = F.col("created_at_ms") < before_ms
    if bucket_id is not None:
        cond = cond & (F.col("bucket_id") == bucket_id)
    # NULL created_at_ms must land in REMAINING: cond is NULL for it, and
    # both filter(cond) and filter(~cond) drop NULL — the row would vanish
    # from both sides (deleted without an ObjectRemoved event)
    cond = F.coalesce(cond, F.lit(False))
    deleted = objects.filter(cond)
    remaining = objects.filter(~cond)
    return remaining, deleted


def copy_object(
    objects: DataFrame,
    bucket_id: str,
    from_name: str,
    to_name: str,
    to_bucket_id: str | None = None,
    new_id: str | None = None,
    new_version: str | None = None,
) -> DataFrame:
    """Object copy (route surface object.ts copy): duplicate the source row
    under the destination key via upsert. The reference mints a fresh
    version (randomUUID, object.ts:316) and a fresh object id via
    upsertObject — two objects never share one primary id (or one ETag,
    since s3proto derives ETags from id). The engine takes the new identity
    as explicit parameters (deterministic inputs keep plans replayable);
    defaults derive them from the destination key so a copy NEVER inherits
    the source identity."""
    src = objects.filter(
        (F.col("bucket_id") == bucket_id) & (F.col("name") == from_name)
    )
    if src.limit(1).count() == 0:
        # the reference raises NoSuchKey; silently proceeding would DELETE a
        # pre-existing destination via the survivors filter below
        raise NoSuchKeyError(f"{bucket_id}/{from_name}")
    dst_bucket = to_bucket_id if to_bucket_id is not None else bucket_id
    dst = (
        src.withColumn("name", F.lit(to_name))
        .withColumn("bucket_id", F.lit(dst_bucket))
        .withColumn(
            "id",
            F.lit(new_id)
            if new_id is not None
            else F.md5(F.concat(F.lit(f"copy:{dst_bucket}:{to_name}:"), F.col("id"))),
        )
        .withColumn(
            "version",
            F.lit(new_version)
            if new_version is not None
            else F.md5(F.concat(F.lit(f"copyv:{dst_bucket}:{to_name}:"), F.col("version"))),
        )
    )
    # destination key is a literal → the upsert's anti-join folds to a scan
    # predicate (no join at all); generic merge_upsert would lower to a
    # nested-loop join against a constant-keyed side
    survivors = objects.filter(
        ~((F.col("bucket_id") == dst_bucket) & (F.col("name") == to_name))
    )
    return survivors.unionByName(dst)


def copy_objects(
    objects: DataFrame, pairs: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Batched copy: the set-oriented form of ``copy_object`` for callers
    driving MANY copies (bulk namespace duplication, tenant cloning). One
    Spark job total instead of one existence-probe job per object.

    ``pairs`` rows: ``(bucket_id, from_name, to_bucket_id, to_name)``.

    Semantics per pair, identical to the scalar form:
    - missing source → the pair lands in the returned ``failed`` frame
      (the batch analogue of the scalar NoSuchKey raise — one bad pair
      must not poison a million-row batch);
    - destination minted with fresh id/version (content-addressed from the
      destination key + source identity — a copy never inherits the
      source identity);
    - a pre-existing destination row is replaced (upsert), and the LAST
      pair wins when one batch targets the same destination twice
      (dedup on destination key, max source name for determinism).

    Returns ``(objects', failed_pairs)``.
    """
    p = pairs.select(
        F.col("bucket_id").alias("_src_bucket"),
        F.col("from_name").alias("_src_name"),
        F.coalesce(F.col("to_bucket_id"), F.col("bucket_id")).alias("_dst_bucket"),
        F.col("to_name").alias("_dst_name"),
    )
    src = objects.select(
        F.col("bucket_id").alias("_src_bucket"),
        F.col("name").alias("_src_name"),
        F.struct(*objects.columns).alias("_row"),
    )
    joined = p.join(src, ["_src_bucket", "_src_name"], "left")
    failed = joined.filter(F.col("_row").isNull()).select(
        F.col("_src_bucket").alias("bucket_id"),
        F.col("_src_name").alias("from_name"),
        F.col("_dst_bucket").alias("to_bucket_id"),
        F.col("_dst_name").alias("to_name"),
    )
    resolved = joined.filter(F.col("_row").isNotNull())
    # last-pair-wins per destination key. Tiebreak on (name, bucket) so
    # two pairs whose same-named sources live in DIFFERENT buckets pick
    # the same winner every run — name alone left it nondeterministic.
    from storage_spark.operators.scans import first_per_group

    resolved = first_per_group(
        resolved,
        ["_dst_bucket", "_dst_name"],
        [F.col("_src_name").desc(), F.col("_src_bucket").desc()],
    )
    dst = resolved.select(
        *[
            F.col(f"_row.{c}").alias(c)
            for c in objects.columns
            if c not in ("bucket_id", "name", "id", "version")
        ],
        F.col("_dst_bucket").alias("bucket_id"),
        F.col("_dst_name").alias("name"),
        F.md5(
            F.concat_ws(
                ":", F.lit("copy"), F.col("_dst_bucket"), F.col("_dst_name"),
                F.col("_row.id"),
            )
        ).alias("id"),
        F.md5(
            F.concat_ws(
                ":", F.lit("copyv"), F.col("_dst_bucket"), F.col("_dst_name"),
                F.col("_row.version"),
            )
        ).alias("version"),
    ).select(*objects.columns)
    survivors = objects.join(
        dst.select(F.col("bucket_id"), F.col("name")),
        ["bucket_id", "name"],
        "left_anti",
    )
    return survivors.unionByName(dst), failed


def move_objects(
    objects: DataFrame, bucket_id: str, from_prefix: str, to_prefix: str
) -> DataFrame:
    """Bulk move/rename (copy+delete in the reference, object.ts move): a
    single name-rewrite merge over the prefix subtree — delete originals,
    insert renamed rows, one pass."""
    from storage_spark.functions.paths import prefix_range_filter

    in_scope = (F.col("bucket_id") == bucket_id) & prefix_range_filter(
        F.col("name"), from_prefix
    )
    moved = objects.filter(in_scope).withColumn(
        "name",
        F.concat(F.lit(to_prefix), F.substring(F.col("name"), len(from_prefix) + 1, 1 << 30)),
    )
    return objects.filter(~in_scope).unionByName(moved)


def lifecycle_events(
    before: DataFrame, after: DataFrame, keys: list[str], compare_col: str
) -> DataFrame:
    """T3: derive ObjectCreated / ObjectUpdatedMetadata / ObjectRemoved rows
    by diffing table states (queue names: object-created.ts:23,
    object-updated.ts:13, object-removed.ts:12-22)."""
    b = before.select(*keys, F.col(compare_col).alias("_b"))
    a = after.select(*keys, F.col(compare_col).alias("_a"))
    created = a.join(b, keys, "left_anti").select(
        *keys, F.lit("ObjectCreated").alias("event_type")
    )
    removed = b.join(a, keys, "left_anti").select(
        *keys, F.lit("ObjectRemoved").alias("event_type")
    )
    updated = (
        a.join(b, keys)
        .filter(F.col("_a") != F.col("_b"))
        .select(*keys, F.lit("ObjectUpdatedMetadata").alias("event_type"))
    )
    return created.unionByName(updated).unionByName(removed)


class ParquetTable:
    """Minimal committed-table holder for tests: read → transform → commit
    (overwrite). Production target is a Delta/Iceberg table where commits
    are ``MERGE INTO`` under optimistic concurrency — the transforms above
    are exactly the MERGE matched/not-matched clauses (see CatalogTable)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def commit(self, df: DataFrame) -> None:
        # localCheckpoint materializes before overwrite (reading and
        # overwriting the same path in one plan is unsafe).
        df.localCheckpoint(eager=True).write.mode("overwrite").parquet(self.path)


class PartitionedParquetTable:
    """Partition-pruned copy-on-write mutations without a table-format jar.

    The table is ``partitionBy(partition_col)`` parquet (the listing layout
    from sources/layout.py). A mutation batch touches only the partitions
    whose keys appear in the batch: read THOSE partitions (partition-pruned
    scan), merge in memory, and rewrite them via dynamic partition
    overwrite — every untouched partition's files stay byte-identical on
    disk. That is the copy-on-write granularity Delta/Iceberg MERGE buys
    (file-level there, partition-level here), which at 100 TB turns a
    full-table rewrite per batch into a rewrite of the few hot partitions
    — reference semantics pg.ts:905-1253, minus the per-row transaction.

    The affected-partition list is a bounded driver collect: one value per
    DISTINCT partition key in the BATCH (not the table) — thousands at
    most, never rows.
    """

    def __init__(
        self, spark: SparkSession, path: str, partition_col: str = "bucket_id"
    ):
        self.spark = spark
        self.path = path
        self.partition_col = partition_col

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def write_initial(self, df: DataFrame) -> None:
        (
            df.repartition(self.partition_col)
            .write.mode("overwrite")
            .partitionBy(self.partition_col)
            .parquet(self.path)
        )

    def _affected(self, batch: DataFrame) -> list:
        return [
            r[0]
            for r in batch.select(self.partition_col).distinct().collect()
        ]

    def _commit_partitions(self, merged: DataFrame) -> None:
        # partitionOverwriteMode=dynamic as a WRITER option (scoped to this
        # write, not session-global): mode("overwrite") then replaces only
        # the partitions present in `merged`.
        (
            merged.localCheckpoint(eager=True)
            .repartition(self.partition_col)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(self.partition_col)
            .parquet(self.path)
        )

    def merge_upsert(self, updates: DataFrame, keys: list[str]) -> None:
        if self.partition_col not in keys:
            raise ValueError(
                f"upsert keys must include {self.partition_col!r}: a row is "
                "only reachable inside its partition"
            )
        parts = self._affected(updates)
        scoped = self.read().filter(F.col(self.partition_col).isin(parts))
        self._commit_partitions(merge_upsert(scoped, updates, keys))

    def merge_update_columns(
        self, updates: DataFrame, keys: list[str], update_cols: list[str]
    ) -> None:
        if self.partition_col not in keys:
            raise ValueError(
                f"update keys must include {self.partition_col!r}"
            )
        parts = self._affected(updates)
        scoped = self.read().filter(F.col(self.partition_col).isin(parts))
        self._commit_partitions(
            merge_update_columns(scoped, updates, keys, update_cols)
        )

    def merge_delete(self, probe: DataFrame, keys: list[str]) -> DataFrame:
        """Returns the RETURNING-parity deleted rows. Dynamic overwrite
        only replaces partitions PRESENT in the written data, so a
        partition whose every row was deleted would silently keep its old
        files — those are dropped explicitly afterwards (the local-FS
        analogue of the metastore's DROP PARTITION; a table format makes
        this a metadata-only commit)."""
        if self.partition_col not in keys:
            raise ValueError(
                f"delete keys must include {self.partition_col!r}"
            )
        parts = self._affected(probe)
        scoped = self.read().filter(F.col(self.partition_col).isin(parts))
        remaining, deleted = merge_delete(scoped, probe, keys)
        deleted = deleted.localCheckpoint(eager=True)
        remaining = remaining.localCheckpoint(eager=True)
        surviving = set(self._affected(remaining))
        self._commit_partitions(remaining)
        import shutil

        for p in set(parts) - surviving:
            shutil.rmtree(
                f"{self.path}/{self.partition_col}={p}", ignore_errors=True
            )
        return deleted


# ----------------------------------------------------------------------
# Table-format path: real MERGE INTO when an Iceberg/Delta catalog exists
# ----------------------------------------------------------------------


def merge_upsert_sql(table: str, source: str, keys: list[str]) -> str:
    """The M1 upsert as MERGE INTO DDL — what `merge_upsert` compiles to on
    a real table format (only matched rows rewrite, not the whole table)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return (
        f"MERGE INTO {table} t USING {source} s ON {on}\n"
        "WHEN MATCHED THEN UPDATE SET *\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )


def merge_update_columns_sql(
    table: str, source: str, keys: list[str], update_cols: list[str]
) -> str:
    """M3 partial update as MERGE (matched rows only, named columns)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
    return (
        f"MERGE INTO {table} t USING {source} s ON {on}\n"
        f"WHEN MATCHED THEN UPDATE SET {sets}"
    )


def merge_delete_sql(table: str, source: str, keys: list[str]) -> str:
    """M4/M5 keyed delete as MERGE … WHEN MATCHED THEN DELETE."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return (
        f"MERGE INTO {table} t USING {source} s ON {on}\n"
        "WHEN MATCHED THEN DELETE"
    )


class CatalogTable:
    """The production mutation path: a named table in a configured Spark
    catalog (Iceberg/Delta), where every mutation is one ``MERGE INTO``
    under the format's optimistic-concurrency commit protocol — M8's
    advisory locks become unnecessary, and a 100 TB upsert touches only the
    files holding matched keys instead of rewriting the table (the
    anti-join+union fallback above is documented as full-rewrite).

    Activates behind ``catalog.iceberg_available``; this container has no
    runtime jar, so tests assert the generated DDL unconditionally and
    skip-mark execution."""

    def __init__(self, spark: SparkSession, name: str):
        self.spark = spark
        self.name = name

    def read(self) -> DataFrame:
        return self.spark.table(self.name)

    def _stage(self, df: DataFrame) -> str:
        import re

        # view name derived from the table name itself: deterministic
        # across processes (no PYTHONHASHSEED dependence) and collision-free
        # per table, so interleaved CatalogTables never clobber each other's
        # staged source
        view = "_merge_src_" + re.sub(r"[^A-Za-z0-9_]", "_", self.name)
        df.createOrReplaceTempView(view)
        return view

    def merge_upsert(self, updates: DataFrame, keys: list[str]) -> None:
        self.spark.sql(merge_upsert_sql(self.name, self._stage(updates), keys))

    def merge_update_columns(
        self, updates: DataFrame, keys: list[str], update_cols: list[str]
    ) -> None:
        self.spark.sql(
            merge_update_columns_sql(
                self.name, self._stage(updates), keys, update_cols
            )
        )

    def merge_delete(self, probe: DataFrame, keys: list[str]) -> None:
        self.spark.sql(
            merge_delete_sql(self.name, self._stage(probe.select(*keys)), keys)
        )
