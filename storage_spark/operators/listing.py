"""Hierarchical listing — the engine's flagship operator family.

The reference answers "list a folder" three different ways (legacy DISTINCT
ON 0020-list-objects-with-delimiter.sql:3-40; skip-scan loop
0050-search-v2-optimised.sql:90-320; batch common-prefix aggregation
search_by_timestamp 0050:676-780). The skip-scan exists only because
Postgres must serve one 1000-key page in ~28 ms from a B-tree; its *result*
is identical to the common-prefix aggregation, which is the shape that
parallelizes: filter → derive common prefix → split folders/leaves →
partial-aggregated groupBy → union → sort → limit. That is THE plan here.

Scale: the prefix filter is a sargable range (paths.prefix_range_filter), so
on a bucket_id-partitioned, name-sorted layout a listing touches only the
files overlapping the prefix range; the groupBy's map-side combine collapses
each folder to one row per partition before the (tiny) shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from storage_spark.functions.paths import common_prefix, prefix_range_filter

#: Columns every listing emits. Folders carry NULL id/size/mimetype like the
#: reference's folder rows (search_v2 returns NULL metadata for prefixes —
#: 0050-search-v2-optimised.sql:700-720).
LISTING_COLUMNS = ["name", "id", "size", "created_at_ms", "updated_at_ms", "mimetype"]


def _apply_common_filters(
    objects: DataFrame,
    bucket_id: str | None,
    prefix: str,
    before_ms: int | None = None,
) -> DataFrame:
    df = objects
    if bucket_id is not None:
        df = df.filter(F.col("bucket_id") == bucket_id)
    if prefix:
        df = df.filter(prefix_range_filter(F.col("name"), prefix))
    if before_ms is not None:
        # temporal cutoff, pg.ts:550-553
        df = df.filter(F.col("created_at_ms") < F.lit(before_ms))
    return df


def list_objects_flat(
    objects: DataFrame,
    bucket_id: str | None = None,
    prefix: str = "",
    start_after: str | None = None,
    limit: int | None = None,
    descending: bool = False,
    before_ms: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Flat (no-delimiter) listing with keyset cursor — S1 + F1-F3 + O1.

    Reference: listObjects / listObjectsV2 without delimiter
    (src/storage/database/pg.ts:537-579 and :612-671): binary name order,
    ``name > start_after`` seek, LIMIT n.
    """
    df = _apply_common_filters(objects, bucket_id, prefix, before_ms)
    if start_after:
        df = df.filter(F.col("name") > start_after if not descending else F.col("name") < start_after)
    df = df.orderBy(F.col("name").desc() if descending else F.col("name").asc())
    if columns:
        df = df.select(*columns)
    if limit is not None:
        df = df.limit(limit)
    return df


def list_objects_with_delimiter(
    objects: DataFrame,
    bucket_id: str | None = None,
    prefix: str = "",
    delimiter: str = "/",
    start_after: str | None = None,
    limit: int | None = None,
    before_ms: int | None = None,
) -> DataFrame:
    """S3 ListObjectsV2-style delimiter listing — the A4 common-prefix plan.

    Folders are ``prefix + first-segment + delimiter`` groups with
    MIN(created_at) as both created/updated (search_by_timestamp's choice,
    0050-search-v2-optimised.sql:729-741); leaves pass through; UNION ALL;
    byte-order sort; limit. Folder rows carry NULL id/size/mimetype.
    """
    df = _apply_common_filters(objects, bucket_id, prefix, before_ms)
    cp = common_prefix(F.col("name"), prefix, delimiter)
    df = df.withColumn("_cp", cp)

    # Single-pass formulation: group on coalesce(folder, leaf-name). A leaf
    # is a singleton group (its own columns survive via the leaf-guarded
    # max); a folder group aggregates MIN(created_at) and NULL metadata —
    # identical output to the folders-UNION-leaves plan with one scan and
    # one shuffle instead of two of each (2x on a 10M-row namespace).
    leaf = F.col("_cp").isNull()
    # Leaves carry their unique id as a second grouping column: a leaf is
    # ALWAYS its own group even when another leaf shares its name (possible
    # only in cross-bucket listings, bucket_id=None) — matching the
    # folders-UNION-leaves formulation, which never merges leaf rows.
    # Folder members have NULL _leaf_key and aggregate together.
    out = (
        df.groupBy(
            F.coalesce(F.col("_cp"), F.col("name")).alias("name"),
            F.when(leaf, F.col("id")).alias("_leaf_key"),
        )
        .agg(
            F.min("created_at_ms").alias("_min_created"),
            F.max(F.when(leaf, F.col("id"))).alias("id"),
            F.max(F.when(leaf, F.col("size"))).alias("size"),
            F.max(F.when(leaf, F.col("updated_at_ms"))).alias("_leaf_updated"),
            F.max(F.when(leaf, F.col("mimetype"))).alias("mimetype"),
        )
        .select(
            "name",
            "id",
            "size",
            F.col("_min_created").alias("created_at_ms"),
            F.coalesce(F.col("_leaf_updated"), F.col("_min_created")).alias(
                "updated_at_ms"
            ),
            "mimetype",
        )
    )
    if start_after:
        # Folder-vs-leaf cursor semantics: a cursor naming a folder resumes
        # past the folder's whole subtree because the folder name ends with
        # the delimiter and every child sorts >= it (object.ts:928-952).
        out = out.filter(F.col("name") > start_after)
    out = out.orderBy("name")
    if limit is not None:
        out = out.limit(limit)
    return out


def search_prefixes(
    objects: DataFrame,
    bucket_id: str | None = None,
    prefix: str = "",
    delimiter: str = "/",
) -> DataFrame:
    """Distinct folder names under a prefix — the skip-scan's result set
    (W2, 0050-search-v2-optimised.sql:90-320) as a one-line aggregation."""
    df = _apply_common_filters(objects, bucket_id, prefix)
    cp = common_prefix(F.col("name"), prefix, delimiter)
    return (
        df.select(cp.alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        .orderBy("name")
    )


def search_objects_sorted(
    objects: DataFrame,
    bucket_id: str | None,
    prefix: str,
    sort_column: Column,
    sort_desc: bool = False,
    limit: int | None = None,
    offset: int | None = None,
) -> DataFrame:
    """POST /object/list with a non-name sort column — O2 multi-key sort:
    ORDER BY <col> <ord>, name <ord> with NULLs treated as epoch
    (pg.ts:661-663; 0039-add-search-v2-sort-support.sql:49-52)."""
    df = _apply_common_filters(objects, bucket_id, prefix)
    key = F.coalesce(sort_column, F.lit(0))
    order = [key.desc() if sort_desc else key.asc(),
             F.col("name").desc() if sort_desc else F.col("name").asc()]
    df = df.orderBy(*order)
    if offset:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    return df


def search_by_timestamp(
    objects: DataFrame,
    bucket_id: str | None,
    prefix: str = "",
    delimiter: str = "/",
    sort_column: str = "created_at_ms",
    sort_desc: bool = False,
    cursor_ts_ms: int | None = None,
    cursor_name: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Full ``search_by_timestamp`` parity (0050-search-v2-optimised.sql:
    676-780): the A4 folder/leaf union, ordered by a timestamp column with
    name tie-break (O2), resumed from a composite ms-truncated cursor (F4).
    Folders carry MIN(created_at) as both timestamps, exactly like the
    reference's aggregated prefix rows (:729-741)."""
    out = list_objects_with_delimiter(objects, bucket_id, prefix, delimiter)
    ts = F.coalesce(F.col(sort_column), F.lit(0))
    if cursor_ts_ms is not None:
        name_cmp = (
            F.col("name") > cursor_name if not sort_desc else F.col("name") < cursor_name
        )
        ts_cmp = ts > cursor_ts_ms if not sort_desc else ts < cursor_ts_ms
        # `is not None`, not truthiness: "" is a legitimate first-page name
        # cursor whose tie-break arm (ts == cursor AND name > '') must stay
        # — dropping it skips boundary rows whose ts equals the cursor
        cond = (
            ts_cmp | ((ts == cursor_ts_ms) & name_cmp)
            if cursor_name is not None
            else ts_cmp
        )
        out = out.filter(cond)
    order = [ts.desc() if sort_desc else ts.asc(),
             F.col("name").desc() if sort_desc else F.col("name").asc()]
    out = out.orderBy(*order)
    if limit is not None:
        out = out.limit(limit)
    return out


def search_objects_v1(
    objects: DataFrame,
    bucket_id: str | None,
    prefix: str = "",
    search: str = "",
    levels: int = 1,
    delimiter: str = "/",
    limit: int | None = 100,
    offset: int = 0,
    sort_column: str = "name",
    sort_desc: bool = False,
) -> DataFrame:
    """Legacy search-v1 with the **case-insensitive ``search`` continuation
    parameter** — the dashboard search box (0056-fix-optimized-search-
    function.sql; index 0051-index-backward-compatible-search.sql:4-5).

    Reference semantics, name sort (0056:61-62,86,102 + main loop):
    ``search`` is appended to ``prefix`` and the combined string matches
    case-INSENSITIVELY (``objects.name ILIKE prefix||search||'%'``, executed
    as a ``lower(name) COLLATE "C"`` range). Folder grouping runs over
    ``lower(name)``, but the DISPLAYED folder keeps the ORIGINAL case of the
    first object encountered in traversal order (the 0056 header's
    case-preservation fix: ``get_common_prefix(v_peek_name, v_prefix)``).
    Both folders and files emit path segment #``levels`` via ``split_part``;
    folder rows carry NULL metadata. LIMIT is capped at 1500 (0056:60);
    OFFSET skips merged folder+file rows in traversal order.

    The reference's hybrid peek/batch skip-scan loop exists to serve one
    page from a B-tree; its *result* is this one declarative plan: filter →
    lowercase common prefix → folders groupBy (min/max-by picks the
    case-preserving representative) → union files → sort by lowercase key.

    Non-name sorts use the reference's path_tokens fallback (0056:82-110):
    folders = DISTINCT segment #levels of deeper rows ordered by name, files
    = rows at exactly ``levels`` ordered by ``sort_column``, folders block
    first, LIMIT/OFFSET over the concatenation.
    """
    import re

    full = (prefix or "") + (search or "")
    fl = full.lower()
    if limit is not None:
        limit = min(limit, 1500)
    df = objects
    if bucket_id is not None:
        df = df.filter(F.col("bucket_id") == bucket_id)
    if fl:
        # ILIKE fl||'%' as a sargable range over lower(name) — same rewrite
        # the reference's 0051 expression index serves
        df = df.filter(prefix_range_filter(F.lower(F.col("name")), fl))

    if sort_column != "name":
        # path_tokens fallback: PG's path_tokens[$1] yields NULL past the
        # array end — F.get (0-based) has the same contract
        toks = F.split(F.col("name"), re.escape(delimiter))
        depth = F.size(toks)
        seg = F.get(toks, levels - 1)
        null_meta = [
            F.lit(None).cast("string").alias("id"),
            F.lit(None).cast("bigint").alias("size"),
            F.lit(None).cast("bigint").alias("created_at_ms"),
            F.lit(None).cast("bigint").alias("updated_at_ms"),
            F.lit(None).cast("string").alias("mimetype"),
        ]
        folders = (
            df.filter(depth != levels)
            .select(seg.alias("name"))
            .distinct()
            .select("name", *null_meta, F.lit(0).alias("_branch"))
        )
        key = F.coalesce(F.col(sort_column), F.lit(0))
        files = df.filter(depth == levels).select(
            seg.alias("name"), "id", "size", "created_at_ms",
            "updated_at_ms", "mimetype", F.lit(1).alias("_branch"),
        )
        out = folders.unionByName(files)
        # folders block first (0056:93-108's UNION ALL order), each block
        # internally ordered by its own key; constant-within-block keys make
        # one composite sort equivalent to the two block sorts
        k_folder = F.when(F.col("_branch") == 0, F.col("name"))
        k_file = F.when(F.col("_branch") == 1, key)
        tie = F.when(F.col("_branch") == 1, F.col("name"))
        order = [F.col("_branch").asc()] + [
            c.desc() if sort_desc else c.asc() for c in (k_folder, k_file, tie)
        ]
        out = out.orderBy(*order).drop("_branch")
    else:
        lname = F.lower(F.col("name"))
        loc = F.locate(delimiter, lname, len(fl) + 1)
        cp = F.when(loc > 0, F.substring(lname, 1, loc + len(delimiter) - 1))
        tagged = df.select(
            "name", "id", "size", "created_at_ms", "updated_at_ms", "mimetype",
            lname.alias("_lname"), cp.alias("_cp"),
        )
        # case-preserving representative: the first row of the folder range
        # in traversal order (ASC: min lower-name; DESC: the top-end peek)
        rep_agg = (F.max if sort_desc else F.min)(F.struct("_lname", "name"))
        disp = F.substring(F.col("_rep.name"), 1, F.length(F.col("_cp")))
        folder_name = F.split_part(
            F.regexp_replace(disp, re.escape(delimiter) + "+$", ""),
            F.lit(delimiter), F.lit(levels),
        )
        folders = (
            tagged.filter(F.col("_cp").isNotNull())
            .groupBy("_cp")
            .agg(rep_agg.alias("_rep"))
            .select(
                folder_name.alias("name"),
                F.lit(None).cast("string").alias("id"),
                F.lit(None).cast("bigint").alias("size"),
                F.lit(None).cast("bigint").alias("created_at_ms"),
                F.lit(None).cast("bigint").alias("updated_at_ms"),
                F.lit(None).cast("string").alias("mimetype"),
                F.col("_cp").alias("_key"),
                F.lit("").alias("_tie"),
            )
        )
        files = tagged.filter(F.col("_cp").isNull()).select(
            F.split_part(F.col("name"), F.lit(delimiter), F.lit(levels)).alias("name"),
            "id", "size", "created_at_ms", "updated_at_ms", "mimetype",
            F.col("_lname").alias("_key"), F.col("name").alias("_tie"),
        )
        out = folders.unionByName(files)
        order = [
            F.col("_key").desc() if sort_desc else F.col("_key").asc(),
            F.col("_tie").desc() if sort_desc else F.col("_tie").asc(),
        ]
        out = out.orderBy(*order).drop("_key", "_tie")
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def top_k_merge(branches: list[DataFrame], order: list[Column], k: int) -> DataFrame:
    """O3 sorted-merge top-k: per-branch LIMIT k, UNION ALL, global top-k —
    search_v2's two-branch plan (0027-search-v2.sql:20-57). Catalyst lowers
    the final sort+limit to TakeOrderedAndProject (no full sort)."""
    if not branches:
        raise ValueError("top_k_merge needs at least one branch")
    limited = [b.orderBy(*order).limit(k) for b in branches]
    out = limited[0]
    for b in limited[1:]:
        out = out.unionByName(b)
    return out.orderBy(*order).limit(k)
