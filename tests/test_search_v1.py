"""search-v1 parity: the case-insensitive ``search`` continuation parameter
(0056-fix-optimized-search-function.sql; index 0051).

The corpus plants case-variant names so the tests pin the three semantics
the reference's 0056 rewrite fixed/established: ILIKE-style matching over
lower(name), ORIGINAL-case folder display from the first row in traversal
order, and the merged folder+file stream ordered by the lowercase key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from storage_spark.operators.listing import search_objects_v1

ROWS = [
    # (name, id, size, created_at_ms, updated_at_ms, mimetype)
    ("Docs/Alpha/readme.txt", "1", 10, 1000, 5000, "text/plain"),
    ("docs/beta/guide.txt", "2", 20, 2000, 4000, "text/plain"),
    ("DOCS/zeta.txt", "3", 30, 3000, 9000, "text/plain"),
    ("images/cat.png", "4", 40, 4000, 8000, "image/png"),
    ("Index.html", "5", 50, 5000, 7000, "text/html"),
    ("izzz.bin", "6", 60, 60, 6000, "application/octet-stream"),
    ("README", "7", 70, 70, 100, "text/plain"),
]

SCHEMA = "name string, id string, size long, created_at_ms long, updated_at_ms long, mimetype string"


def _df(spark):
    return spark.createDataFrame(
        [r + ("b1",) for r in ROWS], SCHEMA + ", bucket_id string"
    )


def test_case_insensitive_search_matches_and_preserves_case(spark):
    out = search_objects_v1(_df(spark), "b1", search="doc", levels=1).collect()
    # all three Docs/docs/DOCS rows collapse into ONE folder (grouping is on
    # lower(name)); display case comes from the FIRST row in lower-name
    # order: 'DOCS/zeta.txt' < 'Docs/...' is false byte-wise on lower —
    # lower names are 'docs/alpha/...', 'docs/beta/...', 'docs/zeta.txt';
    # min is docs/alpha → representative 'Docs/Alpha/readme.txt' → 'Docs'
    assert len(out) == 1
    assert out[0].name == "Docs"
    assert out[0].id is None and out[0].size is None


def test_search_appends_to_prefix(spark):
    # prefix 'docs/' (lowercase — still matches Docs/DOCS) + search 'b'
    out = search_objects_v1(_df(spark), "b1", prefix="docs/", search="b", levels=2).collect()
    assert [r.name for r in out] == ["beta"]


def test_merged_stream_orders_by_lowercase_key(spark):
    out = search_objects_v1(_df(spark), "b1", search="i", levels=1).collect()
    # lower keys: images/ (folder), index.html, izzz.bin
    assert [r.name for r in out] == ["images", "Index.html", "izzz.bin"]
    assert out[0].mimetype is None  # folder
    assert out[1].mimetype == "text/html"


def test_offset_skips_merged_rows(spark):
    full = search_objects_v1(_df(spark), "b1", levels=1).collect()
    page = search_objects_v1(_df(spark), "b1", levels=1, offset=2, limit=2).collect()
    assert [r.name for r in page] == [r.name for r in full[2:4]]


def test_descending_traversal(spark):
    out = search_objects_v1(_df(spark), "b1", search="i", levels=1, sort_desc=True).collect()
    assert [r.name for r in out] == ["izzz.bin", "Index.html", "images"]


def test_limit_capped_at_1500(spark):
    # LEAST(limit, 1500) — 0056:60
    df = search_objects_v1(_df(spark), "b1", limit=100000)
    assert "1500" in df._jdf.queryExecution().analyzed().toString()


def test_non_name_sort_folders_block_first(spark):
    out = search_objects_v1(
        _df(spark), "b1", levels=1, sort_column="updated_at_ms", sort_desc=True
    ).collect()
    # folders = DISTINCT exact-case segment (the path_tokens fallback does
    # NOT collapse case variants — 0056:85-97), name DESC, block FIRST
    assert [r.name for r in out[:4]] == ["images", "docs", "Docs", "DOCS"]
    # file rows follow, ordered by updated_at_ms desc
    file_rows = [r for r in out if r.id is not None]
    assert [r.name for r in file_rows] == ["Index.html", "izzz.bin", "README"]


def test_no_match_and_limit_zero_and_missing_bucket(spark):
    # verify-skill probe classes: unmatched search, limit 0, wrong bucket
    assert search_objects_v1(_df(spark), "b1", search="zzz").count() == 0
    assert search_objects_v1(_df(spark), "b1", limit=0).count() == 0
    assert search_objects_v1(_df(spark), "nope").count() == 0
    # offset past the stream end
    assert search_objects_v1(_df(spark), "b1", offset=10_000).count() == 0
