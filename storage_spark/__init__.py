"""storage_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of supabase/storage (the reference engine).

The reference (at /root/reference, snapshot 2026-08-07) is an object-storage
metadata engine: every query capability is a relational query over metadata
tables (objects / buckets / prefixes / multipart / vectors / catalog).
This package re-expresses that capability surface Spark-first:

- all operators are pure functions ``DataFrame -> DataFrame`` built on the
  DataFrame/SQL API so Catalyst handles pushdown, pruning and join planning;
- hierarchical listing is the reference's own batch formulation
  (``search_by_timestamp``'s common-prefix aggregation,
  migrations/tenant/0050-search-v2-optimised.sql:676-780) rather than the
  procedural skip-scan loop, which only exists to serve single pages in
  milliseconds from a B-tree;
- reconciliation (orphan scans) becomes distributed anti-joins instead of
  1000-key probe batches (src/storage/scanner/scanner.ts:323-403);
- the jsonb metadata-filter DSL (src/storage/protocols/vector/adapter/
  pgvector/filter.ts) compiles to Column expressions;
- vector search is exact distributed top-k with an LSH path for scale.

Scale stance (designed for ~100 TB on a 1000-executor cluster, tested on
local[32]): objects are partitioned by ``bucket_id`` and sorted/z-ordered by
``name`` so prefix listings prune files; dimension tables (buckets, tenants,
vector_indexes) are broadcast; aggregations rely on partial (map-side)
aggregation; no operator collects to the driver.
"""

__version__ = "0.1.0"
