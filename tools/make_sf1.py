"""Synthesize an sf1-scale probe dataset at /tmp/sf1 by replicating the
driver's sf0.1 tables 10x with shifted keys (referential integrity
preserved: every FK shifts by its parent's stride). /tmp only — the probe
surfaces memory/shuffle cliffs the contract scales hide; it is NOT part
of the graded contract and never touches /root/testdata.

Mutations beyond key shifts, so scaled data doesn't degenerate:
- documents: each copy's text is word-rotated by 7*i and tagged with a
  unique token — otherwise every doc gains 9 exact twins and the dedup
  benches measure a pathological corpus instead of a big one;
- embeddings: first component perturbed per copy (same reason);
- events: ts shifted i seconds per copy so (user_id, ts) stays unique.

Single-file parquet via DuckDB COPY — the oracle harness reads
'{dir}/{table}.parquet' as one file.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF1_DIR", "/tmp/sf1")
COPIES = int(os.environ.get("SF1_COPIES", "10"))

PK, CK, SK, OK, EK, DK, VK = (
    100_000, 100_000, 10_000, 1_000_000, 1_000_000, 100_000, 10_000,
)

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

R = f"range({COPIES}) r(i)"
SQL = {
    "region": "SELECT * FROM region",
    "nation": "SELECT * FROM nation",
    "customer": f"""
        SELECT c_custkey + i * {CK} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM customer, {R}""",
    "supplier": f"""
        SELECT s_suppkey + i * {SK} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM supplier, {R}""",
    "part": f"""
        SELECT p_partkey + i * {PK} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice FROM part, {R}""",
    "orders": f"""
        SELECT o_orderkey + i * {OK} AS o_orderkey,
               o_custkey + i * {CK} AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority FROM orders, {R}""",
    "lineitem": f"""
        SELECT l_orderkey + i * {OK} AS l_orderkey,
               l_partkey + i * {PK} AS l_partkey,
               l_suppkey + i * {SK} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem, {R}""",
    "events": f"""
        SELECT event_id + i * {EK} AS event_id,
               ts + i * INTERVAL 1 SECOND AS ts,
               user_id, event_type, value, props FROM events, {R}""",
    "documents": f"""
        SELECT doc_id + i * {DK} AS doc_id,
               array_to_string(
                 list_concat(
                   w[1 + CAST(7 * i % greatest(len(w), 1) AS BIGINT):],
                   w[:CAST(7 * i % greatest(len(w), 1) AS BIGINT)]
                 ), ' '
               ) || ' c' || i || 'x' || doc_id AS text,
               lang, source, 0::BIGINT AS n_chars
        FROM (SELECT *, string_split(text, ' ') AS w FROM documents), {R}""",
    "embeddings": f"""
        SELECT vec_id + i * {VK} AS vec_id,
               CAST(list_concat(
                 [embedding[1] + i * 0.001 + (vec_id % 97) * 0.00001],
                 embedding[2:]
               ) AS FLOAT[]) AS embedding,
               label FROM embeddings, {R}""",
}

for t, q in SQL.items():
    con.execute(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(t, n, flush=True)
# n_chars was placeholder — recompute from the rotated text
con.execute(
    f"""COPY (SELECT doc_id, text, lang, source,
        CAST(length(text) AS BIGINT) AS n_chars
        FROM '{DST}/documents.parquet') TO '{DST}/documents2.parquet'
        (FORMAT PARQUET)"""
)
os.replace(f"{DST}/documents2.parquet", f"{DST}/documents.parquet")
print("done ->", DST)
