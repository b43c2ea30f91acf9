"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark DataFrame and an oracle SQL string over the same sf directory,
then compares row count, column names, and an order-insensitive canonical
form of every value.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from storage_spark.tables import BASE_TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in BASE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).fetch_df()


def _canon(v):
    if v is None:
        return "~null~"
    if isinstance(v, float):
        if math.isnan(v):
            return "~null~"
        return f"{v:.6f}"
    if isinstance(v, Decimal):
        return f"{float(v):.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return str(v)


def _rows(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return cols, sorted(rows)


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, name: str = "query"):
    mine = spark_df.toPandas()
    theirs = run_oracle(oracle_sql, sf_dir)
    my_cols, my_rows = _rows(mine)
    or_cols, or_rows = _rows(theirs)
    assert my_cols == or_cols, f"{name}: columns {my_cols} != oracle {or_cols}"
    assert len(my_rows) == len(or_rows), (
        f"{name}: row count {len(my_rows)} != oracle {len(or_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(my_rows, or_rows) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
