"""Global-ordering operators: assign_global_ids / assign_shards /
top_n_per_group — results must equal the single-partition
``row_number() OVER (ORDER BY ...)`` they replace, while the plan keeps
the work partitioned by group."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from storage_spark.operators.ordering import (
    assign_global_ids,
    assign_shards,
    top_n_per_group,
)


def _docs(spark, n=500):
    # skewed groups + duplicate order values (tiebreak matters)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 37 % 11).alias("q"),
    )


def test_global_ids_match_global_row_number(spark):
    df = _docs(spark)
    order = [F.col("grp"), F.col("q").desc(), F.col("doc_id")]
    got = assign_global_ids(df, order, group_col="grp")
    want = df.withColumn(
        "global_id",
        F.row_number().over(Window.orderBy(*order)).cast("long") - 1,
    )
    assert (
        got.select("doc_id", "global_id").exceptAll(
            want.select("doc_id", "global_id")
        ).count()
        == 0
    )
    # contiguous 0..n-1
    mx, mn, cnt = got.agg(
        F.max("global_id"), F.min("global_id"), F.count("*")
    ).first()
    assert (mn, mx) == (0, cnt - 1)
    assert got.select("global_id").distinct().count() == cnt


def test_global_ids_default_group_is_leading_key(spark):
    df = _docs(spark, 200)
    order = [F.col("grp"), F.col("doc_id")]
    got = assign_global_ids(df, order)
    want = df.withColumn(
        "global_id",
        F.row_number().over(Window.orderBy(*order)).cast("long") - 1,
    )
    assert (
        got.exceptAll(want.select(*got.columns)).count() == 0
    )


def test_global_ids_plan_has_no_single_partition_window(spark):
    df = _docs(spark)
    got = assign_global_ids(df, [F.col("grp"), F.col("doc_id")], "grp")
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the big window must partition by the group; only the tiny
    # #groups-row offset window may be global
    import re

    windows = [
        ln for ln in plan.splitlines() if re.search(r"\bWindow\b", ln)
    ]
    assert windows, plan
    big = [w for w in windows if "row_number" in w]
    assert big and all("__grp" in w for w in big), plan


def test_shards_are_contiguous_slices(spark):
    df = _docs(spark, 100)
    order = [F.col("grp"), F.col("doc_id")]
    got = assign_shards(df, order, n_shards=4, group_col="grp")
    rows = got.orderBy("global_id").collect()
    assert [r.shard for r in rows] == sorted(r.shard for r in rows)
    sizes = got.groupBy("shard").count().orderBy("shard").collect()
    assert [r["shard"] for r in sizes] == [0, 1, 2, 3]
    assert all(r["count"] == 25 for r in sizes)


def test_top_n_per_group_matches_window_sql(spark):
    df = _docs(spark)
    got = top_n_per_group(
        df, ["grp"], [F.col("q").desc(), F.col("doc_id")], 3
    )
    w = Window.partitionBy("grp").orderBy(F.col("q").desc(), F.col("doc_id"))
    want = (
        df.withColumn("rn", F.row_number().over(w)).filter("rn <= 3")
    )
    assert got.exceptAll(want).count() == 0
    assert got.count() == want.count() == 7 * 3


def test_top_n_per_group_plan_pushes_group_limit(spark):
    df = _docs(spark, 2000)
    got = top_n_per_group(df, ["grp"], [F.col("doc_id")], 5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # Spark 3.5+ WindowGroupLimit: per-map-task top-n before the shuffle
    assert "WindowGroupLimit" in plan, plan
