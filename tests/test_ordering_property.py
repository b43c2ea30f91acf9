"""Property test for the COLLATE "C" ordering contract (SURVEY §7 hard
part 5): Spark's string ordering over listing-relevant names must equal
byte-wise UTF-8 order — '/' sorts below alphanumerics, uppercase before
lowercase, and '+'/'~'/space behave byte-wise. The folder-cursor math in
pagination depends on this invariant."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

NAME_ALPHABET = list("abcXYZ019/+~.! _-($)")

names_strategy = st.lists(
    st.text(alphabet=NAME_ALPHABET, min_size=0, max_size=12),
    min_size=1,
    max_size=30,
    unique=True,
)


@settings(max_examples=25, deadline=None)
@given(names=names_strategy)
def test_spark_order_is_byte_order(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = [r.name for r in df.orderBy(F.col("name").asc()).collect()]
    want = sorted(names, key=lambda s: s.encode("utf-8"))
    assert got == want


def test_slash_sorts_below_alphanumerics(spark):
    # the exact property the folder-cursor skip relies on: every child of
    # 'aal/' sorts >= 'aal/', and 'aal0…' sorts after the whole subtree
    names = ["aal/", "aal/z.txt", "aal0", "aalb", "aal!", "AAL/x"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = [r.name for r in df.orderBy("name").collect()]
    assert got == sorted(names, key=lambda s: s.encode())
    assert got.index("aal0") > got.index("aal/z.txt")
