"""Property tests: path-algebra Column functions vs independent pure-Python
implementations over generated paths (SURVEY §2.8 semantics)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from storage_spark.functions import paths

SEG = st.text(alphabet=list("abcZ09._- !"), min_size=1, max_size=6)
PATHS = st.lists(
    st.lists(SEG, min_size=1, max_size=5).map(lambda segs: "/".join(segs)),
    min_size=1,
    max_size=20,
    unique=True,
)


def py_foldername(name):
    return "/".join(name.split("/")[:-1])


def py_filename(name):
    return name.split("/")[-1]


def py_extension(name):
    # reference semantics (0060:4-20): reverse/split_part/reverse — the whole
    # filename when there is no dot, '' for a trailing dot
    return py_filename(name).rsplit(".", 1)[-1]


def py_prefixes(name):
    parts = name.split("/")
    return ["/".join(parts[:i]) for i in range(1, len(parts))]


def py_common_prefix(name, prefix, delim="/"):
    loc = name.find(delim, len(prefix))
    return name[: loc + len(delim)] if loc >= 0 else None


@settings(max_examples=20, deadline=None)
@given(names=PATHS)
def test_path_algebra_matches_python(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    n = F.col("name")
    rows = df.select(
        "name",
        paths.foldername(n).alias("folder"),
        paths.filename(n).alias("file"),
        paths.extension(n).alias("ext"),
        paths.get_level(n).alias("level"),
        paths.get_prefixes(n).alias("prefixes"),
        paths.common_prefix(n, "").alias("cp"),
    ).collect()
    for r in rows:
        assert r.folder == py_foldername(r.name), r.name
        assert r.file == py_filename(r.name), r.name
        assert r.ext == py_extension(r.name), r.name
        assert r.level == len(r.name.split("/")), r.name
        assert list(r.prefixes) == py_prefixes(r.name), r.name
        assert r.cp == py_common_prefix(r.name, ""), r.name


@pytest.mark.parametrize(
    ("name", "prefix", "want"),
    [
        ("a/b/c.txt", "", "a/"),
        ("a/b/c.txt", "a/", "a/b/"),
        ("a/b/c.txt", "a/b/", None),
        ("leaf.txt", "", None),
        ("a//x", "a/", "a//"),  # empty segment is a valid byte-order citizen
    ],
)
def test_common_prefix_cases(spark, name, prefix, want):
    df = spark.createDataFrame([(name,)], "name string")
    got = df.select(paths.common_prefix(F.col("name"), prefix).alias("cp")).collect()[0].cp
    assert got == want


def test_prefix_upper_bound_property(spark):
    # every name with the prefix sorts inside [prefix, upper_bound)
    for p in ["a/", "ECONOMY/", "z", "a!"]:
        ub = paths.prefix_upper_bound(p)
        assert p < ub
        for suffix in ["", "a", "zzz", "/x", "~"]:
            assert p <= p + suffix < ub


def test_prefix_upper_bound_edge_codepoints():
    # surrogate gap is skipped: successor of U+D7FF is U+E000, not a lone
    # surrogate that UTF-8 literals can't carry
    assert paths.prefix_upper_bound("a" + chr(0xD7FF)) == "a" + chr(0xE000)
    # U+10FFFF carries into the previous character
    assert paths.prefix_upper_bound("a\U0010FFFF") == "b"
    # a prefix made entirely of U+10FFFF has no finite bound
    assert paths.prefix_upper_bound("\U0010FFFF\U0010FFFF") is None
    from pyspark.sql import functions as F

    # and the range filter degrades to >= alone without erroring
    col = paths.prefix_range_filter(F.lit("x"), "\U0010FFFF")
    assert col is not None
