"""Filter-DSL compiler vs an independent pure-Python interpreter of the
reference grammar (filter.ts semantics), over a corpus of tri-type docs."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from storage_spark.functions.jsonmeta import FilterError, compile_filter


# --- independent reference interpreter (jsonb semantics in Python) --------


def _as_text(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _elem_text(e):
    # jsonb_array_elements + #>>'{}' : element rendered as text
    if isinstance(e, bool):
        return "true" if e else "false"
    if isinstance(e, float) and e.is_integer():
        return str(int(e))
    if e is None:
        return None
    if isinstance(e, (dict, list)):
        return json.dumps(e)
    return str(e)


def _field_op(doc, field, op, raw):
    present = isinstance(doc, dict) and field in doc
    val = doc.get(field) if present else None
    is_arr = present and isinstance(val, list)
    if op == "$eq":
        t = _as_text(raw)
        if is_arr:
            return any(_elem_text(e) == t for e in val)
        return present and val is not None and _as_text(val) == t
    if op == "$ne":
        t = _as_text(raw)
        if is_arr:
            return not any(_elem_text(e) == t for e in val)
        return present and val is not None and _as_text(val) != t
    if op in ("$gt", "$gte", "$lt", "$lte"):
        if not present or isinstance(val, bool) or not isinstance(val, (int, float)):
            return False
        return {
            "$gt": val > raw,
            "$gte": val >= raw,
            "$lt": val < raw,
            "$lte": val <= raw,
        }[op]
    if op == "$in":
        ts = [_as_text(v) for v in raw]
        if is_arr:
            return any(_elem_text(e) in ts for e in val)
        return present and val is not None and _as_text(val) in ts
    if op == "$nin":
        ts = [_as_text(v) for v in raw]
        if is_arr:
            return not any(_elem_text(e) in ts for e in val)
        return present and val is not None and _as_text(val) not in ts
    if op == "$exists":
        return present if raw else not present
    raise AssertionError(op)


def eval_filter(ast, doc):
    if "$and" in ast:
        return all(eval_filter(s, doc) for s in ast["$and"])
    if "$or" in ast:
        return any(eval_filter(s, doc) for s in ast["$or"])
    out = True
    for field, value in ast.items():
        if isinstance(value, dict):
            out = out and all(
                _field_op(doc, field, op, raw) for op, raw in value.items()
            )
        else:
            out = out and _field_op(doc, field, "$eq", value)
    return out


DOCS = [
    {"k": 69},
    {"k": 0},
    {"k": -3.5},
    {"k": 3.0},
    {"k": "69"},
    {"k": "hello"},
    {"k": True},
    {"k": False},
    {"k": None},
    {"k": ["a", "b"]},
    {"k": [1, 2, 3]},
    {"k": [True, "x", 7]},
    {"k": []},
    {"other": 1},
    {},
]

FILTERS = [
    {"k": 69},
    {"k": "69"},
    {"k": {"$eq": 69}},
    {"k": {"$eq": "b"}},
    {"k": {"$eq": True}},
    {"k": {"$eq": 3}},
    {"k": {"$ne": 69}},
    {"k": {"$ne": "a"}},
    {"k": {"$gt": 1}},
    {"k": {"$gte": 0}},
    {"k": {"$lt": 0}},
    {"k": {"$lte": -3.5}},
    {"k": {"$in": [69, "hello"]}},
    {"k": {"$in": [2, True]}},
    {"k": {"$nin": [69, 1]}},
    {"k": {"$exists": True}},
    {"k": {"$exists": False}},
    {"k": {"$gte": 1, "$lt": 100}},
    {"$and": [{"k": {"$exists": True}}, {"k": {"$gt": 0}}]},
    {"$or": [{"k": 69}, {"other": 1}]},
    {"$or": [{"k": {"$in": ["a", "b"]}}, {"k": {"$exists": False}}]},
]


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [(i, json.dumps(d)) for i, d in enumerate(DOCS)]
    return spark.createDataFrame(rows, "i int, metadata string").cache()


@pytest.mark.parametrize("ast", FILTERS, ids=[json.dumps(f) for f in FILTERS])
def test_filter_matches_reference_interpreter(spark, docs_df, ast):
    got = {
        r.i for r in docs_df.filter(compile_filter(ast, "metadata")).select("i").collect()
    }
    want = {i for i, d in enumerate(DOCS) if eval_filter(ast, d)}
    assert got == want, f"{ast}: spark={sorted(got)} python={sorted(want)}"


INVALID = [
    {},
    {"$and": []},
    {"$or": "x"},
    {"$and": [{"k": 1}], "k": 2},
    {"k": {}},
    {"k": {"$bogus": 1}},
    {"$bad": 1},
    {"k": {"$gt": "notnum"}},
    {"k": {"$in": []}},
    {"k": {"$exists": "yes"}},
    {"k": {"$eq": float("inf")}},
    {"k": {"$eq": [1, 2]}},
    # quote in a key: Spark's variant path grammar has no escape, so this
    # must be a FilterError up front, not INVALID_VARIANT_GET_PATH at run
    {"it's": 1},
    {'he said "hi"': 1},
]


@pytest.mark.parametrize("ast", INVALID, ids=[json.dumps(f, default=str) for f in INVALID])
def test_invalid_filters_raise(ast):
    with pytest.raises(FilterError):
        compile_filter(ast, "metadata")


def test_fuzzed_filters_match_interpreter(spark, docs_df):
    """Randomized grammar fuzz: 120 generated filters evaluated in ONE Spark
    pass (each filter = one boolean column) against the Python interpreter."""
    import random

    rng = random.Random(42)
    scalars = [69, 0, -3.5, 3.0, "69", "hello", True, False, "a", 7, 2]

    def gen_field_filter(depth=0):
        op = rng.choice(
            ["$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin", "$exists",
             "bare", "$and", "$or"]
        )
        if op in ("$and", "$or"):
            if depth >= 2:
                op = "$eq"
            else:
                return {
                    op: [gen_field_filter(depth + 1) for _ in range(rng.randint(1, 3))]
                }
        if op in ("$gt", "$gte", "$lt", "$lte"):
            return {"k": {op: rng.choice([69, 0, -3.5, 3, 100])}}
        if op in ("$in", "$nin"):
            return {"k": {op: rng.sample(scalars, rng.randint(1, 4))}}
        if op == "$exists":
            return {rng.choice(["k", "other", "nope"]): {"$exists": rng.random() < 0.5}}
        if op == "bare":
            return {"k": rng.choice(scalars)}
        return {"k": {op: rng.choice(scalars)}}

    filters = [gen_field_filter() for _ in range(120)]
    cols = [
        F.coalesce(compile_filter(ast, "metadata"), F.lit(False)).alias(f"f{i}")
        for i, ast in enumerate(filters)
    ]
    rows = docs_df.select("i", *cols).collect()
    got = {
        i: {r.i for r in rows if r[f"f{i}"]}
        for i in range(len(filters))
    }
    for i, ast in enumerate(filters):
        want = {j for j, d in enumerate(DOCS) if eval_filter(ast, d)}
        assert got[i] == want, f"filter {ast}: spark={sorted(got[i])} py={sorted(want)}"


def test_non_filterable_keys():
    from storage_spark.functions.jsonmeta import validate_filterable_keys

    with pytest.raises(FilterError):
        validate_filterable_keys({"$and": [{"secret": 1}]}, {"secret"})
    validate_filterable_keys({"open": 1}, {"secret"})  # ok
