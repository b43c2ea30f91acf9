"""Declarative RLS corpus — port of the semantics-bearing policies in the
reference's rls_tests.yaml (owner-match USING, auth.uid() WITH CHECK,
metadata-predicate checks), evaluated per role/claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from storage_spark.operators.rls import (
    Claims,
    Policy,
    apply_policies,
    check_policies,
)

POLICIES = [
    Policy(
        name="read_only_all_objects",
        table="objects",
        roles=("authenticated",),
        permissions=("select",),
        using="owner_id = '{{uid}}'",
    ),
    Policy(
        name="read_public_buckets_objects",
        table="objects",
        roles=("authenticated", "anon"),
        permissions=("select",),
        using="public = true",
    ),
    Policy(
        name="insert_only_all_objects",
        table="objects",
        roles=("authenticated",),
        permissions=("insert",),
        check="auth.uid() = '{{uid}}'",
    ),
    Policy(
        name="insert_with_metadata_check",
        table="objects",
        roles=("authenticated",),
        permissions=("insert",),
        check="get_json_object(user_metadata, '$.department') = 'engineering'",
    ),
    Policy(
        name="insert_only_images",
        table="objects",
        roles=("authenticated",),
        permissions=("insert",),
        check="mimetype LIKE 'image/%'",
    ),
]


@pytest.fixture(scope="module")
def obj_rows(spark):
    return spark.createDataFrame(
        [
            ("o1", "u1", False, "image/png", '{"department": "engineering"}'),
            ("o2", "u1", True, "text/plain", '{"department": "sales"}'),
            ("o3", "u2", False, "image/jpeg", None),
            ("o4", "u2", True, "video/mp4", '{"department": "engineering"}'),
        ],
        "name string, owner_id string, public boolean, mimetype string,"
        " user_metadata string",
    ).cache()


@pytest.mark.parametrize(
    ("claims", "expected"),
    [
        (Claims(sub="u1", role="authenticated"), {"o1", "o2", "o4"}),  # own + public
        (Claims(sub="u2", role="authenticated"), {"o2", "o3", "o4"}),
        (Claims(sub=None, role="anon"), {"o2", "o4"}),  # public only
        (Claims(sub=None, role="service_role"), {"o1", "o2", "o3", "o4"}),
        (Claims(sub="u9", role="authenticated"), {"o2", "o4"}),  # stranger
    ],
)
def test_select_visibility(spark, obj_rows, claims, expected):
    out = apply_policies(obj_rows, POLICIES, claims, "objects", "select")
    assert {r.name for r in out.collect()} == expected


def test_no_applicable_policy_denies_all(spark, obj_rows):
    out = apply_policies(obj_rows, POLICIES, Claims(sub="u1", role="authenticated"),
                         "objects", "delete")
    assert out.count() == 0


def test_with_check_split(spark, obj_rows):
    # any-of semantics: a row passes if ANY applicable WITH CHECK passes —
    # o2 fails uid-check? no: uid check passes for every row (claims-level),
    # so everything is allowed for its owner claims
    allowed, rejected = check_policies(
        obj_rows, POLICIES, Claims(sub="u1", role="authenticated"), "objects"
    )
    assert rejected.count() == 0  # auth.uid() = uid grants all
    # drop the uid policy: only metadata/image checks remain
    narrowed = [p for p in POLICIES if p.name != "insert_only_all_objects"]
    allowed, rejected = check_policies(
        obj_rows, narrowed, Claims(sub="u1", role="authenticated"), "objects"
    )
    assert {r.name for r in allowed.collect()} == {"o1", "o3", "o4"}
    assert {r.name for r in rejected.collect()} == {"o2"}


@pytest.mark.parametrize(
    "evil_sub",
    [
        "x' OR '1'='1",          # classic predicate rewrite
        "x' OR owner_id != '",   # unbalanced-quote splice
        "u1'--",                 # comment-style truncation attempt
        "x\\' OR 1=1 --",        # backslash-escape confusion
    ],
)
def test_uid_injection_cannot_widen_policy(spark, obj_rows, evil_sub):
    """A crafted JWT sub must stay an opaque literal: the owner-match policy
    with a hostile sub matches NO rows (the reference binds claims as
    parameterized GUCs, pg-connection.ts:65-74 — splicing them unescaped
    would turn default-deny into allow-all)."""
    owner_only = [p for p in POLICIES if p.name == "read_only_all_objects"]
    out = apply_policies(
        obj_rows, owner_only, Claims(sub=evil_sub, role="authenticated"),
        "objects", "select",
    )
    assert out.count() == 0


def test_anon_cannot_insert(spark, obj_rows):
    allowed, rejected = check_policies(
        obj_rows, POLICIES, Claims(sub=None, role="anon"), "objects"
    )
    assert allowed.count() == 0 and rejected.count() == 4


# --------------------------------------------------------------------------
# Operation-aware policies (0058-operation-ergonomics.sql +
# 0024-operation-function.sql: the API sets storage.operation per request,
# pg-connection.ts:65-74; policies gate on it)
# --------------------------------------------------------------------------

OP_POLICIES = POLICIES + [
    Policy(
        name="delete_own_via_api_only",
        table="objects",
        roles=("authenticated",),
        permissions=("delete",),
        using="owner_id = '{{uid}}' AND allow_only_operation('storage.object.delete')",
    ),
    Policy(
        name="upload_ops_see_public",
        table="objects",
        roles=("authenticated",),
        permissions=("select",),
        using="public = true AND allow_any_operation('object.upload', 'storage.object.copy')",
    ),
    Policy(
        name="raw_operation_probe",
        table="objects",
        roles=("authenticated",),
        permissions=("probe",),
        using="storage.operation() = 'storage.object.list'",
    ),
]


def test_operation_gated_delete(spark, obj_rows):
    # matching operation (prefix-normalized both ways, 0058:13-22)
    for op in ("storage.object.delete", "object.delete"):
        out = apply_policies(
            obj_rows, OP_POLICIES,
            Claims(sub="u1", role="authenticated", operation=op),
            "objects", "delete",
        )
        assert {r.name for r in out.collect()} == {"o1", "o2"}, op
    # wrong or missing operation -> default deny
    for op in ("storage.object.upload", None):
        out = apply_policies(
            obj_rows, OP_POLICIES,
            Claims(sub="u1", role="authenticated", operation=op),
            "objects", "delete",
        )
        assert out.count() == 0, op


def test_allow_any_operation_list(spark, obj_rows):
    base = {"o1", "o2", "o4"}  # own + public from the non-op policies
    for op, extra in (
        ("storage.object.upload", {"o2", "o4"}),
        ("object.copy", {"o2", "o4"}),
        ("storage.object.delete", set()),
    ):
        out = apply_policies(
            obj_rows, OP_POLICIES,
            Claims(sub="u1", role="authenticated", operation=op),
            "objects", "select",
        )
        assert {r.name for r in out.collect()} == base | extra, op


def test_raw_operation_function_is_unnormalized(spark, obj_rows):
    # storage.operation() returns the RAW GUC (0024:1-6): the short form
    # does NOT match a policy comparing against the 'storage.'-prefixed raw
    hit = apply_policies(
        obj_rows, OP_POLICIES,
        Claims(sub="u1", role="authenticated", operation="storage.object.list"),
        "objects", "probe",
    )
    assert hit.count() == 4
    miss = apply_policies(
        obj_rows, OP_POLICIES,
        Claims(sub="u1", role="authenticated", operation="object.list"),
        "objects", "probe",
    )
    assert miss.count() == 0


def test_empty_expected_operation_is_false(spark, obj_rows):
    pol = [Policy(name="p", table="objects", roles=("authenticated",),
                  permissions=("select",), using="allow_only_operation('')")]
    out = apply_policies(
        obj_rows, pol,
        Claims(sub="u1", role="authenticated", operation="x"),
        "objects", "select",
    )
    assert out.count() == 0  # 0058:24-25: NULL/empty expected -> FALSE


def test_operation_in_claims_cannot_inject(spark, obj_rows):
    out = apply_policies(
        obj_rows, OP_POLICIES,
        Claims(sub="u1", role="authenticated", operation="x' OR '1'='1"),
        "objects", "probe",
    )
    assert out.count() == 0
