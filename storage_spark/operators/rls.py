"""RLS as predicate injection (F8, SURVEY §1.4).

The reference attaches row-level-security policies by setting the role and
JWT claims as Postgres GUCs per transaction (src/internal/database/
pg-connection.ts:65-74); policies are plain SQL predicates over
owner/uid/role (src/test/rls_tests.yaml). The Spark equivalent is exactly
that: a function that injects ``filter`` predicates derived from the claims
before any operator runs. Semantically identical, trivially testable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Claims:
    """The subset of per-request context the reference's policies consult:
    JWT claims plus the transaction-local ``storage.operation`` GUC the API
    sets on every request (src/internal/database/pg-connection.ts:65-74,
    ``set_config('storage.operation', $9, true)``; read back by
    storage.operation(), 0024-operation-function.sql:1-6)."""

    sub: str | None = None
    role: str = "anon"  # anon | authenticated | service_role
    operation: str | None = None  # e.g. 'storage.object.delete'


def apply_rls_objects(
    objects: DataFrame, buckets: DataFrame, claims: Claims
) -> DataFrame:
    """Standard policy set over objects (mirrors rls_tests.yaml): the
    service role bypasses RLS; authenticated users see rows they own or
    rows in public buckets; anonymous sees only public buckets."""
    if claims.role == "service_role":
        return objects
    df = objects.join(
        F.broadcast(buckets.select(F.col("id").alias("bucket_id"), "public")),
        "bucket_id",
    )
    if claims.role == "authenticated" and claims.sub is not None:
        pred = F.col("public") | (F.col("owner_id") == claims.sub)
    else:
        pred = F.col("public")
    return df.filter(pred).drop("public")


@dataclass(frozen=True)
class Policy:
    """A declarative RLS policy — the shape of the reference's corpus
    (src/test/rls_tests.yaml: name/tables/roles/permissions + USING /
    WITH CHECK predicate templates with ``{{uid}}`` substitution).
    Predicates are Spark SQL expressions in this engine's dialect."""

    name: str
    table: str
    roles: tuple[str, ...]
    permissions: tuple[str, ...]
    using: str | None = None
    check: str | None = None


def _sql_quote(v: str) -> str:
    """Escape a claim value for inclusion inside a single-quoted Spark SQL
    literal. The reference never splices claims into SQL — it binds them as
    parameterized GUCs (src/internal/database/pg-connection.ts:65-74); this
    is the engine-side equivalent of that binding. Without it a crafted
    ``sub`` like ``x' OR '1'='1`` would rewrite the policy predicate and
    turn default-deny into allow-all."""
    return v.replace("\\", "\\\\").replace("'", "''")


def _normalize_operation(op: str | None) -> str | None:
    """0058-operation-ergonomics.sql:13-22: a leading ``storage.`` prefix is
    stripped from BOTH sides before comparison, so policies may name the
    operation either way ('storage.object.delete' ≡ 'object.delete')."""
    if op is not None and op.startswith("storage."):
        return op[len("storage."):]
    return op


def allow_only_operation(expected: str | None, claims: Claims) -> bool:
    """Port of storage.allow_only_operation (0058:4-29): FALSE for a
    NULL/empty expected operation; otherwise prefix-normalized equality with
    the current operation, NULL-safe (no current operation → FALSE)."""
    if not expected:
        return False
    cur = _normalize_operation(claims.operation)
    return cur is not None and cur == _normalize_operation(expected)


def allow_any_operation(expected: list[str | None], claims: Claims) -> bool:
    """Port of storage.allow_any_operation (0058:31-57): TRUE iff the
    current operation prefix-normalizes equal to ANY non-empty entry."""
    return any(allow_only_operation(e, claims) for e in expected)


_ONLY_OP_RE = re.compile(r"allow_only_operation\(\s*'([^']*)'\s*\)")
_ANY_OP_RE = re.compile(r"allow_any_operation\(\s*((?:'[^']*'\s*,\s*)*'[^']*')\s*\)")


def _compile(template: str, claims: Claims):
    """Bind per-request context into a policy predicate. Like the reference,
    the operation is constant for the whole request (a transaction-local
    GUC), so ``storage.operation()`` and the 0058 helpers fold to literals
    at compile time — Catalyst would constant-fold them anyway; folding here
    keeps the residual predicate sargable."""
    uid = _sql_quote(claims.sub or "")
    sql = template.replace("{{uid}}", uid).replace("auth.uid()", f"'{uid}'")
    if "operation" in sql:
        sql = _ONLY_OP_RE.sub(
            lambda m: "TRUE" if allow_only_operation(m.group(1), claims) else "FALSE",
            sql,
        )

        def _any(m) -> str:
            ops = re.findall(r"'([^']*)'", m.group(1))
            return "TRUE" if allow_any_operation(list(ops), claims) else "FALSE"

        sql = _ANY_OP_RE.sub(_any, sql)
        op_lit = (
            "'" + _sql_quote(claims.operation) + "'"
            if claims.operation is not None
            else "CAST(NULL AS STRING)"
        )
        # storage.operation() returns the RAW GUC (0024:1-6), unnormalized
        sql = sql.replace("storage.operation()", op_lit)
    return F.expr(sql)


def apply_policies(
    df: DataFrame,
    policies: list[Policy],
    claims: Claims,
    table: str,
    permission: str = "select",
) -> DataFrame:
    """Postgres RLS read semantics: service role bypasses; otherwise a row
    is visible iff ANY applicable policy's USING predicate passes; with no
    applicable policy everything is filtered (default-deny)."""
    if claims.role == "service_role":
        return df
    preds = [
        _compile(p.using, claims)
        for p in policies
        if p.table == table
        and claims.role in p.roles
        and permission in p.permissions
        and p.using
    ]
    if not preds:
        return df.filter(F.lit(False))
    cond = preds[0]
    for p in preds[1:]:
        cond = cond | p
    return df.filter(cond)


def check_policies(
    rows: DataFrame,
    policies: list[Policy],
    claims: Claims,
    table: str,
    permission: str = "insert",
) -> tuple[DataFrame, DataFrame]:
    """WITH CHECK write-side validation: returns (allowed, rejected) — the
    batch analogue of per-row policy violations on INSERT/UPDATE."""
    if claims.role == "service_role":
        return rows, rows.filter(F.lit(False))
    preds = [
        _compile(p.check, claims)
        for p in policies
        if p.table == table
        and claims.role in p.roles
        and permission in p.permissions
        and p.check
    ]
    if not preds:
        return rows.filter(F.lit(False)), rows
    cond = preds[0]
    for p in preds[1:]:
        cond = cond | p
    return rows.filter(cond), rows.filter(~F.coalesce(cond, F.lit(False)))


def apply_rls_buckets(buckets: DataFrame, claims: Claims) -> DataFrame:
    if claims.role == "service_role":
        return buckets
    if claims.role == "authenticated" and claims.sub is not None:
        return buckets.filter(F.col("public") | (F.col("owner_id") == claims.sub))
    return buckets.filter(F.col("public"))
