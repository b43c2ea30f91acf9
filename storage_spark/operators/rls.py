"""RLS as predicate injection (F8, SURVEY §1.4).

The reference attaches row-level-security policies by setting the role and
JWT claims as Postgres GUCs per transaction (src/internal/database/
pg-connection.ts:65-74); policies are plain SQL predicates over
owner/uid/role (src/test/rls_tests.yaml). The Spark equivalent is exactly
that: a function that injects ``filter`` predicates derived from the claims
before any operator runs. Semantically identical, trivially testable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Claims:
    """The subset of JWT claims the reference's policies consult."""

    sub: str | None = None
    role: str = "anon"  # anon | authenticated | service_role


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


def apply_rls_buckets(buckets: DataFrame, claims: Claims) -> DataFrame:
    if claims.role == "service_role":
        return buckets
    if claims.role == "authenticated" and claims.sub is not None:
        return buckets.filter(F.col("public") | (F.col("owner_id") == claims.sub))
    return buckets.filter(F.col("public"))
