"""Signed-URL generation (route surface: object sign / sign-many).

The reference signs per-request JWTs with the tenant's urlSigningKey
(HS256 via jsonwebtoken; payload carries the object url + exp). The batch
analogue is sign-many over a DataFrame of keys: an Arrow-batched pandas UDF
computes HS256 JWTs with the standard library only (hmac/hashlib/base64) —
vectorized per batch, secret closed over (never a column, never shuffled).

This is the one deliberate Python-path operator besides the media stubs:
HMAC has no Column-expression form, and signing output is row-bounded
(page-sized in practice), so the Arrow batch overhead dominates nothing.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).decode().rstrip("=")


def hs256_token(payload: dict, secret: str) -> str:
    """Compact JWT (HS256) — standard-library implementation."""
    header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"}, separators=(",", ":")).encode())
    body = _b64url(json.dumps(payload, separators=(",", ":"), sort_keys=True).encode())
    signing_input = f"{header}.{body}".encode()
    sig = _b64url(hmac.new(secret.encode(), signing_input, hashlib.sha256).digest())
    return f"{header}.{body}.{sig}"


def verify_hs256(token: str, secret: str, now_s: int | None = None) -> dict:
    """Verify HMAC AND expiry: jsonwebtoken.verify rejects expired tokens,
    so a missing exp check would accept any stale signed URL forever.
    ``now_s`` is an explicit input (deterministic/replayable); None skips
    the expiry check for signature-only inspection."""
    header, body, sig = token.split(".")
    signing_input = f"{header}.{body}".encode()
    expect = _b64url(hmac.new(secret.encode(), signing_input, hashlib.sha256).digest())
    if not hmac.compare_digest(sig, expect):
        raise ValueError("invalid signature")
    pad = "=" * (-len(body) % 4)
    payload = json.loads(base64.urlsafe_b64decode(body + pad))
    if now_s is not None and "exp" in payload and payload["exp"] < now_s:
        raise ValueError("token expired")
    return payload


def sign_many(
    objects: DataFrame,
    secret: str,
    expires_in_s: int,
    issued_at_s: int,
    bucket_col: str = "bucket_id",
    name_col: str = "name",
) -> DataFrame:
    """Batch signed-URL issue: one row in → (url, token) out. ``issued_at_s``
    is an explicit input (deterministic, replayable) rather than wall-clock."""
    exp = issued_at_s + expires_in_s

    @F.pandas_udf("string")
    def _sign(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: hs256_token({"url": u, "exp": exp}, secret))

    url = F.concat_ws("/", F.col(bucket_col), F.col(name_col))
    return objects.select(
        url.alias("url"), _sign(url).alias("token"),
        F.lit(exp).alias("expires_at_s"),
    )
