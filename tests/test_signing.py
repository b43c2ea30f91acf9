"""sign / sign-many: HS256 batch URL signing, verified round-trip."""

from __future__ import annotations

import pytest

from storage_spark.operators.signing import hs256_token, sign_many, verify_hs256


def test_token_roundtrip_and_tamper():
    tok = hs256_token({"url": "b/a.txt", "exp": 123}, "s3cret")
    assert verify_hs256(tok, "s3cret") == {"exp": 123, "url": "b/a.txt"}
    with pytest.raises(ValueError):
        verify_hs256(tok, "wrong")
    h, b, s = tok.split(".")
    with pytest.raises(ValueError):
        verify_hs256(f"{h}.{b}x.{s}", "s3cret")


def test_expired_token_rejected():
    """jsonwebtoken.verify rejects expired tokens; so must we — a signed
    URL is a time-limited credential, not a permanent one."""
    tok = hs256_token({"url": "b/a.txt", "exp": 1000}, "s3cret")
    assert verify_hs256(tok, "s3cret", now_s=999)["url"] == "b/a.txt"
    with pytest.raises(ValueError, match="expired"):
        verify_hs256(tok, "s3cret", now_s=1001)
    # no-exp tokens pass any clock (signature-only inspection unchanged)
    assert verify_hs256(hs256_token({"url": "x"}, "s3cret"), "s3cret", now_s=10**10)


def test_sign_many(spark):
    df = spark.createDataFrame(
        [("b1", "a.txt"), ("b1", "d/e.png"), ("b2", "x.bin")],
        "bucket_id string, name string",
    )
    out = sign_many(df, secret="k", expires_in_s=3600, issued_at_s=1_704_067_200)
    rows = out.collect()
    assert len(rows) == 3
    for r in rows:
        payload = verify_hs256(r.token, "k")
        assert payload["url"] == r.url
        assert payload["exp"] == r.expires_at_s == 1_704_070_800
    # deterministic: same inputs → same tokens
    again = {r.url: r.token for r in sign_many(
        df, secret="k", expires_in_s=3600, issued_at_s=1_704_067_200
    ).collect()}
    assert again == {r.url: r.token for r in rows}
