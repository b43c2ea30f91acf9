"""aws-chunked (SigV4 streaming) decode + signature-chain verification
(T8: signature-v4-stream.ts parser semantics, public sigv4-streaming spec)."""

from __future__ import annotations

import pytest

from storage_spark.functions.sigv4 import (
    ChunkSignatureMismatchError,
    InvalidChunkError,
    decode_chunked_blobs,
    derive_signing_key,
    encode_chunked,
    parse_chunked,
    sign_chunk,
    verify_chunked,
)

KEY = derive_signing_key("secret", "20260813", "us-east-1")
TS = "20260813T000000Z"
SCOPE = "20260813/us-east-1/s3/aws4_request"
SEED = "a" * 64


def _signed(data: bytes, chunk: int = 8) -> bytes:
    return encode_chunked(data, chunk, seed_signature=SEED, signing_key=KEY,
                          timestamp=TS, scope=SCOPE)


def test_roundtrip_signed():
    payload = _signed(b"hello aws chunked world", 8)
    out = parse_chunked(payload)
    assert out.data == b"hello aws chunked world"
    assert out.chunk_sizes == [8, 8, 7, 0]
    assert all(len(s) == 64 for s in out.chunk_signatures)


def test_verify_chain_and_tamper():
    payload = _signed(b"payload bytes for the chain", 10)
    decoded = verify_chunked(payload, SEED, KEY, TS, SCOPE)
    assert decoded.data == b"payload bytes for the chain"
    # flip one data byte: the chain breaks at that chunk
    idx = payload.index(b"payload")
    tampered = payload[:idx] + b"Xayload" + payload[idx + 7:]
    with pytest.raises(ChunkSignatureMismatchError):
        verify_chunked(tampered, SEED, KEY, TS, SCOPE)
    # wrong seed: first chunk already mismatches
    with pytest.raises(ChunkSignatureMismatchError):
        verify_chunked(payload, "b" * 64, KEY, TS, SCOPE)


def test_unsigned_trailer_variant():
    body = b"4\r\nWiki\r\n5\r\npedia\r\n0\r\nx-amz-checksum-crc32:AAAA\r\n\r\n"
    out = parse_chunked(body, algorithm="STREAMING-UNSIGNED-PAYLOAD-TRAILER")
    assert out.data == b"Wikipedia"
    assert out.trailers == {"x-amz-checksum-crc32": "AAAA"}


def test_malformed_payloads_raise():
    # a well-formed data chunk but no terminating 0-chunk
    sig0 = sign_chunk(KEY, TS, SCOPE, SEED, b"abc")
    with pytest.raises(InvalidChunkError, match="final chunk"):
        parse_chunked(f"3;chunk-signature={sig0}\r\n".encode() + b"abc\r\n")
    # truncation mid-header is the parser's other refusal
    with pytest.raises(InvalidChunkError, match="header"):
        parse_chunked(_signed(b"abc", 8)[:-7])
    with pytest.raises(InvalidChunkError, match="chunk size"):
        parse_chunked(b"zz;chunk-signature=" + b"a" * 64 + b"\r\n\r\n")
    with pytest.raises(InvalidChunkError, match="signature format"):
        parse_chunked(b"3;chunk-signature=nothex\r\nabc\r\n0;chunk-signature=" + b"a" * 64 + b"\r\n\r\n")
    with pytest.raises(InvalidChunkError, match="exceeds"):
        sig = sign_chunk(KEY, TS, SCOPE, SEED, b"abc")
        parse_chunked(
            f"3;chunk-signature={sig}\r\n".encode() + b"abc\r\n",
            max_chunk_size=2,
        )


def test_decode_chunked_blobs(spark):
    rows = [
        ("b1", _signed(b"first blob", 4)),
        ("b2", _signed(b"second", 3)),
    ]
    df = spark.createDataFrame(rows, "key string, content binary")
    got = {r.key: r for r in decode_chunked_blobs(df).collect()}
    assert bytes(got["b1"].content) == b"first blob"
    assert got["b1"].n_chunks == 4  # 4+4+2 data chunks + final
    assert bytes(got["b2"].content) == b"second"


def _signed_trailer(data: bytes, trailers: dict, chunk: int = 8) -> bytes:
    return encode_chunked(data, chunk, seed_signature=SEED, signing_key=KEY,
                          timestamp=TS, scope=SCOPE, trailers=trailers)


def test_signed_trailer_roundtrip_and_tamper():
    """The -TRAILER signed algorithm extends the HMAC chain one link: the
    x-amz-trailer-signature signs the canonical trailing headers chained
    onto the final chunk signature (AWS4-HMAC-SHA256-TRAILER label)."""
    alg = "STREAMING-AWS4-HMAC-SHA256-PAYLOAD-TRAILER"
    payload = _signed_trailer(b"trailered payload body", {"x-amz-checksum-crc32c": "wdBDMA=="})
    out = verify_chunked(payload, SEED, KEY, TS, SCOPE, algorithm=alg)
    assert out.data == b"trailered payload body"
    assert out.trailers["x-amz-checksum-crc32c"] == "wdBDMA=="
    assert "x-amz-trailer-signature" in out.trailers
    # flip one byte of the checksum trailer: the trailer link breaks
    tampered = payload.replace(b"wdBDMA==", b"XdBDMA==")
    with pytest.raises(ChunkSignatureMismatchError, match="trailer"):
        verify_chunked(tampered, SEED, KEY, TS, SCOPE, algorithm=alg)
    # strip the trailer-signature line entirely: also refused
    lines = payload.split(b"\r\n")
    stripped = b"\r\n".join(l for l in lines if not l.startswith(b"x-amz-trailer-signature"))
    with pytest.raises(ChunkSignatureMismatchError, match="missing"):
        verify_chunked(stripped, SEED, KEY, TS, SCOPE, algorithm=alg)


def test_trailing_garbage_after_trailer_section_raises():
    body = b"4\r\nWiki\r\n5\r\npedia\r\n0\r\nx-amz-checksum-crc32:AAAA\r\n\r\nGARBAGE"
    with pytest.raises(InvalidChunkError, match="after trailer"):
        parse_chunked(body, algorithm="STREAMING-UNSIGNED-PAYLOAD-TRAILER")
