"""SigV4 streaming-payload (aws-chunked) decode + verification — T9/T8.

Reference: ChunkSignatureV4Parser
(src/storage/protocols/s3/signature-v4-stream.ts:258-420) parses
``<size-hex>;chunk-signature=<64hex>\\r\\n<payload>\\r\\n`` framing in
HEADER/DATA/FOOTER/TRAILER phases; SignatureV4 (signature-v4.ts) verifies
each chunk signature against the rolling string-to-sign chain. Spec:
https://docs.aws.amazon.com/AmazonS3/latest/API/sigv4-streaming.html

Engine form: the reference decodes a live request stream; a batch engine
decodes STORED aws-chunked payloads (e.g. raw capture buckets) — one pure
parser over bytes, plus an Arrow-batched ``mapInPandas`` stage for a
binary column. Signature verification is the same HMAC chain, computable
because every input (seed signature, scope, timestamp) is a column/value,
not connection state.
"""

from __future__ import annotations

import hashlib
import hmac
import re
from dataclasses import dataclass, field

_CRLF = b"\r\n"
_MAX_HEADER = 128
_SIG_RE = re.compile(rb"^[0-9a-fA-F]{64}$")
DEFAULT_MAX_CHUNK = 8 * 1024 * 1024  # signature-v4-stream.ts default

ALGORITHMS = (
    "STREAMING-UNSIGNED-PAYLOAD-TRAILER",
    "STREAMING-AWS4-HMAC-SHA256-PAYLOAD",
    "STREAMING-AWS4-HMAC-SHA256-PAYLOAD-TRAILER",
)


class InvalidChunkError(Exception):
    """Malformed aws-chunked framing (ERRORS.InvalidRequest shapes in the
    reference parser: bad header, bad signature format, missing final
    chunk, oversized chunk)."""


class ChunkSignatureMismatchError(Exception):
    """A chunk's signature does not match the rolling HMAC chain."""


@dataclass
class DecodedChunked:
    data: bytes
    chunk_sizes: list = field(default_factory=list)
    chunk_signatures: list = field(default_factory=list)  # None when unsigned
    trailers: dict = field(default_factory=dict)


def parse_chunked(
    payload: bytes,
    algorithm: str = "STREAMING-AWS4-HMAC-SHA256-PAYLOAD",
    max_chunk_size: int = DEFAULT_MAX_CHUNK,
) -> DecodedChunked:
    """Decode a complete aws-chunked payload: returns the concatenated data
    plus per-chunk sizes/signatures and any trailer headers. Raises
    InvalidChunkError exactly where the streaming parser errors (incomplete
    header, missing final chunk, signature format, size cap)."""
    if algorithm not in ALGORITHMS:
        raise InvalidChunkError(f"unknown streaming algorithm: {algorithm}")
    signed = algorithm != "STREAMING-UNSIGNED-PAYLOAD-TRAILER"
    has_trailer = algorithm.endswith("-TRAILER")
    out = DecodedChunked(data=b"")
    buf = memoryview(payload)
    pos = 0
    parts: list[bytes] = []
    saw_final = False
    while True:
        nl = payload.find(_CRLF, pos, pos + _MAX_HEADER + 2)
        if nl < 0:
            if pos >= len(payload):
                if saw_final and not has_trailer:
                    break
                raise InvalidChunkError("Missing final chunk")
            raise InvalidChunkError("incomplete or oversized chunk header")
        header = bytes(buf[pos:nl])
        pos = nl + 2
        if saw_final or (has_trailer and b":" in header and b";" not in header):
            # trailer section: "name:value" lines until the blank line
            if not header:
                break
            name, _, value = header.partition(b":")
            out.trailers[name.decode().strip().lower()] = value.decode().strip()
            continue
        size_part, _, sig_part = header.partition(b";")
        try:
            size = int(size_part, 16)
        except ValueError as e:
            raise InvalidChunkError(f"bad chunk size: {size_part!r}") from e
        if size > max_chunk_size:
            raise InvalidChunkError(f"Chunk size exceeds {max_chunk_size}")
        if signed:
            if not sig_part.startswith(b"chunk-signature="):
                raise InvalidChunkError("missing chunk-signature")
            sig = sig_part[len(b"chunk-signature="):]
            if not _SIG_RE.match(sig):
                raise InvalidChunkError(f"bad signature format: {sig!r}")
            out.chunk_signatures.append(sig.decode().lower())
        else:
            if sig_part:
                raise InvalidChunkError("unexpected chunk extension")
            out.chunk_signatures.append(None)
        out.chunk_sizes.append(size)
        if len(payload) < pos + size:
            raise InvalidChunkError("truncated chunk payload")
        parts.append(bytes(buf[pos : pos + size]))
        pos += size
        if size == 0:
            saw_final = True
            if not has_trailer:
                # footer CRLF after the final 0-size chunk is optional in
                # captures; consume if present
                if payload[pos : pos + 2] == _CRLF:
                    pos += 2
                if pos != len(payload):
                    raise InvalidChunkError("data after final chunk")
                break
            continue
        if payload[pos : pos + 2] != _CRLF:
            raise InvalidChunkError("missing chunk footer CRLF")
        pos += 2
    if not saw_final:
        raise InvalidChunkError("Missing final chunk")
    if pos != len(payload):
        raise InvalidChunkError("data after trailer section")
    out.data = b"".join(parts)
    return out


# ----------------------------------------------------------------------
# Signature chain (public SigV4 streaming spec)
# ----------------------------------------------------------------------


def derive_signing_key(secret: str, date: str, region: str, service: str = "s3") -> bytes:
    """AWS4 key derivation: HMAC chain over date/region/service."""
    k = hmac.new(f"AWS4{secret}".encode(), date.encode(), hashlib.sha256).digest()
    k = hmac.new(k, region.encode(), hashlib.sha256).digest()
    k = hmac.new(k, service.encode(), hashlib.sha256).digest()
    return hmac.new(k, b"aws4_request", hashlib.sha256).digest()


def chunk_string_to_sign(
    timestamp: str, scope: str, previous_signature: str, chunk: bytes
) -> str:
    """Per-chunk string-to-sign (sigv4-streaming spec §Defining the chunk
    string to sign)."""
    empty_hash = hashlib.sha256(b"").hexdigest()
    return "\n".join(
        [
            "AWS4-HMAC-SHA256-PAYLOAD",
            timestamp,
            scope,
            previous_signature,
            empty_hash,
            hashlib.sha256(chunk).hexdigest(),
        ]
    )


def sign_chunk(
    signing_key: bytes, timestamp: str, scope: str,
    previous_signature: str, chunk: bytes,
) -> str:
    return hmac.new(
        signing_key,
        chunk_string_to_sign(timestamp, scope, previous_signature, chunk).encode(),
        hashlib.sha256,
    ).hexdigest()


def canonical_trailer(trailers: dict) -> str:
    """Canonical trailing-header string (sigv4-streaming-trailers spec):
    ``name:value\\n`` per trailer, excluding x-amz-trailer-signature."""
    return "".join(
        f"{k}:{v}\n" for k, v in trailers.items() if k != "x-amz-trailer-signature"
    )


def sign_trailer(
    signing_key: bytes, timestamp: str, scope: str,
    previous_signature: str, trailers: dict,
) -> str:
    """Trailer string-to-sign uses the AWS4-HMAC-SHA256-TRAILER label and
    the sha256 of the canonical trailing headers, chained onto the final
    chunk signature."""
    sts = "\n".join(
        [
            "AWS4-HMAC-SHA256-TRAILER",
            timestamp,
            scope,
            previous_signature,
            hashlib.sha256(canonical_trailer(trailers).encode()).hexdigest(),
        ]
    )
    return hmac.new(signing_key, sts.encode(), hashlib.sha256).hexdigest()


def encode_chunked(
    data: bytes,
    chunk_size: int,
    seed_signature: str | None = None,
    signing_key: bytes | None = None,
    timestamp: str = "",
    scope: str = "",
    trailers: dict | None = None,
) -> bytes:
    """Inverse of parse_chunked (test fixture / writer): split ``data``
    into signed (or unsigned) aws-chunked framing ending in the 0-chunk.
    With ``trailers``, emits the trailer section after the final chunk
    (signed mode appends a chained x-amz-trailer-signature)."""
    chunks = [
        data[i : i + chunk_size] for i in range(0, len(data), chunk_size)
    ] + [b""]
    out = bytearray()
    prev = seed_signature
    for c in chunks:
        if signing_key is not None and prev is not None:
            sig = sign_chunk(signing_key, timestamp, scope, prev, c)
            out += f"{len(c):x};chunk-signature={sig}".encode() + _CRLF
            prev = sig
        else:
            out += f"{len(c):x}".encode() + _CRLF
        if c or trailers is None:
            out += c + _CRLF
    if trailers is not None:
        tr = dict(trailers)
        if signing_key is not None and prev is not None:
            tr["x-amz-trailer-signature"] = sign_trailer(
                signing_key, timestamp, scope, prev, trailers
            )
        for k, v in tr.items():
            out += f"{k}:{v}".encode() + _CRLF
        out += _CRLF
    return bytes(out)


def verify_chunked(
    payload: bytes,
    seed_signature: str,
    signing_key: bytes,
    timestamp: str,
    scope: str,
    algorithm: str = "STREAMING-AWS4-HMAC-SHA256-PAYLOAD",
) -> DecodedChunked:
    """Decode AND verify the rolling signature chain: chunk N's signature
    signs (previous signature, sha256(chunk N)) — any byte flip or
    signature swap breaks the chain at that link. For the ``-TRAILER``
    signed algorithm the chain extends one more link: the
    ``x-amz-trailer-signature`` trailer must equal the
    AWS4-HMAC-SHA256-TRAILER string-to-sign over the canonical trailing
    headers, chained onto the final chunk signature — so a tampered
    trailer (e.g. a flipped checksum) fails exactly like a tampered
    chunk."""
    decoded = parse_chunked(payload, algorithm)
    prev = seed_signature
    for size, sig, chunk in zip(
        decoded.chunk_sizes,
        decoded.chunk_signatures,
        _resplit(decoded.data, decoded.chunk_sizes),
    ):
        expect = sign_chunk(signing_key, timestamp, scope, prev, chunk)
        if sig != expect:
            raise ChunkSignatureMismatchError(
                f"chunk of size {size}: signature mismatch"
            )
        prev = sig
    if algorithm == "STREAMING-AWS4-HMAC-SHA256-PAYLOAD-TRAILER":
        got = decoded.trailers.get("x-amz-trailer-signature")
        if got is None:
            raise ChunkSignatureMismatchError("missing x-amz-trailer-signature")
        expect = sign_trailer(
            signing_key, timestamp, scope, prev, decoded.trailers
        )
        if got.lower() != expect:
            raise ChunkSignatureMismatchError("trailer signature mismatch")
    return decoded


def _resplit(data: bytes, sizes: list) -> list:
    out, pos = [], 0
    for s in sizes:
        out.append(data[pos : pos + s])
        pos += s
    return out


def decode_chunked_blobs(blobs, content_col: str = "content"):
    """Bulk form: strip aws-chunked framing from a binary column —
    Arrow-batched mapInPandas (same stage shape as the multimodal decode),
    emitting decoded content + chunk count per blob."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("n_chunks", T.IntegerType()),
        ]
    )

    def _batches(it):
        for pdf in it:
            decoded = [parse_chunked(bytes(b)) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "content": [d.data for d in decoded],
                    "n_chunks": [len(d.chunk_sizes) for d in decoded],
                }
            )

    return blobs.mapInPandas(_batches, schema)
