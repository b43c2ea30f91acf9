"""WARC (Web ARChive, ISO 28500) record parsing for web-corpus ingestion.

Completes the web-ingest front door next to ``functions.htmltext``: real
pretraining pipelines (CCNet / RefinedWeb / C4 lineage) start from
Common-Crawl WARC or WET files — a crawl's raw capture — and every
operator this engine already ships (extraction, line dedup, quality,
langid, MinHash, ...) sits DOWNSTREAM of splitting those files into
records. Not part of the reference's surface (extension, SURVEY §7.10).

Dependency-free by design (public spec, stdlib only):

- A WARC file is a concatenation of records; each record is a version
  line (``WARC/1.0``/``WARC/1.1``), CRLF-separated named headers, one
  empty line, ``Content-Length`` octets of payload, and a CRLF CRLF
  record separator.
- gzip transport (``.warc.gz`` — one gzip MEMBER per record, the Common
  Crawl layout) is handled by stdlib ``gzip.decompress``, which
  concatenates all members — exactly the uncompressed stream.
- ``response`` records carry an HTTP message as payload
  (``Content-Type: application/http``); ``http_split`` separates the
  status line + headers from the entity body. WET (``conversion``
  records) carry extracted text directly.
- Parsing is forward-only and bounded: a malformed record (bad version
  line, unparsable/missing Content-Length, truncated payload) stops the
  walk — everything already parsed is kept, nothing raises. A tail-
  truncated fetch therefore degrades to its parsable prefix, the right
  behavior for byte-range reads of huge crawl files.

100 TB story: record splitting is embarrassingly parallel over FILES —
one Arrow map-only stage (the codec stage shape, multimodal.py:149), no
shuffle, memory bounded by one file per batch row. At crawl scale the
unit of work IS the .warc.gz file (Common Crawl ships ~1 GB segments),
so files-as-rows partitioning is the natural layout; downstream stages
consume the exploded record frame exactly like every other per-doc
operator here.
"""

from __future__ import annotations

import gzip
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


def parse_warc_records(data: bytes) -> list[dict]:
    """Pure-Python core: split a WARC byte stream into records.

    Returns dicts with ``offset`` (byte offset of the record's version
    line in the UNCOMPRESSED stream), ``warc_type``, ``record_id``,
    ``target_uri``, ``warc_date``, ``content_type``, ``content_length``
    and ``payload`` (bytes). Unknown/absent headers are None. Gzip input
    (magic ``1f 8b``) is decompressed first; empty/None input yields [].
    """
    if not data:
        return []
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except OSError:
            return []
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(_CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            break  # not a record boundary: stop, keep what we have
        offset = pos
        cur = eol + 2
        headers: dict[str, str] = {}
        ok = True
        while True:
            eol = data.find(_CRLF, cur)
            if eol < 0:
                ok = False
                break
            line = data[cur:eol]
            cur = eol + 2
            if not line:
                break  # end of header block
            name, sep, value = line.partition(b":")
            if not sep:
                ok = False
                break
            headers[name.strip().lower().decode("latin-1")] = (
                value.strip().decode("latin-1")
            )
        if not ok:
            break
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            break
        if length < 0 or cur + length > n:
            break  # truncated payload
        out.append(
            {
                "offset": offset,
                "warc_type": headers.get("warc-type"),
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "content_length": length,
                "payload": data[cur : cur + length],
            }
        )
        pos = cur + length
    return out


def http_split(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an ``application/http`` payload into (status_code,
    content_type, body). Returns (None, None, payload) when the payload
    does not start with an HTTP status line — callers get the raw bytes
    back rather than an error (WET conversion records, direct
    resources)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        return None, None, payload
    head_lines = payload[:head_end].split(_CRLF)
    parts = head_lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for line in head_lines[1:]:
        name, sep, value = line.partition(b":")
        if sep and name.strip().lower() == b"content-type":
            ctype = value.strip().decode("latin-1")
            break
    return status, ctype, payload[head_end + 4 :]


#: Output fields appended by the record-splitting stage.
RECORD_FIELDS = [
    T.StructField("rec_no", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("payload", T.BinaryType()),
]


def extract_warc_records(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Explode WARC files into records: input columns (minus the file
    bytes) + ``rec_no`` (1-based within the file), ``offset``,
    ``warc_type``, ``record_id``, ``target_uri``, ``warc_date``,
    ``content_type``, ``content_length``, ``payload``. Arrow-batched
    mapInPandas; files with no parsable records emit no rows."""
    keep = [f for f in df.schema.fields if f.name != content_col]
    out_schema = T.StructType(keep + RECORD_FIELDS)
    keep_names = [f.name for f in keep]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                blob = r[content_col]
                recs = parse_warc_records(
                    bytes(blob) if blob is not None else b""
                )
                for i, rec in enumerate(recs):
                    row = {k: r[k] for k in keep_names}
                    row.update(rec)
                    row["rec_no"] = i + 1
                    rows.append(row)
            yield pd.DataFrame(
                rows, columns=keep_names + [f.name for f in RECORD_FIELDS]
            )

    return df.mapInPandas(_batches, out_schema)


def wet_export(
    df: DataFrame,
    shard_col: str = "shard",
    uri_col: str = "uri",
    text_col: str = "text",
    date: str = "2024-01-01T00:00:00Z",
) -> DataFrame:
    """The inverse direction: documents → WET segment files (one row per
    shard: ``shard``, ``content`` bytes, ``n_records``), each a valid
    concatenation of WARC ``conversion`` records — the interchange format
    the extraction half of a crawl pipeline EMITS (Common Crawl's WET
    layout). ``parse_warc_records(content)`` round-trips exactly (tested).

    All JVM-side expressions — record framing is string concat +
    ``octet_length``, and per-shard assembly is one groupBy with a
    sort_array over (uri, record) structs, so output bytes are
    DETERMINISTIC (shard content is ordered by uri, independent of
    partitioning). Record IDs are md5(uri) urns. Transport gzip is a
    sink concern (write the bytes through a gzip sink if needed — the
    parser accepts both).

    100 TB story: one shuffle on the shard key sizes segments
    explicitly (shard assignment is the caller's partitioning lever);
    record building itself is map-only."""
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        F.col(uri_col),
        F.lit(f"\r\nWARC-Date: {date}\r\nWARC-Record-ID: <urn:uuid:"),
        F.md5(F.encode(F.col(uri_col), "UTF-8")),
        F.lit(">\r\nContent-Length: "),
        F.octet_length(F.col(text_col)).cast("string"),
        F.lit("\r\n\r\n"),
        F.col(text_col),
        F.lit("\r\n\r\n"),
    )
    per = df.select(
        F.col(shard_col).alias("shard"),
        F.col(uri_col).alias("_u"),
        rec.alias("_r"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("_u", "_r"))),
        lambda s: s["_r"],
    )
    return per.groupBy("shard").agg(
        F.encode(F.array_join(ordered, ""), "UTF-8").alias("content"),
        F.count(F.lit(1)).cast("long").alias("n_records"),
    )


def warc_http_documents(
    df: DataFrame,
    content_col: str = "content",
    min_status: int = 200,
    max_status: int = 299,
) -> DataFrame:
    """The crawl → documents bridge: WARC files → one row per successful
    HTTP ``response`` record, with ``http_status``, ``http_content_type``
    and the entity ``body`` split out of the payload. Chain
    ``functions.htmltext.explode_html_lines`` on the decoded body for the
    full WARC → text front door (tested end-to-end in test_warc)."""
    recs = extract_warc_records(df, content_col)
    split_schema = T.StructType(
        [f for f in recs.schema.fields if f.name != "payload"]
        + [
            T.StructField("http_status", T.IntegerType()),
            T.StructField("http_content_type", T.StringType()),
            T.StructField("body", T.BinaryType()),
        ]
    )
    pass_names = [f.name for f in recs.schema.fields if f.name != "payload"]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                status, ctype, body = http_split(bytes(r["payload"]))
                row = {k: r[k] for k in pass_names}
                row.update(
                    http_status=status, http_content_type=ctype, body=body
                )
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=pass_names
                + ["http_status", "http_content_type", "body"],
            )

    return (
        recs.filter(F.col("warc_type") == "response")
        .mapInPandas(_batches, split_schema)
        .filter(
            F.col("http_status").isNotNull()
            & F.col("http_status").between(min_status, max_status)
        )
    )
