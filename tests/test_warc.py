"""WARC record parsing (functions/warc.py): pure-Python core against
hand-built WARC byte streams (uncompressed + per-record gzip members, the
Common Crawl layout), graceful-degradation rules on malformed/truncated
input, the HTTP payload split, the Arrow record-splitting stage, and the
WARC → response body → htmltext front-door composition."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from storage_spark.functions.warc import (
    extract_warc_records,
    http_split,
    parse_warc_records,
    warc_http_documents,
)


def _rec(rtype: str, payload: bytes, uri: str | None = None,
         rid: str = "<urn:uuid:1>", version: str = "WARC/1.0") -> bytes:
    lines = [version.encode(), b"WARC-Type: " + rtype.encode()]
    if uri is not None:
        lines.append(b"WARC-Target-URI: " + uri.encode())
    lines.append(b"WARC-Record-ID: " + rid.encode())
    lines.append(b"WARC-Date: 2024-01-01T00:00:00Z")
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200,
          ctype: bytes = b"text/html") -> bytes:
    return (
        b"HTTP/1.1 " + str(status).encode() + b" OK\r\n"
        b"Content-Type: " + ctype + b"\r\n"
        b"Server: x\r\n\r\n" + body
    )


def test_parse_multi_record_stream():
    stream = (
        _rec("warcinfo", b"software: test")
        + _rec("response", _http(b"<p>hi</p>"), uri="http://a/x")
        + _rec("conversion", b"plain text", uri="http://a/x")
    )
    recs = parse_warc_records(stream)
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "conversion",
    ]
    assert recs[0]["offset"] == 0
    assert recs[1]["target_uri"] == "http://a/x"
    assert recs[1]["payload"] == _http(b"<p>hi</p>")
    assert recs[1]["content_length"] == len(_http(b"<p>hi</p>"))
    assert recs[2]["payload"] == b"plain text"
    assert recs[2]["record_id"] == "<urn:uuid:1>"
    assert recs[2]["warc_date"] == "2024-01-01T00:00:00Z"
    # offsets point at each record's version line in the stream
    for r in recs:
        assert stream[r["offset"] : r["offset"] + 5] == b"WARC/"


def test_gzip_per_record_members_and_whole_stream():
    a, b = _rec("warcinfo", b"x"), _rec("conversion", b"body", uri="u")
    # Common Crawl layout: one gzip member per record, concatenated
    members = gzip.compress(a) + gzip.compress(b)
    assert [r["warc_type"] for r in parse_warc_records(members)] == [
        "warcinfo", "conversion",
    ]
    # whole-stream gzip parses identically
    assert [r["warc_type"] for r in parse_warc_records(gzip.compress(a + b))
            ] == ["warcinfo", "conversion"]
    assert parse_warc_records(b"\x1f\x8bnot really gzip") == []


def test_warc_11_version_accepted():
    recs = parse_warc_records(_rec("response", b"p", version="WARC/1.1"))
    assert len(recs) == 1 and recs[0]["payload"] == b"p"


def test_truncation_and_malformed_keep_prefix():
    good = _rec("response", _http(b"ok"), uri="u")
    # truncated second record: payload cut short
    trunc = good + _rec("response", b"0123456789")[:-8]
    recs = parse_warc_records(trunc)
    assert len(recs) == 1 and recs[0]["target_uri"] == "u"
    # garbage between records stops the walk (not a boundary)
    assert len(parse_warc_records(good + b"not a warc" + good)) == 1
    # missing Content-Length stops cleanly
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\npayload"
    assert len(parse_warc_records(good + bad)) == 1
    # header line without a colon stops cleanly
    noc = b"WARC/1.0\r\nbroken header line\r\n\r\n"
    assert len(parse_warc_records(good + noc)) == 1
    assert parse_warc_records(b"") == []
    assert parse_warc_records(None) == []


def test_http_split():
    status, ctype, body = http_split(_http(b"<p>x</p>", 404))
    assert (status, ctype, body) == (404, "text/html", b"<p>x</p>")
    # non-HTTP payload passes through untouched (WET conversion records)
    assert http_split(b"plain") == (None, None, b"plain")
    # headless / malformed status line
    assert http_split(b"HTTP/1.1 nope\r\n\r\nx") == (
        None, None, b"HTTP/1.1 nope\r\n\r\nx"
    )
    assert http_split(b"HTTP/1.1 200 OK\r\nno terminator") == (
        None, None, b"HTTP/1.1 200 OK\r\nno terminator"
    )


def test_extract_stage_explodes_and_passes_through(spark):
    f1 = _rec("warcinfo", b"i") + _rec(
        "response", _http(b"<p>a</p>"), uri="http://a/"
    )
    f2 = _rec("conversion", b"wet text", uri="http://b/")
    df = spark.createDataFrame(
        [("f1", "s1", bytearray(f1)), ("f2", "s2", bytearray(f2)),
         ("f3", "s3", bytearray(b"junk"))],
        "key string, shard string, content binary",
    )
    got = extract_warc_records(df).collect()
    assert [(r.key, r.rec_no, r.warc_type) for r in got] == [
        ("f1", 1, "warcinfo"), ("f1", 2, "response"), ("f2", 1, "conversion"),
    ]
    by = {(r.key, r.rec_no): r for r in got}
    assert by[("f2", 1)].shard == "s2"  # passthrough column survives
    assert bytes(by[("f2", 1)].payload) == b"wet text"
    assert by[("f1", 2)].offset == len(_rec("warcinfo", b"i"))


def test_warc_http_documents_filters_and_splits(spark):
    f = (
        _rec("response", _http(b"<p>keep</p>", 200), uri="http://ok/")
        + _rec("response", _http(b"gone", 404), uri="http://miss/")
        + _rec("request", b"GET / HTTP/1.1\r\n\r\n", uri="http://ok/")
        + _rec("conversion", b"not http", uri="http://wet/")
    )
    df = spark.createDataFrame(
        [("f", bytearray(f))], "key string, content binary"
    )
    got = warc_http_documents(df).collect()
    assert [(r.target_uri, r.http_status, bytes(r.body)) for r in got] == [
        ("http://ok/", 200, b"<p>keep</p>")
    ]
    assert got[0].http_content_type == "text/html"


def test_wet_export_round_trips_and_is_deterministic(spark):
    """documents → WET segment bytes → parse_warc_records recovers every
    doc exactly; shard content is ordered by uri regardless of input
    order; multibyte text survives via octet-length framing."""
    from storage_spark.functions.warc import wet_export

    rows = [
        ("s1", "http://a/2", "second doc"),
        ("s1", "http://a/1", "first döc ü"),  # multibyte
        ("s2", "http://b/1", ""),
    ]
    df = spark.createDataFrame(rows, "shard string, uri string, text string")
    out = {r.shard: r for r in wet_export(df).collect()}
    assert out["s1"].n_records == 2 and out["s2"].n_records == 1
    recs = parse_warc_records(bytes(out["s1"].content))
    assert [(r["warc_type"], r["target_uri"]) for r in recs] == [
        ("conversion", "http://a/1"), ("conversion", "http://a/2"),
    ]
    assert recs[0]["payload"].decode("utf-8") == "first döc ü"
    assert recs[0]["content_length"] == len("first döc ü".encode())
    assert recs[1]["payload"] == b"second doc"
    [empty] = parse_warc_records(bytes(out["s2"].content))
    assert empty["payload"] == b"" and empty["content_length"] == 0
    # deterministic under reversed input order
    again = wet_export(
        spark.createDataFrame(rows[::-1], "shard string, uri string, text string")
    ).collect()
    assert {r.shard: bytes(r.content) for r in again} == {
        k: bytes(v.content) for k, v in out.items()
    }


def test_warc_records_staged_driver_pair_hash_matches(spark, sf_dir):
    """The staged-for-r13 driver pair (q_warc_records /
    _oracle_warc_records) must pass the IDENTICAL gate the driver runs —
    generation-rule replay over the documents table — so registering it
    is a two-line diff when a window slot opens."""
    import __spark_entry__ as entry_mod
    from tests.parity import assert_parity

    assert_parity(
        entry_mod.q_warc_records(spark, sf_dir),
        entry_mod._oracle_warc_records(),
        sf_dir,
        "warc_records_staged",
    )


def test_wet_export_staged_driver_pair_hash_matches(spark, sf_dir):
    """The staged-for-r13 driver pair (q_wet_export / _oracle_wet_export)
    must pass the IDENTICAL gate the driver runs."""
    import __spark_entry__ as entry_mod
    from tests.parity import assert_parity

    assert_parity(
        entry_mod.q_wet_export(spark, sf_dir),
        entry_mod._oracle_wet_export(),
        sf_dir,
        "wet_export_staged",
    )


def test_front_door_stages_are_shuffle_free(spark):
    """The crawl front door must stay embarrassingly parallel: WARC
    record explosion, the HTTP split, and HTML line explosion are Arrow
    map-only stages — no Exchange anywhere in the composed plan (the
    100 TB property: cost scales with files scanned, never shuffled).
    wet_export's single shard-key Exchange is the one the caller ASKS
    for (segment sizing)."""
    import contextlib
    import io

    from storage_spark.functions.htmltext import explode_html_lines
    from storage_spark.functions.warc import wet_export

    def plan_of(df):
        # "simple" mode: one line per physical operator (formatted mode
        # prints each node twice — tree + detail section)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        return buf.getvalue()

    df = spark.createDataFrame(
        [("f", bytearray(_rec("response", _http(b"<p>x</p>"), uri="u")))],
        "key string, content binary",
    )
    docs = warc_http_documents(df).select(
        "key", F.decode(F.col("body"), "UTF-8").alias("html")
    )
    plan = plan_of(explode_html_lines(docs, "html"))
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 3  # records, http split, extract

    wet_plan = plan_of(
        wet_export(
            spark.createDataFrame(
                [("s", "u", "t")], "shard string, uri string, text string"
            )
        )
    )
    assert wet_plan.count("Exchange") == 1  # only the shard groupBy


def test_warc_to_html_lines_front_door(spark):
    """The full crawl front door: WARC bytes → successful response body →
    decoded HTML → block lines, all one composed plan."""
    from storage_spark.functions.htmltext import explode_html_lines

    html = b"<html><body><p>Hello crawl</p><div>Second block</div></body></html>"
    f = _rec("response", _http(html), uri="http://site/page")
    df = spark.createDataFrame(
        [("f", bytearray(f))], "key string, content binary"
    )
    docs = warc_http_documents(df).select(
        "key", "target_uri",
        F.decode(F.col("body"), "UTF-8").alias("html"),
    )
    lines = explode_html_lines(docs, "html").collect()
    assert [(r.line_no, r.line) for r in lines] == [
        (1, "Hello crawl"), (2, "Second block"),
    ]
    assert lines[0].target_uri == "http://site/page"
