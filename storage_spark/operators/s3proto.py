"""S3 ListObjects wire-shape adapters (SURVEY §3.2 steps 5-6).

The reference splits a mixed folder/leaf page into ``CommonPrefixes`` vs
``Contents`` on ``id IS NULL`` (src/storage/object.ts:679-689), truncates
with limit+1 (:691-712), and re-maps V1 markers onto the V2 cursor
(s3-handler.ts:162-195). The engine keeps listings as DataFrames; this
module shapes one page at the driver edge — pages are protocol-capped
(≤1000 keys), so this is O(page), never O(table).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from storage_spark.operators.pagination import clamp_limit, encode_token


@dataclass(frozen=True)
class ListObjectsV2Result:
    contents: list[dict] = field(default_factory=list)
    common_prefixes: list[str] = field(default_factory=list)
    is_truncated: bool = False
    next_continuation_token: str | None = None
    key_count: int = 0


def shape_list_objects_v2(listing: DataFrame, max_keys: int) -> ListObjectsV2Result:
    """limit+1 page fetch + folder/leaf split on NULL id. ``listing`` must
    already be sorted by name (the operators guarantee it)."""
    max_keys = clamp_limit(max_keys)
    rows = listing.limit(max_keys + 1).collect()
    # MaxKeys=0 is a valid S3 request: empty page, NOT truncated (there is
    # no token to continue from, so claiming truncation would deadlock a
    # paging client).
    is_truncated = len(rows) > max_keys > 0
    rows = rows[:max_keys]
    contents = [
        {
            "Key": r["name"],
            "Size": r["size"],
            "LastModified": r["updated_at_ms"],
            "ETag": r["id"],
        }
        for r in rows
        if r["id"] is not None
    ]
    prefixes = [r["name"] for r in rows if r["id"] is None]
    token = encode_token(rows[-1]["name"]) if is_truncated and rows else None
    return ListObjectsV2Result(
        contents=contents,
        common_prefixes=prefixes,
        is_truncated=is_truncated,
        next_continuation_token=token,
        key_count=len(rows),
    )


def to_list_bucket_result_xml(
    result: ListObjectsV2Result,
    bucket: str,
    prefix: str = "",
    delimiter: str = "/",
    max_keys: int = 1000,
) -> str:
    """S3 ``ListBucketResult`` XML body (the reference serializes via
    fast-xml-parser, src/http/plugins/xml.ts:1-275; same element shape)."""
    from xml.etree import ElementTree as ET

    root = ET.Element(
        "ListBucketResult", xmlns="http://s3.amazonaws.com/doc/2006-03-01/"
    )
    for tag, val in [
        ("Name", bucket),
        ("Prefix", prefix),
        ("Delimiter", delimiter),
        ("MaxKeys", str(max_keys)),
        ("KeyCount", str(result.key_count)),
        ("IsTruncated", "true" if result.is_truncated else "false"),
    ]:
        ET.SubElement(root, tag).text = val
    if result.next_continuation_token:
        ET.SubElement(root, "NextContinuationToken").text = (
            result.next_continuation_token
        )
    for c in result.contents:
        el = ET.SubElement(root, "Contents")
        ET.SubElement(el, "Key").text = c["Key"]
        if c.get("Size") is not None:
            ET.SubElement(el, "Size").text = str(c["Size"])
        if c.get("ETag") is not None:
            ET.SubElement(el, "ETag").text = str(c["ETag"])
    for p in result.common_prefixes:
        el = ET.SubElement(root, "CommonPrefixes")
        ET.SubElement(el, "Prefix").text = p
    return ET.tostring(root, encoding="unicode")


def v1_marker_to_v2(marker: str | None, prefix_of_last_page: str | None = None) -> str | None:
    """V1 ``Marker`` ≡ V2 ``StartAfter`` on the raw key (s3-handler.ts:
    162-195 re-maps tokens; the engine-side cursor is just the name)."""
    return marker or prefix_of_last_page


# ----------------------------------------------------------------------
# V1 ListObjects: the full token remap (s3-handler.ts:162-195)
# ----------------------------------------------------------------------


@dataclass(frozen=True)
class ListObjectsV1Result:
    """V1 ``ListBucketResult``: tokens are RAW keys (cursorV1 mode —
    s3-handler.ts:267-272 returns ``nextCursorKey``, not the encoded
    cursor), and ``NextMarker`` appears only when the page is truncated AND
    a delimiter was requested (:179-184)."""

    contents: list[dict] = field(default_factory=list)
    common_prefixes: list[str] = field(default_factory=list)
    is_truncated: bool = False
    marker: str | None = None
    next_marker: str | None = None
    key_count: int = 0


def shape_list_objects_v1(
    listing: DataFrame, max_keys: int, delimiter: str | None = "/"
) -> ListObjectsV1Result:
    """V1 page = the V2 page with the token remap applied: the request's
    ``Marker`` feeds the listing as ``StartAfter`` upstream (v1_marker_to_v2)
    and the response carries the raw last key instead of an opaque token."""
    from storage_spark.operators.pagination import decode_token

    v2 = shape_list_objects_v2(listing, max_keys)
    raw_next = (
        decode_token(v2.next_continuation_token)
        if v2.next_continuation_token
        else None
    )
    return ListObjectsV1Result(
        contents=v2.contents,
        common_prefixes=v2.common_prefixes,
        is_truncated=v2.is_truncated,
        marker=raw_next,
        next_marker=raw_next if (v2.is_truncated and delimiter) else None,
        key_count=v2.key_count,
    )


# ----------------------------------------------------------------------
# XML request parsing (the reference's fast-xml-parser plugin,
# src/http/plugins/xml.ts, feeds these command shapes)
# ----------------------------------------------------------------------


class MalformedXMLError(Exception):
    """S3 ``MalformedXML``: body does not parse or misses required parts."""


def _parse_xml(body: str):
    from xml.etree import ElementTree as ET

    try:
        return ET.fromstring(body)
    except ET.ParseError as e:
        raise MalformedXMLError(str(e)) from e


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_complete_multipart_upload_xml(body: str) -> list[tuple[int, str]]:
    """``CompleteMultipartUpload`` request body → ordered
    ``(part_number, etag)`` list (the Parts array consumed at
    s3-handler.ts:512-520). Part numbers must be integers; quotes around
    ETags are stripped as AWS clients send either form."""
    root = _parse_xml(body)
    parts: list[tuple[int, str]] = []
    for el in root:
        if _strip_ns(el.tag) != "Part":
            continue
        num, etag = None, None
        for child in el:
            t = _strip_ns(child.tag)
            if t == "PartNumber":
                try:
                    num = int((child.text or "").strip())
                except ValueError as e:
                    raise MalformedXMLError(f"bad PartNumber: {child.text!r}") from e
            elif t == "ETag":
                etag = (child.text or "").strip().strip('"')
        if num is None or etag is None:
            raise MalformedXMLError("Part needs PartNumber and ETag")
        parts.append((num, etag))
    if not parts:
        raise MalformedXMLError("CompleteMultipartUpload needs at least one Part")
    return parts


def parse_delete_objects_xml(body: str) -> tuple[list[str], bool]:
    """``Delete`` (multi-object delete) request body → (keys, quiet)."""
    root = _parse_xml(body)
    keys: list[str] = []
    quiet = False
    for el in root:
        t = _strip_ns(el.tag)
        if t == "Quiet":
            quiet = (el.text or "").strip().lower() == "true"
        elif t == "Object":
            key = None
            for child in el:
                if _strip_ns(child.tag) == "Key":
                    key = child.text or ""
            if key is None:
                raise MalformedXMLError("Object needs a Key")
            keys.append(key)
    if not keys:
        raise MalformedXMLError("Delete needs at least one Object")
    return keys, quiet


def to_list_parts_result_xml(
    parts: list[dict],
    bucket: str,
    key: str,
    upload_id: str,
    is_truncated: bool = False,
    next_part_number_marker: int | None = None,
) -> str:
    """S3 ``ListPartsResult`` XML body (ListParts response shape the
    reference emits through its XML plugin for O6 pages)."""
    from xml.etree import ElementTree as ET

    root = ET.Element(
        "ListPartsResult", xmlns="http://s3.amazonaws.com/doc/2006-03-01/"
    )
    for tag, val in [
        ("Bucket", bucket),
        ("Key", key),
        ("UploadId", upload_id),
        ("IsTruncated", "true" if is_truncated else "false"),
    ]:
        ET.SubElement(root, tag).text = val
    if next_part_number_marker is not None:
        ET.SubElement(root, "NextPartNumberMarker").text = str(
            next_part_number_marker
        )
    for p in parts:
        el = ET.SubElement(root, "Part")
        ET.SubElement(el, "PartNumber").text = str(p["PartNumber"])
        ET.SubElement(el, "ETag").text = str(p["ETag"])
        if p.get("Size") is not None:
            ET.SubElement(el, "Size").text = str(p["Size"])
    return ET.tostring(root, encoding="unicode")


def parse_list_parts_result_xml(body: str) -> dict:
    """Inverse of ``to_list_parts_result_xml`` (round-trip support)."""
    root = _parse_xml(body)
    out: dict = {"Parts": [], "IsTruncated": False}
    for el in root:
        t = _strip_ns(el.tag)
        if t in ("Bucket", "Key", "UploadId"):
            out[t] = el.text
        elif t == "IsTruncated":
            out["IsTruncated"] = (el.text or "").strip().lower() == "true"
        elif t == "NextPartNumberMarker":
            out["NextPartNumberMarker"] = int(el.text or 0)
        elif t == "Part":
            p: dict = {}
            for child in el:
                ct = _strip_ns(child.tag)
                if ct == "PartNumber":
                    p["PartNumber"] = int(child.text or 0)
                elif ct == "ETag":
                    p["ETag"] = child.text
                elif ct == "Size":
                    p["Size"] = int(child.text or 0)
            out["Parts"].append(p)
    return out


def parse_list_bucket_result_xml(body: str) -> ListObjectsV2Result:
    """Inverse of ``to_list_bucket_result_xml`` — golden round-trip support
    and a client-side response reader."""
    root = _parse_xml(body)
    contents: list[dict] = []
    prefixes: list[str] = []
    is_truncated = False
    token: str | None = None
    key_count = 0
    for el in root:
        t = _strip_ns(el.tag)
        if t == "Contents":
            c: dict = {}
            for child in el:
                ct = _strip_ns(child.tag)
                if ct == "Key":
                    c["Key"] = child.text or ""
                elif ct == "Size":
                    c["Size"] = int(child.text or 0)
                elif ct == "ETag":
                    c["ETag"] = child.text
            contents.append(c)
        elif t == "CommonPrefixes":
            for child in el:
                if _strip_ns(child.tag) == "Prefix":
                    prefixes.append(child.text or "")
        elif t == "IsTruncated":
            is_truncated = (el.text or "").strip().lower() == "true"
        elif t == "NextContinuationToken":
            token = el.text
        elif t == "KeyCount":
            key_count = int(el.text or 0)
    return ListObjectsV2Result(
        contents=contents,
        common_prefixes=prefixes,
        is_truncated=is_truncated,
        next_continuation_token=token,
        key_count=key_count,
    )
