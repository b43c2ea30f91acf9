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
