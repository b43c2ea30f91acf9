"""Key / bucket-name / mime-type validation as Column predicates.

Reference: src/storage/limits.ts:91-112 (S3-safe character classes) and
src/storage/uploader.ts:305-332 (mime wildcard matching). In the reference
these throw per-request; in a batch engine they are filters that partition
an input batch into valid/invalid rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: limits.ts:94 — object keys allow word chars, '/', and S3-special chars.
OBJECT_KEY_RE = r"^(\w|/|!|\-|\.|\*|'|\(|\)| |&|\$|@|=|;|:|\+|,|\?)*$"

#: limits.ts:110 — bucket names: same minus '/' (and length < 101).
BUCKET_NAME_RE = r"^(\w|!|\-|\.|\*|'|\(|\)| |&|\$|@|=|;|:|\+|,|\?)*$"


def is_valid_key(key: Column) -> Column:
    return (F.length(key) > 0) & key.rlike(OBJECT_KEY_RE)


def is_valid_bucket_name(name: Column) -> Column:
    return (F.length(name) > 0) & (F.length(name) < 101) & name.rlike(BUCKET_NAME_RE)


def mime_type_allowed(mime: Column, allowed: list[str]) -> Column:
    """uploader.ts:305-332: exact match, or 'type/*' wildcard prefix, or a
    bare '*' / '*/*' allow-all. Empty/None allowed list allows everything."""
    if not allowed:
        return F.lit(True)
    cond = F.lit(False)
    for pattern in allowed:
        if pattern in ("*", "*/*"):
            cond = cond | F.lit(True)
        elif pattern.endswith("/*"):
            cond = cond | mime.startswith(pattern[:-1])
        else:
            cond = cond | (mime == pattern)
    return cond
