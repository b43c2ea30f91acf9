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
#: \z (absolute end), not $: Java's $ matches before a trailing newline,
#: which would admit newline-terminated keys the reference rejects.
OBJECT_KEY_RE = r"^(\w|/|!|\-|\.|\*|'|\(|\)| |&|\$|@|=|;|:|\+|,|\?)*\z"

#: limits.ts:110 — bucket names: same minus '/' (and length < 101).
BUCKET_NAME_RE = r"^(\w|!|\-|\.|\*|'|\(|\)| |&|\$|@|=|;|:|\+|,|\?)*\z"


def is_valid_key(key: Column) -> Column:
    return (F.length(key) > 0) & key.rlike(OBJECT_KEY_RE)


def is_valid_bucket_name(name: Column) -> Column:
    return (F.length(name) > 0) & (F.length(name) < 101) & name.rlike(BUCKET_NAME_RE)


def mime_type_allowed(mime: Column, allowed: list[str]) -> Column:
    """uploader.ts:305-332 (validateMimeType): the requested mime must be
    'type/subtype'; an allowed entry matches when its TYPE equals the
    requested type and its subtype is '*' or equals the requested subtype.
    Note the reference matches NEITHER '*' nor '*/*' — the wildcard exists
    only in the subtype position — and a mime without '/' is invalid.
    Empty/None allowed list allows everything (no restriction configured)."""
    if not allowed:
        return F.lit(True)
    req_type = F.split(mime, "/").getItem(0)
    req_ext = F.split(mime, "/").getItem(1)
    cond = F.lit(False)
    for pattern in allowed:
        parts = pattern.split("/")
        if len(parts) < 2:
            continue  # '*' or bare types never match (uploader.ts:317-319)
        a_type, a_ext = parts[0], parts[1]
        if a_ext == "*":
            cond = cond | (req_type == a_type)
        else:
            cond = cond | ((req_type == a_type) & (req_ext == a_ext))
    return mime.contains("/") & cond
