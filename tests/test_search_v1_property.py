"""Property test: search_objects_v1 (name-sort hybrid path) vs an
independent pure-Python replay of the 0056 semantics over generated
mixed-case corpora — folder grouping on lower(name), original-case
display from the traversal-order representative, split_part naming,
merged-stream offset/limit, both directions."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from storage_spark.operators.listing import search_objects_v1

SEG = st.text(alphabet=list("aBcZ09._-"), min_size=1, max_size=4)
NAME = st.lists(SEG, min_size=1, max_size=3).map("/".join)
CORPUS = st.lists(NAME, min_size=1, max_size=14, unique=True)


def py_search_v1(rows, search, levels, offset, limit, desc):
    """Pure-Python 0056 replay. rows = [(name, id)]."""
    fl = search.lower()
    hits = [(n, i) for n, i in rows if n.lower().startswith(fl)]
    folders: dict[str, list] = {}
    files = []
    for n, i in hits:
        ln = n.lower()
        loc = ln.find("/", len(fl))
        if loc >= 0:
            folders.setdefault(ln[: loc + 1], []).append((ln, n))
        else:
            files.append((ln, n, i))
    stream = []
    for cp, members in folders.items():
        rep = (max if desc else min)(members)[1]
        disp = rep[: len(cp)].rstrip("/")
        seg = disp.split("/")[levels - 1] if levels <= len(disp.split("/")) else ""
        stream.append((cp, "", seg, None))
    for ln, n, i in files:
        parts = n.split("/")
        seg = parts[levels - 1] if levels <= len(parts) else ""
        stream.append((ln, n, seg, i))
    stream.sort(key=lambda t: (t[0], t[1]), reverse=desc)
    page = stream[offset : offset + limit if limit is not None else None]
    return [(seg, i) for _, _, seg, i in page]


@settings(max_examples=15, deadline=None)
@given(
    names=CORPUS,
    search=st.text(alphabet=list("aBcZ"), max_size=2),
    levels=st.integers(1, 3),
    offset=st.integers(0, 3),
    desc=st.booleans(),
)
def test_search_v1_matches_python_replay(spark, names, search, levels, offset, desc):
    rows = [(n, str(i)) for i, n in enumerate(names)]
    df = spark.createDataFrame(
        [(n, i, 1, 2, 3, "m", "b") for n, i in rows],
        "name string, id string, size long, created_at_ms long,"
        " updated_at_ms long, mimetype string, bucket_id string",
    )
    got = [
        (r.name, r.id)
        for r in search_objects_v1(
            df, "b", search=search, levels=levels, offset=offset, limit=8,
            sort_desc=desc,
        ).collect()
    ]
    want = py_search_v1(rows, search, levels, offset, 8, desc)
    assert got == want, (names, search, levels, offset, desc)
