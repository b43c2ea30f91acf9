"""COVERAGE.md drift guard: the operator map SURVEY §2.13 points at
must name every registry query, and must not name queries that no
longer exist — the r7 verdict caught 10+ unmapped rows, this test
makes that drift impossible (VERDICT r7 #3)."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _registry_names() -> set[str]:
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as e

    return set(e.queries())


def test_every_registry_query_is_mapped_in_coverage():
    cov = (REPO / "COVERAGE.md").read_text()
    names = _registry_names()
    missing = sorted(
        n for n in names if not re.search(r"`%s`" % re.escape(n), cov)
    )
    assert not missing, (
        f"registry queries absent from COVERAGE.md: {missing} — add a row "
        "(or extend an existing row's driver-query column)"
    )


def test_coverage_names_no_phantom_queries():
    """Backticked identifiers in COVERAGE.md's driver-query columns that
    look like registry names must actually exist in the registry (catch
    renames that orphan the doc)."""
    cov = (REPO / "COVERAGE.md").read_text()
    names = _registry_names()
    # driver-query column = 3rd cell of each table row
    phantoms = set()
    for line in cov.splitlines():
        cells = [c.strip() for c in line.split("|")]
        # 4-column tables only (| ID | Impl | Driver query | Test |
        # splits to 6 cells); 3-column tables have no driver column
        if len(cells) < 6 or not line.lstrip().startswith("|"):
            continue
        for tok in re.findall(r"`([a-z][a-z0-9_]+)`", cells[3]):
            # only flag tokens that LOOK like driver rows (present
            # alongside 'parity'-style cells) and aren't function refs
            if "." not in tok and tok not in names:
                phantoms.add(tok)
    assert not phantoms, (
        f"COVERAGE.md driver-query column names unknown to the registry: "
        f"{sorted(phantoms)}"
    )
