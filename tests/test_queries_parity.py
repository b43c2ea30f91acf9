"""Every queries() entry with an oracle must hash-match it — the same gate
the driver runs (CORRECTNESS_r{N}.json), executed locally."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.parity import assert_parity

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_parity(spark, sf_dir, name):
    if name not in ORACLES:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    assert_parity(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir, name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_view_coherence_across_sf_switch(spark):
    """Interleaving sf_dirs (the driver runs entry() at sf0.001 between
    sf0.01 queries) must re-register the session-global temp views — the
    view-reading merge_upsert would otherwise scan the wrong scale."""
    a = QUERIES["merge_upsert"](spark, "/root/testdata/sf0.01").count()
    entry_mod.entry(spark).count()  # registers sf0.001 views
    b = QUERIES["merge_upsert"](spark, "/root/testdata/sf0.01").count()
    assert a == b
