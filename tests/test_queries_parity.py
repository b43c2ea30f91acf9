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
