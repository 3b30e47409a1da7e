"""Driver-contract e2e: every queries() entry with an oracle must match
its DuckDB result at sf0.01 (the driver's own gate, replicated locally)."""

import pytest

import __spark_entry__ as entry_mod

from .conftest import SF001
from .oracle_check import compare

QUERY_NAMES = sorted(entry_mod.queries().keys())


def test_all_queries_have_callables():
    qs = entry_mod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    df = qs[name](spark, SF001)
    if name not in oracles:
        # rows-only contract: must run and return a stable schema
        assert df.columns
        assert df.count() >= 0
        return
    compare(df, duck, oracles[name], SF001)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
