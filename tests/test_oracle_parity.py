"""Every registered query must hash-match its DuckDB oracle at sf0.001 —
the local version of the driver's t2 gate."""

from __future__ import annotations

import pytest

from advanced_logistics_data_engineering_arabic_nlp_pipeline_spark import registry
from tests.oracle_util import compare, duckdb_conn

QUERIES = registry.all_queries()
# Driver-window oracles plus the pytest-only tier (demoted duplicates keep
# their full local hash check even though the driver sees them rows-only).
ORACLES = {**registry.all_oracles(), **registry.local_oracles()}


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    compare(df, con, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    # non-SQL-expressible ops: weaker check, must run and return a schema
    df = QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.count() >= 0
    # release per-query persisted cut points (same contract as compare())
    spark.catalog.clearCache()
