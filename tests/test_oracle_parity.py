"""Run every registered query against its DuckDB oracle at sf0.01 —
the same check the driver performs (CORRECTNESS gate)."""

from __future__ import annotations

import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import registry

from oracle_utils import compare, duck_connection

SF_DIR = "/root/testdata/sf0.01"

_QUERIES = registry.queries()
_ORACLE = registry.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_parity(spark, duck, name):
    df = _QUERIES[name](spark, SF_DIR)
    compare(df, duck, _ORACLE[name])


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLE)))
def test_rows_only_queries_run(spark, name):
    """Non-SQL-expressible ops: at least assert they run and return a
    stable schema with >= 0 rows (mirrors the driver's weaker check)."""
    df = _QUERIES[name](spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0
