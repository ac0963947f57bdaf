"""Query registry: the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, a DuckDB
oracle twin. Registration happens at import time via the ``@query``
decorator in the ``queries_*`` modules.

Determinism rules applied throughout (SURVEY §7 "determinism
discipline"):
- every float output column is rounded (4-6 decimals) in BOTH the Spark
  query and the oracle SQL, so value hashes are robust to summation
  order;
- every top-k cut orders by the rounded score with an id tie-break;
- column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLE: dict[str, str] = {}

_MODULES = (
    "adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_relational",
    "adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_vector",
    "adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_text",
    "adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_streaming",
    "adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_analytics",
)


def query(name: str, oracle: str | None = None):
    """Register ``fn`` as queries()[name]; ``oracle`` is the DuckDB SQL
    twin (omit only for genuinely non-SQL-expressible operators — the
    driver then records a weaker rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        import_module(mod)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLE)
