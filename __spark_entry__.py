"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship RAG pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` enumerate every implemented operator
from SURVEY.md §2 with its DuckDB-checkable ANSI-SQL twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.plans.flagship import (
    flagship,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    return registry.oracle_sql()
