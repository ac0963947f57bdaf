"""Benchmark harness (driver contract).

Runs every registered query plus the flagship pipeline at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a ``noop`` write (full distributed execution,
no driver-side collect), timed individually. ``value`` is the total
wall-clock across all queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import registry
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.plans.flagship import (
    flagship,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.session import (
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(tail.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> None:
    """Execute the full plan distributed-side; no rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("bench")
    queries = registry.queries()

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    _force(flagship(spark, SF_DIR))
    timings["flagship"] = round(time.perf_counter() - t0, 3)

    for name in sorted(queries):
        fn = queries[name]
        t0 = time.perf_counter()
        _force(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
