"""Regenerate EXPLAIN.md: the formatted physical plan of every
registered query at sf0.001 — the plan-review artifact behind
tests/test_plans.py. Usage: python explain.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.plans.flagship import (  # noqa: E402
    flagship,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.session import (  # noqa: E402
    get_spark,
)

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("explain", cpus=4)
    out = [
        "# EXPLAIN — physical plans (sf0.001, regenerate with `python explain.py`)",
        "",
        "Shapes to look for: `PushedFilters`/pruned `ReadSchema` on scans,",
        "`BroadcastHashJoin` for dims, `TakeOrderedAndProject` for top-k,",
        "`partial_*` aggregates before exchanges, `WindowGroupLimit` under",
        "ranked-window cuts, `Exchange RoundRobinPartitioning` as the",
        "materialization barrier for sketch columns (loaders.scatter).",
        "",
    ]
    plans = {"flagship": flagship(spark, SF)}
    qs = E.queries()
    plans.update({n: qs[n](spark, SF) for n in sorted(qs)})
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        if len(plan) > 4000:
            plan = plan[:4000] + "\n… (truncated)"
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(__file__), "EXPLAIN.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote EXPLAIN.md with {len(plans)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
