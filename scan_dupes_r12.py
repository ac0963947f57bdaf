"""Duplicate-scan sweep (builder tool): for every registered query,
count duplicated FileScan subtrees in the formatted physical plan —
the same parquet location appearing more than once means the plan
re-reads (and re-computes everything above) that scan per reference.

Prints queries with >=1 duplicated location, sorted by duplicate count.
Usage: python scan_dupes_r12.py [min_dupes]
"""

from __future__ import annotations

import io
import os
import re
import sys
from collections import Counter
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
    min_dupes = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spark = get_spark("scan_dupes_r12", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    rows = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # streaming/side-effect queries
            rows.append((name, -1, f"explain failed: {exc}"[:80]))
            continue
        locs = re.findall(r"Location:.*?\[(.*?)\]", plan)
        c = Counter(locs)
        dupes = {loc.rsplit("/", 1)[-1]: n for loc, n in c.items() if n > 1}
        extra = sum(n - 1 for n in c.values() if n > 1)
        if extra >= min_dupes:
            rows.append((name, extra, str(dupes)))
    rows.sort(key=lambda r: -r[1])
    for name, extra, detail in rows:
        print(f"{name:32s} {extra:3d}  {detail}")


if __name__ == "__main__":
    main()
