"""Two-phase distributed skyline (Pareto frontier), scale wave V12.

The skyline of a set under (minimize price, maximize qty): rows no
other row dominates (other.price ≤ price AND other.qty ≥ qty with at
least one strict). The classic distributed algorithm:

1. **Local phase** — each partition computes its own skyline
   (Arrow-batched ``mapInPandas``, one sort + linear sweep per
   partition). Sound because dominance is transitive: any row dominated
   within its partition is dominated globally, so dropping it never
   loses a global-skyline row. At 100 TB this is where the reduction
   happens — partitions of millions of rows collapse to skylines of
   typically tens.
2. **Global phase** — the surviving candidates (small by construction)
   meet in a broadcast theta LEFT ANTI self-join: a candidate survives
   iff no other candidate dominates it. Exact, and the nested-loop is
   over |candidates|², not |input|².

No SQL engine expresses phase 1 relationally (dominance is not a
window); the DuckDB oracle runs the O(n²) NOT EXISTS directly on the
(pre-aggregated, bounded) input, which is exactly the single-node shape
the two-phase plan replaces.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_skyline(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    import pandas as pd  # noqa: F401

    for pdf in batches:
        if pdf.empty:
            yield pdf
            continue
        # sort: price asc, qty desc — sweep keeps a row iff no
        # strictly-cheaper row had ≥ qty and no same-price row has
        # strictly greater qty (equal (price, qty) pairs both survive:
        # dominance requires one strict inequality)
        pdf = pdf.sort_values(
            ["price", "qty"], ascending=[True, False], kind="mergesort"
        )
        keep = []
        best_prev = float("-inf")  # max qty over strictly smaller prices
        group_price = None
        group_max = float("-inf")
        for row in pdf.itertuples(index=False):
            if group_price is None or row.price != group_price:
                best_prev = max(best_prev, group_max)
                group_price = row.price
                group_max = float("-inf")
            if row.qty > best_prev and row.qty >= group_max:
                keep.append(True)
                group_max = max(group_max, row.qty)
            else:
                keep.append(False)
        yield pdf[pd.Series(keep, index=pdf.index)]


def skyline(points: DataFrame) -> DataFrame:
    """``points(part_id, price, qty)`` → its Pareto frontier
    (min price, max qty), exact."""
    import pandas as pd  # noqa: F401 - mapInPandas dependency

    cand = points.mapInPandas(_local_skyline, points.schema)
    t, d = cand.alias("t"), cand.alias("d")
    dominated_by = (
        (F.col("d.price") <= F.col("t.price"))
        & (F.col("d.qty") >= F.col("t.qty"))
        & (
            (F.col("d.price") < F.col("t.price"))
            | (F.col("d.qty") > F.col("t.qty"))
        )
    )
    return t.join(F.broadcast(d), dominated_by, "left_anti")
