"""Vector math as Catalyst expressions (SURVEY §2.8 F7).

The reference's similarity metric is cosine (Pinecone index
``metric="cosine"``, /root/reference/AI.py:52). Here dot product, norm,
and cosine are built from Spark's higher-order array functions
(``zip_with`` + ``aggregate``), so scoring stays JVM-side inside
whole-stage codegen — no Python in the hot path, which is what lets a
top-k scan over a 100 TB embeddings table run at scan speed.

All arithmetic is DOUBLE regardless of the stored FLOAT vectors, to
match the DuckDB oracle's double-precision list arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either side has zero norm."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0.0, dot(a, b) / denom).otherwise(F.lit(0.0))
