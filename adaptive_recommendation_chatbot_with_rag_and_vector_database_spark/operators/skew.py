"""Skew-aware join (SURVEY §4.2 shuffle/partitioning row; 100 TB
posture). A shuffled equi-join on a key with a hot value puts that
value's entire fact volume into one task. Two mitigations, in
preference order:

1. AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled`` —
   on by default in this engine's session factory): post-shuffle,
   oversized partitions are split and the matching build side is
   replicated. Zero code; handles moderate skew.
2. ``salted_join`` below, for the pathological case AQE can't fix
   (one key ≫ executor memory, or a non-AQE-eligible plan): the fact
   side's key is widened with a deterministic salt in ``[0, buckets)``
   and the dim side is replicated ``buckets`` times, so one hot key
   spreads over ``buckets`` tasks. Replication cost is |dim|×buckets —
   use only when dim ≪ fact, which is exactly the skewed-join shape.

Result equals the plain inner/left join bit-for-bit (property-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    buckets: int = DEFAULT_BUCKETS,
    salt_src: str | None = None,
) -> DataFrame:
    """Equi-join ``fact`` to ``dim`` on column ``on`` with key salting.

    ``salt_src`` names a fact column whose hash spreads the salt; by
    default the salt hashes ALL fact columns (deterministic per row,
    uniform across a hot key's rows — never a random(): retries and
    oracle runs must reproduce)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_cols = [F.col(salt_src)] if salt_src else [
        F.col(c) for c in fact.columns
    ]
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(buckets)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_fact.join(replicated_dim, [on, "_salt"], how)
    return out.drop("_salt")


def salted_join_hot(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    hot_threshold: int,
    buckets: int = DEFAULT_BUCKETS,
    salt_src: str | None = None,
) -> DataFrame:
    """``salted_join`` refinement that salts ONLY the hot keys, so the
    dim inflates by |hot| × (buckets − 1) rows instead of |dim| ×
    buckets — the form to use when the dim itself is large.

    The hot set is derived from the data (per-key count >
    ``hot_threshold``) and is tiny BY DEFINITION — it is the head of
    the key distribution — so broadcasting it to both sides is always
    safe. Cold fact rows keep salt 0 and meet the dim's single salt-0
    replica; hot rows scatter across ``buckets`` tasks. Inner join
    only (hot-set membership is symmetric information; outer forms
    would need null-salt care)."""
    hot = (
        fact.groupBy(on)
        .count()
        .filter(F.col("count") > hot_threshold)
        .select(on)
        .withColumn("_hot", F.lit(True))
    )
    salt_cols = [F.col(salt_src)] if salt_src else [F.col(c) for c in fact.columns]
    salted_fact = fact.join(F.broadcast(hot), on, "left").withColumn(
        "_salt",
        F.when(
            F.col("_hot"), F.pmod(F.xxhash64(*salt_cols), F.lit(buckets)).cast("int")
        ).otherwise(F.lit(0)),
    )
    replicated_dim = dim.join(F.broadcast(hot), on, "left").withColumn(
        "_salt",
        F.explode(
            F.when(
                F.col("_hot"), F.sequence(F.lit(0), F.lit(buckets - 1))
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    out = salted_fact.drop("_hot").join(
        replicated_dim.drop("_hot"), [on, "_salt"], "inner"
    )
    return out.drop("_salt")
