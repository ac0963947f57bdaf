"""Bloom-filter semi-join reduction (scale-pattern wave: V10).

The classic distributed-join optimization (Trino/Photon "dynamic
filtering", Spark's own ``runtime.bloomFilter`` injection): summarize
the build side's join keys into a fixed-size bitmap, broadcast the
bitmap (kilobytes, independent of key count), and drop probe-side rows
that cannot match BEFORE the join's shuffle. False positives are
removed by the exact join that follows; false negatives are impossible
(probe uses the identical hash family), so results are exactly the
plain join's.

Why not just broadcast the distinct build keys (a semi join)? At 100 TB
the selective side can still hold 10⁸ keys — an 800 MB broadcast — while
a 2²⁰-bit bloom is 128 KB at ~2-4 % FPR. The bitmap build is a keyed
aggregate over hash positions (map-side ``bit_or`` partials, exchange
carries ≤ num_bits/64 rows), the probe test is pure projection
(two hash + mask ops inside WholeStageCodegen).

Spark 3.3+ can inject this automatically
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) when size
thresholds are met; this operator is the explicit, threshold-free form
with a deterministic hash family, so fixtures exercise the same plan a
cluster would run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Second-hash salt: any fixed literal mixed into xxhash64 gives an
# independent hash function over the key.
_SALT2 = 0x9E3779B9


def _positions(key: Column, num_bits: int) -> list[Column]:
    h1 = F.xxhash64(key)
    h2 = F.xxhash64(key, F.lit(_SALT2))
    return [F.pmod(h, F.lit(num_bits)).cast("long") for h in (h1, h2)]


def bloom_size_for(
    n_keys: int,
    bits_per_key: int = 10,
    floor_bits: int = 1 << 17,
    cap_bits: int = 1 << 26,
) -> int:
    """Size the bitmap from the build-side key count — the sizing step
    every dynamic-filtering engine performs before building. A FIXED
    size is a scale bug, not a simplification: at the 100× fact tier
    (3 M urgent-order keys) the original 2¹⁷-bit filter saturated —
    every bit set, FPR → 1 — so the probe pruned NOTHING while still
    paying two hashes per row (measured 35 s vs 2.4 s at 10×, a
    superlinear wall for a linear workload). ~10 bits/key keeps FPR
    ≈ 1 % with two hash functions; the power-of-two round keeps
    ``pmod`` cheap; the 2²⁶ cap bounds the broadcast at 8 MB (past
    which a partitioned semi-join is the better tool and the caller
    should rethink, exactly like Spark's injection thresholds). Past
    the cap FPR degrades again with key count, so the clamp WARNS —
    silent saturation is exactly the failure mode the dynamic sizing
    exists to prevent."""
    import math
    import warnings

    need = max(floor_bits, bits_per_key * max(n_keys, 1))
    if need > cap_bits:
        warnings.warn(
            f"bloom saturating: {n_keys} keys need {need} bits but the "
            f"broadcast cap is {cap_bits} ({cap_bits // 8 // (1 << 20)} MB); "
            f"effective bits/key {cap_bits / max(n_keys, 1):.1f} — consider "
            "a partitioned semi-join for this build side",
            stacklevel=2,
        )
    return min(cap_bits, 1 << math.ceil(math.log2(need)))


def bloom_build(keys: DataFrame, key_col: str, num_bits: int = 1 << 17) -> DataFrame:
    """Aggregate ``keys[key_col]`` into a 1-row bloom bitmap:
    ``(bloom: array<bigint>)`` of num_bits/64 words, zero-filled, so
    the probe's word fetch is O(1) indexed access (a sparse map would
    cost a linear scan PER PROBE ROW). Distributed end-to-end:
    positions explode (2 rows/key), word-keyed ``bit_or`` with
    map-side partials, zero-fill via a range grid left-join, and ONE
    ordered collect densifies the ≤ num_bits/64 word rows into the
    array (``sort_array`` over collected (idx, word) structs —
    O(n log n)). The earlier form densified through per-element
    ``element_at`` on a Catalyst MAP, which is a linear scan per
    element — O(n_words²) on one row — fine at the original 2¹⁷ bits
    (2 048 words) and a hang at the dynamically-sized 2²⁵ (524 288
    words, ~10¹¹ comparisons): the second scale bug the 100× fact tier
    exposed in this operator."""
    n_words = num_bits // 64
    spark = keys.sparkSession
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), num_bits))).alias("pos")
    )
    words = pos.groupBy(F.expr("cast(pos div 64 as int)").alias("word_idx")).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(pos % 64 as int))")).alias("word")
    )
    grid = spark.range(n_words).select(F.col("id").cast("int").alias("word_idx"))
    filled = grid.join(words, "word_idx", "left").select(
        F.struct(
            F.col("word_idx"),
            F.coalesce(F.col("word"), F.lit(0).cast("long")).alias("word"),
        ).alias("st")
    )
    return filled.agg(F.sort_array(F.collect_list("st")).alias("sts")).select(
        F.transform(F.col("sts"), lambda s: s["word"]).alias("bloom")
    )


def bloom_probe(
    df: DataFrame, key_col: str, bloom: DataFrame, num_bits: int = 1 << 17
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the bloom set (exactly all
    true matches plus ~FPR of the rest). The bitmap rides a 1-row
    broadcast; the membership test is codegen'd projection work."""
    from ..sources.loaders import scatter

    # min-parallelism guard for the per-row hash/mask test on
    # single-file fixture scans (no-op on well-partitioned input)
    d = scatter(df).crossJoin(F.broadcast(bloom))
    test = None
    for p in _positions(F.col(key_col), num_bits):
        word_idx = F.floor(p / F.lit(64)).cast("int")
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int")
        )
        word = F.element_at(F.col("bloom"), word_idx + F.lit(1))  # 1-based
        cond = word.bitwiseAND(mask) != 0
        test = cond if test is None else (test & cond)
    return d.filter(test).drop("bloom")
