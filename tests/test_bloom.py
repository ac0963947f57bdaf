"""Bloom semi-join reduction invariants (operators/bloom.py) and
Python DataSource parallelism (sources/pyds.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.bloom import (
    bloom_build,
    bloom_probe,
)


def test_bloom_never_drops_true_matches(spark):
    """False negatives are impossible: every build key survives the
    probe regardless of bitmap size (even a tiny, collision-heavy
    one)."""
    keys = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    for num_bits in (1 << 8, 1 << 17):  # tiny → many collisions; default
        bloom = bloom_build(keys, "k", num_bits=num_bits)
        kept = bloom_probe(keys, "k", bloom, num_bits=num_bits)
        assert kept.count() == 500


def test_bloom_fpr_is_small_at_default_size(spark):
    """Non-members mostly drop: with n=500 keys in a 2^17-bit bitmap
    the expected FPR is well under 1 %."""
    keys = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    bloom = bloom_build(keys, "k")
    non_members = spark.range(10_000_000, 10_005_000).select(
        F.col("id").alias("k")
    )
    false_pos = bloom_probe(non_members, "k", bloom).count()
    assert false_pos < 50  # 1% of 5000


def test_synthgen_datasource_splits_into_requested_partitions(spark):
    """The Python DataSource plans one input partition per requested
    split — the parallel-read contract."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.pyds import (
        register,
    )

    register(spark)
    df = (
        spark.read.format("synthgen")
        .option("rows", 1000)
        .option("parts", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000


def test_synthgen_stream_equals_batch(spark, tmp_path):
    """The streaming form of the Python DataSource
    (SimpleDataSourceStreamReader) delivers exactly the batch rows,
    split across micro-batches — the unified-API guarantee plus the
    deterministic-replay contract (readBetweenOffsets) recovery needs."""
    import time

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.pyds import (
        register,
    )

    register(spark)
    batch = spark.read.format("synthgen").option("rows", 500).load()
    stream = (
        spark.readStream.format("synthgen")
        .option("rows", 500)
        .option("batch", 200)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sg_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table("sg_mem").count() >= 500:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.table("sg_mem").collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_round6_matches_duckdb_semantics():
    """The MMR greedy's Python rounding must be bit-identical to DuckDB
    round(x, 6) (half away from zero on the binary double) — property
    checked across the score range the greedy produces."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.ranking import (
        _round6,
    )

    con = duckdb.connect()

    @settings(max_examples=300, deadline=None)
    @given(st.floats(min_value=-2.0, max_value=2.0, allow_nan=False))
    def check(x):
        want = con.execute("SELECT round(?::DOUBLE, 6)", [x]).fetchone()[0]
        assert _round6(x) == want, x

    check()
    con.close()
