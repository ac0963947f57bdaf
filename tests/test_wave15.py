"""Wave-15 unit tests: properties the oracle-parity hash can't express
(batch-split invariance under a DIFFERENT split, entropy closed forms,
argmax dominance, diff-class arithmetic, recall monotonicity)."""

from __future__ import annotations



import pytest
from pyspark.sql import functions as F

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_analytics import (
    q_dedup_survivorship,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_pipeline import (
    q_table_diff,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_streaming import (
    q_stream_upsert_merge,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_text import (
    q_char_entropy,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_vector import (
    q_matryoshka_recall,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def test_char_entropy_closed_forms(spark):
    """Uniform alphabet → exactly log2(n); single repeated char → 0;
    empty text → 0 with low_entropy flag."""
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "aaaaaa"), (3, ""), (4, "aabb")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in _entropy_of(spark, df).collect()}
    assert rows[1].entropy_bits == pytest.approx(2.0, abs=1e-6)
    assert rows[2].entropy_bits == 0.0
    assert rows[3].entropy_bits == 0.0 and rows[3].low_entropy
    assert rows[4].entropy_bits == pytest.approx(1.0, abs=1e-6)
    assert rows[1].n_chars == 4 and rows[1].n_distinct_chars == 4


def _entropy_of(spark, docs):
    from pyspark.sql import Window

    counts = (
        docs.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    p = F.col("c") / F.sum("c").over(Window.partitionBy("doc_id"))
    ent = (
        counts.withColumn("p", p)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_chars"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
            F.round(-F.sum(F.col("p") * F.log2("p")), 6).alias("entropy_bits"),
        )
    )
    return (
        docs.select("doc_id")
        .join(ent, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
            F.coalesce("n_distinct_chars", F.lit(0)).alias("n_distinct_chars"),
            F.coalesce("entropy_bits", F.lit(0.0)).alias("entropy_bits"),
            (F.coalesce("entropy_bits", F.lit(0.0)) < 2.0).alias("low_entropy"),
        )
    )


def test_char_entropy_matches_registered_query(spark):
    """The in-test reimplementation above and the registered query must
    agree on the real fixture (guards against the test drifting)."""
    docs = load_table(spark, "documents", SF_DIR)
    a = sorted(map(tuple, q_char_entropy(spark, SF_DIR).collect()))
    b = sorted(map(tuple, _entropy_of(spark, docs).collect()))
    assert a == b


def test_survivorship_canonical_dominates_cluster(spark):
    """Within every cluster the canonical doc carries the max quality
    (ties broken by min doc_id), and each cluster's canonical is a
    member of that cluster."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.text import (
        quality_score,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.dedup import (
        connected_components,
        minhash_near_dup,
    )

    docs = load_table(spark, "documents", SF_DIR).filter(
        F.col("doc_id") % 10 == 0
    )
    cc = connected_components(minhash_near_dup(docs, threshold=0.7), docs)
    qual = {
        r.doc_id: r.q
        for r in docs.select(
            "doc_id", quality_score("text").alias("q")
        ).collect()
    }
    members: dict = {}
    for r in cc.collect():
        members.setdefault(r.component, []).append(r.doc_id)
    out = {r.component: r for r in q_dedup_survivorship(spark, SF_DIR).collect()}
    assert set(out) == set(members)
    for comp, ms in members.items():
        row = out[comp]
        assert row.canonical_doc in ms
        assert row.n_members == len(ms)
        best = max(ms, key=lambda d: (qual[d], -d))
        assert row.canonical_doc == best
        assert row.canon_quality == pytest.approx(qual[best], abs=1e-9)


def test_table_diff_class_arithmetic(spark):
    """Class counts must equal the modulus construction exactly."""
    orders = load_table(spark, "orders", SF_DIR)
    keys = [r.o_orderkey for r in orders.select("o_orderkey").collect()]
    n_del = sum(1 for k in keys if k % 97 == 0)
    n_add = sum(1 for k in keys if k % 101 == 0)
    n_mod = sum(1 for k in keys if k % 89 == 0 and k % 97 != 0)
    out = {r.change_type: r for r in q_table_diff(spark, SF_DIR).collect()}
    assert out["deleted"].n_rows == n_del
    assert out["added"].n_rows == n_add
    assert out["modified"].n_rows == n_mod
    assert out["unchanged"].n_rows == len(keys) - n_del - n_mod
    # every modified row bumps price by exactly +1.0
    assert out["modified"].price_delta == pytest.approx(float(n_mod), abs=1e-6)


def test_matryoshka_recall_monotone_and_bounded(spark):
    rows = {r.trunc_dim: r for r in q_matryoshka_recall(spark, SF_DIR).collect()}
    assert set(rows) == {16, 32}
    for r in rows.values():
        assert 0.0 <= r.avg_recall <= 1.0
        assert r.n_probes > 0
    # the longer prefix cannot lose to the shorter one by much; on the
    # synthetic fixture it should plainly dominate
    assert rows[32].avg_recall >= rows[16].avg_recall


def test_upsert_merge_invariant_to_batch_split(spark):
    """Final state must be identical under a different micro-batch
    geometry (3 files vs the registered query's 8) AND equal to the
    batch-global argmax computed directly."""
    import shutil
    import tempfile

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.streaming.upsert_merge import (
        current_state_path,
        upsert_merge_stream,
    )

    ev = load_table(spark, "events", SF_DIR).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    work = tempfile.mkdtemp(prefix="wave15_upsert_")
    try:
        staged = f"{work}/staged"
        ev.repartition(3).write.parquet(staged)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        batches: list = []
        q = upsert_merge_stream(
            stream, f"{work}/state", f"{work}/ckpt", batch_counter=batches
        )
        q.awaitTermination()
        assert len(batches) == 3
        got = sorted(
            map(
                tuple,
                spark.read.parquet(current_state_path(f"{work}/state")).collect(),
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    via_query = sorted(map(tuple, q_stream_upsert_merge(spark, SF_DIR).collect()))
    assert got == via_query

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    direct = sorted(
        map(
            tuple,
            ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.col("ts").alias("last_ts"),
                F.col("event_id").alias("last_event_id"),
                F.col("event_type").alias("last_event_type"),
                F.col("value").alias("last_value"),
            )
            .collect(),
        )
    )
    assert got == direct


def test_tfidf_keywords_shape(spark):
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_text import (
        q_tfidf_keywords,
    )

    rows = q_tfidf_keywords(spark, SF_DIR).collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
        assert r.tfidf > 0.0 and r.tf >= 1 and r.df >= 1
    n_sources = (
        load_table(spark, "documents", SF_DIR)
        .select("source")
        .distinct()
        .count()
    )
    assert len(by_source) == n_sources
    for rs in by_source.values():
        assert len(rs) == 5
        assert sorted(r.rnk for r in rs) == [1, 2, 3, 4, 5]
        scores = [r.tfidf for r in sorted(rs, key=lambda r: r.rnk)]
        assert scores == sorted(scores, reverse=True)
