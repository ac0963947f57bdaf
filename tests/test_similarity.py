"""Recall checks for the approximate kNN paths against exact brute
force. Fixture embeddings are ~uniform on the unit sphere (no cluster
structure), so partial-scan recall is bounded by the scan fraction; the
sound invariants are (a) exhaustive probing reproduces exact results,
(b) recall is monotone in the probe budget, (c) approximation changes
WHICH pairs are found, never their scores."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.retrieval import (
    knn_join,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.similarity import (
    ivf_knn,
    lsh_knn,
)

SF_DIR = "/root/testdata/sf0.01"
K = 4


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def probes(emb):
    return emb.filter(F.expr("vec_id % 50 = 0")).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


@pytest.fixture(scope="module")
def exact_rows(emb, probes):
    # knn_join keeps self-matches (caller's choice); the ANN paths
    # exclude them, so re-rank after a self-filter for the baseline.
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    df = (
        knn_join(probes, emb, k=K + 1, query_vec="qvec")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rnk2", F.row_number().over(w))
        .filter(F.col("rnk2") <= K)
    )
    return df.collect()


@pytest.fixture(scope="module")
def exact(exact_rows):
    return {(r.query_id, r.vec_id) for r in exact_rows}


def _recall(approx_rows, exact_pairs):
    approx = {(r.query_id, r.vec_id) for r in approx_rows}
    return len(approx & exact_pairs) / len(exact_pairs)


def test_lsh_recall(emb, probes, exact):
    rows = lsh_knn(probes, emb, k=K).collect()
    r = _recall(rows, exact)
    assert r >= 0.5, f"LSH recall@{K} too low: {r}"


def test_ivf_full_probe_is_exact(emb, probes, exact):
    full = _recall(ivf_knn(probes, emb, k=K, n_cells=8, nprobe=8).collect(), exact)
    assert full == 1.0, f"full-probe IVF must equal exact, got {full}"


def test_ivf_recall_monotone(emb, probes, exact):
    half = _recall(ivf_knn(probes, emb, k=K, n_cells=8, nprobe=4).collect(), exact)
    quarter = _recall(ivf_knn(probes, emb, k=K, n_cells=8, nprobe=2).collect(), exact)
    assert half >= quarter, f"recall not monotone in nprobe: {half} < {quarter}"
    assert half >= 0.4, f"half-scan IVF recall unreasonably low: {half}"


def test_lsh_scores_match_exact_for_found_pairs(emb, probes, exact_rows):
    exact_scores = {(r.query_id, r.vec_id): round(r.score, 6) for r in exact_rows}
    for r in lsh_knn(probes, emb, k=K).collect():
        key = (r.query_id, r.vec_id)
        if key in exact_scores:
            assert abs(exact_scores[key] - r.score) < 2e-6


def test_knn_auto_routes_by_index_size(spark):
    """SURVEY §4.3 routing: small index → exact brute force; above the
    threshold → LSH. Same output shape either way, and on this fixture
    the LSH route recalls most of the exact top-k."""
    from pyspark.sql import functions as F

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.retrieval import (
        knn_auto,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        load_table,
    )

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    probes = emb.filter(F.expr("vec_id % 100 = 0")).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = knn_auto(probes, emb, k=4, ann_threshold_rows=10**9)
    approx = knn_auto(probes, emb, k=4, ann_threshold_rows=1)
    assert exact.columns == approx.columns == ["query_id", "vec_id", "score", "rank"]

    ex = {(r.query_id, r.vec_id) for r in exact.collect() if r.query_id != r.vec_id}
    ap = {(r.query_id, r.vec_id) for r in approx.collect()}
    assert len(ex & ap) / len(ex) >= 0.5  # bucketed candidates recall
