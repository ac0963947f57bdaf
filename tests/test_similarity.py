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


def test_ivf_batch_matches_broadcast_ivf(emb, probes):
    """The shuffle-join batch variant must be plan-only different:
    same codebook, same candidate semantics, same rounding — so its
    (query, vec, score, rank) rows are IDENTICAL to ivf_knn's for any
    (n_cells, nprobe), including the partial top-k regime where the
    per-(query, cell) window prunes before the global one."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.similarity import (
        ivf_knn_batch,
    )

    for n_cells, nprobe in ((8, 8), (8, 3), (16, 4)):
        small = sorted(
            map(tuple, ivf_knn(probes, emb, k=K, n_cells=n_cells, nprobe=nprobe).collect())
        )
        batch = sorted(
            map(
                tuple,
                ivf_knn_batch(
                    probes, emb, k=K, n_cells=n_cells, nprobe=nprobe
                ).collect(),
            )
        )
        assert small == batch, f"batch/broadcast IVF diverge at {n_cells}/{nprobe}"


def test_ivf_batch_no_probe_broadcast_no_collect(emb, probes):
    """The batch regime's contract is physical: no probe-sized
    broadcast anywhere in the plan (both sides meet in a cell-keyed
    shuffle; AQE may still locally broadcast SMALL sides, so pin AQE
    off for the plan check), and the post-join candidate space is
    reduced to per-query top-k partials INSIDE the Arrow kernel — the
    only exchanges are the two cell-join sides and the final window
    over k-row partials; the pair space itself is never shuffled."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.similarity import (
        ivf_knn_batch,
    )

    spark = emb.sparkSession
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            ivf_knn_batch(probes, emb, k=K, n_cells=8, nprobe=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    assert "BroadcastExchange" not in plan
    # one exchange per cell-join side, one for the final per-query
    # window over the in-UDF top-k partials — nothing pair-space-sized
    assert plan.count("Exchange hashpartitioning") == 3, plan


def test_knn_auto_routes_large_probe_batches_to_ivf_batch(emb, probes):
    """Router contract for the batch-join regime: with a large index
    (forced) and a probe batch above probe_threshold_rows, knn_auto
    must produce exactly ivf_knn_batch's rows (not LSH's, whose
    banded candidates differ); below the probe threshold it must
    produce exactly lsh_knn's rows."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.retrieval import (
        knn_auto,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.similarity import (
        ivf_knn_batch,
    )

    routed_batch = sorted(
        map(
            tuple,
            knn_auto(
                probes, emb, k=K, ann_threshold_rows=1, probe_threshold_rows=1
            ).collect(),
        )
    )
    direct_batch = sorted(
        map(tuple, ivf_knn_batch(probes, emb, k=K).collect())
    )
    assert routed_batch == direct_batch

    dim = len(emb.select("embedding").first()[0])
    routed_lsh = sorted(
        map(
            tuple,
            knn_auto(
                probes, emb, k=K, ann_threshold_rows=1, probe_threshold_rows=10**9
            ).collect(),
        )
    )
    direct_lsh = sorted(
        map(tuple, lsh_knn(probes, emb, k=K, dim=dim).collect())
    )
    assert routed_lsh == direct_lsh


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


def test_brute_topk_partials_bit_identical_to_catalyst(emb, probes):
    """The Arrow kernel's multi-truncation top-k must equal the
    Catalyst round(cosine_sim(slice(...))) fold's top-k exactly —
    same rounding, same (score desc, id asc) tie order — at every
    requested prefix dim."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.vector import (
        cosine_sim,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.similarity import (
        brute_topk_partials,
    )

    panel = [
        (r.query_id, r.qvec)
        for r in probes.orderBy("query_id").limit(8).collect()
    ]
    full_dim = len(panel[0][1])
    partials = brute_topk_partials(emb, panel, k=K, dims=[16, 32, full_dim])
    w = Window.partitionBy("trunc_dim", "query_id").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    got = sorted(
        map(
            tuple,
            partials.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= K)
            .collect(),
        )
    )

    spark = emb.sparkSession
    pdf = spark.createDataFrame(
        [(q, list(map(float, v))) for q, v in panel],
        "query_id long, qvec array<float>",
    )
    want = []
    for d in (16, 32, full_dim):
        e = F.slice("embedding", 1, d) if d != full_dim else F.col("embedding")
        q = F.slice("qvec", 1, d) if d != full_dim else F.col("qvec")
        scored = (
            emb.crossJoin(F.broadcast(pdf))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                "vec_id",
                F.round(cosine_sim(e, q), 6).alias("score"),
            )
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("vec_id")
        )
        want.extend(
            (d, r.query_id, r.vec_id, r.score, r.rnk)
            for r in scored.withColumn("rnk", F.row_number().over(wq))
            .filter(F.col("rnk") <= K)
            .collect()
        )
    assert got == sorted(want)


def test_brute_knn_block_exclude_self_keeps_true_topk(spark):
    """Regression: the old INT64_MIN self-sentinel wrapped under the
    `-col` negation inside argpartition, so the self row could WIN the
    partial selection and evict a genuine neighbor. Build a fixture
    where the self row would otherwise rank first and k == n-1, so a
    dropped candidate is visible in the output, not just re-ranked."""
    import numpy as np

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.similarity import (
        brute_knn_block,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(6, 8)).astype(float)
    idx = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(6)],
        "vec_id long, embedding array<double>",
    ).repartition(1)
    panel = [(0, list(vecs[0]))]  # self-match scores 1.0 — the top row
    rows = brute_knn_block(idx, panel, k=5, exclude_self=True).collect()
    got = {r.vec_id for r in rows}
    assert got == {1, 2, 3, 4, 5}  # all non-self rows, none evicted
    assert all(r.query_id == 0 for r in rows)


def test_brute_knn_block_rejects_negative_ids(spark):
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.similarity import (
        brute_knn_block,
    )

    idx = spark.createDataFrame(
        [(-1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="negative id"):
        brute_knn_block(idx, [(0, [1.0, 0.0])], k=1).collect()


def test_ivf_batch_rejects_non_integral_ids(emb, probes):
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.similarity import (
        ivf_knn_batch,
    )

    str_probes = probes.select(
        F.col("query_id").cast("string").alias("query_id"), "qvec"
    )
    with pytest.raises(TypeError, match="integral"):
        ivf_knn_batch(str_probes, emb, k=K, index_rows=1000)


def test_ivf_batch_probe_chunking_hash_identical(emb, probes, monkeypatch):
    """The two-axis tiling inside score_cell must not change results:
    shrinking the block budget to 1 element forces BOTH a probe-axis
    chunk of 1 and an index-axis tile of 1 — the most extreme tiling
    (every score in its own block, per-tile top-k merged per probe) —
    against the untiled broadcast reference."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators import (
        similarity as sim,
    )

    monkeypatch.setattr(sim, "_BLOCK_ELEMS", 1)  # chunk=1 AND tile=1
    base = sorted(
        (r.query_id, r.vec_id, r.score)
        for r in sim.ivf_knn_batch(
            probes, emb, k=K, n_cells=4, nprobe=4, cache_key="chunktest"
        ).collect()
    )
    ref = sorted(
        (r.query_id, r.vec_id, r.score)
        for r in sim.ivf_knn(
            probes, emb, k=K, n_cells=4, nprobe=4, cache_key="chunktest"
        ).collect()
    )
    assert base == ref


def test_knn_join_probe_cap_guard(emb, probes):
    with pytest.raises(ValueError, match="max_probe_rows"):
        knn_join(probes, emb, k=K, query_vec="qvec", max_probe_rows=3)


def test_ann_result_panel_filter_equals_direct_panel_run(spark):
    # ADVICE r10 #3: q_ann_recall filters the session-cached FULL-probe
    # ANN result down to the panel ids instead of re-running ANN on the
    # panel — sound only while lsh_knn/ivf_knn stay strictly per-probe
    # independent. Pin that independence: the filtered superset must be
    # row-for-row identical to a direct panel-only run for both routes.
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import (
        queries_vector as qv,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.similarity import (
        ivf_knn,
        lsh_knn,
    )

    sf = "/root/testdata/sf0.001"
    probes_panel = (
        qv._probes(spark, sf).orderBy("query_id").limit(qv._RECALL_PANEL)
    )
    panel_ids = [r.query_id for r in probes_panel.select("query_id").collect()]
    emb = qv._emb(spark, sf)

    direct = {
        "lsh": lsh_knn(probes_panel, emb, k=qv._K),
        "ivf12": ivf_knn(
            probes_panel, emb, k=qv._K, n_cells=16, nprobe=12, cache_key=sf
        ),
    }
    for route, direct_df in direct.items():
        filtered = qv._ann_result(spark, sf, route).filter(
            F.col("query_id").isin(panel_ids)
        )
        sym_diff = (
            filtered.exceptAll(direct_df)
            .unionByName(direct_df.exceptAll(filtered))
            .count()
        )
        assert sym_diff == 0, f"route {route}: panel filter != direct run"
