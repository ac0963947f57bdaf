"""End-to-end RagEngine: the reference's full user surface (upload →
index → ask → history) on Spark, deterministic."""

from __future__ import annotations

import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.engine import (
    RagEngine,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.retrieval import (
    REFUSAL_MESSAGE,
    REFUSAL_PREFIX,
)


@pytest.fixture()
def engine(spark, tmp_path):
    eng = RagEngine(spark, index_path=str(tmp_path / "index"))
    corpus = tmp_path / "files"
    corpus.mkdir()
    (corpus / "ships.txt").write_text(
        "The cargo vessel departed with priority freight. "
        "Order priorities were set to urgent for all maritime shipments."
    )
    (corpus / "fruit.txt").write_text(
        "Apples and oranges were harvested in autumn. "
        "The orchard yield doubled compared to last season."
    )
    assert eng.index_files(str(corpus), glob="*.txt") > 0
    return eng


def test_reindex_is_cached(engine, tmp_path):
    # the reference's LRU semantics: identical corpus → zero new embeds
    assert engine.index_files(str(tmp_path / "files"), glob="*.txt") == 0


def test_retrieve_returns_k_scored_chunks(engine):
    rows = engine.retrieve("priority freight shipments", k=2).collect()
    assert len(rows) == 2
    assert rows[0].score >= rows[1].score
    assert {"doc_id", "chunk_id", "text", "score"} <= set(rows[0].asDict())


def test_ask_returns_reference_result_shape(engine):
    out = engine.ask("What were the order priorities?")
    assert set(out) == {"input", "context", "answer", "retrieved"}
    assert out["context"]  # stuffed, non-empty
    assert "\n" not in out["answer"]  # first-line projection (P2)
    assert len(out["retrieved"]) <= 4  # reference k=4 default


def test_refusal_postprocessing(engine):
    engine.answerer = lambda q, c: REFUSAL_PREFIX + " about llamas."
    out = engine.ask("Anything about llamas?")
    assert out["answer"] == REFUSAL_MESSAGE  # P1 canned message


def test_session_history_lifecycle(engine):
    sid = "s1"
    assert engine.history(sid) == []  # get-or-create: absent reads empty
    engine.ask("q one", session_id=sid)
    engine.ask("q two", session_id=sid)
    log = engine.history(sid)
    assert [m["role"] for m in log] == ["user", "assistant"] * 2
    assert engine.history_df(sid).count() == 4
    engine.clear_session(sid)  # AI.py:29-30,232-235
    assert engine.history(sid) == []


def test_rewrite_hook_is_pluggable(engine):
    seen = {}

    def rw(q, hist):
        seen["q"] = q
        return q + " freight"

    engine.rewrite = rw
    engine.ask("priority")
    assert seen["q"] == "priority"


def test_history_aware_rewrite_contextualizes_followups():
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.engine import (
        history_aware_rewrite,
    )

    history = [
        {"role": "user", "content": "Tell me about shipping priority for orders"},
        {"role": "assistant", "content": "Shipping priority ranks orders by urgency."},
    ]
    # anaphoric follow-up pulls salient topic words from history
    out = history_aware_rewrite("what about it?", history)
    assert out.startswith("what about it?")
    assert "context:" in out and "shipping" in out and "priority" in out
    # standalone questions pass through untouched
    q = "summarize the revenue trend across all market segments"
    assert history_aware_rewrite(q, history) == q
    # no history → identity
    assert history_aware_rewrite("what about it?", []) == "what about it?"
    # deterministic
    assert history_aware_rewrite("what about it?", history) == out


def test_mmr_search_type_diversifies(engine):
    sim = engine.retrieve("priority freight shipments", k=2).collect()
    mmr = engine.retrieve(
        "priority freight shipments", k=2, search_type="mmr"
    ).collect()
    assert len(mmr) == 2
    # greedy step 1 = plain argmax relevance → same top hit
    assert (mmr[0].doc_id, mmr[0].chunk_id) == (sim[0].doc_id, sim[0].chunk_id)
    assert {"doc_id", "chunk_id", "text", "score"} <= set(mmr[0].asDict())


def test_hybrid_search_type_fuses_lexical_and_vector(engine):
    rows = engine.retrieve(
        "priority freight shipments", k=2, search_type="hybrid"
    ).collect()
    assert len(rows) == 2
    assert rows[0].score >= rows[1].score
    # the chunk actually containing the query words must win the fusion
    assert "priority" in rows[0].text.lower()


def test_hybrid_dedupes_question_terms_before_slice(engine, monkeypatch):
    """A repeated-term question must not waste the 5 question-term
    slots on duplicates: dedupe happens BEFORE the [:5] slice, so all
    5 distinct non-stopword terms reach the lexical leg."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators import (
        ranking,
    )

    captured = {}
    real = ranking.bm25_scores

    def spy(df, terms, *a, **kw):
        captured["terms"] = list(terms)
        return real(df, terms, *a, **kw)

    monkeypatch.setattr(ranking, "bm25_scores", spy)
    q = (
        "priority priority priority freight freight shipments "
        "urgent maritime cargo"
    )
    rows = engine.retrieve(q, k=2, search_type="hybrid").collect()
    assert len(rows) == 2
    assert captured["terms"] == [
        "priority",
        "freight",
        "shipments",
        "urgent",
        "maritime",
    ]
    assert len(set(captured["terms"])) == 5


def test_unknown_search_type_rejected(engine):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        engine.retrieve("anything", search_type="cosine!!")


def test_recommend_adapts_to_session_history(engine):
    # a session about shipping should be recommended the shipping
    # chunk first; a session about fruit, the orchard chunk — same
    # engine, recommendations shift with the conversation
    engine.ask("What were the order priorities?", session_id="s-ship")
    engine.ask("How was the orchard yield?", session_id="s-fruit")
    top_ship = engine.recommend("s-ship", k=1).collect()[0]
    top_fruit = engine.recommend("s-fruit", k=1).collect()[0]
    assert "freight" in top_ship.text or "maritime" in top_ship.text
    assert "orchard" in top_fruit.text or "Apples" in top_fruit.text


def test_recommend_cold_start_is_defined(engine):
    # unknown session: empty profile still yields k deterministic rows
    rows = engine.recommend("never-seen", k=2).collect()
    assert len(rows) == 2


def test_recursive_cte_equals_iterative_dataframe_loop(spark):
    """q_recursive_cte's UnionLoop semantics cross-checked against a
    hand-rolled iterate-until-empty DataFrame loop of the same
    recursion — pins that Spark 4.1's WITH RECURSIVE executes the
    declared fixpoint, independently of the DuckDB oracle."""
    from pyspark.sql import functions as F

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import registry
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_spark4 import (
        _REC_MAX_KEY,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r.p_partkey, r.depth, r.path_sum)
        for r in registry.queries()["q_recursive_cte"](spark, sf).collect()
    }

    frontier = (
        load_table(spark, "part", sf)
        .filter(F.col("p_partkey") <= _REC_MAX_KEY)
        .select(
            "p_partkey",
            F.col("p_partkey").alias("node"),
            F.lit(0).alias("depth"),
        )
    )
    acc = frontier
    while True:
        frontier = frontier.filter(F.col("node") > 1).select(
            "p_partkey",
            F.expr("node DIV 2").alias("node"),
            (F.col("depth") + 1).alias("depth"),
        )
        if frontier.isEmpty():
            break
        acc = acc.unionByName(frontier)
    want = {
        (r.p_partkey, r.depth, r.path_sum)
        for r in acc.groupBy("p_partkey")
        .agg(
            F.max("depth").alias("depth"),
            F.sum("node").cast("long").alias("path_sum"),
        )
        .collect()
    }
    assert got == want and got


def test_retrieve_routes_through_ann_above_threshold(spark, tmp_path):
    """The facade's brute-force→ANN handoff: shrink ann_threshold_rows
    so the tiny fixture index exceeds it, and every search_type must
    still return k well-formed rows via the LSH route (approximate, so
    assert shape + score sanity + that the top hit is the on-topic
    chunk, not exact equality)."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        load_table,
    )

    eng = RagEngine(
        spark, index_path=str(tmp_path / "index"), ann_threshold_rows=10
    )
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    assert eng.index_documents(docs) > 0
    assert eng._count_index_rows() > 10  # the route is actually ANN

    exact = RagEngine(spark, index_path=str(tmp_path / "index"))
    q = "priority freight shipments delayed by clerk errors"
    for st in ("similarity", "mmr", "hybrid"):
        rows = eng.retrieve(q, search_type=st).collect()
        assert len(rows) == eng.k, st
        assert all(r.text and r.score is not None for r in rows), st
    # ANN recall on the head: the top similarity hit matches the exact scan
    top_ann = eng.retrieve(q).collect()[0]
    top_exact = exact.retrieve(q).collect()[0]
    assert (top_ann.doc_id, top_ann.chunk_id) == (
        top_exact.doc_id,
        top_exact.chunk_id,
    )
    # ask + recommend drive the same routed path end-to-end
    res = eng.ask(q, session_id="ann")
    assert res["answer"]
    assert len(eng.recommend("ann").collect()) == eng.k


def test_fresh_engine_reuses_on_disk_ann_layout(spark, tmp_path, monkeypatch):
    """The IVF layout is a per-CORPUS artifact: a fresh engine pointed
    at an already-built above-threshold index must verify the persisted
    corpus fingerprint and reuse the codebook+layout — not retrain
    KMeans and rewrite the index (ADVICE r6: the build was effectively
    per-instance). Retrieval on the fresh instance must also stop
    re-reading the codebook parquet per question once verified."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators import (
        similarity as sim,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        load_table,
    )

    path = str(tmp_path / "index")
    eng = RagEngine(spark, index_path=path, ann_threshold_rows=10)
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    assert eng.index_documents(docs) > 0
    q = "priority freight shipments delayed by clerk errors"
    built = eng.retrieve(q).collect()
    assert eng._ann_built and len(built) == eng.k

    def boom(*a, **k):
        raise AssertionError("fresh engine rebuilt an already-built layout")

    monkeypatch.setattr(sim, "train_centroids_sample", boom)
    monkeypatch.setattr(sim, "write_ivf_index", boom)
    fresh = RagEngine(spark, index_path=path, ann_threshold_rows=10)
    got = fresh.retrieve(q).collect()
    assert fresh._ann_built
    assert [(r.doc_id, r.chunk_id) for r in got] == [
        (r.doc_id, r.chunk_id) for r in built
    ]


def test_ann_rebuild_after_corpus_growth_retrains(spark, tmp_path, monkeypatch):
    """After index_documents grows the corpus, the next retrieval must
    RETRAIN with a corpus-versioned cache key — not silently replay the
    old corpus's memoized centroids under the bare-path key, and not
    trust the now-mismatched on-disk fingerprint (ADVICE r6)."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators import (
        similarity as sim,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        load_table,
    )

    path = str(tmp_path / "index")
    eng = RagEngine(spark, index_path=path, ann_threshold_rows=10)
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    assert eng.index_documents(docs.filter("doc_id % 2 = 0")) > 0
    q = "priority freight shipments delayed by clerk errors"

    seen_keys = []
    real_train = sim.train_centroids_sample

    def spy(*a, **k):
        seen_keys.append(k.get("cache_key"))
        return real_train(*a, **k)

    monkeypatch.setattr(sim, "train_centroids_sample", spy)
    eng.retrieve(q).collect()  # first build
    assert eng.index_documents(docs.filter("doc_id % 2 = 1")) > 0
    assert not eng._ann_built  # corpus change invalidates in-session
    eng.retrieve(q).collect()  # fingerprint mismatch => rebuild
    assert len(seen_keys) == 2  # retrained, not replayed from memo/disk
    assert seen_keys[0] != seen_keys[1]  # corpus-versioned cache keys
    assert all(k and str(path) in k for k in seen_keys)


def test_postings_bm25_bit_identical_to_scan_form(spark, tmp_path):
    """The posting-list layout must reproduce the scan-form BM25 scores
    bit-for-bit for every document containing >=1 query term (the only
    documents the postings emit — zero-match docs carry no lexical
    evidence by design)."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.ranking import (
        bm25_postings_scores,
        bm25_scores,
        write_postings_index,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        load_table,
    )

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").select(
        "doc_id", "text"
    )
    lex = str(tmp_path / "lex")
    stats = str(tmp_path / "lex_stats")
    write_postings_index(docs, lex, stats, fingerprint=123)
    # real corpus tokens plus one absent term (its tf-0 filler-df path
    # must contribute exactly +0.0, like the scan form's idf*0) plus a
    # REPEATED term: the scan form adds one contribution per list
    # occurrence, so the postings form must too — not dedupe the sum
    terms = ["query", "window", "query", "merge", "customer", "zzz_absent_term"]
    scan = {
        r.doc_id: r.bm25
        for r in bm25_scores(docs, terms).collect()
        if r.bm25 != 0.0
    }
    post = {
        r.doc_id: r.bm25
        for r in bm25_postings_scores(
            spark, lex, stats, terms, id_col="doc_id"
        ).collect()
    }
    assert post  # the fixture matches some terms
    assert post == scan  # exact float equality, doc for doc


def test_hybrid_routes_through_postings_above_threshold(spark, tmp_path, monkeypatch):
    """Above the ANN threshold the hybrid BM25 leg must come from the
    posting-list layout (no corpus tokenize per question), and a fresh
    engine must REUSE the persisted layout via the stats fingerprint."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators import (
        ranking as rk,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        load_table,
    )

    path = str(tmp_path / "index")
    eng = RagEngine(spark, index_path=path, ann_threshold_rows=10)
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    assert eng.index_documents(docs) > 0
    q = "priority freight shipments delayed by clerk errors"
    rows = eng.retrieve(q, search_type="hybrid").collect()
    assert len(rows) == eng.k and eng._lex_built

    def boom(*a, **k):
        raise AssertionError("fresh engine rebuilt an already-built postings layout")

    monkeypatch.setattr(rk, "write_postings_index", boom)
    fresh = RagEngine(spark, index_path=path, ann_threshold_rows=10)
    got = fresh.retrieve(q, search_type="hybrid").collect()
    assert fresh._lex_built
    assert [(r.doc_id, r.chunk_id) for r in got] == [
        (r.doc_id, r.chunk_id) for r in rows
    ]


def test_fresh_engine_detects_equal_rowcount_corpus_rewrite(
    spark, tmp_path, monkeypatch
):
    """An external rewrite of index_path that PRESERVES the row count
    must still fail the reuse fingerprint: the corpus signature folds
    the index parquet's byte length and newest child mtime in beside
    the row count (ADVICE r7), so a fresh engine retrains instead of
    silently serving a stale IVF layout."""
    import shutil

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators import (
        similarity as sim,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        load_table,
    )

    path = str(tmp_path / "index")
    eng = RagEngine(spark, index_path=path, ann_threshold_rows=10)
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    assert eng.index_documents(docs) > 0
    q = "priority freight shipments delayed by clerk errors"
    eng.retrieve(q).collect()  # builds + persists the IVF layout

    # external same-rowcount rewrite: round-trip the index through a
    # staging dir (different file sizes/mtimes, identical row count)
    staged = str(tmp_path / "staged")
    spark.read.parquet(path).coalesce(1).write.parquet(staged)
    shutil.rmtree(path)
    shutil.move(staged, path)

    calls = []
    real_train = sim.train_centroids_sample

    def spy(*a, **k):
        calls.append(1)
        return real_train(*a, **k)

    monkeypatch.setattr(sim, "train_centroids_sample", spy)
    fresh = RagEngine(spark, index_path=path, ann_threshold_rows=10)
    got = fresh.retrieve(q).collect()
    assert calls, "fresh engine trusted a stale fingerprint after an equal-rowcount rewrite"
    assert fresh._ann_built and len(got) == fresh.k


def test_bounded_corpus_growth_appends_into_ivf_layout(
    spark, tmp_path, monkeypatch
):
    """Incremental IVF maintenance (round 8): a bounded append-only
    corpus growth must NOT retrain KMeans or rewrite the layout — the
    delta chunks are assigned under the existing codebook and appended
    into the cell partitions, and the appended content is immediately
    retrievable through the ANN route."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators import (
        similarity as sim,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        load_table,
    )

    path = str(tmp_path / "index")
    eng = RagEngine(spark, index_path=path, ann_threshold_rows=10)
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    assert eng.index_documents(docs.filter("doc_id % 10 != 0")) > 0
    eng.retrieve("priority freight shipments").collect()  # builds the layout

    def boom(*a, **k):
        raise AssertionError("bounded growth retrained/rewrote the IVF layout")

    assert eng.index_documents(docs.filter("doc_id % 10 = 0")) > 0  # ~11% growth
    monkeypatch.setattr(sim, "train_centroids_sample", boom)
    monkeypatch.setattr(sim, "write_ivf_index", boom)

    # pick a NEW doc's own chunk text as the query: its embedding is
    # the chunk's embedding, so the appended chunk must come back top-1
    new_chunk = (
        eng.index()
        .filter("doc_id % 10 = 0")
        .filter("chunk_id = 0")
        .select("doc_id", "text")
        .first()
    )
    got = eng.retrieve(new_chunk.text).collect()
    assert eng._ann_built
    assert got[0].doc_id == new_chunk.doc_id and got[0].chunk_id == 0

    # the layout now covers the whole corpus, no duplicates
    ivf_path, _ = eng._ann_paths()
    assert (
        spark.read.parquet(ivf_path).count() == eng.index().count()
    )
    # and a FRESH engine reuses the appended layout (fingerprint matches)
    fresh = RagEngine(spark, index_path=path, ann_threshold_rows=10)
    fresh.retrieve("delayed clerk errors").collect()
    assert fresh._ann_built
