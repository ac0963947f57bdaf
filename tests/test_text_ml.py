"""MLlib TF-IDF pipeline (X3)."""

from __future__ import annotations

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.text_ml import (
    DEFAULT_FEATURES,
    featurize,
    tfidf_pipeline,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"


def test_tfidf_shapes_and_determinism(spark):
    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    model = tfidf_pipeline(docs)
    out = featurize(model, docs)
    rows = out.select("doc_id", "tf", "tfidf").orderBy("doc_id").limit(5).collect()
    assert rows and all(r.tf.size == DEFAULT_FEATURES for r in rows)
    # IDF dampens but never negates
    assert all(min(r.tfidf.values, default=0.0) >= 0.0 for r in rows)
    # deterministic across a re-fit on identical input
    model2 = tfidf_pipeline(docs)
    rows2 = featurize(model2, docs).select("doc_id", "tfidf").orderBy("doc_id").limit(5).collect()
    assert [r.tfidf for r in rows2] == [r.tfidf for r in rows]


def test_tfidf_bigram_variant(spark):
    docs = load_table(spark, "documents", SF).select("doc_id", "text").limit(50)
    out = featurize(tfidf_pipeline(docs, with_bigrams=True), docs)
    assert out.select("tfidf").first().tfidf.size == DEFAULT_FEATURES
