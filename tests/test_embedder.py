from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.embedder import (
    EMBED_DIM,
    embed_text,
    embed_texts,
)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_dimension_and_dtype(text):
    v = embed_text(text)
    assert v.shape == (EMBED_DIM,)
    assert v.dtype == np.float32


@given(st.text(min_size=1, max_size=200).filter(lambda t: t.strip()))
@settings(max_examples=200, deadline=None)
def test_unit_norm(text):
    # signed feature hashing can cancel to the zero vector on tiny
    # adversarial inputs; otherwise the embedding is L2-normalized
    v = embed_text(text)
    norm = float(np.linalg.norm(v))
    assert norm == 0.0 or abs(norm - 1.0) < 1e-5


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_deterministic(text):
    assert np.array_equal(embed_text(text), embed_text(text))


def test_zero_for_empty():
    assert not embed_text("").any()
    assert not embed_text("   ").any()


def test_locality_smoke():
    a = embed_text("the quick brown fox jumps over the lazy dog")
    b = embed_text("the quick brown fox jumped over the lazy dog")
    c = embed_text("completely unrelated financial report totals")
    assert float(a @ b) > float(a @ c)


def test_configurable_dimension():
    v = embed_text("hello world", dim=1536)
    assert v.shape == (1536,)


def test_batch_matches_single():
    texts = ["alpha", "beta gamma", ""]
    batch = embed_texts(texts)
    for t, v in zip(texts, batch):
        assert np.array_equal(v, embed_text(t))
