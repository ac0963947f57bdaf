from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.chunker import (
    split_text_recursive,
)

TEXTISH = st.lists(
    st.sampled_from(["a", "b", "ab", " ", "\n", "\n\n"]), min_size=0, max_size=200
).map("".join)


@given(TEXTISH, st.integers(min_value=1, max_value=50))
@settings(max_examples=300, deadline=None)
def test_chunks_within_size(text, chunk_size):
    for chunk in split_text_recursive(text, chunk_size):
        assert 0 < len(chunk) <= chunk_size


@given(TEXTISH, st.integers(min_value=1, max_value=50))
@settings(max_examples=300, deadline=None)
def test_reconstruction_up_to_whitespace(text, chunk_size):
    chunks = split_text_recursive(text, chunk_size)
    # Concatenating chunks recovers the source text modulo whitespace
    # stripped at chunk boundaries.
    assert "".join(chunks).replace(" ", "").replace("\n", "") == text.replace(
        " ", ""
    ).replace("\n", "")


@given(TEXTISH, st.integers(min_value=1, max_value=50))
@settings(max_examples=100, deadline=None)
def test_deterministic(text, chunk_size):
    assert split_text_recursive(text, chunk_size) == split_text_recursive(
        text, chunk_size
    )


def test_empty_and_whitespace():
    assert split_text_recursive("") == []
    assert split_text_recursive("   \n\n  ", 10) == []


def test_prefers_paragraph_boundaries():
    text = "para one is here.\n\npara two is here.\n\npara three."
    chunks = split_text_recursive(text, 25)
    assert chunks == ["para one is here.", "para two is here.", "para three."]


def test_falls_back_to_words_then_chars():
    text = "alpha beta gamma delta"
    # separator chars count toward the budget: " gamma"+" delta" is 12 > 11
    assert split_text_recursive(text, 11) == ["alpha beta", "gamma", "delta"]
    assert split_text_recursive(text, 12) == ["alpha beta", "gamma delta"]
    # a single run longer than chunk_size splits per character
    assert split_text_recursive("abcdefgh", 3) == ["abc", "def", "gh"]


def test_merge_keeps_source_order():
    text = "a\nb\nc\nd"
    assert split_text_recursive(text, 3) == ["a\nb", "c", "d"]
    assert split_text_recursive(text, 4) == ["a\nb", "c\nd"]


def test_reference_default_chunk_size():
    # chunk_size=1000 default mirrors /root/reference/AI.py:209
    long_text = ("word " * 400).strip()  # 1999 chars
    chunks = split_text_recursive(long_text)
    assert all(len(c) <= 1000 for c in chunks)
    assert len(chunks) == 2
