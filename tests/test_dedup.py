"""Semantic tests for the dedup pipelines with planted duplicates —
the fixture corpus has no duplicate texts, so these build small corpora
with known dup structure and assert the pipelines find exactly it."""

from __future__ import annotations

from pyspark.sql import functions as F

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup,
    simhash_near_dup,
    simhash_values,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside "
    "as morning light fills the quiet street with gentle golden color"
)
NEAR = BASE.replace("golden", "amber").replace("quiet", "sleepy")
FAR = (
    "completely different text about financial quarterly reports and "
    "revenue projections for the engineering division next fiscal year "
    "including headcount plans and infrastructure budget estimates"
)


def _corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, "  " + BASE + "  "),  # whitespace-normalized dup of 0
        (3, NEAR),  # near dup of 0
        (4, FAR),
        (5, FAR.upper()),  # case-normalized dup of 4
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups_normalized_copies(spark):
    out = {r.rep_doc_id: r.n_copies for r in exact_dedup(_corpus(spark)).collect()}
    # 0,1,2 collapse (exact + whitespace), 4,5 collapse (case), 3 alone
    assert out == {0: 3, 3: 1, 4: 2}


def test_minhash_finds_near_dup_pair(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_dup(_corpus(spark), threshold=0.5).collect()
    }
    # the exact-dup pairs and the near-dup pair (0,3) must all surface
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 3) in pairs and 0.5 <= pairs[(0, 3)] < 1.0
    # unrelated docs never pair
    assert not any({a, b} & {4, 5} and {a, b} & {0, 1, 2, 3} for a, b in pairs)


def test_simhash_near_dup_pairs(spark):
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_dup(_corpus(spark), max_hamming=6).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 0  # identical token sets
    assert (0, 3) in pairs  # near dup within hamming budget
    far_keys = {k for k in pairs if {4, 5} & set(k) and {0, 1, 2, 3} & set(k)}
    assert not far_keys


def test_simhash_is_deterministic_and_tokenset_invariant(spark):
    df = _corpus(spark)
    vals = {r.doc_id: r.simhash for r in simhash_values(df).collect()}
    # doc 2 differs from doc 0 only by surrounding whitespace → same tokens
    assert vals[0] == vals[1] == vals[2]
    # case-folding makes 4 and 5 identical too
    assert vals[4] == vals[5]
    assert vals[0] != vals[4]
