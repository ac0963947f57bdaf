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


# --- inverted-index jaccard: equivalence to the naive definition -----------


def _naive_jaccard_pairs(spark, rows):
    """Reference semantics in plain Python: all same-block pairs,
    Jaccard of distinct-bigram sets, emitted when intersection > 0."""
    import itertools

    def bigrams(text):
        toks = [t for t in text.lower().split() if t]
        return set(" ".join(p) for p in zip(toks, toks[1:]))

    by_id = {i: (blk, bigrams(t)) for i, blk, t in rows}
    out = {}
    for a, b in itertools.combinations(sorted(by_id), 2):
        blk_a, ga = by_id[a]
        blk_b, gb = by_id[b]
        if blk_a != blk_b:
            continue
        inter = len(ga & gb)
        if inter:
            out[(a, b)] = round(inter / len(ga | gb), 6)
    return out


def test_inverted_index_jaccard_matches_naive(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.dedup import (
        inverted_index_jaccard,
    )

    words = st.sampled_from("alpha beta gamma delta epsilon zeta".split())
    texts = st.lists(words, min_size=0, max_size=8).map(" ".join)
    corpora = st.lists(
        st.tuples(st.sampled_from(["en", "fr"]), texts), min_size=2, max_size=8
    )

    @settings(max_examples=15, deadline=None)
    @given(corpora)
    def check(corpus):
        rows = [(i, blk, t) for i, (blk, t) in enumerate(corpus)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        toked = df.select(
            "doc_id",
            "lang",
            F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "").alias("toks"),
        )
        grams = toked.select(
            "doc_id",
            "lang",
            F.array_distinct(
                F.zip_with(
                    F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                    F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                    lambda x, y: F.concat_ws(" ", x, y),
                )
            ).alias("bigrams"),
        )
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in inverted_index_jaccard(grams).filter(F.col("jaccard") > 0).collect()
        }
        assert got == _naive_jaccard_pairs(spark, rows)

    check()


def test_embedding_near_dup_all_pairs_needs_explicit_opt_in(spark):
    """The unbounded form is a quadratic cross join — it must refuse to
    plan unless the caller says allow_all_pairs=True (the 100 TB
    guard-rail), and with the opt-in it finds the planted duplicate."""
    import pytest

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.dedup import (
        embedding_near_dup,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),   # exact dup of 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    with pytest.raises(ValueError, match="all-pairs"):
        embedding_near_dup(df, threshold=0.9)
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup(df, threshold=0.9, allow_all_pairs=True).collect()
    }
    assert got == {(0, 1)}


def test_passjoin_candidates_match_naive_block_join(spark):
    """End-to-end equivalence on an adversarial corpus: verified PassJoin
    candidates must equal the naive block-nested-loop result exactly —
    mixed lengths (incl. below t+1 chars, exercising the short path),
    shared hot prefixes, and pairs straddling the ±t length window."""
    import random

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.dedup import (
        passjoin_candidates,
    )

    rng = random.Random(11)
    words = ["aa", "ab", "ba", "the", "of", "x"]
    rows = []
    for i in range(120):
        base = " ".join(rng.choices(words, k=rng.randint(0, 8)))[:40]
        rows.append((i, "en" if i % 3 else "fr", base))
        if i % 4 == 0:  # planted near-dup: one substitution
            mut = list(base)
            if mut:
                mut[rng.randrange(len(mut))] = "z"
            rows.append((1000 + i, "en" if i % 3 else "fr", "".join(mut)))
    keys = spark.createDataFrame(rows, "doc_id long, lang string, sig string")
    t = 4
    pred = lambda c: c % 2 == 0

    cands = passjoin_candidates(
        keys, t=t, probe_pred=pred, sig_col="sig", max_sig_len=40
    )
    sa = keys.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("_sa"))
    sb = keys.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("_sb"))
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", F.levenshtein("_sa", "_sb", t).alias("dist")
        )
        .filter(F.col("dist") >= 0)
        .collect()
    )

    a = keys.select(
        F.col("doc_id").alias("id_a"), F.col("lang").alias("_la"), F.col("sig").alias("_sa")
    ).filter(pred(F.col("id_a")))
    b = keys.select(
        F.col("doc_id").alias("id_b"), F.col("lang").alias("_lb"), F.col("sig").alias("_sb")
    )
    want = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in a.join(b, (F.col("_la") == F.col("_lb")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", F.levenshtein("_sa", "_sb", t).alias("dist"))
        .filter(F.col("dist") >= 0)
        .collect()
    )
    assert got == want and len(want) > 20
