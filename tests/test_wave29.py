"""Wave-29 unit tests: Python-recomputed ground truth — bigram
first-occurrence novelty, per-dimension moments, and the lang-ID
confusion identity against q_lang_id's own predictions.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.tokenize import (
    py_toks,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_hygiene import (
    q_embedding_dims_audit,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_text import (
    q_lang_confusion,
    q_lang_id,
    q_ngram_novelty,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def test_ngram_novelty_matches_first_occurrence_replay(spark):
    per_doc = {}
    for r in load_table(spark, "documents", SF_DIR).collect():
        toks = py_toks(r.text)
        bigs = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
        if bigs:
            per_doc[r.doc_id] = bigs
    first = {}
    for d in sorted(per_doc):
        for b in per_doc[d]:
            first.setdefault(b, d)
    got = {r.doc_id: r for r in q_ngram_novelty(spark, SF_DIR).collect()}
    assert set(got) == set(per_doc)
    for d, bigs in per_doc.items():
        novel = sum(1 for b in bigs if first[b] == d)
        assert got[d].n_bigrams == len(bigs)
        assert got[d].novel_share == pytest.approx(novel / len(bigs), abs=1e-4)
    # the earliest document is 100% novel by construction
    assert got[min(per_doc)].novel_share == 1.0


def test_lang_confusion_matches_lang_id_predictions(spark):
    preds = Counter(
        (r.labeled_lang, r.pred_lang)
        for r in q_lang_id(spark, SF_DIR).collect()
    )
    got = {
        (r.labeled_lang, r.pred_lang): r.n_docs
        for r in q_lang_confusion(spark, SF_DIR).collect()
    }
    assert got == dict(preds)
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert sum(got.values()) == n_docs  # every document lands in a cell


def test_embedding_dims_audit_matches_numpy(spark):
    mat = np.array(
        [
            [float(x) for x in r.embedding]
            for r in load_table(spark, "embeddings", SF_DIR).collect()
        ]
    )
    got = {r.dim: r for r in q_embedding_dims_audit(spark, SF_DIR).collect()}
    assert set(got) == set(range(1, mat.shape[1] + 1))
    for d in range(mat.shape[1]):
        g = got[d + 1]
        assert g.mean_x == pytest.approx(mat[:, d].mean(), abs=1e-4)
        assert g.std_x == pytest.approx(mat[:, d].std(ddof=1), abs=1e-4)
        assert g.is_dead == (1 if mat[:, d].std(ddof=1) < 0.001 else 0)
