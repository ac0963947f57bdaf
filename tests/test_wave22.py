"""Wave-22 unit tests: Python-recomputed ground truth — PMI from the
textbook marginal formula, common neighbors from set intersections
over a replayed hub-capped bipartite graph, and phrase search from a
naive substring-of-token-list scan."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_graphstats import (
    _CN_MAX_DEG,
    _CN_ORDER_MOD,
    _CN_TOPK,
    q_common_neighbors,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_retrieval import (
    _PHRASE,
    q_phrase_search,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_text import (
    _PMI_MIN_COUNT,
    _PMI_TOPK,
    q_pmi_collocations,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def test_pmi_matches_marginal_formula(spark):
    docs = load_table(spark, "documents", SF_DIR).collect()
    uni, bg = defaultdict(int), defaultdict(int)
    n1 = n2 = 0
    for r in docs:
        t = r.text.split(" ")
        for w in t:
            if w:
                uni[w] += 1
                n1 += 1
        n2 += max(len(t) - 1, 0)
        for a, b in zip(t, t[1:]):
            bg[(a, b)] += 1
    scored = []
    for (a, b), cxy in bg.items():
        if cxy >= _PMI_MIN_COUNT:
            pmi = round(
                math.log(cxy)
                + 2 * math.log(n1)
                - math.log(n2)
                - math.log(uni[a])
                - math.log(uni[b]),
                4,
            )
            scored.append((-pmi, f"{a} {b}", cxy, uni[a], uni[b]))
    scored.sort()
    out = q_pmi_collocations(spark, SF_DIR).collect()
    assert len(out) == min(_PMI_TOPK, len(scored))
    for got, (npmi, bigram, cxy, cx, cy) in zip(out, scored):
        assert got.bigram == bigram
        assert got.cxy == cxy
        assert (got.cx, got.cy) == (cx, cy)
        assert got.pmi == pytest.approx(-npmi, abs=1e-4)


def test_common_neighbors_matches_set_intersections(spark):
    orders = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, "orders", SF_DIR).collect()
        if r.o_orderkey % _CN_ORDER_MOD == 0
    }
    edges = set()
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        if r.l_orderkey in orders:
            edges.add((orders[r.l_orderkey], r.l_partkey))
    by_part = defaultdict(set)
    for c, p in edges:
        by_part[p].add(c)
    by_cust = defaultdict(set)
    for p, cs in by_part.items():
        if len(cs) <= _CN_MAX_DEG:
            for c in cs:
                by_cust[c].add(p)
    pairs = defaultdict(int)
    for p, cs in by_part.items():
        if len(cs) <= _CN_MAX_DEG:
            cl = sorted(cs)
            for i, a in enumerate(cl):
                for b in cl[i + 1 :]:
                    pairs[(a, b)] += 1
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:_CN_TOPK]
    out = q_common_neighbors(spark, SF_DIR).collect()
    assert [(r.ca, r.cb) for r in out] == [k for k, _ in ranked]
    for r, ((a, b), common) in zip(out, ranked):
        assert r.common == common
        union = len(by_cust[a]) + len(by_cust[b]) - common
        assert r.jaccard == pytest.approx(common / union, abs=1e-4)
        assert common == len(by_cust[a] & by_cust[b])


def test_phrase_search_matches_naive_scan(spark):
    docs = load_table(spark, "documents", SF_DIR).collect()
    expected = {}
    for r in docs:
        t = r.text.split(" ")
        pos = [
            i + 1
            for i in range(len(t) - 2)
            if (t[i], t[i + 1], t[i + 2]) == _PHRASE
        ]
        if pos:
            expected[r.doc_id] = (len(pos), pos[0], len(t))
    got = {
        r.doc_id: (r.n_matches, r.first_pos, r.n_tokens)
        for r in q_phrase_search(spark, SF_DIR).collect()
    }
    assert got == expected
    assert got, "the fixture phrase must occur at sf0.01"
