"""Wave-20 unit tests: Python-recomputed ground truth — Kaplan-Meier
from the textbook product over a replayed risk set, Theil-Sen from the
full pairwise slope list, the expectation audit from direct counting,
exposure Gini from the sorted-rank identity over the full catalog,
feature hashing from a hashlib replay, and UCB1 from the formula."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.tokenize import (
    py_toks,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_governance import (
    q_expectation_audit,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_measurement import (
    q_theil_sen,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_mlops import (
    _UCB_REWARD,
    q_ucb_bandit,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_retrieval import (
    _RM_K,
    _RM_PANEL,
    q_rec_exposure,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_temporal import (
    q_survival_km,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_trainset import (
    _FH_DIM,
    _FH_P,
    q_feature_hashing,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def test_survival_km_matches_textbook_product(spark):
    rows = load_table(spark, "events", SF_DIR).collect()
    origin, conv, last = {}, {}, {}
    for r in rows:
        d = r.ts.date()
        u = r.user_id
        origin[u] = d if u not in origin or d < origin[u] else origin[u]
        last[u] = d if u not in last or d > last[u] else last[u]
        if r.event_type == "purchase":
            conv[u] = d if u not in conv or d < conv[u] else conv[u]
    end = max(last.values())
    subjects = [
        ((conv[u] - origin[u]).days, 1)
        if u in conv
        else ((end - origin[u]).days, 0)
        for u in origin
    ]
    out = q_survival_km(spark, SF_DIR).collect()
    assert out, "conversion KM must produce death-time rows"
    surv = 1.0
    expected = []
    for t in sorted({t for t, c in subjects if c}):
        n_risk = sum(1 for ot, _ in subjects if ot >= t)
        d_t = sum(1 for ot, c in subjects if ot == t and c)
        surv *= 1.0 - d_t / n_risk if n_risk > d_t else 0.0
        expected.append((t, n_risk, d_t, surv))
    assert [(r.t_days, r.n_at_risk, r.n_converted) for r in out] == [
        e[:3] for e in expected
    ]
    for got, exp in zip(out, expected):
        assert got.survival == pytest.approx(exp[3], abs=1e-4)
    # survival is monotone non-increasing from 1
    vals = [r.survival for r in out]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_theil_sen_matches_pairwise_median(spark):
    rows = load_table(spark, "events", SF_DIR).collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r.event_type][r.ts.date()] += 1
    out = {r.event_type: r for r in q_theil_sen(spark, SF_DIR).collect()}
    for et, series in daily.items():
        days = sorted(series)
        slopes = sorted(
            round((series[d2] - series[d1]) / (d2 - d1).days, 6)
            for i, d1 in enumerate(days)
            for d2 in days[i + 1 :]
        )
        med = slopes[math.ceil(0.5 * len(slopes)) - 1]
        got = out[et]
        assert got.n_pairs == len(slopes)
        assert got.slope_per_day == pytest.approx(med, abs=1e-9)
        assert got.direction == ("up" if med > 0 else "down" if med < 0 else "flat")


def test_expectation_audit_matches_direct_counts(spark):
    orders = load_table(spark, "orders", SF_DIR).collect()
    cust = {r.c_custkey for r in load_table(spark, "customer", SF_DIR).collect()}
    n = len(orders)
    expected = {
        "orderkey_unique": n - len({r.o_orderkey for r in orders}),
        "custkey_referential": sum(1 for r in orders if r.o_custkey not in cust),
        "totalprice_positive": sum(
            1 for r in orders if r.o_totalprice is None or r.o_totalprice <= 0
        ),
        "status_in_domain": sum(
            1 for r in orders if r.o_orderstatus not in ("O", "F", "P")
        ),
        "orderdate_bounded": sum(
            1
            for r in orders
            if r.o_orderdate is None
            or not (1990 <= r.o_orderdate.year <= 2005)
        ),
    }
    out = {r.expectation: r for r in q_expectation_audit(spark, SF_DIR).collect()}
    assert set(out) == set(expected)
    for name, v in expected.items():
        assert out[name].n_rows == n
        assert out[name].n_violations == v
        assert out[name].passed == int(v == 0)


def test_rec_exposure_matches_rank_identity(spark):
    rows = load_table(spark, "embeddings", SF_DIR).collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    probe_ids = sorted(vecs)[:_RM_PANEL]

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return round(dot / math.sqrt(na * nb), 6)

    counts = defaultdict(int)
    for qid in probe_ids:
        top = sorted(
            ((-cos(vecs[v], vecs[qid]), v) for v in vecs if v != qid)
        )[:_RM_K]
        for _, v in top:
            counts[v] += 1
    n = len(vecs)
    total = sum(counts.values())
    # rank ALL items by (count, vec_id); zero-count items rank first
    ranked = sorted(vecs, key=lambda v: (counts.get(v, 0), v))
    num = sum(
        (2 * (i + 1) - n - 1) * counts.get(v, 0) for i, v in enumerate(ranked)
    )
    out = q_rec_exposure(spark, SF_DIR).collect()[0]
    assert out.n_items == n
    assert out.n_recommended == len(counts)
    assert out.coverage == pytest.approx(len(counts) / n, abs=1e-5)
    assert out.gini == pytest.approx(num / (n * total), abs=1e-5)
    assert 0.0 <= out.gini <= 1.0


def test_feature_hashing_matches_hashlib_replay(spark):
    docs = load_table(spark, "documents", SF_DIR).collect()
    expected = defaultdict(int)
    for r in docs:
        for tok in py_toks(r.text):
            h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % _FH_P
            expected[(r.doc_id, h % _FH_DIM)] += 1 - 2 * ((h // _FH_DIM) % 2)
    expected = {k: v for k, v in expected.items() if v != 0}
    got = {
        (r.doc_id, r.bucket): r.val
        for r in q_feature_hashing(spark, SF_DIR).collect()
    }
    assert got == expected


def test_ucb_bandit_matches_formula(spark):
    rows = load_table(spark, "events", SF_DIR).collect()
    pulls = defaultdict(lambda: [0, 0])
    for r in rows:
        s = pulls[r.event_type]
        s[0] += 1
        s[1] += int(r.value >= _UCB_REWARD)
    n = sum(s[0] for s in pulls.values())
    out = {r.arm: r for r in q_ucb_bandit(spark, SF_DIR).collect()}
    ucbs = {}
    for arm, (np_, nr) in pulls.items():
        ucb = round(nr / np_ + math.sqrt(2 * math.log(n) / np_), 5)
        ucbs[arm] = ucb
        assert out[arm].n_pulls == np_
        assert out[arm].n_rewards == nr
        assert out[arm].mean_reward == pytest.approx(nr / np_, abs=1e-4)
        assert out[arm].ucb == pytest.approx(ucb, abs=1e-4)
    best = min(a for a, u in ucbs.items() if u == max(ucbs.values()))
    for arm in pulls:
        assert out[arm].chosen == int(arm == best)
