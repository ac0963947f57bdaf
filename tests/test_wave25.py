"""Wave-25 unit tests: Python-recomputed ground truth — CUPED from a
numpy covariance replay, cohort LTV and Pareto shares from dict
rollups, decayed popularity from a per-row replay, and source KL from
a contingency replay.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_frequency import (
    _DECAY_HALF_LIFE_DAYS,
    _DECAY_REF,
    q_decay_popularity,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_hygiene import (
    q_source_kl,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_measurement import (
    _CUPED_SPLIT,
    _LCG_A,
    _LCG_C,
    _LCG_M,
    q_cuped,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_warehouse import (
    q_cohort_ltv,
    q_pareto_concentration,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def test_cuped_matches_numpy_replay(spark):
    from datetime import datetime

    split = datetime.fromisoformat(_CUPED_SPLIT)
    per = defaultdict(lambda: [0.0, 0.0])
    for r in load_table(spark, "events", SF_DIR).collect():
        per[r.user_id][0 if r.ts < split else 1] += r.value
    uids = sorted(per)
    pre = np.array([per[u][0] for u in uids])
    post = np.array([per[u][1] for u in uids])
    variant = np.array(
        [0 if (u * _LCG_A + _LCG_C) % _LCG_M < _LCG_M // 2 else 1 for u in uids]
    )
    theta = float(np.cov(pre, post, ddof=1)[0, 1] / np.var(pre, ddof=1))
    cuped = post - theta * (pre - pre.mean())
    got = q_cuped(spark, SF_DIR).collect()[0]
    assert (got.n_a, got.n_b) == (int((variant == 0).sum()), int((variant == 1).sum()))
    assert got.theta == pytest.approx(theta, abs=1e-5)
    assert got.lift_raw == pytest.approx(
        post[variant == 1].mean() - post[variant == 0].mean(), abs=1e-4
    )
    assert got.lift_cuped == pytest.approx(
        cuped[variant == 1].mean() - cuped[variant == 0].mean(), abs=1e-4
    )
    want_vr = (1 - np.var(cuped, ddof=1) / np.var(post, ddof=1)) * 100
    assert got.var_reduction_pct == pytest.approx(want_vr, abs=0.011)
    # CUPED must not move the true effect, only the noise
    assert want_vr > 0  # pre-period engagement predicts post-period


def test_cohort_ltv_matches_rollup(spark):
    first = {}
    yearly = defaultdict(float)
    for r in load_table(spark, "orders", SF_DIR).collect():
        y = r.o_orderdate.year
        first[r.o_custkey] = min(first.get(r.o_custkey, y), y)
        yearly[(r.o_custkey, y)] += r.o_totalprice
    size = Counter(first.values())
    rev = defaultdict(float)
    for (c, y), v in yearly.items():
        rev[(first[c], y - first[c])] += v
    got = {(r.cohort, r.age): r for r in q_cohort_ltv(spark, SF_DIR).collect()}
    assert set(got) == set(rev)
    for cohort in size:
        cum = 0.0
        for age in sorted(a for (co, a) in rev if co == cohort):
            cum += rev[(cohort, age)]
            g = got[(cohort, age)]
            assert g.n_customers == size[cohort]
            assert g.cum_rev_per_customer == pytest.approx(
                cum / size[cohort], abs=0.011
            )


def test_pareto_concentration_matches_sorted_replay(spark):
    cust = defaultdict(float)
    for r in load_table(spark, "orders", SF_DIR).collect():
        cust[r.o_custkey] += r.o_totalprice
    ordered = sorted(cust.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ordered)
    total = sum(cust.values())
    per_dec = defaultdict(lambda: [0, 0.0])
    for rnk0, (_, rev) in enumerate(ordered):
        d = rnk0 * 10 // n
        per_dec[d][0] += 1
        per_dec[d][1] += rev
    got = {r.decile: r for r in q_pareto_concentration(spark, SF_DIR).collect()}
    assert set(got) == set(per_dec)
    cum = 0.0
    for d in sorted(per_dec):
        nn, rv = per_dec[d]
        cum += rv
        assert got[d].n_customers == nn
        assert got[d].rev_share == pytest.approx(rv / total, abs=1e-4)
        assert got[d].cum_share == pytest.approx(cum / total, abs=1e-4)
    # the curve must actually be concentrated: top decile > uniform share
    assert got[0].rev_share > 0.1


def test_decay_popularity_matches_replay(spark):
    from datetime import date

    ref = date.fromisoformat(_DECAY_REF)
    score = defaultdict(float)
    ships = Counter()
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        age = (ref - r.l_shipdate.date()).days
        score[r.l_partkey] += r.l_quantity * 0.5 ** (age / _DECAY_HALF_LIFE_DAYS)
        ships[r.l_partkey] += 1
    want = sorted(
        ((round(s, 4), p) for p, s in score.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = q_decay_popularity(spark, SF_DIR).collect()
    assert [(r.decayed_qty, r.l_partkey, r.n_ships) for r in got] == [
        (pytest.approx(s, abs=1e-4), p, ships[p]) for s, p in want
    ]


def test_source_kl_matches_contingency_replay(spark):
    cells = Counter()
    for r in load_table(spark, "documents", SF_DIR).collect():
        cells[(r.source, r.lang)] += 1
    st = Counter()
    lt = Counter()
    for (s, l), n in cells.items():
        st[s] += n
        lt[l] += n
    total = sum(cells.values())
    got = {r.source: r for r in q_source_kl(spark, SF_DIR).collect()}
    assert set(got) == set(st)
    for s in st:
        kl = sum(
            (n / st[s]) * math.log((n / st[s]) / (lt[l] / total))
            for (src, l), n in cells.items()
            if src == s
        )
        assert got[s].n_docs == st[s]
        assert got[s].kl == pytest.approx(kl, abs=1e-5)
        assert got[s].kl >= -1e-9  # KL is non-negative
