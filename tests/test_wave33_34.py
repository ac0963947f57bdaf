"""Wave-33/34 unit tests: Python-recomputed ground truth — Poisson GOF
moments, the seeded permutation p-value, Jensen-Shannon terms, decile
transitions, the Cochran-Armitage z, Wilson bounds, max drawdown,
feature correlations, vocabulary richness, the weekend Welch t, and the
stopword-profile cosine. The DuckDB oracle parity for the same queries
runs in test_oracle_parity.py; these recompute the math independently
of BOTH engines."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date

import numpy as np
import pytest

import __spark_entry__ as E
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_measurement import (
    _LCG_A,
    _LCG_C,
    _LCG_M,
    _PERM_N,
    _PERM_STEP,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"
_Q = E.queries()


def test_poisson_gof_matches_numpy(spark):
    od = {r.o_orderkey for r in load_table(spark, "orders", SF).collect()}
    cnt = Counter(
        r.l_orderkey
        for r in load_table(spark, "lineitem", SF).collect()
        if r.l_orderkey in od
    )
    ks = [cnt.get(o, 0) for o in od]
    n, lam = float(len(ks)), float(sum(ks)) / len(ks)
    obs = Counter(min(k, 13) for k in ks)
    exp = {k: n * math.exp(-lam) * lam**k / math.factorial(k) for k in range(13)}
    exp[13] = n - sum(exp.values())
    chi2 = sum(
        (obs.get(k, 0) - exp[k]) ** 2 / exp[k] for k in range(14)
    )
    row = _Q["q_poisson_gof"](spark, SF).collect()[0]
    assert row.n_orders == len(ks)
    assert row.lambda_hat == pytest.approx(round(lam, 6), abs=1e-9)
    assert row.chi2 == pytest.approx(round(chi2, 4), abs=1e-3)
    assert row.n_bins == 14


def test_permutation_test_matches_python_lcg(spark):
    ev = load_table(spark, "events", SF).collect()
    spend = defaultdict(float)
    for r in ev:
        spend[r.user_id] += r.value if r.event_type == "purchase" else 0.0

    def stat(p):
        s = {0: 0.0, 1: 0.0}
        c = {0: 0, 1: 0}
        for u, y in spend.items():
            g = 0 if ((u + p * _PERM_STEP) * _LCG_A + _LCG_C) % _LCG_M < _LCG_M // 2 else 1
            s[g] += y
            c[g] += 1
        return round(abs(s[1] / c[1] - s[0] / c[0]), 4)

    d0 = stat(0)
    hits = sum(1 for p in range(1, _PERM_N + 1) if stat(p) >= d0)
    row = _Q["q_permutation_test"](spark, SF).collect()[0]
    assert row.n_users == len(spend)
    assert row.d_obs == pytest.approx(d0, abs=2e-4)
    assert row.p_value == pytest.approx(round((1 + hits) / (1 + _PERM_N), 4), abs=1e-6)


def test_js_drift_terms_match_counter(spark):
    ev = load_table(spark, "events", SF).collect()
    ts = [int(r.ts.timestamp()) for r in ev]
    cut = min(ts) + (max(ts) - min(ts)) // 2
    c0, c1 = Counter(), Counter()
    for r in ev:
        (c0 if int(r.ts.timestamp()) <= cut else c1)[r.event_type] += 1
    n0, n1 = sum(c0.values()), sum(c1.values())
    rows = {r.event_type: r for r in _Q["q_js_drift"](spark, SF).collect()}
    total = 0.0
    for t in set(c0) | set(c1):
        p0, p1 = c0.get(t, 0) / n0, c1.get(t, 0) / n1
        m = (p0 + p1) / 2
        term = 0.5 * (p0 * math.log(p0 / m) if p0 > 0 else 0.0) + 0.5 * (
            p1 * math.log(p1 / m) if p1 > 0 else 0.0
        )
        total += term
        assert rows[t].p0 == pytest.approx(round(p0, 6), abs=1e-9)
        assert rows[t].jsd_term == pytest.approx(round(term, 6), abs=1e-9)
    assert rows[next(iter(rows))].jsd_total == pytest.approx(
        round(total, 6), abs=1e-9
    )
    assert 0.0 <= total <= math.log(2) + 1e-12


def test_decile_transition_matches_sorted_ranks(spark):
    od = load_table(spark, "orders", SF).collect()
    rev = defaultdict(float)
    for r in od:
        rev[(r.o_orderdate.year, r.o_custkey)] += r.o_totalprice
    y1 = min(y for y, _ in rev)
    decs = {}
    for yr in (y1, y1 + 1):
        custs = sorted(
            ((round(v, 2), c) for (y, c), v in rev.items() if y == yr)
        )
        n = len(custs)
        for i, (_, c) in enumerate(custs):
            decs[(yr, c)] = int(10 * i / n) + 1
    want = Counter(
        (decs[(y1, c)], decs[(y1 + 1, c)])
        for (y, c) in rev
        if y == y1 and (y1 + 1, c) in decs
    )
    got = {
        (r.d_from, r.d_to): r.n_cust
        for r in _Q["q_decile_transition"](spark, SF).collect()
    }
    assert got == dict(want)


def test_trend_test_matches_closed_form(spark):
    li = load_table(spark, "lineitem", SF).collect()
    b = defaultdict(lambda: [0.0, 0.0])
    for r in li:
        k = int(round(r.l_discount * 100))
        b[k][0] += 1
        b[k][1] += 1 if r.l_returnflag == "R" else 0
    nn = sum(v[0] for v in b.values())
    pbar = sum(v[1] for v in b.values()) / nn
    sx = sum(k * v[0] for k, v in b.items())
    sxx = sum(k * k * v[0] for k, v in b.items())
    sxr = sum(k * v[1] for k, v in b.items())
    z = (sxr - pbar * sx) / math.sqrt(
        pbar * (1 - pbar) * (sxx - sx * sx / nn)
    )
    row = _Q["q_trend_test"](spark, SF).collect()[0]
    assert row.n_lines == int(nn)
    assert row.z_trend == pytest.approx(round(z, 4), abs=1e-3)


def test_wilson_screen_matches_closed_form(spark):
    li = load_table(spark, "lineitem", SF).collect()
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        agg[r.l_suppkey][0] += 1
        agg[r.l_suppkey][1] += 1 if r.l_returnflag == "R" else 0
    z = 1.96

    def wil(n, r):
        p = r / n
        return (
            p + z * z / (2 * n) - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        ) / (1 + z * z / n)

    ranked = sorted(
        ((round(wil(n, r), 6), s, n, r) for s, (n, r) in agg.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = _Q["q_return_rate_wilson"](spark, SF).collect()
    assert [(g.l_suppkey, g.wilson_lb) for g in got] == [
        (s, lb) for lb, s, _, _ in ranked
    ]


def test_max_drawdown_matches_running_peak(spark):
    ev = load_table(spark, "events", SF).collect()
    daily = defaultdict(float)
    for r in ev:
        daily[r.ts.date()] += r.value
    peak, best = -1.0, None
    for d in sorted(daily):
        v = round(daily[d], 4)
        peak = max(peak, v)
        dd = round((peak - v) / peak, 6)
        if best is None or dd > best[0]:
            best = (dd, d, peak, v)
    row = _Q["q_max_drawdown"](spark, SF).collect()[0]
    assert row.max_drawdown == pytest.approx(best[0], abs=1e-9)
    assert row.trough_day == best[1]


def test_feature_correlation_matches_numpy(spark):
    ev = load_table(spark, "events", SF).collect()
    feats = defaultdict(lambda: [0.0, 0.0, set(), 0.0])
    for r in ev:
        f = feats[r.user_id]
        f[0] += 1
        f[1] += r.value
        f[2].add(r.ts.date())
        f[3] += 1 if r.event_type == "purchase" else 0
    m = np.array(
        [[len(f[2]), f[0], f[3], f[1]] for f in feats.values()]
    )  # active_days, n_events, n_purchases, total_value
    names = ["active_days", "n_events", "n_purchases", "total_value"]
    c = np.corrcoef(m.T)
    got = {
        (r.f1, r.f2): r.pearson
        for r in _Q["q_feature_correlation"](spark, SF).collect()
    }
    for i, a in enumerate(names):
        for j in range(i + 1, len(names)):
            assert got[(a, names[j])] == pytest.approx(
                round(float(c[i, j]), 4), abs=1e-3
            ), (a, names[j])


def test_vocab_richness_matches_counter(spark):
    docs = load_table(spark, "documents", SF).collect()
    per = defaultdict(Counter)
    for r in docs:
        per[r.source].update(w for w in r.text.split(" ") if w)
    got = {r.source: r for r in _Q["q_vocab_richness"](spark, SF).collect()}
    for s, cnt in per.items():
        toks, types = sum(cnt.values()), len(cnt)
        hapax = sum(1 for v in cnt.values() if v == 1)
        g = got[s]
        assert (g.n_tokens, g.n_types, g.n_hapax) == (toks, types, hapax)
        assert g.ttr == pytest.approx(round(types / toks, 6), abs=1e-9)


def test_weekend_uplift_matches_welch(spark):
    ev = load_table(spark, "events", SF).collect()
    daily = defaultdict(float)
    for r in ev:
        daily[r.ts.date()] += r.value
    we = [round(v, 4) for d, v in daily.items() if d.isoweekday() >= 6]
    wd = [round(v, 4) for d, v in daily.items() if d.isoweekday() < 6]
    m1, m0 = np.mean(we), np.mean(wd)
    t = (m1 - m0) / math.sqrt(
        np.var(we, ddof=1) / len(we) + np.var(wd, ddof=1) / len(wd)
    )
    row = _Q["q_weekend_uplift"](spark, SF).collect()[0]
    assert (row.n_weekend_days, row.n_weekday_days) == (len(we), len(wd))
    assert row.welch_t == pytest.approx(round(t, 4), abs=1e-3)


def test_stopword_profile_matches_counter_cosine(spark):
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.text import (
        STOPWORDS,
    )

    stops = {w for ws in STOPWORDS.values() for w in ws}
    docs = load_table(spark, "documents", SF).collect()
    per = defaultdict(Counter)
    for r in docs:
        per[r.source].update(w for w in r.text.split(" ") if w in stops)
    vecs = {}
    for s, cnt in per.items():
        t = sum(cnt.values())
        vecs[s] = {w: c / t for w, c in cnt.items()}
    got = {
        (r.src_a, r.src_b): r.cosine
        for r in _Q["q_stopword_profile"](spark, SF).collect()
    }
    srcs = sorted(vecs)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            dot = sum(vecs[a][w] * vecs[b].get(w, 0.0) for w in vecs[a])
            na = math.sqrt(sum(v * v for v in vecs[a].values()))
            nb = math.sqrt(sum(v * v for v in vecs[b].values()))
            assert got[(a, b)] == pytest.approx(
                round(dot / (na / 1.0 * nb), 6), abs=1e-6
            ), (a, b)
