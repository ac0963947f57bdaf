"""Wave-39 unit tests: Python-recomputed ground truth — Woolf odds-ratio
CIs, the TOST two-one-sided walk, Katz 3-hop walk counts, the bounded
k-core peel, series peak detection, and probability-weighted-moment
L-ratios. DuckDB oracle parity for the same queries runs in
test_oracle_parity.py; these recompute the math independently of BOTH
engines."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

import __spark_entry__ as E
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"
_Q = E.queries()


def test_odds_ratio_matches_woolf(spark):
    li = load_table(spark, "lineitem", SF).collect()
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for r in li:
        e = r.l_discount >= 0.05
        o = r.l_returnflag == "R"
        i = 0 if (e and o) else 1 if (e and not o) else 2 if o else 3
        cells[r.l_linestatus][i] += 1
    rows = {r.stratum: r for r in _Q["q_odds_ratio"](spark, SF).collect()}
    for st, (a, b, c, d) in cells.items():
        orr = (a * float(d)) / (b * float(c))
        se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
        lo, hi = math.exp(math.log(orr) - 1.96 * se), math.exp(
            math.log(orr) + 1.96 * se
        )
        r = rows[st]
        assert (r.a, r.b, r.c, r.d) == (a, b, c, d)
        assert r.odds_ratio == pytest.approx(round(orr, 6), abs=1e-6)
        assert r.ci_lo == pytest.approx(round(lo, 6), abs=1e-6)
        assert r.ci_hi == pytest.approx(round(hi, 6), abs=1e-6)
        assert r.significant_5pct == (1 if (lo > 1.0 or hi < 1.0) else 0)


def test_tost_matches_two_one_sided(spark):
    o = load_table(spark, "orders", SF).collect()
    we, wd = [], []
    for r in o:
        (we if r.o_orderdate.date().isoweekday() in (6, 7) else wd).append(
            r.o_totalprice
        )
    m1, m2 = sum(we) / len(we), sum(wd) / len(wd)
    v1 = sum(x * x for x in we) / len(we) - m1 * m1
    v2 = sum(x * x for x in wd) / len(wd) - m2 * m2
    diff, margin = m1 - m2, m2 * 0.05
    se = math.sqrt(v1 / len(we) + v2 / len(wd))
    t_lo, t_hi = (diff + margin) / se, (diff - margin) / se
    row = _Q["q_tost_equivalence"](spark, SF).collect()[0]
    assert (row.n_weekend, row.n_weekday) == (len(we), len(wd))
    assert row.mean_diff == pytest.approx(round(diff, 4), abs=1e-3)
    assert row.t_lower == pytest.approx(round(t_lo, 4), abs=1e-3)
    assert row.t_upper == pytest.approx(round(t_hi, 4), abs=1e-3)
    assert row.equivalent_5pct == (
        1 if (t_lo > 1.6449 and t_hi < -1.6449) else 0
    )


def _sym_edges(spark):
    li = [
        (r.l_orderkey, r.l_partkey)
        for r in load_table(spark, "lineitem", SF).collect()
        if r.l_orderkey % 20 == 0
    ]
    by_order = defaultdict(set)
    for ok, pk in li:
        by_order[ok].add(pk)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    return [(a, b) for a, b in edges] + [(b, a) for a, b in edges]


def test_katz_matches_walk_counts(spark):
    sym = _sym_edges(spark)
    adj = defaultdict(list)
    for a, b in sym:
        adj[a].append(b)
    h1 = {v: len(ns) for v, ns in adj.items()}
    h2 = {v: sum(h1[b] for b in ns) for v, ns in adj.items()}
    h3 = {v: sum(h2[b] for b in ns) for v, ns in adj.items()}
    a = 0.05
    scores = {v: a * (h1[v] + a * (h2[v] + a * h3[v])) for v in adj}
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = _Q["q_katz_centrality"](spark, SF).collect()
    assert [r.part for r in got] == [v for v, _ in top]
    for r in got:
        assert (r.walks_1, r.walks_2, r.walks_3) == (
            h1[r.part],
            h2[r.part],
            h3[r.part],
        )
        assert r.katz == pytest.approx(round(scores[r.part], 6), abs=1e-9)


def test_kcore_matches_peel_loop(spark):
    sym = set(_sym_edges(spark))
    for _ in range(6):
        deg = Counter(a for a, _ in sym)
        keep = {v for v, d in deg.items() if d >= 3}
        sym = {(a, b) for a, b in sym if a in keep and b in keep}
    deg = Counter(a for a, _ in sym)
    row = _Q["q_kcore_peel"](spark, SF).collect()[0]
    assert row.n_core_vertices == len(deg)
    assert row.n_core_edges == sum(deg.values()) // 2
    if deg:
        assert (row.min_degree, row.max_degree) == (
            min(deg.values()),
            max(deg.values()),
        )


def test_peak_detection_matches_loop(spark):
    daily = defaultdict(float)
    for r in load_table(spark, "orders", SF).collect():
        daily[r.o_orderdate.date()] += r.o_totalprice
    days = sorted(daily)
    rev = [round(daily[d], 4) for d in days]
    peaks = []
    for i in range(3, len(rev) - 3):
        nb = rev[i - 3 : i] + rev[i + 1 : i + 4]
        if rev[i] > max(nb):
            peaks.append((days[i], rev[i], round(rev[i] - max(nb), 4)))
    top = sorted(peaks, key=lambda p: (-p[1], p[0]))[:10]
    got = [
        (r.peak_day, r.rev, r.prominence)
        for r in _Q["q_peak_detection"](spark, SF).collect()
    ]
    assert got == top


def test_l_moments_match_pwm(spark):
    xs = sorted(
        r.o_totalprice for r in load_table(spark, "orders", SF).collect()
    )
    n = len(xs)
    b0 = sum(xs) / n
    b1 = sum(x * (i) / (n - 1.0) for i, x in enumerate(xs)) / n
    b2 = (
        sum(x * i * (i - 1) / ((n - 1.0) * (n - 2.0)) for i, x in enumerate(xs))
        / n
    )
    b3 = (
        sum(
            x * i * (i - 1) * (i - 2) / ((n - 1.0) * (n - 2.0) * (n - 3.0))
            for i, x in enumerate(xs)
        )
        / n
    )
    l1, l2 = b0, 2 * b1 - b0
    l3, l4 = 6 * b2 - 6 * b1 + b0, 20 * b3 - 30 * b2 + 12 * b1 - b0
    row = _Q["q_l_moments"](spark, SF).collect()[0]
    assert row.n == n
    assert row.l1 == pytest.approx(round(l1, 4), abs=1e-3)
    assert row.l2 == pytest.approx(round(l2, 4), abs=1e-3)
    assert row.l_cv == pytest.approx(round(l2 / l1, 6), abs=1e-6)
    assert row.l_skew == pytest.approx(round(l3 / l2, 6), abs=1e-6)
    assert row.l_kurt == pytest.approx(round(l4 / l2, 6), abs=1e-6)
