"""Wave-41 unit tests: Python-recomputed ground truth — Bland-Altman
limits of agreement, Cochran's Q over over-indexed event types, monthly
net/gross revenue retention, bounded min-label propagation, and
multi-class precision/recall/F1. DuckDB oracle parity for the same
queries runs in test_oracle_parity.py; these recompute the math
independently of BOTH engines."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest

import __spark_entry__ as E
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.text import (
    LANG_PRIORITY,
    STOPWORDS,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"
_Q = E.queries()

_WS = re.compile(r"[ \t\n\f\r]+")


def _cents(x: float) -> int:
    return int(round(x * 100))


def test_bland_altman_matches_recomputed_limits(spark):
    line = defaultdict(int)
    for r in load_table(spark, "lineitem", SF).collect():
        line[r.l_orderkey] += _cents(r.l_extendedprice)
    diffs = [
        _cents(r.o_totalprice) - line[r.o_orderkey]
        for r in load_table(spark, "orders", SF).collect()
        if r.o_orderkey in line
    ]
    n = len(diffs)
    s1, s2 = sum(diffs), sum(d * d for d in diffs)
    mean = s1 / n
    sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
    lo, hi = mean - 1.96 * sd, mean + 1.96 * sd
    outside = sum(1 for d in diffs if d < lo or d > hi)
    row = _Q["q_bland_altman"](spark, SF).collect()[0]
    assert row.n_pairs == n
    assert row.mean_diff_cents == pytest.approx(round(mean, 6), abs=1e-6)
    assert row.sd_cents == pytest.approx(round(sd, 6), abs=1e-6)
    assert row.lo_limit == pytest.approx(round(lo, 6), abs=1e-6)
    assert row.hi_limit == pytest.approx(round(hi, 6), abs=1e-6)
    assert row.n_outside == outside
    assert row.outside_share == pytest.approx(round(outside / n, 6), abs=1e-6)


def test_cochran_q_matches_closed_form(spark):
    types = ("click", "error", "purchase", "signup", "view")
    per_user = defaultdict(Counter)
    for r in load_table(spark, "events", SF).collect():
        if r.event_type in types:
            per_user[r.user_id][r.event_type] += 1
    flags = {
        u: [1 if 5 * c[t] > sum(c.values()) else 0 for t in types]
        for u, c in per_user.items()
    }
    g = [sum(f[j] for f in flags.values()) for j in range(5)]
    ls = [sum(f) for f in flags.values()]
    t, sum_l2 = sum(ls), sum(x * x for x in ls)
    denom = 5 * t - sum_l2
    q = 0.0 if denom == 0 else 4.0 * (5 * sum(x * x for x in g) - t * t) / denom
    row = _Q["q_cochran_q"](spark, SF).collect()[0]
    assert row.n_users == len(flags)
    assert [
        row.g_click,
        row.g_error,
        row.g_purchase,
        row.g_signup,
        row.g_view,
    ] == g
    assert row.grand_total == t and row.sum_l2 == sum_l2
    assert row.q_stat == pytest.approx(round(q, 6), abs=1e-6)
    assert row.df == 4
    assert row.reject_5pct == (1 if round(q, 6) > 9.487729 else 0)


def test_revenue_retention_matches_cohort_math(spark):
    cm = defaultdict(int)
    for r in load_table(spark, "orders", SF).collect():
        d = r.o_orderdate.date() if hasattr(r.o_orderdate, "date") else r.o_orderdate
        cm[(r.o_custkey, d.replace(day=1))] += _cents(r.o_totalprice)
    months = sorted({m for _, m in cm})
    nxt = lambda m: (m.replace(year=m.year + 1, month=1)  # noqa: E731
                     if m.month == 12 else m.replace(month=m.month + 1))
    rows = {r.m: r for r in _Q["q_revenue_retention"](spark, SF).collect()}
    assert set(rows) == {nxt(m) for m in months}
    for m in months:
        prev = {c: v for (c, mm), v in cm.items() if mm == m}
        cur = {c: v for (c, mm), v in cm.items() if mm == nxt(m)}
        base = sum(prev.values())
        retained = sum(cur[c] for c in prev if c in cur)
        gross = sum(min(prev[c], cur[c]) for c in prev if c in cur)
        r = rows[nxt(m)]
        assert r.n_prev_cust == len(prev)
        assert r.n_retained == sum(1 for c in prev if c in cur)
        assert (r.base_cents, r.retained_cents, r.gross_cents) == (
            base,
            retained,
            gross,
        )
        assert r.nrr == pytest.approx(round(retained / base, 6), abs=1e-6)
        assert r.grr == pytest.approx(round(gross / base, 6), abs=1e-6)


def _copurchase_adj(spark):
    orders = defaultdict(set)
    for r in load_table(spark, "lineitem", SF).collect():
        if r.l_orderkey % 20 == 0:
            orders[r.l_orderkey].add(r.l_partkey)
    adj = defaultdict(set)
    for parts in orders.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                adj[a].add(b)
                adj[b].add(a)
    return adj


def test_label_propagation_trace_matches_simulation(spark):
    adj = _copurchase_adj(spark)
    labels = {v: v for v in adj}
    expected = [(0, 0, len(set(labels.values())), sum(labels.values()))]
    for t in (1, 2, 3):
        new = {
            v: min([labels[v]] + [labels[u] for u in adj[v]]) for v in adj
        }
        changed = sum(1 for v in adj if new[v] != labels[v])
        labels = new
        expected.append(
            (t, changed, len(set(labels.values())), sum(labels.values()))
        )
    rows = [
        (r.round, r.n_changed, r.n_labels, r.label_sum)
        for r in _Q["q_label_propagation"](spark, SF).collect()
    ]
    assert rows == expected
    # monotone: labels can only coarsen
    assert all(rows[i][2] >= rows[i + 1][2] for i in range(3))


def _py_lang_pred(text: str) -> str:
    toks = set(t for t in _WS.split(text.lower()) if t)
    s = {l: len(toks & set(STOPWORDS[l])) for l in LANG_PRIORITY}
    if max(s.values()) == 0:
        return "unknown"
    for i, lang in enumerate(LANG_PRIORITY[:-1]):
        if s[lang] >= max(s[o] for o in LANG_PRIORITY[i + 1 :]):
            return lang
    return LANG_PRIORITY[-1]


def test_multiclass_f1_matches_confusion_math(spark):
    pairs = [
        (r.lang, _py_lang_pred(r.text))
        for r in load_table(spark, "documents", SF).collect()
    ]
    n_true = Counter(y for y, _ in pairs)
    n_pred = Counter(p for _, p in pairs)
    tp = Counter(y for y, p in pairs if y == p)
    rows = {r.lang: r for r in _Q["q_multiclass_f1"](spark, SF).collect()}
    assert set(rows) == set(n_true) | {"__macro__"}
    per_class = []
    for y in n_true:
        npred = n_pred.get(y, 0)
        prec = round(tp[y] / npred, 6) if npred else 0.0
        rec = round(tp[y] / n_true[y], 6)
        f1 = round(2 * tp[y] / (n_true[y] + npred), 6)
        r = rows[y]
        assert (r.n_true, r.n_pred, r.tp) == (n_true[y], npred, tp[y])
        assert r.prec == pytest.approx(prec, abs=1e-6)
        assert r.rec == pytest.approx(rec, abs=1e-6)
        assert r.f1 == pytest.approx(f1, abs=1e-6)
        per_class.append((prec, rec, f1))
    m = rows["__macro__"]
    k = len(per_class)
    assert m.n_true == sum(n_true.values())
    assert m.prec == pytest.approx(
        round(sum(p for p, _, _ in per_class) / k, 6), abs=2e-6
    )
    assert m.rec == pytest.approx(
        round(sum(r for _, r, _ in per_class) / k, 6), abs=2e-6
    )
    assert m.f1 == pytest.approx(
        round(sum(f for _, _, f in per_class) / k, 6), abs=2e-6
    )
