"""Wave-36 unit tests: Python-recomputed ground truth — Gumbel moments
and return levels, the Chapman estimator, average precision, the
threshold-grid confusion counts, CMS one-sided error + exact probe
estimates, best-window snippet argmax, span-corruption arithmetic, and
the Holt recursion. DuckDB oracle parity for the same queries runs in
test_oracle_parity.py; these recompute the math independently of BOTH
engines."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
import pytest

import __spark_entry__ as E
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_frequency import (
    _CMS_P,
    _CMS_ROWS,
    _CMS_TOPK,
    _CMS_W,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_trainset import (
    _NEG_A,
    _NEG_C,
    _NEG_M,
    _SPAN_LEN,
    _SPAN_TOK_RATIO,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"
_Q = E.queries()


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def test_evt_gumbel_matches_moments(spark):
    o = load_table(spark, "orders", SF).collect()
    daily = defaultdict(float)
    for r in o:
        d = r.o_orderdate.date()
        daily[d] = max(daily[d], r.o_totalprice)
    mx = [round(v, 4) for v in daily.values()]
    m1 = float(np.mean(mx))
    s = float(np.std(mx, ddof=1))
    sigma = round(s * math.sqrt(6) / math.pi, 4)
    mu = round(m1 - 0.5772156649015329 * s * math.sqrt(6) / math.pi, 4)
    row = _Q["q_evt_gumbel"](spark, SF).collect()[0]
    assert row.n_days == len(mx)
    assert row.mu == pytest.approx(mu, abs=1e-6)
    assert row.sigma == pytest.approx(sigma, abs=1e-6)
    for t in (30, 90, 365):
        rl = round(mu - sigma * math.log(-math.log(1 - 1 / t)), 4)
        assert getattr(row, f"rl_{t}") == pytest.approx(rl, abs=1e-6)


def test_capture_recapture_matches_chapman(spark):
    docs = load_table(spark, "documents", SF).collect()
    v = {"src0": set(), "src1": set()}
    for r in docs:
        if r.source in v:
            v[r.source].update(_toks(r.text))
    n1, n2 = len(v["src0"]), len(v["src1"])
    m = len(v["src0"] & v["src1"])
    est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    row = _Q["q_capture_recapture"](spark, SF).collect()[0]
    assert (row.n1, row.n2, row.m) == (n1, n2, m)
    assert row.observed_union == len(v["src0"] | v["src1"])
    assert row.chapman_est == pytest.approx(round(est, 2), abs=1e-6)


def _label_scores(spark):
    li = load_table(spark, "lineitem", SF).collect()
    o = {r.o_orderkey: r.o_totalprice for r in load_table(spark, "orders", SF).collect()}
    ret = defaultdict(int)
    keys = set()
    for r in li:
        if r.l_orderkey in o:
            keys.add(r.l_orderkey)
            if r.l_returnflag == "R":
                ret[r.l_orderkey] = 1
    return [(o[k], ret.get(k, 0)) for k in keys]


def test_pr_auc_matches_stepped_ap(spark):
    scored = _label_scores(spark)
    cls = {}  # per score: [neg_cnt, pos_cnt]
    for s, p in scored:
        a = cls.setdefault(s, [0, 0])
        a[p] += 1  # a[0]=neg, a[1]=pos
    P = sum(a[1] for a in cls.values())
    cum_tp = cum_fp = 0
    ap = 0.0
    for s in sorted(cls, reverse=True):
        neg, pos = cls[s][0], cls[s][1]
        cum_tp += pos
        cum_fp += neg
        ap += (pos / P) * (cum_tp / (cum_tp + cum_fp))
    row = _Q["q_pr_auc"](spark, SF).collect()[0]
    assert row.n_pos == P
    assert row.pr_auc == pytest.approx(round(ap, 6), abs=1e-9)
    assert row.baseline == pytest.approx(
        round(P / len(scored), 6), abs=1e-9
    )


def test_threshold_metrics_match_counts(spark):
    scored = _label_scores(spark)
    rows = {r.thr: r for r in _Q["q_threshold_metrics"](spark, SF).collect()}
    for thr in range(50_000, 500_000, 50_000):
        tp = sum(1 for s, p in scored if s >= thr and p)
        fp = sum(1 for s, p in scored if s >= thr and not p)
        fn = sum(1 for s, p in scored if s < thr and p)
        r = rows[thr]
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn)
        p = tp / (tp + fp) if tp + fp else 0.0
        rc = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * rc / (p + rc) if p + rc else 0.0
        assert r.precision_ == pytest.approx(round(p, 6), abs=1e-9)
        assert r.recall_ == pytest.approx(round(rc, 6), abs=1e-9)
        assert r.f1 == pytest.approx(round(f1, 6), abs=1e-9)


def _h32(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % _CMS_P


def test_cms_estimates_match_python_sketch(spark):
    docs = load_table(spark, "documents", SF).collect()
    stream = [t for r in docs for t in _toks(r.text)]
    cells = Counter()
    for t in stream:
        h = _h32(t)
        for rid, (a, b) in enumerate(_CMS_ROWS):
            cells[(rid, (a * h + b) % _CMS_P % _CMS_W)] += 1
    exact = Counter(stream)
    probes = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:_CMS_TOPK]
    rows = {r.tok: r for r in _Q["q_cms_calibration"](spark, SF).collect()}
    assert set(rows) == {t for t, _ in probes}
    for tok, n in probes:
        h = _h32(tok)
        est = min(
            cells[(rid, (a * h + b) % _CMS_P % _CMS_W)]
            for rid, (a, b) in enumerate(_CMS_ROWS)
        )
        r = rows[tok]
        assert (r.exact_n, r.cms_est) == (n, est)
        assert r.never_undercounts == 1  # the CMS one-sided guarantee
        assert r.overcount == est - n >= 0


def test_snippet_matches_sliding_argmax(spark):
    docs = load_table(spark, "documents", SF).collect()
    terms = {"join", "hash", "scan"}
    expect = {}
    for r in docs:
        toks = _toks(r.text)
        if len(toks) < 8:
            continue
        scores = [
            sum(1 for t in toks[i : i + 8] if t in terms)
            for i in range(len(toks) - 7)
        ]
        hits = max(scores)
        if hits >= 3:
            start = scores.index(hits)  # 0-based
            expect[r.doc_id] = (start + 1, hits, " ".join(toks[start : start + 8]))
    got = {
        r.doc_id: (r.start_pos, r.hits, r.snippet)
        for r in _Q["q_snippet_extract"](spark, SF).collect()
    }
    assert got == expect


def test_span_corruption_matches_arithmetic(spark):
    docs = load_table(spark, "documents", SF).collect()
    rows = {r.doc_id: r for r in _Q["q_span_corruption"](spark, SF).collect()}
    for r in docs:
        n = len(_toks(r.text))
        if n < _SPAN_LEN:
            assert r.doc_id not in rows
            continue
        n_spans = max(1, n // _SPAN_TOK_RATIO)
        stride = n // n_spans
        masked = 0
        last_end = 0
        for j in range(n_spans):
            off = ((r.doc_id % _NEG_M) * _NEG_A + j * _NEG_C + 13) % _NEG_M % (
                stride - (_SPAN_LEN - 1)
            )
            start = j * stride + off + 1
            assert start > last_end  # spans never overlap
            ln = min(_SPAN_LEN, n - start + 1)
            last_end = start + ln - 1
            masked += ln
        row = rows[r.doc_id]
        assert row.n_toks == n and row.n_spans == n_spans
        assert row.masked_tokens == masked
        assert row.mask_ratio == pytest.approx(round(masked / n, 4), abs=1e-9)


def _r(x: float, nd: int) -> float:
    """SQL-style round-half-away-from-zero (Python round() is banker's —
    a midpoint anywhere in the recursion forks the trajectories)."""
    q = 10.0**nd
    return math.copysign(math.floor(abs(x) * q + 0.5), x) / q


def test_holt_recursion_matches_python_loop(spark):
    o = load_table(spark, "orders", SF).collect()
    daily = defaultdict(float)
    for r in o:
        daily[r.o_orderdate.date()] += r.o_totalprice
    series = sorted(daily.items())[-28:]
    xs = [_r(v, 4) for _, v in series]
    l, b = xs[0], _r(xs[1] - xs[0], 6)
    fc = {}
    for i in range(2, 29):
        fc[i] = _r(l + b, 6)
        l_new = _r(0.5 * xs[i - 1] + 0.5 * (l + b), 6)
        b = _r(0.3 * (l_new - l) + 0.7 * b, 6)
        l = l_new
    rows = _Q["q_holt_forecast"](spark, SF).collect()
    assert len(rows) == 7
    for k, r in enumerate(rows):
        i = 22 + k
        assert r.d == series[i - 1][0]
        assert r.actual == pytest.approx(xs[i - 1], abs=1e-9)
        assert r.forecast == pytest.approx(fc[i], abs=1e-9)
        assert r.abs_err == pytest.approx(round(abs(xs[i - 1] - fc[i]), 4), abs=1e-9)
