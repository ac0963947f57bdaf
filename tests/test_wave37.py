"""Wave-37 unit tests: Python-recomputed ground truth — runs-test
moments, McNemar discordant counts, Jarque-Bera central moments, the
assortativity Pearson sums, the weekday variance decomposition, disc
length bands, DPO pair construction, and the DSIR llr + Gumbel keys.
DuckDB oracle parity for the same queries runs in test_oracle_parity;
these recompute the math independently of BOTH engines."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pytest

import __spark_entry__ as E
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_curation import (
    _DSIR_A,
    _DSIR_K,
    _DSIR_M,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"
_Q = E.queries()


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def _daily_rev(spark):
    daily = defaultdict(float)
    for r in load_table(spark, "orders", SF).collect():
        daily[r.o_orderdate.date()] += r.o_totalprice
    return {d: round(v, 4) for d, v in daily.items()}


def test_runs_test_matches_loop(spark):
    daily = _daily_rev(spark)
    revs = sorted(daily.values())
    med = revs[(len(revs) + 1) // 2 - 1]
    signs = [1 if daily[d] > med else 0 for d in sorted(daily) if daily[d] != med]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    er = 1 + 2 * n1 * n2 / (n1 + n2)
    vr = (2 * n1 * n2) * (2 * n1 * n2 - n1 - n2) / (
        (n1 + n2) ** 2 * (n1 + n2 - 1)
    )
    z = (runs - er) / math.sqrt(vr)
    row = _Q["q_runs_test"](spark, SF).collect()[0]
    assert (row.n1, row.n2, row.runs) == (n1, n2, runs)
    assert row.expected_runs == pytest.approx(round(er, 4), abs=1e-9)
    assert row.z == pytest.approx(round(z, 4), abs=1e-9)


def test_mcnemar_matches_counts(spark):
    li = load_table(spark, "lineitem", SF).collect()
    bc = defaultdict(lambda: [0, 0])
    for r in li:
        a = r.l_discount >= 0.05
        b = r.l_extendedprice >= 53000.0
        if a and not b:
            bc[r.l_returnflag][0] += 1
        elif b and not a:
            bc[r.l_returnflag][1] += 1
    rows = {r.l_returnflag: r for r in _Q["q_mcnemar_flips"](spark, SF).collect()}
    for flag, (b, c) in bc.items():
        r = rows[flag]
        assert (r.flips_ab, r.flips_ba) == (b, c)
        chi2 = (b - c) ** 2 / (b + c)
        assert r.chi2 == pytest.approx(round(chi2, 4), abs=1e-9)
        assert r.biased_at_5pct == (1 if chi2 > 3.841 else 0)


def test_jarque_bera_matches_numpy_moments(spark):
    o = load_table(spark, "orders", SF).collect()
    by = defaultdict(list)
    for r in o:
        by[r.o_orderstatus].append(r.o_totalprice)
    rows = {r.o_orderstatus: r for r in _Q["q_jarque_bera"](spark, SF).collect()}
    for st, vals in by.items():
        x = np.array(vals)
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        skew = m3 / m2**1.5
        kurt = m4 / m2**2 - 3
        jb = len(x) / 6 * (skew**2 + kurt**2 / 4)
        r = rows[st]
        assert r.n == len(vals)
        assert r.skewness == pytest.approx(round(skew, 4), abs=1e-6)
        assert r.kurtosis_excess == pytest.approx(round(kurt, 4), abs=1e-6)
        assert r.jb == pytest.approx(round(jb, 4), abs=1e-3)
        assert r.p_value == pytest.approx(round(math.exp(-jb / 2), 6), abs=1e-6)


def test_assortativity_matches_edge_pearson(spark):
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
    sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    deg = Counter(a for a, _ in sym)
    xs = np.array([deg[a] for a, b in sym], dtype=float)
    ys = np.array([deg[b] for a, b in sym], dtype=float)
    m = len(sym)
    num = m * (xs * ys).sum() - xs.sum() * ys.sum()
    den = math.sqrt(m * (xs * xs).sum() - xs.sum() ** 2) * math.sqrt(
        m * (ys * ys).sum() - ys.sum() ** 2
    )
    row = _Q["q_assortativity"](spark, SF).collect()[0]
    assert row.n_directed_edges == m
    assert row.assortativity == pytest.approx(round(num / den, 6), abs=1e-6)


def test_seasonality_strength_matches_decomposition(spark):
    o = load_table(spark, "orders", SF).collect()
    daily = defaultdict(float)
    for r in o:
        daily[r.o_orderdate.date()] += r.o_totalprice
    series = {d: round(v, 4) for d, v in daily.items()}
    g = np.mean(list(series.values()))
    wsum = defaultdict(list)
    for d, v in series.items():
        wsum[d.isoweekday() % 7 + 1].append(v)  # Spark dayofweek: Sun=1
    wmean = {k: np.mean(v) for k, v in wsum.items()}
    ss_tot = sum((v - g) ** 2 for v in series.values())
    ss_res = sum(
        (v - wmean[d.isoweekday() % 7 + 1]) ** 2 for d, v in series.items()
    )
    row = _Q["q_seasonality_strength"](spark, SF).collect()[0]
    assert row.n_days == len(series)
    assert row.ss_total_bn == pytest.approx(round(ss_tot / 1e9, 4), abs=1e-3)
    assert row.strength == pytest.approx(round(1 - ss_res / ss_tot, 6), abs=1e-6)


def test_length_bands_match_order_stats(spark):
    docs = load_table(spark, "documents", SF).collect()
    by = defaultdict(list)
    for r in docs:
        by[r.lang].append(r.n_chars)
    rows = {r.lang: r for r in _Q["q_length_bands"](spark, SF).collect()}
    for lang, vals in by.items():
        s = sorted(vals)
        n = len(s)
        r = rows[lang]
        for q, col in ((0.10, "p10"), (0.50, "p50"), (0.90, "p90")):
            assert getattr(r, col) == s[math.ceil(q * n) - 1]
        assert r.n_docs == n


def _quality(text: str) -> float:
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.text import (
        STOPWORDS,
    )

    toks = _toks(text)
    dtoks = set(toks)
    stop = {w for ws in STOPWORDS.values() for w in ws}
    punct = sum(1 for ch in text if not ch.isalnum() and not ch.isspace())
    pr = punct / len(text) if text else 0.0
    sr = len(dtoks & stop) / len(dtoks) if dtoks else 0.0
    return round(
        0.4 * min(len(toks) / 100.0, 1.0) + 0.4 * sr + 0.2 * (1 - min(pr * 5, 1.0)),
        6,
    )


def test_dpo_pairs_match_rank_offset(spark):
    docs = load_table(spark, "documents", SF).collect()
    by = defaultdict(list)
    for r in docs:
        by[r.source].append((-_quality(r.text), r.doc_id))
    expect = set()
    for src, items in by.items():
        items.sort()
        n = len(items)
        half = (n + 1) // 2
        for i in range(n // 2):
            qa, ca = -items[i][0], items[i][1]
            qb, cb = -items[i + half][0], items[i + half][1]
            if qa - qb > 0:
                expect.add((src, ca, cb, i + 1, round(qa - qb, 6)))
    got = {
        (r.source, r.chosen_id, r.rejected_id, r.chosen_rank, r.margin)
        for r in _Q["q_dpo_pairs"](spark, SF).collect()
    }
    assert got == expect


def test_importance_resampling_matches_python(spark):
    docs = load_table(spark, "documents", SF).collect()
    cp, ct = Counter(), Counter()
    for r in docs:
        for w in _toks(r.text):
            cp[w] += 1
            if r.lang == "en":
                ct[w] += 1
    n_p, n_t, v = sum(cp.values()), sum(ct.values()), len(cp)
    keyed = []
    for r in docs:
        toks = _toks(r.text)
        if not toks:
            continue
        llr = round(
            sum(
                math.log((ct.get(w, 0) + 1) / (n_t + v))
                - math.log((cp[w] + 1) / (n_p + v))
                for w in toks
            ),
            4,
        )
        u = ((r.doc_id % _DSIR_M) * _DSIR_A + 17) % _DSIR_M / float(
            _DSIR_M
        ) + 0.5 / _DSIR_M
        key = round(llr - math.log(-math.log(u)), 6)
        keyed.append((-key, r.doc_id, r.lang, llr))
    keyed.sort()
    expect = [
        (i + 1, doc, lang, llr, -negk)
        for i, (negk, doc, lang, llr) in enumerate(keyed[:_DSIR_K])
    ]
    got = [
        (r.rank, r.doc_id, r.lang, r.llr, r.gumbel_key)
        for r in _Q["q_importance_resampling"](spark, SF).collect()
    ]
    assert [g[:3] for g in got] == [e[:3] for e in expect]
    for g, e in zip(got, expect):
        assert g[3] == pytest.approx(e[3], abs=1e-9)
        assert g[4] == pytest.approx(e[4], abs=1e-9)
