"""Wave-35 unit tests: Python-recomputed ground truth — the rank-sum
AUC, Cohen's kappa closed form, MAD robust z counts, shingle
containment sets, the O(n²) Kendall pair loop, the RBO depth sum, the
Lorenz/Gini rank formula, and the LCG negative sampler. DuckDB oracle
parity for the same queries runs in test_oracle_parity.py; these
recompute the math independently of BOTH engines."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest

import __spark_entry__ as E
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_trainset import (
    _NEG_A,
    _NEG_C,
    _NEG_DRAWS,
    _NEG_K,
    _NEG_M,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"
_Q = E.queries()


def test_roc_auc_matches_rank_sum(spark):
    li = load_table(spark, "lineitem", SF).collect()
    o = {r.o_orderkey: r.o_totalprice for r in load_table(spark, "orders", SF).collect()}
    ret = defaultdict(int)
    for r in li:
        if r.l_orderkey in o and r.l_returnflag == "R":
            ret[r.l_orderkey] = 1
    # order must have >=1 line to get a label (inner join semantics)
    keys_with_lines = {r.l_orderkey for r in li}
    scored = [(o[k], ret.get(k, 0)) for k in o if k in keys_with_lines]
    pos = sorted(s for s, p in scored if p == 1)
    neg = sorted(s for s, p in scored if p == 0)
    na = np.array(neg)
    u = sum(
        np.searchsorted(na, s, side="left")
        + 0.5 * (np.searchsorted(na, s, side="right") - np.searchsorted(na, s, side="left"))
        for s in pos
    )
    auc = u / (len(pos) * len(neg))
    row = _Q["q_roc_auc"](spark, SF).collect()[0]
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    assert row.auc == pytest.approx(round(auc, 6), abs=1e-9)
    assert row.gini == pytest.approx(round(2 * auc - 1, 6), abs=1e-9)


def test_cohens_kappa_matches_closed_form(spark):
    li = load_table(spark, "lineitem", SF).collect()
    by = defaultdict(lambda: [0, 0, 0, 0])  # n, agree, a1, b1
    for r in li:
        a = 1 if r.l_discount >= 0.05 else 0
        b = 1 if r.l_extendedprice >= 53000.0 else 0
        s = by[r.l_returnflag]
        s[0] += 1
        s[1] += a == b
        s[2] += a
        s[3] += b
    rows = {r.l_returnflag: r for r in _Q["q_cohens_kappa"](spark, SF).collect()}
    for flag, (n, agree, a1, b1) in by.items():
        po = agree / n
        pe = (a1 * b1 + (n - a1) * (n - b1)) / (n * n)
        r = rows[flag]
        assert r.n == n and r.agree == agree
        assert r.kappa == pytest.approx(round((po - pe) / (1 - pe), 6), abs=1e-9)


def test_mad_outliers_matches_disc_median(spark):
    o = load_table(spark, "orders", SF).collect()
    by = defaultdict(list)
    for r in o:
        by[r.o_orderpriority].append(r.o_totalprice)

    def disc_med(xs):
        s = sorted(xs)
        return s[(len(s) + 1) // 2 - 1]

    rows = {r.o_orderpriority: r for r in _Q["q_mad_outliers"](spark, SF).collect()}
    assert set(rows) == set(by)
    for pri, vals in by.items():
        med = disc_med(vals)  # exact data value, no interpolation
        mad = disc_med([abs(v - med) for v in vals])
        rz = [round(0.6745 * (v - med) / mad, 6) for v in vals]
        n_out = sum(1 for z in rz if abs(z) > 3.5)
        r = rows[pri]
        assert r.med == pytest.approx(round(med, 4), abs=1e-9)
        assert r.mad == pytest.approx(round(mad, 4), abs=1e-9)
        assert r.n == len(vals)
        assert r.n_outliers == n_out
        assert r.max_abs_z == pytest.approx(round(max(abs(z) for z in rz), 4), abs=1e-9)


def _bigrams(text: str) -> set[str]:
    # mirror functions.text.tokens: lowercase, whitespace split, empties out
    toks = [t for t in text.lower().split() if t]
    return {f"{a} {b}" for a, b in zip(toks, toks[1:])}


def test_containment_matches_python_sets(spark):
    docs = load_table(spark, "documents", SF).collect()
    grams = {r.doc_id: (_bigrams(r.text), r.lang) for r in docs}
    expect = {}
    for ida, (ga, la) in grams.items():
        if ida % 10 != 0 or not ga:
            continue
        for idb, (gb, lb) in grams.items():
            if idb <= ida or lb != la or not gb:
                continue
            c = round(len(ga & gb) / min(len(ga), len(gb)), 6)
            if c >= 0.2:
                expect[(ida, idb)] = c
    got = {
        (r.id_a, r.id_b): r.containment
        for r in _Q["q_containment_dedup"](spark, SF).collect()
    }
    assert got == pytest.approx(expect)


def test_subset_document_scores_full_containment(spark):
    """The operator pin: a chunk wholly inside a longer doc scores 1.0
    overlap where Jaccard dilutes toward |A|/|B|."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.text import (
        tokens,
        word_bigrams,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.dedup import (
        inverted_index_jaccard,
        inverted_index_overlap,
    )
    import pyspark.sql.functions as F

    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    short = "gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(0, long, "en"), (1, short, "en")], "doc_id long, text string, lang string"
    ).select(
        "doc_id",
        "lang",
        F.array_distinct(word_bigrams(tokens("text"))).alias("bigrams"),
    )
    ov = inverted_index_overlap(df).collect()[0]
    jac = inverted_index_jaccard(df).collect()[0]
    assert ov.containment == 1.0
    assert jac.jaccard < 0.5


def test_kendall_tau_matches_pair_loop(spark):
    o = load_table(spark, "orders", SF).collect()
    daily = defaultdict(lambda: [0, 0.0])
    for r in o:
        d = r.o_orderdate.date()
        daily[d][0] += 1
        daily[d][1] += r.o_totalprice
    series = [(k, v[0], round(v[1], 4)) for k, v in sorted(daily.items())]
    x = np.array([s[1] for s in series], dtype=float)
    y = np.array([s[2] for s in series], dtype=float)
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(len(x), k=1)
    prod = dx[iu] * dy[iu]
    conc = int((prod > 0).sum())
    disc = int((prod < 0).sum())
    tx = int(((dx[iu] == 0) & (dy[iu] != 0)).sum())
    ty = int(((dy[iu] == 0) & (dx[iu] != 0)).sum())
    tau = (conc - disc) / math.sqrt((conc + disc + tx) * (conc + disc + ty))
    row = _Q["q_kendall_tau"](spark, SF).collect()[0]
    assert (row.n_days, row.concordant, row.discordant) == (len(series), conc, disc)
    assert (row.ties_x, row.ties_y) == (tx, ty)
    assert row.tau_b == pytest.approx(round(tau, 6), abs=1e-9)


def test_rbo_matches_depth_sum(spark):
    li = load_table(spark, "lineitem", SF).collect()
    rev = defaultdict(float)
    for r in li:
        p = "a" if r.l_shipdate.year <= 1997 else "b"
        rev[(p, r.l_partkey)] += r.l_extendedprice * (1 - r.l_discount)
    tops = {}
    for p in "ab":
        items = sorted(
            ((round(v, 4), -k) for (pp, k), v in rev.items() if pp == p),
            reverse=True,
        )[:20]
        tops[p] = [-negk for _, negk in items]
    ra = {k: i + 1 for i, k in enumerate(tops["a"])}
    rb = {k: i + 1 for i, k in enumerate(tops["b"])}
    both = {k: max(ra[k], rb[k]) for k in set(ra) & set(rb)}
    s = 0.0
    for d in range(1, 21):
        xd = sum(1 for dm in both.values() if dm <= d)
        s += 0.9 ** (d - 1) * xd / d
    rbo = s * (1 - 0.9) / (1 - 0.9**20)
    row = _Q["q_rbo_rank_overlap"](spark, SF).collect()[0]
    assert row.k == 20 and row.p == 0.9
    assert row.overlap_at_k == sum(1 for dm in both.values() if dm <= 20)
    assert row.rbo == pytest.approx(round(rbo, 6), abs=1e-9)


def test_lorenz_gini_matches_rank_formula(spark):
    o = load_table(spark, "orders", SF).collect()
    cust = defaultdict(float)
    for r in o:
        cust[r.o_custkey] += r.o_totalprice
    vals = sorted((round(v, 4), k) for k, v in cust.items())
    n = len(vals)
    t = sum(v for v, _ in vals)
    rs = sum((i + 1) * v for i, (v, _) in enumerate(vals))
    gini = round(2 * rs / (n * t) - (n + 1) / n, 6)
    dec_rev = defaultdict(float)
    dec_n = defaultdict(int)
    for i, (v, _) in enumerate(vals):
        d = (i * 10) // n
        dec_rev[d] += v
        dec_n[d] += 1
    rows = _Q["q_lorenz_gini"](spark, SF).collect()
    assert [r.decile for r in rows] == sorted(dec_rev)
    cum = 0.0
    for r in rows:
        assert r.n_customers == dec_n[r.decile]
        assert r.decile_rev == pytest.approx(round(dec_rev[r.decile], 4), abs=1e-6)
        cum += round(dec_rev[r.decile], 4)
        assert r.cum_share == pytest.approx(round(cum / t, 6), abs=1e-6)
        assert r.gini == pytest.approx(gini, abs=1e-9)


def test_negative_sampling_matches_python_lcg(spark):
    o = load_table(spark, "orders", SF).collect()
    li = load_table(spark, "lineitem", SF).collect()
    okey2cust = {r.o_orderkey: r.o_custkey for r in o}
    pos = {
        (okey2cust[r.l_orderkey], r.l_partkey)
        for r in li
        if r.l_orderkey in okey2cust
    }
    custs = [r.c_custkey for r in load_table(spark, "customer", SF).collect()]
    n_parts = load_table(spark, "part", SF).count()
    expect = []
    for c in sorted(custs):
        cands = {}
        for i in range(1, _NEG_DRAWS + 1):
            cand = ((c % _NEG_M) * _NEG_A + i * _NEG_C + 7) % _NEG_M % n_parts + 1
            cands.setdefault(cand, i)
        keep = sorted(
            ((mi, cand) for cand, mi in cands.items() if (c, cand) not in pos)
        )[:_NEG_K]
        expect.extend((c, cand, rnk + 1) for rnk, (mi, cand) in enumerate(keep))
    got = [
        (r.c_custkey, r.neg_partkey, r.rnk)
        for r in _Q["q_negative_sampling"](spark, SF).collect()
    ]
    assert got == expect
