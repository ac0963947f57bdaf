"""Wave-24 unit tests: Python-recomputed ground truth — rank sums and
chi-square from direct contingency replays, BH step-up against a list
replay (with the A&S p-value checked against math.erfc), Adamic-Adar
from a dict-of-sets graph, calibration bins / bigram LM / freshness /
funnel timing from per-row replays.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.tokenize import (
    py_toks,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_curation import (
    q_bigram_lm,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_governance import (
    _FRESH_SLA_MIN,
    q_freshness_audit,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_graphstats import (
    _CN_MAX_DEG,
    _CN_ORDER_MOD,
    q_adamic_adar,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_measurement import (
    _AS_A,
    _AS_P,
    _LCG_A,
    _LCG_C,
    _LCG_M,
    q_bh_fdr,
    q_chi_square,
    q_mann_whitney,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_mlops import (
    _STOPWORDS,
    q_reliability_bins,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_warehouse import (
    q_funnel_timing,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def _variant(uid: int) -> int:
    return 0 if (uid * _LCG_A + _LCG_C) % _LCG_M < _LCG_M // 2 else 1


def _p_two(z: float) -> float:
    a1, a2, a3, a4, a5 = _AS_A
    x = abs(z) / math.sqrt(2.0)
    t = 1.0 / (1.0 + _AS_P * x)
    return (
        a1 * t + a2 * t**2 + a3 * t**3 + a4 * t**4 + a5 * t**5
    ) * math.exp(-(x * x))


def test_mann_whitney_matches_rank_replay(spark):
    rows = [
        (_variant(r.user_id), r.value)
        for r in load_table(spark, "events", SF_DIR).collect()
        if r.event_type == "purchase"
    ]
    # average ranks with ties, the textbook way
    by_val = sorted(rows, key=lambda t: t[1])
    ranks: dict[float, float] = {}
    i = 0
    while i < len(by_val):
        j = i
        while j < len(by_val) and by_val[j][1] == by_val[i][1]:
            j += 1
        for k in range(i, j):
            ranks.setdefault(by_val[i][1], (i + 1 + j) / 2.0)
        i = j
    r1 = sum(ranks[v] for a, v in rows if a == 0)
    n1 = sum(1 for a, _ in rows if a == 0)
    n2 = len(rows) - n1
    ties = Counter(v for _, v in rows)
    tie = sum(t**3 - t for t in ties.values())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    var = (n1 * n2 / 12.0) * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    got = q_mann_whitney(spark, SF_DIR).collect()[0]
    assert (got.n_a, got.n_b) == (n1, n2)
    assert got.u_a == pytest.approx(u1, abs=0.051)
    assert got.z_score == pytest.approx(z, abs=1e-3)
    assert got.significant == (1 if abs(z) > 1.96 else 0)


def test_chi_square_matches_contingency_replay(spark):
    cells = Counter(
        (r.event_type, _variant(r.user_id))
        for r in load_table(spark, "events", SF_DIR).collect()
    )
    rt = Counter()
    ct = Counter()
    for (et, v), o in cells.items():
        rt[et] += o
        ct[v] += o
    n = sum(cells.values())
    chi2 = sum(
        (o - rt[et] * ct[v] / n) ** 2 / (rt[et] * ct[v] / n)
        for (et, v), o in cells.items()
    )
    got = q_chi_square(spark, SF_DIR).collect()[0]
    assert got.chi2 == pytest.approx(chi2, abs=1e-3)
    assert got.dof == (len(rt) - 1) * (len(ct) - 1)
    assert got.cramers_v == pytest.approx(
        math.sqrt(chi2 / (n * min(len(rt) - 1, len(ct) - 1))), abs=1e-4
    )


def test_bh_fdr_matches_step_up_replay(spark):
    per = defaultdict(lambda: ([], []))
    for r in load_table(spark, "events", SF_DIR).collect():
        per[r.event_type][_variant(r.user_id)].append(r.value)
    stats = {}
    for et, (a, b) in per.items():
        ma, mb = np.mean(a), np.mean(b)
        va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
        z = (mb - ma) / math.sqrt(va / len(a) + vb / len(b))
        stats[et] = (len(a), len(b), z, _p_two(z))
        # the rational approximation tracks the true two-sided p
        assert _p_two(z) == pytest.approx(math.erfc(abs(z) / math.sqrt(2)), abs=2e-7)
    m = len(stats)
    ordered = sorted(stats.items(), key=lambda kv: (kv[1][3], kv[0]))
    adj, run = {}, 1.0
    for i in range(m - 1, -1, -1):
        et, (_, _, _, p) = ordered[i]
        run = min(run, p * m / (i + 1))
        adj[et] = min(1.0, run)
    got = {r.event_type: r for r in q_bh_fdr(spark, SF_DIR).collect()}
    assert set(got) == set(stats)
    for rank0, (et, (na, nb, z, p)) in enumerate(ordered):
        g = got[et]
        assert (g.n_a, g.n_b) == (na, nb)
        assert g.z_score == pytest.approx(z, abs=1e-3)
        assert g.p_value == pytest.approx(p, abs=1e-5)
        assert g.p_rank == rank0 + 1
        assert g.adj_p == pytest.approx(adj[et], abs=1e-5)
        assert g.discovery == (1 if adj[et] <= 0.10 else 0)


def test_adamic_adar_matches_graph_replay(spark):
    orders = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, "orders", SF_DIR).collect()
        if r.o_orderkey % _CN_ORDER_MOD == 0
    }
    edges = set()
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        if r.l_orderkey in orders:
            edges.add((orders[r.l_orderkey], r.l_partkey))
    pdeg = Counter(p for _, p in edges)
    by_part = defaultdict(list)
    for c, p in edges:
        if 2 <= pdeg[p] <= _CN_MAX_DEG:
            by_part[p].append(c)
    pair_common = Counter()
    pair_aa = defaultdict(float)
    for p, cs in by_part.items():
        w = 1.0 / math.log(pdeg[p])
        cs.sort()
        for i in range(len(cs)):
            for j in range(i + 1, len(cs)):
                pair_common[(cs[i], cs[j])] += 1
                pair_aa[(cs[i], cs[j])] += w
    want = sorted(
        (
            (round(aa, 5), ca, cb, pair_common[(ca, cb)])
            for (ca, cb), aa in pair_aa.items()
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = q_adamic_adar(spark, SF_DIR).collect()
    assert [(r.aa_score, r.ca, r.cb, r.common) for r in got] == [
        (pytest.approx(a, abs=1e-5), ca, cb, c) for a, ca, cb, c in want
    ]


def test_reliability_bins_match_token_replay(spark):
    en = set(_STOPWORDS["en"])
    per_bin = defaultdict(lambda: [0, 0.0, 0.0])
    for r in load_table(spark, "documents", SF_DIR).collect():
        toks = py_toks(r.text)
        score = sum(1 for t in toks if t in en) / max(len(toks), 1)
        b = min(int(score * 10), 9)
        per_bin[b][0] += 1
        per_bin[b][1] += score
        per_bin[b][2] += 1.0 if r.lang == "en" else 0.0
    got = {r.bin: r for r in q_reliability_bins(spark, SF_DIR).collect()}
    assert set(got) == set(per_bin)
    for b, (n, s, l) in per_bin.items():
        assert got[b].n_docs == n
        assert got[b].mean_score == pytest.approx(s / n, abs=1e-4)
        assert got[b].obs_rate == pytest.approx(l / n, abs=1e-4)
        assert got[b].gap == pytest.approx(abs(s / n - l / n), abs=1e-4)


def test_bigram_lm_matches_replay(spark):
    docs = {
        r.doc_id: py_toks(r.text)
        for r in load_table(spark, "documents", SF_DIR).collect()
    }
    corpus = Counter()
    hist = Counter()
    vocab = set()
    per_doc = {}
    for d, toks in docs.items():
        vocab.update(toks)
        bigs = [(toks[i], f"{toks[i]} {toks[i+1]}") for i in range(len(toks) - 1)]
        for w1, b in bigs:
            corpus[b] += 1
            hist[w1] += 1
        if bigs:
            per_doc[d] = bigs
    v = len(vocab)
    got = {r.doc_id: r for r in q_bigram_lm(spark, SF_DIR).collect()}
    assert set(got) == set(per_doc)
    for d, bigs in per_doc.items():
        lp = sum(math.log10((corpus[b] + 1) / (hist[w1] + v)) for w1, b in bigs)
        assert got[d].n_bigrams == len(bigs)
        assert got[d].avg_logp == pytest.approx(lp / len(bigs), abs=1e-3)


def test_freshness_audit_matches_replay(spark):
    last = {}
    cnt = Counter()
    for r in load_table(spark, "events", SF_DIR).collect():
        cnt[r.event_type] += 1
        if r.event_type not in last or r.ts > last[r.event_type]:
            last[r.event_type] = r.ts
    gmax = max(last.values())
    got = {r.event_type: r for r in q_freshness_audit(spark, SF_DIR).collect()}
    assert set(got) == set(cnt)
    for et in cnt:
        lag = (int(gmax.timestamp()) - int(last[et].timestamp())) // 60
        g = got[et]
        assert g.n_events == cnt[et]
        assert g.lag_minutes == lag
        assert g.status == ("stale" if lag > _FRESH_SLA_MIN else "fresh")


def test_funnel_timing_matches_replay(spark):
    first = defaultdict(dict)
    for r in load_table(spark, "events", SF_DIR).collect():
        d = first[r.user_id]
        if r.event_type not in d or r.ts < d[r.event_type]:
            d[r.event_type] = r.ts
    gaps = defaultdict(list)
    for d in first.values():
        tv, tc, tp = d.get("view"), d.get("click"), d.get("purchase")
        if tv and tc and tc > tv:
            gaps["view->click"].append(
                int(tc.timestamp()) - int(tv.timestamp())
            )
            if tp and tp > tc:
                gaps["click->purchase"].append(
                    int(tp.timestamp()) - int(tc.timestamp())
                )
    got = {r.step: r for r in q_funnel_timing(spark, SF_DIR).collect()}
    assert set(got) == set(gaps)
    for step, g in gaps.items():
        r = got[step]
        assert r.n_users == len(g)
        assert r.p50_s == pytest.approx(np.percentile(g, 50), abs=0.051)
        assert r.p90_s == pytest.approx(np.percentile(g, 90), abs=0.051)
        assert r.mean_s == pytest.approx(np.mean(g), abs=0.051)
