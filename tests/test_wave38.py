"""Wave-38 unit tests: Python-recomputed ground truth — Kruskal-Wallis
tie-corrected ranks, the Brown-Forsythe median-deviation ANOVA, the
G-test LLR sum, the Theil between/within decomposition, the SPRT
boundary walk, Friedman blocked ranks, Dirichlet query-likelihood
scores, heavy-change cross products, SAX disc-quartile symbols, the
Hurst R/S pipeline, ABC-XYZ class assignment, and the Brier
decomposition identity. DuckDB oracle parity for the same queries runs
in test_oracle_parity.py; these recompute the math independently of
BOTH engines."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

import __spark_entry__ as E
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.tokenize import (
    py_toks,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"
_Q = E.queries()


def _avg_ranks(values):
    """value -> average rank (1-based, ties averaged)."""
    c = Counter(values)
    out, cum = {}, 0
    for v in sorted(c):
        out[v] = cum + (c[v] + 1) / 2.0
        cum += c[v]
    return out


def test_kruskal_wallis_matches_rank_loop(spark):
    o = load_table(spark, "orders", SF).collect()
    vals = [r.o_totalprice for r in o]
    ranks = _avg_ranks(vals)
    groups = defaultdict(list)
    for r in o:
        groups[r.o_orderstatus].append(ranks[r.o_totalprice])
    n = len(vals)
    sq = sum(sum(g) ** 2 / len(g) for g in groups.values())
    h = 12.0 / (n * (n + 1.0)) * sq - 3.0 * (n + 1.0)
    ties = Counter(vals)
    tie3 = sum(t**3 - t for t in ties.values())
    hc = h / (1.0 - tie3 / (float(n) * n * n - n))
    row = _Q["q_kruskal_wallis"](spark, SF).collect()[0]
    assert row.n == n and row.k_groups == 3 and row.df == 2
    assert row.h_stat == pytest.approx(round(h, 4), abs=1e-6)
    assert row.h_corrected == pytest.approx(round(hc, 4), abs=1e-6)
    assert row.significant_5pct == (1 if hc > 5.991 else 0)


def test_brown_forsythe_matches_loop(spark):
    o = load_table(spark, "orders", SF).collect()
    groups = defaultdict(list)
    for r in o:
        groups[r.o_orderstatus].append(r.o_totalprice)
    zs = defaultdict(list)
    for g, vals in groups.items():
        s = sorted(vals)
        med = s[math.ceil(len(s) / 2) - 1]  # disc median
        zs[g] = [abs(x - med) for x in vals]
    k = len(zs)
    n = sum(len(v) for v in zs.values())
    gm = sum(sum(v) for v in zs.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in zs.values())
    ssw = sum(
        sum(x * x for x in v) - sum(v) ** 2 / len(v) for v in zs.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = _Q["q_brown_forsythe"](spark, SF).collect()[0]
    assert (row.k_groups, row.df_between, row.df_within) == (k, k - 1, n - k)
    assert row.f_stat == pytest.approx(round(f, 4), abs=1e-3)
    assert row.variances_equal_5pct == (0 if f > 2.9957 else 1)


def test_g_test_matches_llr_sum(spark):
    li = load_table(spark, "lineitem", SF).collect()
    obs = Counter((r.l_returnflag, r.l_linestatus) for r in li)
    row_t = Counter()
    col_t = Counter()
    for (rf, ls), c in obs.items():
        row_t[rf] += c
        col_t[ls] += c
    n = sum(obs.values())
    g = 2.0 * sum(
        c * math.log(c / (row_t[rf] * float(col_t[ls]) / n))
        for (rf, ls), c in obs.items()
    )
    df = (len(row_t) - 1) * (len(col_t) - 1)
    row = _Q["q_g_test"](spark, SF).collect()[0]
    assert (row.n, row.df) == (n, df)
    assert row.g_stat == pytest.approx(round(g, 4), abs=1e-6)


def test_theil_decomposition_identity(spark):
    o = load_table(spark, "orders", SF).collect()
    cust_rev = defaultdict(float)
    for r in o:
        cust_rev[r.o_custkey] += r.o_totalprice
    cust_rev = {k: round(v, 4) for k, v in cust_rev.items()}
    nat = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, "customer", SF).collect()
    }
    nname = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, "nation", SF).collect()
    }
    by = defaultdict(list)
    for ck, rev in cust_rev.items():
        by[nname[nat[ck]]].append(rev)
    big_n = sum(len(v) for v in by.values())
    big_x = sum(sum(v) for v in by.values())
    rows = {r.nation: r for r in _Q["q_theil_index"](spark, SF).collect()}
    total = 0.0
    for g, vals in by.items():
        mu_g = sum(vals) / len(vals)
        t_g = sum((x / mu_g) * math.log(x / mu_g) for x in vals) / len(vals)
        share = sum(vals) / big_x
        btw = share * math.log(share / (len(vals) / float(big_n)))
        r = rows[g]
        assert r.n_customers == len(vals)
        assert r.rev_share == pytest.approx(round(share, 6), abs=1e-5)
        assert r.theil_within_g == pytest.approx(round(t_g, 6), abs=1e-5)
        assert r.between_contrib == pytest.approx(round(btw, 6), abs=1e-5)
        total += share * t_g + btw
    # decomposition identity: reported total equals sum of parts
    any_row = next(iter(rows.values()))
    assert any_row.theil_total == pytest.approx(round(total, 6), abs=1e-5)


def test_sprt_matches_walk(spark):
    o = load_table(spark, "orders", SF).collect()
    daily = defaultdict(lambda: [0, 0])
    for r in o:
        d = r.o_orderdate.date()
        daily[d][0] += 1
        daily[d][1] += 1 if r.o_totalprice > 300_000.0 else 0
    la = math.log(0.42 / 0.38)
    lb = math.log(0.58 / 0.62)
    cum, first_h1, first_h0 = 0.0, None, None
    ln19 = math.log(19.0)
    for d in sorted(daily):
        n, hi = daily[d]
        cum += hi * la + (n - hi) * lb
        if first_h1 is None and cum >= ln19:
            first_h1 = d
        if first_h0 is None and cum <= -ln19:
            first_h0 = d
    row = _Q["q_sprt_boundary"](spark, SF).collect()[0]
    assert row.n_days == len(daily)
    assert row.final_llr == pytest.approx(round(cum, 4), abs=1e-6)
    if first_h1 is not None and (first_h0 is None or first_h1 <= first_h0):
        assert row.decision == "accept_h1" and row.decision_day == first_h1
    elif first_h0 is not None:
        assert row.decision == "accept_h0" and row.decision_day == first_h0
    else:
        assert row.decision == "continue" and row.decision_day is None


def test_friedman_matches_blocked_ranks(spark):
    ev = load_table(spark, "events", SF).collect()
    types = sorted({r.event_type for r in ev})
    k = len(types)
    blocks = defaultdict(Counter)
    for r in ev:
        d = r.ts.date()
        monday = d.toordinal() - d.weekday()
        blocks[monday][r.event_type] += 1
    full = {wkk: c for wkk, c in blocks.items() if len(c) == k}
    n = len(full)
    rank_sums = defaultdict(float)
    sumr2 = 0.0
    for c in full.values():
        ranks = _avg_ranks(list(c.values()))
        # counts -> per-type rank within the block
        byval = defaultdict(list)
        for t in types:
            byval[c[t]].append(t)
        for v, ts_ in byval.items():
            for t in ts_:
                rank_sums[t] += ranks[v]
                sumr2 += ranks[v] ** 2
    ssq = sum((rank_sums[t] - n * (k + 1) / 2.0) ** 2 for t in types)
    fr = (k - 1) * ssq / (sumr2 - n * k * (k + 1.0) ** 2 / 4.0)
    row = _Q["q_friedman_test"](spark, SF).collect()[0]
    assert (row.k, row.n_blocks, row.df) == (k, n, k - 1)
    assert row.fr_stat == pytest.approx(round(fr, 4), abs=1e-6)


def test_query_likelihood_matches_lm_scoring(spark):
    docs = load_table(spark, "documents", SF).collect()
    terms = ("join", "hash", "scan")
    toks = {r.doc_id: py_toks(r.text) for r in docs}
    total = sum(len(t) for t in toks.values())
    cf = {t: sum(tk.count(t) for tk in toks.values()) for t in terms}
    mu = 500.0
    scores = {}
    for did, tk in toks.items():
        if not tk:
            continue
        s = 0.0
        for t in terms:
            s += math.log(
                (tk.count(t) + mu * (cf[t] / float(total))) / (len(tk) + mu)
            )
        scores[did] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r.doc_id, r.ql_score) for r in _Q["q_query_likelihood"](spark, SF).collect()]
    assert [d for d, _ in got] == [d for d, _ in top]
    for (gd, gs), (ed, es) in zip(got, top):
        assert gs == pytest.approx(round(es, 6), abs=1e-6)


def test_heavy_change_matches_cross_products(spark):
    docs = load_table(spark, "documents", SF).collect()
    ca, cb = Counter(), Counter()
    for r in docs:
        tgt = ca if r.lang == "en" else cb
        for t in py_toks(r.text):
            tgt[t] += 1
    ta, tb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    scored = sorted(
        vocab,
        key=lambda t: (-abs(ca[t] * tb - cb[t] * ta), t),
    )[:20]
    got = _Q["q_heavy_change"](spark, SF).collect()
    assert [r.term for r in got] == scored
    for r in got:
        expect = round(ca[r.term] / float(ta) - cb[r.term] / float(tb), 6)
        assert r.freq_delta == pytest.approx(expect, abs=1e-9)
        assert (r.count_en, r.count_rest) == (ca[r.term], cb[r.term])


def _weekly_cents(spark):
    daily = defaultdict(float)
    for r in load_table(spark, "orders", SF).collect():
        daily[r.o_orderdate.date()] += r.o_totalprice
    wk = defaultdict(int)
    epoch = __import__("datetime").date(1970, 1, 1)
    for d, v in daily.items():
        wk[(d - epoch).days // 7] += int(round(round(v, 4) * 10000))
    return wk


def test_sax_symbols_match_disc_quartiles(spark):
    wk = _weekly_cents(spark)
    s = sorted(wk.values())
    n = len(s)
    q1, q2, q3 = (s[math.ceil(q * n) - 1] for q in (0.25, 0.5, 0.75))

    def sym(v):
        return "a" if v <= q1 else "b" if v <= q2 else "c" if v <= q3 else "d"

    epoch = __import__("datetime").date(1970, 1, 1)
    import datetime as _dt

    byq = defaultdict(list)
    for w in sorted(wk):
        d = epoch + _dt.timedelta(days=w * 7)
        byq[(d.year, (d.month - 1) // 3 + 1)].append(sym(wk[w]))
    got = {
        (r.year, r.quarter): (r.n_weeks, r.sax)
        for r in _Q["q_sax_symbols"](spark, SF).collect()
    }
    assert got == {k: (len(v), "".join(v)) for k, v in byq.items()}


def test_hurst_rs_matches_loop(spark):
    daily = defaultdict(float)
    for r in load_table(spark, "orders", SF).collect():
        daily[r.o_orderdate.date()] += r.o_totalprice
    series = [round(daily[d], 4) for d in sorted(daily)]
    mean_rs = {}
    for w in (8, 16, 32):
        rss = []
        for b in range(len(series) // w):
            blk = series[b * w : (b + 1) * w]
            mb = sum(blk) / w
            cum, c, mx, mn = 0.0, [], -1e18, 1e18
            for x in blk:
                cum += x - mb
                mx, mn = max(mx, cum), min(mn, cum)
            s = math.sqrt(sum((x - mb) ** 2 for x in blk) / w)
            if s > 0:
                rss.append((mx - mn) / s)
        mean_rs[w] = (len(rss), sum(rss) / len(rss))
    lw = [math.log(w) for w in (8, 16, 32)]
    lr = [math.log(mean_rs[w][1]) for w in (8, 16, 32)]
    n = 3
    slope = (n * sum(a * b for a, b in zip(lw, lr)) - sum(lw) * sum(lr)) / (
        n * sum(a * a for a in lw) - sum(lw) ** 2
    )
    rows = {r.window_size: r for r in _Q["q_hurst_rs"](spark, SF).collect()}
    for w in (8, 16, 32):
        assert rows[w].n_blocks == mean_rs[w][0]
        assert rows[w].mean_rs == pytest.approx(
            round(mean_rs[w][1], 4), abs=1e-3
        )
        assert rows[w].hurst == pytest.approx(round(slope, 4), abs=1e-3)


def test_abc_xyz_matches_loop(spark):
    li = load_table(spark, "lineitem", SF).collect()
    rev = defaultdict(float)
    wk = defaultdict(lambda: defaultdict(int))
    for r in li:
        rev[r.l_partkey] += r.l_extendedprice
        d = r.l_shipdate.date()
        monday = d.toordinal() - d.weekday()
        wk[r.l_partkey][monday] += int(r.l_quantity)
    rev = {k: round(v, 4) for k, v in rev.items()}
    total = sum(rev.values())
    cum, abc = 0.0, {}
    for pk in sorted(rev, key=lambda p: (-rev[p], p)):
        cum += rev[pk]
        share = cum / total
        abc[pk] = "A" if share <= 0.8 else "B" if share <= 0.95 else "C"
    xyz = {}
    for pk, weeks in wk.items():
        q = list(weeks.values())
        m = len(q)
        if m == 1:
            xyz[pk] = "Z"
            continue
        mean = sum(q) / float(m)
        cv = math.sqrt(max(sum(x * x for x in q) / float(m) - mean * mean, 0.0)) / mean
        xyz[pk] = "X" if cv <= 0.5 else "Y" if cv <= 1.0 else "Z"
    cells = defaultdict(lambda: [0, 0.0])
    for pk in rev:
        c = cells[(abc[pk], xyz[pk])]
        c[0] += 1
        c[1] += rev[pk]
    got = {
        (r.abc, r.xyz): (r.n_parts, r.class_rev, r.rev_share)
        for r in _Q["q_abc_xyz"](spark, SF).collect()
    }
    assert set(got) == set(cells)
    for k, (n_parts, crev) in cells.items():
        gn, gr, gs = got[k]
        assert gn == n_parts
        assert gr == pytest.approx(round(crev, 4), abs=1e-3)
        assert gs == pytest.approx(round(crev / total, 6), abs=1e-6)


def test_brier_decomposition_identity(spark):
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.text import (
        STOPWORDS,
    )

    en = set(STOPWORDS["en"])
    docs = load_table(spark, "documents", SF).collect()
    rows = []
    for r in docs:
        tk = py_toks(r.text)
        score = sum(1 for t in tk if t in en) / float(max(len(tk), 1))
        rows.append(
            (min(int(score * 10), 9), score, 1.0 if r.lang == "en" else 0.0)
        )
    n = len(rows)
    brier = sum((s - l) ** 2 for _, s, l in rows) / n
    obar = sum(l for _, _, l in rows) / n
    bins = defaultdict(list)
    for b, s, l in rows:
        bins[b].append((s, l))
    rel = (
        sum(
            len(v)
            * (sum(s for s, _ in v) / len(v) - sum(l for _, l in v) / len(v))
            ** 2
            for v in bins.values()
        )
        / n
    )
    res = (
        sum(
            len(v) * (sum(l for _, l in v) / len(v) - obar) ** 2
            for v in bins.values()
        )
        / n
    )
    row = _Q["q_brier_decomposition"](spark, SF).collect()[0]
    assert row.n == n
    assert row.brier == pytest.approx(round(brier, 6), abs=1e-6)
    assert row.reliability == pytest.approx(round(rel, 6), abs=1e-6)
    assert row.resolution == pytest.approx(round(res, 6), abs=1e-6)
    assert row.uncertainty == pytest.approx(
        round(obar * (1 - obar), 6), abs=1e-6
    )
    # Murphy identity at binned granularity
    assert row.decomposed_brier == pytest.approx(
        round(rel - res + obar * (1 - obar), 6), abs=1e-6
    )
