"""Wave-27 unit tests: Python-recomputed ground truth — power-analysis
closed forms, norm distributions, backlog buckets, waterfall algebra
(with the gross = net + discount identity), scorecard metrics,
equi-depth balance, and the Zipf OLS.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.tokenize import (
    py_toks,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_hygiene import (
    q_embedding_norm_drift,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_measurement import (
    _LCG_A,
    _LCG_C,
    _LCG_M,
    _POWER_SPEND,
    _TARGET_REL_LIFT,
    _Z_ALPHA,
    _Z_BETA,
    q_power_analysis,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_scale import (
    q_equi_depth_histogram,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_text import (
    _ZIPF_MIN_FREQ,
    q_zipf_fit,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_warehouse import (
    q_backlog_aging,
    q_revenue_waterfall,
    q_supplier_scorecard,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def test_power_analysis_matches_closed_form(spark):
    spend = defaultdict(float)
    for r in load_table(spark, "events", SF_DIR).collect():
        if r.event_type == "purchase":
            spend[r.user_id] += r.value
    users = {
        r.user_id for r in load_table(spark, "events", SF_DIR).collect()
    }
    conv = {u: 1 if spend.get(u, 0.0) > _POWER_SPEND else 0 for u in users}
    n_a = sum(1 for u in users if (u * _LCG_A + _LCG_C) % _LCG_M < _LCG_M // 2)
    n_b = len(users) - n_a
    p = sum(conv.values()) / len(users)
    zsum = _Z_ALPHA + _Z_BETA
    mde = zsum * math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
    n_req = math.ceil(
        zsum**2 * 2 * p * (1 - p) / (p * _TARGET_REL_LIFT) ** 2
    )
    got = q_power_analysis(spark, SF_DIR).collect()[0]
    assert (got.n_a, got.n_b) == (n_a, n_b)
    assert got.base_rate == pytest.approx(p, abs=1e-4)
    assert got.mde_abs == pytest.approx(mde, abs=1e-4)
    assert got.n_per_arm_for_5pct == n_req
    assert got.mde_abs > 0  # the fixture must exercise a nonzero rate


def test_embedding_norm_drift_matches_replay(spark):
    per = defaultdict(list)
    for r in load_table(spark, "embeddings", SF_DIR).collect():
        per[r.label].append(math.sqrt(sum(float(x) * float(x) for x in r.embedding)))
    got = {r.label: r for r in q_embedding_norm_drift(spark, SF_DIR).collect()}
    assert set(got) == set(per)
    for lbl, norms in per.items():
        g = got[lbl]
        assert g.n_vectors == len(norms)
        assert g.mean_norm == pytest.approx(np.mean(norms), abs=1e-4)
        assert g.std_norm == pytest.approx(np.std(norms, ddof=1), abs=1e-4)
        assert g.p95_norm == pytest.approx(
            np.percentile(norms, 95), abs=1e-3
        )


def test_backlog_aging_matches_replay(spark):
    orders = load_table(spark, "orders", SF_DIR).collect()
    asof = max(r.o_orderdate for r in orders)
    buckets = defaultdict(lambda: [0, 0.0])
    for r in orders:
        if r.o_orderstatus != "O":
            continue
        age = (asof - r.o_orderdate).days
        b = (
            "0-90d"
            if age <= 90
            else "91-365d" if age <= 365 else "1-2y" if age <= 730 else ">2y"
        )
        buckets[b][0] += 1
        buckets[b][1] += r.o_totalprice
    got = {r.bucket: r for r in q_backlog_aging(spark, SF_DIR).collect()}
    assert set(got) == set(buckets)
    for b, (n, v) in buckets.items():
        assert got[b].n_orders == n
        assert got[b].open_value == pytest.approx(v, abs=0.011)


def test_revenue_waterfall_identity_and_replay(spark):
    per = defaultdict(lambda: [0.0] * 5)
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        y = r.l_shipdate.year
        e, d, t = r.l_extendedprice, r.l_discount, r.l_tax
        row = per[y]
        row[0] += e
        row[1] += e * d
        row[2] += e * (1 - d)
        row[3] += e * (1 - d) * t
        row[4] += e * (1 - d) * (1 + t)
    got = {r.year: r for r in q_revenue_waterfall(spark, SF_DIR).collect()}
    assert set(got) == set(per)
    for y, (g, dd, n, t, b) in per.items():
        r = got[y]
        assert r.gross == pytest.approx(g, abs=0.02)
        assert r.discount_given == pytest.approx(dd, abs=0.02)
        assert r.net == pytest.approx(n, abs=0.02)
        assert r.tax_collected == pytest.approx(t, abs=0.02)
        assert r.billed == pytest.approx(b, abs=0.02)
        # waterfall identities the decomposition must satisfy
        assert r.gross == pytest.approx(r.net + r.discount_given, abs=0.03)
        assert r.billed == pytest.approx(r.net + r.tax_collected, abs=0.03)


def test_supplier_scorecard_matches_replay(spark):
    agg = defaultdict(lambda: [0, 0.0, 0.0, 0])
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        a = agg[r.l_suppkey]
        a[0] += 1
        a[1] += r.l_extendedprice * (1 - r.l_discount)
        a[2] += r.l_discount
        a[3] += 1 if r.l_returnflag == "R" else 0
    want = sorted(
        ((round(v[1], 2), k) for k, v in agg.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = q_supplier_scorecard(spark, SF_DIR).collect()
    assert [(r.revenue, r.l_suppkey) for r in got] == [
        (pytest.approx(rv, abs=0.011), k) for rv, k in want
    ]
    for r in got:
        a = agg[r.l_suppkey]
        assert r.n_lines == a[0]
        assert r.avg_discount == pytest.approx(a[2] / a[0], abs=1e-4)
        assert r.return_rate == pytest.approx(a[3] / a[0], abs=1e-4)


def test_equi_depth_histogram_is_balanced(spark):
    vals = [
        r.l_extendedprice
        for r in load_table(spark, "lineitem", SF_DIR).collect()
    ]
    rows = q_equi_depth_histogram(spark, SF_DIR).collect()
    assert sum(r.n_rows for r in rows) == len(vals)
    assert [r.bucket for r in rows] == sorted(r.bucket for r in rows)
    # equi-depth: each of the 8 buckets holds ~n/8 rows (ties can skew)
    for r in rows:
        assert r.n_rows == pytest.approx(len(vals) / 8, rel=0.25)
        assert r.lo <= r.hi
        assert 1 <= r.ndv <= r.n_rows
    # bucket ranges are disjoint and ordered
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo + 0.011


def test_zipf_fit_matches_numpy_ols(spark):
    wc = Counter()
    for r in load_table(spark, "documents", SF_DIR).collect():
        wc.update(py_toks(r.text))
    kept = sorted(
        ((f, w) for w, f in wc.items() if f >= _ZIPF_MIN_FREQ),
        key=lambda t: (-t[0], t[1]),
    )
    x = np.log(np.arange(1, len(kept) + 1, dtype=float))
    y = np.log(np.array([f for f, _ in kept], dtype=float))
    slope = float(np.cov(x, y, ddof=0)[0, 1] / np.var(x))
    r2 = float(np.cov(x, y, ddof=0)[0, 1] ** 2 / (np.var(x) * np.var(y)))
    got = q_zipf_fit(spark, SF_DIR).collect()[0]
    assert got.n_words == len(kept)
    assert got.zipf_exponent == pytest.approx(-slope, abs=1e-3)
    assert got.r2 == pytest.approx(r2, abs=1e-3)
    assert 0 <= got.r2 <= 1


# --- wave-28 additions (round 6 close) --------------------------------------


def test_exact_quantiles_query_is_ordered_and_monotone(spark):
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_scale import (
        _QUANTILE_FRACS,
        q_exact_quantiles,
    )

    rows = q_exact_quantiles(spark, SF_DIR).collect()
    assert [r.frac for r in rows] == sorted(_QUANTILE_FRACS)
    qs = [r.quantile for r in rows]
    assert qs == sorted(qs)  # quantiles are monotone in the fraction
    vals = sorted(
        r.l_extendedprice
        for r in load_table(spark, "lineitem", SF_DIR).collect()
    )
    for r in rows:  # exact definition: pos = 1 + (n-1)q, linear interp
        pos = 1 + (len(vals) - 1) * r.frac
        lo = int(math.floor(pos))
        frac = pos - lo
        want = vals[lo - 1] + frac * (vals[min(lo, len(vals) - 1)] - vals[lo - 1])
        assert r.quantile == pytest.approx(want, abs=1e-3)


def test_token_fertility_matches_replay(spark):
    import re

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.text import (
        TOKEN_REGEX,
    )
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_text import (
        q_token_fertility,
    )

    rx = re.compile(TOKEN_REGEX)
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in load_table(spark, "documents", SF_DIR).collect():
        a = agg[r.lang]
        a[0] += 1
        a[1] += len(r.text)
        a[2] += len(rx.findall(r.text))
        a[3] += len(py_toks(r.text))
    got = {r.lang: r for r in q_token_fertility(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for lang, (n, ch, bpe, ws) in agg.items():
        g = got[lang]
        assert (g.n_docs, g.n_chars, g.n_bpe_tokens) == (n, ch, bpe)
        assert g.chars_per_token == pytest.approx(ch / bpe, abs=1e-3)
        assert g.tokens_per_word == pytest.approx(bpe / ws, abs=1e-3)
