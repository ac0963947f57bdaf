"""Wave-19 unit tests: Python-recomputed ground truth — ACF from the
textbook Pearson formula, FIFO matching from the two-pointer replay
(the strongest check: the closed form must equal the loop it
eliminates), decile lift from a full sort, the bootstrap from a
replayed LCG, Benford from direct digit counts, RFM from a replayed
ntile, and ranking metrics from a sequential-fold cosine rerank."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_governance import (
    _BENFORD_SHARES,
    q_benford,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_ledger import (
    _FIFO_BRAND,
    q_fifo_inventory,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_measurement import (
    _BOOT_B,
    _POIS_CDF,
    q_poisson_bootstrap,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_mlops import (
    q_decile_lift,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_retrieval import (
    _RM_K,
    _RM_PANEL,
    q_ranking_metrics,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_temporal import (
    q_acf,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_warehouse import (
    q_rfm_segmentation,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def test_acf_matches_pearson(spark):
    rows = load_table(spark, "events", SF_DIR).collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r.event_type][r.ts.date()] += 1
    out = {(r.event_type, r.lag): r for r in q_acf(spark, SF_DIR).collect()}
    for et, series in daily.items():
        xs = [series[d] for d in sorted(series)]
        for lag in range(1, 8):
            pairs = [(xs[i], xs[i - lag]) for i in range(lag, len(xs))]
            got = out[(et, lag)]
            assert got.n_pairs == len(pairs)
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            tx, ty = n * sxx - sx * sx, n * syy - sy * sy
            if tx == 0 or ty == 0:
                assert got.acf is None
            else:
                r_ = (n * sxy - sx * sy) / math.sqrt(tx * ty)
                assert got.acf == pytest.approx(r_, abs=1e-4)


def test_fifo_matches_two_pointer_replay(spark):
    """The cumulative-interval closed form must reproduce the textbook
    two-pointer FIFO allocation loop exactly, pair by pair."""
    part = {
        r.p_partkey
        for r in load_table(spark, "part", SF_DIR).collect()
        if r.p_brand == _FIFO_BRAND
    }
    sides = {"F": defaultdict(list), "O": defaultdict(list)}
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        if r.l_partkey in part:
            sides[r.l_linestatus][r.l_partkey].append(
                (r.l_shipdate, r.l_orderkey, r.l_linenumber, int(r.l_quantity))
            )
    expected = {}
    for pk in part:
        receipts = sorted(sides["F"].get(pk, []))
        issues = sorted(sides["O"].get(pk, []))
        ri, ii = 0, 0
        rrem = receipts[0][3] if receipts else 0
        irem = issues[0][3] if issues else 0
        while ri < len(receipts) and ii < len(issues):
            take = min(rrem, irem)
            expected[(pk, ri + 1, ii + 1)] = take
            rrem -= take
            irem -= take
            if rrem == 0:
                ri += 1
                rrem = receipts[ri][3] if ri < len(receipts) else 0
            if irem == 0:
                ii += 1
                irem = issues[ii][3] if ii < len(issues) else 0
    got = {
        (r.l_partkey, r.receipt_seq, r.issue_seq): r.matched_qty
        for r in q_fifo_inventory(spark, SF_DIR).collect()
    }
    # The replay can emit a zero-take boundary pair; the closed form's
    # strict inequalities exclude empty overlaps by construction.
    expected = {k: v for k, v in expected.items() if v > 0}
    assert got == expected


def test_decile_lift_matches_full_sort(spark):
    rows = load_table(spark, "events", SF_DIR).collect()
    ranked = sorted(rows, key=lambda r: (-r.value, r.event_id))
    n = len(ranked)
    per = defaultdict(lambda: [0, 0])
    for i, r in enumerate(ranked):
        d = i * 10 // n
        per[d][0] += 1
        per[d][1] += int(r.event_type == "purchase")
    p = sum(v[1] for v in per.values())
    out = {r.decile: r for r in q_decile_lift(spark, SF_DIR).collect()}
    assert set(out) == set(per)
    cum = 0
    for d in sorted(per):
        n_rows, positives = per[d]
        cum += positives
        assert out[d].n_rows == n_rows
        assert out[d].positives == positives
        assert out[d].pos_rate == pytest.approx(positives / n_rows, abs=1e-4)
        assert out[d].lift == pytest.approx(
            (positives / n_rows) / (p / n), abs=1e-4
        )
        assert out[d].cum_capture == pytest.approx(cum / p, abs=1e-4)
    assert out[max(per)].cum_capture == pytest.approx(1.0, abs=1e-5)


def test_poisson_bootstrap_matches_lcg_replay(spark):
    rows = [
        (r.event_id, int(round(r.value * 100)))
        for r in load_table(spark, "events", SF_DIR).collect()
        if r.event_type == "purchase"
    ]
    thresholds = [float(t) for t in _POIS_CDF]

    def weight(event_id: int, b: int) -> int:
        m1 = ((event_id % 1048576) * 1103515245 + 12345) % 1048576
        m2 = ((m1 + b) * 1103515245 + 12345) % 1048576
        u = m2 / 1048576.0
        for k, t in enumerate(thresholds):
            if u < t:
                return k
        return len(thresholds)

    means = []
    for b in range(_BOOT_B):
        sw = swc = 0
        for eid, cents in rows:
            w = weight(eid, b)
            sw += w
            swc += w * cents
        if sw > 0:
            means.append(round(swc / (sw * 100.0), 4))
    means.sort()
    out = q_poisson_bootstrap(spark, SF_DIR).collect()[0]
    assert out.n_rows == len(rows)
    assert out.point_mean == pytest.approx(
        sum(c for _, c in rows) / (len(rows) * 100.0), abs=1e-3
    )
    assert out.n_replicates == len(means)
    lo = means[math.ceil(0.05 * len(means)) - 1]
    hi = means[math.ceil(0.95 * len(means)) - 1]
    assert out.ci_lo == pytest.approx(lo, abs=1e-6)
    assert out.ci_hi == pytest.approx(hi, abs=1e-6)
    assert out.ci_lo <= out.point_mean <= out.ci_hi


def test_benford_matches_direct_counts(spark):
    rows = load_table(spark, "orders", SF_DIR).collect()
    counts = defaultdict(lambda: defaultdict(int))
    for r in rows:
        if r.o_totalprice > 0:
            counts[r.o_orderpriority][
                int(str(int(round(r.o_totalprice * 100)))[0])
            ] += 1
    shares = [float(s) for s in _BENFORD_SHARES]
    out = {(r.priority, r.digit): r for r in q_benford(spark, SF_DIR).collect()}
    for prio, per_digit in counts.items():
        nt = sum(per_digit.values())
        chi2 = sum(
            (per_digit.get(d, 0) - nt * shares[d - 1]) ** 2 / (nt * shares[d - 1])
            for d in range(1, 10)
        )
        for d in range(1, 10):
            got = out[(prio, d)]
            assert got.n == per_digit.get(d, 0)
            assert got.obs_share == pytest.approx(
                per_digit.get(d, 0) / nt, abs=1e-4
            )
            assert got.exp_share == pytest.approx(shares[d - 1], abs=1e-5)
            assert got.chi2 == pytest.approx(chi2, abs=1e-2)
            assert got.flagged == int(chi2 > 15.50731305586545)


def _ntile(keys: list, n: int) -> dict:
    """Replay SQL ntile: first (len % n) buckets get one extra row."""
    out, total = {}, len(keys)
    base, extra = divmod(total, n)
    i = 0
    for b in range(1, n + 1):
        size = base + (1 if b <= extra else 0)
        for k in keys[i : i + size]:
            out[k] = b
        i += size
    return out


def test_rfm_matches_replayed_ntile(spark):
    orders = load_table(spark, "orders", SF_DIR).collect()
    nation = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, "customer", SF_DIR).collect()
    }
    md = max(r.o_orderdate.date() for r in orders)
    per = defaultdict(lambda: [None, 0, 0])  # last_date, freq, cents
    for r in orders:
        s = per[r.o_custkey]
        d = r.o_orderdate.date()
        s[0] = d if s[0] is None or d > s[0] else s[0]
        s[1] += 1
        s[2] += int(round(r.o_totalprice * 100))
    by_nation = defaultdict(list)
    for ck, (last, freq, cents) in per.items():
        by_nation[nation[ck]].append(((md - last).days, freq, cents, ck))
    cells = defaultdict(lambda: [0, 0])
    for nk, custs in by_nation.items():
        r_q = _ntile([c[3] for c in sorted(custs, key=lambda c: (c[0], c[3]))], 5)
        f_q = _ntile([c[3] for c in sorted(custs, key=lambda c: (-c[1], c[3]))], 5)
        m_q = _ntile([c[3] for c in sorted(custs, key=lambda c: (-c[2], c[3]))], 5)
        for _, _, cents, ck in custs:
            cell = cells[(r_q[ck], f_q[ck], m_q[ck])]
            cell[0] += 1
            cell[1] += cents
    out = {
        (r.r_q, r.f_q, r.m_q): r
        for r in q_rfm_segmentation(spark, SF_DIR).collect()
    }
    assert set(out) == set(cells)
    for key, (n_cust, cents) in cells.items():
        assert out[key].n_customers == n_cust
        assert out[key].total_monetary_cents == cents
        r_q, f_q, m_q = key
        if r_q == 1 and f_q <= 2 and m_q <= 2:
            seg = "champion"
        elif r_q >= 4 and f_q <= 2:
            seg = "at_risk"
        elif r_q >= 4 and f_q >= 4:
            seg = "lost"
        else:
            seg = "regular"
        assert out[key].segment == seg


def test_ranking_metrics_matches_brute_rerank(spark):
    """Sequential-fold cosine (bit-matching the engine's zip_with
    aggregate), full rerank, textbook NDCG/MRR/P@k."""
    rows = load_table(spark, "embeddings", SF_DIR).collect()
    vecs = {r.vec_id: ([float(x) for x in r.embedding], r.label) for r in rows}
    label_cnt = defaultdict(int)
    for _, lbl in vecs.values():
        label_cnt[lbl] += 1
    probe_ids = sorted(vecs)[:_RM_PANEL]

    def cos(a: list, b: list) -> float:
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return round(dot / math.sqrt(na * nb), 6)

    disc = [round(1e6 / math.log2(r + 1)) for r in range(1, _RM_K + 1)]
    out = {r.query_id: r for r in q_ranking_metrics(spark, SF_DIR).collect()}
    assert set(out) == set(probe_ids)
    for qid in probe_ids:
        qv, qlabel = vecs[qid]
        scored = sorted(
            (
                (-cos(vecs[vid][0], qv), vid, vecs[vid][1])
                for vid in vecs
                if vid != qid
            ),
        )[:_RM_K]
        rels = [int(lbl == qlabel) for _, _, lbl in scored]
        n_rel = label_cnt[qlabel] - 1
        dcg = sum(r * d for r, d in zip(rels, disc))
        idcg = sum(disc[: min(n_rel, _RM_K)])
        got = out[qid]
        assert got.p_at_k == pytest.approx(sum(rels) / _RM_K, abs=1e-5)
        first = next((i + 1 for i, r in enumerate(rels) if r), None)
        assert got.mrr == pytest.approx(1.0 / first if first else 0.0, abs=1e-4)
        assert got.ndcg == pytest.approx(
            dcg / idcg if idcg else 0.0, abs=1e-4
        )
        assert got.n_rel_corpus == n_rel


# --- property test: the FIFO closed form IS the loop -------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=50), max_size=12),
    st.lists(st.integers(min_value=1, max_value=50), max_size=12),
)
def test_fifo_interval_identity_equals_two_pointer(receipts, issues):
    """Pure-math property behind q_fifo_inventory: for ANY quantity
    sequences, the cumulative-interval overlap formula produces exactly
    the allocations of the textbook two-pointer FIFO loop."""
    # closed form: match (r, i) iff intervals overlap; qty = overlap
    rhi = [sum(receipts[: k + 1]) for k in range(len(receipts))]
    ihi = [sum(issues[: k + 1]) for k in range(len(issues))]
    closed = {}
    for r, rh in enumerate(rhi):
        rl = rh - receipts[r]
        for i, ih in enumerate(ihi):
            il = ih - issues[i]
            if rl < ih and il < rh:
                closed[(r, i)] = min(rh, ih) - max(rl, il)
    # two-pointer replay
    loop = {}
    ri = ii = 0
    rrem = receipts[0] if receipts else 0
    irem = issues[0] if issues else 0
    while ri < len(receipts) and ii < len(issues):
        take = min(rrem, irem)
        if take > 0:
            loop[(ri, ii)] = take
        rrem -= take
        irem -= take
        if rrem == 0:
            ri += 1
            rrem = receipts[ri] if ri < len(receipts) else 0
        if irem == 0:
            ii += 1
            irem = issues[ii] if ii < len(issues) else 0
    assert closed == loop
    # conservation: total matched = min(total supply, total demand)
    assert sum(closed.values()) == min(sum(receipts), sum(issues))
    # linear output bound: matches <= receipts + issues - 1
    if closed:
        assert len(closed) <= len(receipts) + len(issues) - 1
