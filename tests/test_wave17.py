"""Wave-17 unit tests: recompute each operator in plain Python — the
clamped balance runs the ACTUAL max(0, ·) recursion (not the window
identity the engine uses), proration runs the textbook largest-
remainder algorithm, attribution replays the touch log — so the
distributed closed forms are checked against the definitional
algorithms they replace."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_ledger import (
    _ATTR_WINDOW_US,
    q_attribution,
    q_clamped_balance,
    q_event_sequence,
    q_proration,
    q_robust_center,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def events_rows(spark):
    return load_table(spark, "events", SF_DIR).collect()


def _us(ts) -> int:
    return int(ts.timestamp() * 1_000_000)


def _cents(v: float) -> int:
    """round-half-away like Spark/DuckDB round() (python round() is
    banker's — differs on binary-exact .5 products like 0.125*100)."""
    return math.floor(v * 100 + 0.5)


def test_proration_matches_largest_remainder(spark):
    li = load_table(spark, "lineitem", SF_DIR).collect()
    orders = {
        r.o_orderkey: _cents(r.o_totalprice)
        for r in load_table(spark, "orders", SF_DIR).collect()
    }
    by_order = defaultdict(list)
    for r in li:
        by_order[r.l_orderkey].append(
            (r.l_linenumber, _cents(r.l_extendedprice))
        )
    out = {r.l_orderkey: r for r in q_proration(spark, SF_DIR).collect()}
    assert set(out) == set(by_order)
    for ok, items in by_order.items():
        cents = orders[ok]
        W = sum(w for _, w in items)
        # the fixture repeats l_linenumber within an order — work on
        # per-item lists with the query's (rem desc, ln, wc) tie-break
        allocs = []
        for ln, w in items:
            allocs.append([cents * w // W, cents * w % W, ln, w])
        leftover = cents - sum(a[0] for a in allocs)
        assert 0 <= leftover < len(items)
        for a in sorted(allocs, key=lambda a: (-a[1], a[2], a[3]))[:leftover]:
            a[0] += 1
        vals = [a[0] for a in allocs]
        row = out[ok]
        assert row.n_items == len(items)
        assert row.cents_total == cents
        assert row.cents_allocated == cents  # exact conservation
        assert row.exact == 1
        assert row.max_item_cents == max(vals)
        assert row.min_item_cents == min(vals)


def test_clamped_balance_matches_true_recursion(spark, events_rows):
    """Run the definitional x_t = max(0, x_{t-1} + d_t) loop and require
    the engine's two-window closed form to reproduce it exactly."""
    tx = defaultdict(list)
    for r in events_rows:
        c = _cents(r.value)
        d = c if r.event_type in ("purchase", "signup") else -c
        tx[r.user_id].append((_us(r.ts), r.event_id, d))
    out = {r.user_id: r for r in q_clamped_balance(spark, SF_DIR).collect()}
    assert set(out) == set(tx)
    for u, rows in tx.items():
        rows.sort()
        x, peak, hits = 0, -math.inf, 0
        for _, _, d in rows:
            x = max(0, x + d)
            peak = max(peak, x)
            if x == 0 and d < 0:
                hits += 1
        row = out[u]
        assert row.n_tx == len(rows)
        assert row.final_cents == x
        assert row.peak_cents == peak
        assert row.floor_hits == hits, f"user {u}"


def test_robust_center_matches_definitions(spark):
    rows = load_table(spark, "customer", SF_DIR).collect()
    by_nation = defaultdict(lambda: ([], defaultdict(int)))
    for r in rows:
        bals, segs = by_nation[r.c_nationkey]
        if r.c_acctbal is not None:
            bals.append(r.c_acctbal)
        segs[r.c_mktsegment] += 1

    def disc_median(vals):
        s = sorted(vals)
        # smallest value with cume_dist >= 0.5
        return s[math.ceil(len(s) / 2) - 1]

    out = {r.c_nationkey: r for r in q_robust_center(spark, SF_DIR).collect()}
    assert set(out) == set(by_nation)
    for nk, (bals, segs) in by_nation.items():
        med = round(disc_median(bals), 4)
        mad = round(disc_median([abs(b - med) for b in bals]), 4)
        mode = min(
            segs.items(), key=lambda kv: (-kv[1], kv[0] if kv[0] is not None else "￿")
        )[0]
        row = out[nk]
        assert row.median_bal == pytest.approx(med, abs=1e-6)
        assert row.mad_bal == pytest.approx(mad, abs=1e-6)
        assert row.mode_segment == mode


def test_event_sequence_matches_replay(spark, events_rows):
    seqs = defaultdict(list)
    for r in events_rows:
        seqs[r.user_id].append((_us(r.ts), r.event_id, r.event_type[0]))
    out = {r.user_id: r for r in q_event_sequence(spark, SF_DIR).collect()}
    assert set(out) == set(seqs)
    for u, evs in seqs.items():
        evs.sort()
        s = "".join(c for _, _, c in evs)
        row = out[u]
        assert row.seq_len == len(s)
        assert row.n_view_click == s.count("vc")
        vi = s.find("v")
        has = 0
        if vi >= 0:
            ci = s.find("c", vi + 1)
            if ci >= 0 and s.find("p", ci + 1) >= 0:
                has = 1
        assert row.has_funnel == has
        assert row.first_event == s[0] and row.last_event == s[-1]


def test_attribution_matches_replay(spark, events_rows):
    per_user = defaultdict(list)
    for r in events_rows:
        if r.event_type in ("view", "click", "purchase"):
            kind = 0 if r.event_type != "purchase" else 1
            per_user[r.user_id].append(
                (_us(r.ts), kind, r.event_id, r.event_type, r.value)
            )
    expected = defaultdict(lambda: [0, 0.0])
    for u, evs in per_user.items():
        evs.sort()
        last_touch = None
        for t, kind, _, et, val in evs:
            if kind == 0:
                last_touch = (t, et)
            elif last_touch and last_touch[0] >= t - _ATTR_WINDOW_US:
                expected[last_touch[1]][0] += 1
                expected[last_touch[1]][1] += val
            else:
                expected["direct"][0] += 1
                expected["direct"][1] += val
    out = {r.channel: r for r in q_attribution(spark, SF_DIR).collect()}
    assert set(out) == set(expected)
    for ch, (n, rev) in expected.items():
        assert out[ch].n_conversions == n
        assert out[ch].revenue == pytest.approx(rev, abs=1e-2)
