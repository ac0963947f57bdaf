"""Wave-23 unit tests: Python-recomputed ground truth — cycle times
from a direct per-order replay, month-over-month from a dict rollup,
and prefix completions from a Counter."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_temporal import (
    q_mom_revenue,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_text import (
    _PREFIX_LEN,
    _PREFIX_MIN_FREQ,
    _PREFIX_TOPK,
    q_prefix_completions,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_warehouse import (
    q_order_cycle_time,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def test_order_cycle_time_matches_replay(spark):
    last_ship = {}
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        d = r.l_shipdate.date()
        k = r.l_orderkey
        last_ship[k] = d if k not in last_ship or d > last_ship[k] else last_ship[k]
    per = defaultdict(list)
    for r in load_table(spark, "orders", SF_DIR).collect():
        if r.o_orderkey in last_ship:
            per[r.o_orderpriority].append(
                (last_ship[r.o_orderkey] - r.o_orderdate.date()).days
            )
    out = {r.priority: r for r in q_order_cycle_time(spark, SF_DIR).collect()}
    assert set(out) == set(per)
    for prio, days in per.items():
        days.sort()
        got = out[prio]
        assert got.n_orders == len(days)
        assert got.p50_days == days[math.ceil(0.5 * len(days)) - 1]
        assert got.p90_days == days[math.ceil(0.9 * len(days)) - 1]
        assert got.mean_days == pytest.approx(sum(days) / len(days), abs=1e-3)


def test_mom_revenue_matches_rollup(spark):
    seg = {
        r.c_custkey: r.c_mktsegment
        for r in load_table(spark, "customer", SF_DIR).collect()
    }
    monthly = defaultdict(int)
    for r in load_table(spark, "orders", SF_DIR).collect():
        m = r.o_orderdate.date().replace(day=1)
        monthly[(seg[r.o_custkey], m)] += int(round(r.o_totalprice * 100))
    out = {(r.segment, r.month): r for r in q_mom_revenue(spark, SF_DIR).collect()}
    assert set(out) == set(monthly)
    by_seg = defaultdict(list)
    for (s, m), cents in monthly.items():
        by_seg[s].append((m, cents))
    for s, series in by_seg.items():
        series.sort()
        prev = None
        for m, cents in series:
            got = out[(s, m)]
            assert got.revenue_cents == cents
            if prev is None:
                assert got.prev_cents is None and got.mom_pct is None
            else:
                assert got.prev_cents == prev
                assert got.mom_pct == pytest.approx(
                    (cents - prev) / prev, abs=1e-4
                )
            prev = cents


def test_prefix_completions_match_counter(spark):
    freq = defaultdict(int)
    for r in load_table(spark, "documents", SF_DIR).collect():
        for w in r.text.split(" "):
            if len(w) >= _PREFIX_LEN:
                freq[w] += 1
    by_prefix = defaultdict(list)
    for w, f in freq.items():
        if f >= _PREFIX_MIN_FREQ:
            by_prefix[w[:_PREFIX_LEN]].append((-f, w))
    expected = []
    for p in sorted(by_prefix):
        for rnk, (nf, w) in enumerate(sorted(by_prefix[p])[:_PREFIX_TOPK], 1):
            expected.append((p, w, -nf, rnk))
    got = [
        (r.prefix, r.word, r.freq, r.rnk)
        for r in q_prefix_completions(spark, SF_DIR).collect()
    ]
    assert got == expected
    assert got, "fixture vocabulary must produce completions"
