"""Wave-18 unit tests: Python-recomputed ground truth — PSI from the
binned definition, leave-fold-out encoding from the subtraction
identity's naive per-fold form, k-anonymity from direct group counts,
and the feature backfill from a per-user event replay (the strongest
leakage check: the replay only ever looks strictly backwards)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_mlops import (
    _K_ANON,
    _PSI_BIN_W,
    _PSI_BINS,
    _PSI_EPS,
    _TE_FOLDS,
    _TE_SMOOTH,
    _US_7D,
    _US_30D,
    q_feature_backfill,
    q_k_anonymity,
    q_psi_drift,
    q_target_encoding,
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


def test_psi_matches_definition(spark, events_rows):
    times = [_us(r.ts) for r in events_rows]
    mid = (min(times) + max(times)) // 2
    cells = defaultdict(lambda: [defaultdict(int), defaultdict(int)])
    for r in events_rows:
        b = min(int(r.value // _PSI_BIN_W), _PSI_BINS - 1)
        cells[r.event_type][0 if _us(r.ts) < mid else 1][b] += 1
    out = {r.event_type: r for r in q_psi_drift(spark, SF_DIR).collect()}
    assert set(out) == set(cells)
    for et, (ref, cur) in cells.items():
        nr, nc = sum(ref.values()), sum(cur.values())
        psi = 0.0
        for b in set(ref) | set(cur):
            pr = max(ref.get(b, 0) / nr, _PSI_EPS)
            pc = max(cur.get(b, 0) / nc, _PSI_EPS)
            psi += (pc - pr) * math.log(pc / pr)
        assert out[et].psi == pytest.approx(psi, abs=1e-4)
        assert out[et].drifted == int(psi > 0.2)


def test_target_encoding_matches_naive_per_fold(spark):
    """The engine computes all folds in one pass via the subtraction
    identity; recompute each fold's encoder the naive way (drop the
    fold, aggregate the rest) and require equality."""
    cust = {
        r.c_custkey: r.c_mktsegment
        for r in load_table(spark, "customer", SF_DIR).collect()
    }
    rows = [
        (cust[r.o_custkey], r.o_custkey % _TE_FOLDS, r.o_totalprice)
        for r in load_table(spark, "orders", SF_DIR).collect()
        if r.o_custkey in cust
    ]
    gmean = sum(y for _, _, y in rows) / len(rows)
    out = {
        (r.category, r.fold): r
        for r in q_target_encoding(spark, SF_DIR).collect()
    }
    cats = {c for c, _, _ in rows}
    for cat in cats:
        for fold in range(_TE_FOLDS):
            others = [y for c, f, y in rows if c == cat and f != fold]
            mine = [y for c, f, y in rows if c == cat and f == fold]
            if not mine:
                assert (cat, fold) not in out
                continue
            enc = (sum(others) + _TE_SMOOTH * gmean) / (
                len(others) + _TE_SMOOTH
            )
            row = out[(cat, fold)]
            assert row.n_in_fold == len(mine)
            assert row.encoded == pytest.approx(enc, abs=1e-2)
            assert row.fold_raw_mean == pytest.approx(
                sum(mine) / len(mine), abs=1e-2
            )


def test_k_anonymity_matches_group_counts(spark):
    cust = load_table(spark, "customer", SF_DIR).collect()
    region = {
        r.n_nationkey: r.n_regionkey
        for r in load_table(spark, "nation", SF_DIR).collect()
    }
    l0, l1, l2 = defaultdict(int), defaultdict(int), defaultdict(int)
    for r in cust:
        l0[(r.c_nationkey, r.c_mktsegment)] += 1
        l1[(region[r.c_nationkey], r.c_mktsegment)] += 1
        l2[r.c_mktsegment] += 1
    out = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in q_k_anonymity(spark, SF_DIR).collect()
    }
    assert set(out) == set(l0)
    for (nk, seg), n in l0.items():
        row = out[(nk, seg)]
        assert row.group_size == n
        if n >= _K_ANON:
            lvl = 0
        elif l1[(region[nk], seg)] >= _K_ANON:
            lvl = 1
        elif l2[seg] >= _K_ANON:
            lvl = 2
        else:
            lvl = 999
        assert row.anonymity_level == lvl
    # the audit is non-trivial on this fixture: some group needs
    # generalization and every group resolves below level 999
    assert any(r.anonymity_level > 0 for r in out.values())
    assert all(r.anonymity_level < 999 for r in out.values())


def test_feature_backfill_matches_replay(spark, events_rows):
    per_user = defaultdict(list)
    for r in events_rows:
        per_user[r.user_id].append(
            (_us(r.ts), r.event_id, r.event_type, math.floor(r.value * 100 + 0.5))
        )
    out = {r.event_id: r for r in q_feature_backfill(spark, SF_DIR).collect()}
    n_checked = 0
    for u, evs in per_user.items():
        evs.sort()
        for t, eid, et, cents in evs:
            if et != "purchase":
                continue
            views = sum(
                1
                for t2, _, et2, _ in evs
                if et2 == "view" and t - _US_7D <= t2 <= t - 1
            )
            spend = sum(
                c2
                for t2, _, et2, c2 in evs
                if et2 == "purchase" and t - _US_30D <= t2 <= t - 1
            )
            prior = sum(1 for t2, _, _, _ in evs if t2 <= t - 1)
            row = out[eid]
            assert row.views_7d == views
            assert row.spend_30d_cents == spend
            assert row.prior_events == prior
            n_checked += 1
    assert n_checked == len(out) > 0
