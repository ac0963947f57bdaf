"""Wave-16 unit tests: recompute each operator's answer in plain
Python from the fixture (interval sweep, streak scan, first-seen sets,
lag-7 backtest, pooled z-test, numpy percentiles, diversity closed
forms, the LCG Laplace draw, brute-force haversine) and require the
distributed implementation to match — properties the oracle-parity
hash checks on one engine pair, these check against a third,
independent implementation."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_measurement import (
    _AB_SPEND,
    _DP_B,
    _GEO_RADIUS_KM,
    _LCG_A,
    _LCG_C,
    _LCG_M,
    q_ab_test,
    q_diversity_index,
    q_dp_noise,
    q_spatial_knn,
    q_winsorize,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_temporal import (
    q_gaps_islands,
    q_interval_merge,
    q_running_distinct,
    q_seasonal_naive,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def events_rows(spark):
    return load_table(spark, "events", SF_DIR).collect()


def _epoch_us(ts) -> int:
    return int(ts.timestamp() * 1_000_000)


def _utc_date(ts):
    """UTC calendar day of a collected Spark timestamp. PySpark renders
    TimestampType in the driver's LOCAL timezone, so ``ts.date()``
    shifts under a non-UTC TZ env while the engine (session TZ pinned
    UTC) does not; round-tripping through the epoch instant is
    TZ-invariant."""
    import datetime

    return datetime.datetime.fromtimestamp(
        ts.timestamp(), tz=datetime.timezone.utc
    ).date()


def test_interval_merge_matches_sweep(spark, events_rows):
    by_user = defaultdict(list)
    for r in events_rows:
        s = _epoch_us(r.ts)
        by_user[r.user_id].append((s, s + math.floor(r.value * 60000000)))
    expected = {}
    for u, ivs in by_user.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        lens = [e - s for s, e in merged]
        expected[u] = (len(ivs), len(merged), sum(lens), max(lens))
    out = {r.user_id: r for r in q_interval_merge(spark, SF_DIR).collect()}
    assert set(out) == set(expected)
    for u, (n_raw, n_merged, covered, mx) in expected.items():
        row = out[u]
        assert (row.n_raw, row.n_merged, row.covered_us, row.max_merged_us) == (
            n_raw,
            n_merged,
            covered,
            mx,
        ), f"user {u}"


def test_gaps_islands_matches_streak_scan(spark, events_rows):
    days = defaultdict(set)
    for r in events_rows:
        days[r.user_id].add(_utc_date(r.ts))
    expected = {}
    for u, ds in days.items():
        ordered = sorted(ds)
        streaks, cur, max_gap = [], 1, 0
        for prev, nxt in zip(ordered, ordered[1:]):
            gap = (nxt - prev).days - 1
            max_gap = max(max_gap, gap)
            if gap == 0:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        expected[u] = (len(ordered), len(streaks), max(streaks), max_gap)
    out = {r.user_id: r for r in q_gaps_islands(spark, SF_DIR).collect()}
    assert set(out) == set(expected)
    for u, (active, n_streaks, mx, gap) in expected.items():
        row = out[u]
        assert (
            row.active_days,
            row.n_streaks,
            row.max_streak_days,
            row.max_gap_days,
        ) == (active, n_streaks, mx, gap), f"user {u}"


def test_running_distinct_matches_first_seen(spark, events_rows):
    first_seen, per_day = {}, defaultdict(set)
    for r in events_rows:
        d = _utc_date(r.ts)
        per_day[d].add(r.user_id)
        if r.user_id not in first_seen or d < first_seen[r.user_id]:
            first_seen[r.user_id] = d
    new_by_day = defaultdict(int)
    for d in first_seen.values():
        new_by_day[d] += 1
    out = q_running_distinct(spark, SF_DIR).collect()
    assert [r.d for r in out] == sorted(per_day)
    cum = 0
    for r in out:
        cum += new_by_day.get(r.d, 0)
        assert r.active_users == len(per_day[r.d])
        assert r.new_users == new_by_day.get(r.d, 0)
        assert r.returning_users == r.active_users - r.new_users
        assert r.cum_users == cum
    assert out[-1].cum_users == len(first_seen)


def test_seasonal_naive_matches_backtest(spark, events_rows):
    daily = defaultdict(lambda: defaultdict(int))
    for r in events_rows:
        daily[r.event_type][_utc_date(r.ts)] += 1
    out = {r.event_type: r for r in q_seasonal_naive(spark, SF_DIR).collect()}
    for et, series in daily.items():
        ds = sorted(series)
        n = [series[d] for d in ds]
        md = ds[-1]
        idx = [
            i
            for i in range(len(ds))
            if (md - ds[i]).days < 14 and i >= 7
        ]
        mape7 = np.mean([abs(n[i] - n[i - 7]) / n[i] for i in idx])
        mape1 = np.mean([abs(n[i] - n[i - 1]) / n[i] for i in idx])
        smape = np.mean(
            [2.0 * abs(n[i] - n[i - 7]) / (n[i] + n[i - 7]) for i in idx]
        )
        row = out[et]
        assert row.n_days_eval == len(idx)
        assert row.mape_seasonal == pytest.approx(mape7, abs=1e-4)
        assert row.mape_naive == pytest.approx(mape1, abs=1e-4)
        assert row.smape_seasonal == pytest.approx(smape, abs=1e-4)


def test_ab_test_matches_pooled_z(spark, events_rows):
    spend = defaultdict(float)
    users = set()
    for r in events_rows:
        users.add(r.user_id)
        if r.event_type == "purchase":
            spend[r.user_id] += r.value
    arms = {0: [0, 0], 1: [0, 0]}  # variant -> [n, conv]
    for u in users:
        v = 0 if (u * _LCG_A + _LCG_C) % _LCG_M < _LCG_M // 2 else 1
        arms[v][0] += 1
        arms[v][1] += int(spend[u] > _AB_SPEND)
    (n_a, conv_a), (n_b, conv_b) = arms[0], arms[1]
    row = q_ab_test(spark, SF_DIR).collect()[0]
    assert (row.n_a, row.conv_a, row.n_b, row.conv_b) == (
        n_a,
        conv_a,
        n_b,
        conv_b,
    )
    ra, rb = conv_a / n_a, conv_b / n_b
    pooled = (conv_a + conv_b) / (n_a + n_b)
    se = math.sqrt(pooled * (1 - pooled) * (1 / n_a + 1 / n_b))
    z = (rb - ra) / se if se else None
    assert row.lift == pytest.approx(rb - ra, abs=1e-4)
    if z is not None:
        assert row.z_score == pytest.approx(z, abs=1e-3)
        assert row.significant == int(abs(z) > 1.96)


def test_winsorize_matches_numpy(spark):
    rows = load_table(spark, "customer", SF_DIR).collect()
    by_seg = defaultdict(list)
    for r in rows:
        by_seg[r.c_mktsegment].append(r.c_acctbal)
    out = {r.c_mktsegment: r for r in q_winsorize(spark, SF_DIR).collect()}
    assert set(out) == set(by_seg)
    for seg, vals in by_seg.items():
        a = np.asarray(vals)
        # numpy 'linear' interpolation == Spark percentile == quantile_cont
        p05 = round(float(np.quantile(a, 0.05)), 4)
        p95 = round(float(np.quantile(a, 0.95)), 4)
        row = out[seg]
        assert row.n == len(vals)
        assert row.raw_mean == pytest.approx(a.mean(), abs=1e-3)
        assert row.winsorized_mean == pytest.approx(
            np.clip(a, p05, p95).mean(), abs=1e-3
        )
        in_band = a[(a >= p05) & (a <= p95)]
        assert row.trimmed_mean == pytest.approx(in_band.mean(), abs=1e-3)
        assert row.n_clipped == len(vals) - len(in_band)
        # robust means sit inside the clip band; raw may not
        assert p05 <= row.trimmed_mean <= p95


def test_diversity_closed_forms(spark, events_rows):
    counts = defaultdict(lambda: defaultdict(int))
    for r in events_rows:
        counts[r.user_id][r.event_type] += 1
    out = {r.user_id: r for r in q_diversity_index(spark, SF_DIR).collect()}
    assert set(out) == set(counts)
    for u, cs in counts.items():
        t = sum(cs.values())
        ps = [c / t for c in cs.values()]
        row = out[u]
        assert row.n_events == t and row.n_types == len(cs)
        assert row.shannon == pytest.approx(
            -sum(p * math.log(p) for p in ps), abs=1e-4
        )
        assert row.simpson == pytest.approx(sum(p * p for p in ps), abs=1e-4)
        assert row.top_share == pytest.approx(max(ps), abs=1e-4)
        # closed-form bounds: 0 <= H <= ln(k); 1/k <= simpson <= 1
        assert -1e-9 <= row.shannon <= math.log(len(cs)) + 1e-9
        assert 1 / len(cs) - 1e-9 <= row.simpson <= 1 + 1e-9


def test_dp_noise_matches_seeded_laplace(spark, events_rows):
    daily = defaultdict(int)
    for r in events_rows:
        daily[(r.event_type, _utc_date(r.ts))] += 1
    out = q_dp_noise(spark, SF_DIR).collect()
    assert len(out) == len(daily)
    epoch = __import__("datetime").date(1970, 1, 1)
    for row in out:
        n = daily[(row.event_type, row.d)]
        key = (row.d - epoch).days * 256 + ord(row.event_type[0])
        residue = (key * _LCG_A + _LCG_C) % _LCG_M
        u = (residue + 0.5) / _LCG_M - 0.5
        lap = -_DP_B * math.copysign(1.0, u) * math.log(1 - 2 * abs(u))
        assert row.n == n
        assert row.noisy_n == pytest.approx(n + lap, abs=1e-3)
        assert row.abs_noise == pytest.approx(abs(lap), abs=1e-3)


def test_spatial_knn_matches_brute_force(spark):
    custs = load_table(spark, "customer", SF_DIR).collect()
    supps = load_table(spark, "supplier", SF_DIR).collect()

    def cust_pos(k):
        return (
            ((k * 2654435761) % 120000) / 12000.0 + 40,
            ((k * 40503 + 7919) % 240000) / 12000.0,
        )

    def supp_pos(k):
        return (
            ((k * 2654435761 + 999331) % 120000) / 12000.0 + 40,
            ((k * 40503 + 104729) % 240000) / 12000.0,
        )

    def hav(p, q):
        dphi = math.radians(q[0] - p[0]) / 2
        dlmb = math.radians(q[1] - p[1]) / 2
        a = (
            math.sin(dphi) ** 2
            + math.cos(math.radians(p[0]))
            * math.cos(math.radians(q[0]))
            * math.sin(dlmb) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(a))

    spos = [(s.s_suppkey, supp_pos(s.s_suppkey)) for s in supps]
    expected = {}
    for c in custs:
        cp = cust_pos(c.c_custkey)
        hits = sorted(
            (round(hav(cp, sp), 6), sk)
            for sk, sp in spos
            if round(hav(cp, sp), 6) <= _GEO_RADIUS_KM
        )
        if hits:
            expected[c.c_custkey] = (len(hits), hits[0][1], round(hits[0][0], 3))
    out = {r.c_custkey: r for r in q_spatial_knn(spark, SF_DIR).collect()}
    assert set(out) == set(expected), (
        "blocked join must equal brute force — a miss means the grid "
        "neighborhood failed to cover the radius"
    )
    for ck, (n_within, sk, d) in expected.items():
        row = out[ck]
        assert (row.n_within, row.nearest_suppkey) == (n_within, sk)
        assert row.nearest_km == pytest.approx(d, abs=1e-3)
    # sanity: the fixture actually exercises the operator
    assert len(expected) > 0
