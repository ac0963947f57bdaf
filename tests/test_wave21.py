"""Wave-21 unit tests: Python-recomputed ground truth — grid-DBSCAN
from a flood fill over dense cells, session paths from a replayed gap
sessionizer, SLO burn from direct daily percentiles, inventory aging
from the FIFO leftover identity (checked AGAINST the two-pointer
replay, the strongest cross-operator check), and weekday seasonality
from the centered-MA definition."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import date

import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_ledger import (
    _FIFO_BRAND,
    q_inventory_aging,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_measurement import (
    _DB_CELL_DEG,
    _DB_DENSE_Q,
    q_grid_dbscan,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_temporal import (
    _SLO_P95,
    _SLO_WINDOW_D,
    q_slo_burn,
    q_weekday_seasonality,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_warehouse import (
    _PATH_GAP_S,
    _PATH_LEN,
    _PATH_TOPK,
    q_session_path_topk,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def test_grid_dbscan_matches_flood_fill(spark):
    cust = load_table(spark, "customer", SF_DIR).collect()
    cells = defaultdict(int)
    for r in cust:
        lat = ((r.c_custkey * 2654435761) % 120000) / 12000.0 + 40
        lon = ((r.c_custkey * 40503 + 7919) % 240000) / 12000.0
        cells[
            (
                int(math.floor(lat / _DB_CELL_DEG)),
                int(math.floor(lon / _DB_CELL_DEG)),
            )
        ] += 1
    counts = sorted(cells.values())
    min_pts = counts[math.ceil(_DB_DENSE_Q * len(counts)) - 1]
    dense = {cy * 100 + cx: (cy, cx, n) for (cy, cx), n in cells.items()
             if n >= min_pts}
    # flood fill over 8-adjacency
    seen, clusters = set(), {}
    for start in sorted(dense):
        if start in seen:
            continue
        stack, members = [start], []
        seen.add(start)
        while stack:
            c = stack.pop()
            members.append(c)
            cy, cx, _ = dense[c]
            for other, (oy, ox, _) in dense.items():
                if other not in seen and abs(oy - cy) <= 1 and abs(ox - cx) <= 1:
                    seen.add(other)
                    stack.append(other)
        cid = min(members)
        clusters[cid] = (len(members), sum(dense[m][2] for m in members))
    out = {r.cluster_id: (r.n_cells, r.n_points)
           for r in q_grid_dbscan(spark, SF_DIR).collect()}
    assert out == clusters
    assert out, "fixture geography must yield at least one dense cluster"


def test_session_paths_match_replayed_sessionizer(spark):
    rows = sorted(
        load_table(spark, "events", SF_DIR).collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    paths = defaultdict(int)
    n_sessions = 0
    cur_user, last_ts, cur_path = None, None, None
    for r in rows:
        new = (
            r.user_id != cur_user
            or (r.ts - last_ts).total_seconds() > _PATH_GAP_S
        )
        if new:
            if cur_path is not None:
                paths[cur_path[:_PATH_LEN]] += 1
                n_sessions += 1
            cur_user, cur_path = r.user_id, ""
        cur_path += r.event_type[0]
        last_ts = r.ts
    if cur_path is not None:
        paths[cur_path[:_PATH_LEN]] += 1
        n_sessions += 1
    ranked = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:_PATH_TOPK]
    out = q_session_path_topk(spark, SF_DIR).collect()
    assert [(r.path, r.n) for r in out] == ranked
    for r in out:
        assert r.share == pytest.approx(
            dict(ranked)[r.path] / n_sessions, abs=1e-4
        )
    assert [r.rank for r in out] == list(range(1, len(out) + 1))


def test_slo_burn_matches_direct_percentile(spark):
    rows = load_table(spark, "events", SF_DIR).collect()
    daily = defaultdict(list)
    for r in rows:
        daily[(r.event_type, r.ts.date())].append(r.value)
    p95, breach = {}, {}
    for k, vals in daily.items():
        vals.sort()
        p95[k] = round(vals[math.ceil(0.95 * len(vals)) - 1], 4)
        breach[k] = int(p95[k] > _SLO_P95)
    out = q_slo_burn(spark, SF_DIR).collect()
    assert len(out) == len(daily)
    by_type = defaultdict(list)
    for r in out:
        by_type[r.event_type].append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.d)
        for i, r in enumerate(rs):
            assert r.p95 == pytest.approx(p95[(et, r.d)], abs=1e-6)
            assert r.breach == breach[(et, r.d)]
            exp7 = sum(
                breach[(et, rs[j].d)]
                for j in range(max(0, i - _SLO_WINDOW_D + 1), i + 1)
            )
            assert r.breaches_7d == exp7
            assert r.burn_rate == pytest.approx(exp7 / _SLO_WINDOW_D, abs=1e-5)


def test_inventory_aging_matches_fifo_replay(spark):
    """The scalar leftover identity must equal what the two-pointer
    FIFO replay leaves in each receipt lot."""
    part = {
        r.p_partkey
        for r in load_table(spark, "part", SF_DIR).collect()
        if r.p_brand == _FIFO_BRAND
    }
    sides = {"F": defaultdict(list), "O": defaultdict(list)}
    maxd = None
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        if r.l_partkey in part:
            d = r.l_shipdate.date()
            maxd = d if maxd is None or d > maxd else maxd
            sides[r.l_linestatus][r.l_partkey].append(
                (r.l_shipdate, r.l_orderkey, r.l_linenumber, int(r.l_quantity))
            )
    buckets = defaultdict(lambda: [0, 0])
    for pk in part:
        receipts = sorted(sides["F"].get(pk, []))
        remaining = [q for *_, q in receipts]
        demand = sum(q for *_, q in sides["O"].get(pk, []))
        for i in range(len(remaining)):
            take = min(remaining[i], demand)
            remaining[i] -= take
            demand -= take
        for (ship, _, _, _), left in zip(receipts, remaining):
            if left > 0:
                age = (maxd - ship.date()).days
                b = (
                    "000-030" if age <= 30
                    else "031-090" if age <= 90
                    else "091-180" if age <= 180
                    else "181+"
                )
                buckets[b][0] += 1
                buckets[b][1] += left
    out = {r.age_bucket: (r.n_lots, r.leftover_qty)
           for r in q_inventory_aging(spark, SF_DIR).collect()}
    assert out == {k: tuple(v) for k, v in buckets.items()}


def test_weekday_seasonality_matches_centered_ma(spark):
    rows = load_table(spark, "events", SF_DIR).collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r.event_type][r.ts.date()] += 1
    out = {(r.event_type, r.weekday): r
           for r in q_weekday_seasonality(spark, SF_DIR).collect()}
    epoch = date(1970, 1, 1)
    for et, series in daily.items():
        days = sorted(series)
        per_wd = defaultdict(list)
        for i in range(3, len(days) - 3):
            win = days[i - 3 : i + 4]
            s7 = sum(series[d] for d in win)
            detr7 = 7 * series[days[i]] - s7
            per_wd[(days[i] - epoch).days % 7].append(detr7)
        peaks = {}
        for wd, vals in per_wd.items():
            got = out[(et, wd)]
            assert got.n_days == len(vals)
            eff = round(sum(vals) / (7.0 * len(vals)), 4)
            assert got.seasonal_effect == pytest.approx(eff, abs=1e-9)
            peaks[wd] = got.seasonal_effect
        best = min(w for w, e in peaks.items() if e == max(peaks.values()))
        for wd in per_wd:
            assert out[(et, wd)].is_peak == int(wd == best)
