"""Wave-26 unit tests: Python-recomputed ground truth — U-shaped
attribution credits (with the conservation identity), trailing-window
distinct counts, delta-method moments, and the SRM chi-square.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timedelta

import numpy as np
import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_ledger import (
    q_multi_touch_attribution,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_measurement import (
    _LCG_A,
    _LCG_C,
    _LCG_M,
    q_delta_method_ratio,
    q_srm_check,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_temporal import (
    q_stickiness,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def _variant(uid: int) -> int:
    return 0 if (uid * _LCG_A + _LCG_C) % _LCG_M < _LCG_M // 2 else 1


def test_multi_touch_credit_conserves_and_matches_replay(spark):
    ev = load_table(spark, "events", SF_DIR).collect()
    conv = {}
    for r in ev:
        if r.event_type == "purchase":
            if r.user_id not in conv or r.ts < conv[r.user_id]:
                conv[r.user_id] = r.ts
    paths = defaultdict(list)
    for r in ev:
        if (
            r.event_type in ("view", "click")
            and r.user_id in conv
            and r.ts < conv[r.user_id]
        ):
            paths[r.user_id].append((r.ts, r.event_id, r.event_type))
    credit = Counter()
    touches = Counter()
    for u, path in paths.items():
        path.sort()
        n = len(path)
        for pos0, (_, _, ch) in enumerate(path):
            touches[ch] += 1
            if n == 1:
                credit[ch] += 1.0
            elif n == 2:
                credit[ch] += 0.5
            elif pos0 == 0 or pos0 == n - 1:
                credit[ch] += 0.4
            else:
                credit[ch] += 0.2 / (n - 2)
    got = {r.channel: r for r in q_multi_touch_attribution(spark, SF_DIR).collect()}
    assert set(got) == set(credit)
    for ch in credit:
        assert got[ch].credit == pytest.approx(credit[ch], abs=1e-3)
        assert got[ch].n_touches == touches[ch]
    # conservation: total credit == conversions that had >=1 touch
    assert sum(r.credit for r in got.values()) == pytest.approx(
        len(paths), abs=1e-2
    )


def test_stickiness_matches_window_replay(spark):
    pairs = set()
    for r in load_table(spark, "events", SF_DIR).collect():
        pairs.add((r.user_id, r.ts.date()))
    days = sorted({d for _, d in pairs})
    got = {r.day: r for r in q_stickiness(spark, SF_DIR).collect()}
    assert set(got) == {str(d) for d in days}
    for d in days:
        dau = {u for u, dd in pairs if dd == d}
        wau = {u for u, dd in pairs if d - timedelta(days=6) <= dd <= d}
        g = got[str(d)]
        assert g.dau == len(dau)
        assert g.wau == len(wau)
        assert g.stickiness == pytest.approx(len(dau) / len(wau), abs=1e-4)
        assert g.dau <= g.wau  # DAU is a subset of the trailing week


def test_delta_method_matches_numpy_replay(spark):
    per = defaultdict(lambda: [0, 0])
    for r in load_table(spark, "events", SF_DIR).collect():
        if r.event_type == "click":
            per[r.user_id][0] += 1
        elif r.event_type == "view":
            per[r.user_id][1] += 1
    stats = {}
    for v in (0, 1):
        xs = np.array(
            [c for u, (c, w) in per.items() if _variant(u) == v and w > 0],
            dtype=float,
        )
        ys = np.array(
            [w for u, (c, w) in per.items() if _variant(u) == v and w > 0],
            dtype=float,
        )
        n = len(xs)
        r = xs.mean() / ys.mean()
        vr = (
            np.var(xs, ddof=1)
            + r * r * np.var(ys, ddof=1)
            - 2 * r * np.cov(xs, ys, ddof=1)[0, 1]
        ) / (ys.mean() ** 2 * n)
        stats[v] = (n, r, vr)
    z = (stats[1][1] - stats[0][1]) / math.sqrt(stats[0][2] + stats[1][2])
    got = q_delta_method_ratio(spark, SF_DIR).collect()[0]
    assert (got.n_a, got.n_b) == (stats[0][0], stats[1][0])
    assert got.r_a == pytest.approx(stats[0][1], abs=1e-5)
    assert got.r_b == pytest.approx(stats[1][1], abs=1e-5)
    assert got.z_score == pytest.approx(z, abs=1e-3)
    assert got.significant == (1 if abs(z) > 1.96 else 0)


def test_srm_check_matches_replay(spark):
    users = {
        r.user_id for r in load_table(spark, "events", SF_DIR).collect()
    }
    n_a = sum(1 for u in users if _variant(u) == 0)
    n_b = len(users) - n_a
    e = (n_a + n_b) / 2.0
    chi2 = (n_a - e) ** 2 / e + (n_b - e) ** 2 / e
    got = q_srm_check(spark, SF_DIR).collect()[0]
    assert (got.n_a, got.n_b) == (n_a, n_b)
    assert got.chi2 == pytest.approx(chi2, abs=1e-3)
    assert got.srm == (1 if chi2 > 3.841 else 0)
