"""Wave-30 unit tests: Python-recomputed ground truth for the
statistics & audience wave — ANOVA moment algebra, tie-aware Spearman
ranks, set-algebra audience overlap, first-seen decomposition, IQR
fence arithmetic, BPE pair counting, sample covariance, inter-arrival
gaps, and the fixed-basket index identity (base year == 1.0).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_stats import (
    _COV_DIMS,
    q_anova_f,
    q_audience_overlap,
    q_bpe_pairs,
    q_embedding_cov,
    q_interarrival,
    q_iqr_outliers,
    q_new_returning,
    q_price_index,
    q_spearman_corr,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def _round_half_away(x: float, nd: int) -> float:
    m = 10**nd
    return (np.floor(x * m + 0.5) if x >= 0 else np.ceil(x * m - 0.5)) / m


def test_anova_f_matches_moment_recompute(spark):
    groups = defaultdict(list)
    for r in load_table(spark, "orders", SF_DIR).collect():
        groups[r.o_orderpriority].append(r.o_totalprice)
    k = len(groups)
    big_n = sum(len(v) for v in groups.values())
    gm = sum(sum(v) for v in groups.values()) / big_n
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in groups.values())
    ssw = sum(
        sum(x * x for x in v) - sum(v) ** 2 / len(v) for v in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (big_n - k))
    row = q_anova_f(spark, SF_DIR).collect()[0]
    assert row.k_groups == k
    assert row.df_between == k - 1 and row.df_within == big_n - k
    assert abs(row.f_stat - f) < 1e-3
    assert abs(row.eta_sq - ssb / (ssb + ssw)) < 1e-5
    # the F statistic is positive and finite for a real split
    assert 0 < row.f_stat < 1e9


def test_spearman_matches_scipy_free_recompute(spark):
    rows = load_table(spark, "lineitem", SF_DIR).collect()
    qty = np.array([r.l_quantity for r in rows])
    price = np.array([r.l_extendedprice for r in rows])

    def avg_ranks(a: np.ndarray) -> np.ndarray:
        order = np.argsort(a, kind="stable")
        ranks = np.empty(len(a))
        sa = a[order]
        i = 0
        while i < len(sa):
            j = i
            while j < len(sa) and sa[j] == sa[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0  # avg of ranks i+1..j
            i = j
        return ranks

    ra, rb = avg_ranks(qty), avg_ranks(price)
    rho = np.corrcoef(ra, rb)[0, 1]
    row = q_spearman_corr(spark, SF_DIR).collect()[0]
    assert row.n == len(rows)
    assert abs(row.spearman - rho) < 1e-5
    # the synthetic fixture draws price independently of quantity, so the
    # true association is ~0 — a tight band around the recomputed value
    # (already asserted) plus the legal range is the right check
    assert -1.0 <= row.spearman <= 1.0


def test_audience_overlap_set_algebra(spark):
    sets = defaultdict(set)
    for r in load_table(spark, "events", SF_DIR).collect():
        sets[r.event_type].add(r.user_id)
    got = {
        (r.type_a, r.type_b): r for r in q_audience_overlap(spark, SF_DIR).collect()
    }
    types = sorted(sets)
    expect_pairs = {
        (a, b)
        for ia, a in enumerate(types)
        for b in types[ia + 1 :]
        if sets[a] & sets[b]
    }
    assert set(got) == expect_pairs
    for (a, b), r in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert (r.n_a, r.n_b, r.inter) == (len(sets[a]), len(sets[b]), inter)
        assert abs(r.jaccard - inter / union) < 1e-6


def test_new_returning_conserves_actives(spark):
    first = {}
    daily = defaultdict(set)
    for r in load_table(spark, "events", SF_DIR).collect():
        d = r.ts.date()
        daily[d].add(r.user_id)
        first[r.user_id] = min(first.get(r.user_id, d), d)
    rows = q_new_returning(spark, SF_DIR).collect()
    assert [r.day for r in rows] == sorted(daily)
    cum = 0
    for r in rows:
        new = sum(1 for u, f in first.items() if f == r.day)
        assert r.active == len(daily[r.day])
        assert r.new_users == new
        assert r.returning_users == r.active - new
        cum += new
        assert r.cum_users == cum
    # the final cumulative count is the full user base
    assert rows[-1].cum_users == len(first)


def test_iqr_fences_and_outlier_counts(spark):
    by_flag = defaultdict(list)
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        by_flag[r.l_returnflag].append(r.l_extendedprice)
    got = {r.l_returnflag: r for r in q_iqr_outliers(spark, SF_DIR).collect()}
    assert set(got) == set(by_flag)
    for flag, vals in by_flag.items():
        q1 = _round_half_away(np.quantile(vals, 0.25), 4)
        q3 = _round_half_away(np.quantile(vals, 0.75), 4)
        lo = _round_half_away(q1 - 1.5 * (q3 - q1), 5)
        hi = _round_half_away(q3 + 1.5 * (q3 - q1), 5)
        r = got[flag]
        assert abs(r.q1 - q1) < 1e-6 and abs(r.q3 - q3) < 1e-6
        assert abs(r.lo_fence - lo) < 1e-6 and abs(r.hi_fence - hi) < 1e-6
        n_out = sum(1 for v in vals if v < lo or v > hi)
        assert (r.n, r.n_outliers) == (len(vals), n_out)
        assert abs(r.outlier_share - n_out / len(vals)) < 1e-5


def test_bpe_pairs_counter_recompute(spark):
    c: Counter = Counter()
    for r in load_table(spark, "documents", SF_DIR).collect():
        for w in r.text.split(" "):
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = [(r.pair, r.freq) for r in q_bpe_pairs(spark, SF_DIR).collect()]
    assert got == want


def test_embedding_cov_matches_numpy(spark):
    X = np.array(
        [
            [float(x) for x in r.embedding[:_COV_DIMS]]
            for r in load_table(spark, "embeddings", SF_DIR).collect()
        ]
    )
    C = np.cov(X, rowvar=False, ddof=1)
    rows = q_embedding_cov(spark, SF_DIR).collect()
    assert len(rows) == _COV_DIMS * (_COV_DIMS + 1) // 2
    for r in rows:
        assert r.i <= r.j
        assert abs(r.cov - C[r.i - 1, r.j - 1]) < 1e-7
    # diagonal entries are variances: strictly positive
    assert all(r.cov > 0 for r in rows if r.i == r.j)


def test_interarrival_gap_recompute(spark):
    seqs = defaultdict(list)
    for r in load_table(spark, "events", SF_DIR).collect():
        seqs[(r.user_id, r.event_type)].append(
            (r.ts, r.event_id, int(r.ts.timestamp()))
        )
    gaps = defaultdict(list)
    for (u, t), evs in seqs.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        for a, b in zip(evs, evs[1:]):
            gaps[t].append(b[2] - a[2])
    got = {r.event_type: r for r in q_interarrival(spark, SF_DIR).collect()}
    assert set(got) == {t for t, g in gaps.items() if g}
    for t, g in gaps.items():
        if not g:
            continue
        r = got[t]
        assert r.n_gaps == len(g)
        assert abs(r.p50_s - _round_half_away(float(np.quantile(g, 0.5)), 1)) < 0.11
        assert abs(r.p90_s - _round_half_away(float(np.quantile(g, 0.9)), 1)) < 0.11
        assert abs(r.mean_s - np.mean(g)) < 0.11


def test_price_index_base_year_is_unity(spark):
    rows = q_price_index(spark, SF_DIR).collect()
    years = [r.yr for r in rows]
    assert years == sorted(years)
    base = rows[0]
    # the base year prices itself: index exactly 1 by construction
    assert abs(base.laspeyres - 1.0) < 1e-9
    # every year shares a non-empty basket with the base year
    assert all(r.n_parts > 0 for r in rows)
    # recompute one non-base year end-to-end
    cell = defaultdict(lambda: [0.0, 0.0])  # (yr, part) -> [rev, qty]
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        key = (r.l_shipdate.year, r.l_partkey)
        cell[key][0] += r.l_extendedprice
        cell[key][1] += r.l_quantity
    y0 = min(y for y, _ in cell)
    target = rows[1].yr
    cur = sum(
        (cell[(target, p)][0] / cell[(target, p)][1]) * cell[(y0, p)][1]
        for (y, p) in cell
        if y == target and (y0, p) in cell
    )
    bas = sum(
        (cell[(y0, p)][0] / cell[(y0, p)][1]) * cell[(y0, p)][1]
        for (y, p) in cell
        if y == target and (y0, p) in cell
    )
    assert abs(rows[1].laspeyres - cur / bas) < 1e-5
