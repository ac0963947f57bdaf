"""Wave-31 unit tests: Python-recomputed ground truth — contingency
information measures, weighted-median cumulative-weight definition,
lagged correlation, HHI/CR4 algebra, the signed-rank statistic, and the
Flesch formula."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_stats import (
    _CCF_MAX_LAG,
    q_ccf,
    q_contingency_stats,
    q_hhi_concentration,
    q_readability,
    q_weighted_median,
    q_wilcoxon_signed_rank,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

from conftest import SF_DIR


def test_contingency_stats_recompute(spark):
    cells = Counter()
    for r in load_table(spark, "events", SF_DIR).collect():
        # weekday label choice is irrelevant: MI/chi2 are invariant to
        # bijective relabeling, which is why Spark's dayofweek (Sun=1)
        # and DuckDB's (Sun=0) can disagree on labels yet agree here
        cells[(r.event_type, r.ts.weekday())] += 1
    n = sum(cells.values())
    na = Counter()
    nb = Counter()
    for (a, b), c in cells.items():
        na[a] += c
        nb[b] += c
    mi = sum(
        (c / n) * math.log(c * n / (na[a] * nb[b]))
        for (a, b), c in cells.items()
    )
    chi2 = sum(
        (c - na[a] * nb[b] / n) ** 2 / (na[a] * nb[b] / n)
        for (a, b), c in cells.items()
    )
    row = q_contingency_stats(spark, SF_DIR).collect()[0]
    assert (row.n, row.n_rows_dim, row.n_cols_dim) == (n, len(na), len(nb))
    assert abs(row.chi2 - chi2) < 1e-3
    assert abs(row.mutual_info - mi) < 1e-5
    v = math.sqrt(chi2 / (n * (min(len(na), len(nb)) - 1)))
    assert abs(row.cramers_v - v) < 1e-5


def test_weighted_median_cumulative_definition(spark):
    agg = defaultdict(lambda: defaultdict(float))
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        agg[r.l_returnflag][r.l_extendedprice] += r.l_quantity
    got = {r.l_returnflag: r for r in q_weighted_median(spark, SF_DIR).collect()}
    for flag, wmap in agg.items():
        tw = sum(wmap.values())
        cw = 0.0
        med = None
        for v in sorted(wmap):
            cw += wmap[v]
            if cw >= tw / 2:
                med = v
                break
        r = got[flag]
        assert abs(r.total_weight - tw) < 1e-6
        assert abs(r.weighted_median - round(med, 2)) < 1e-9
        # the weighted median is bracketed by the value range
        assert min(wmap) <= r.weighted_median <= max(wmap)


def test_ccf_lag_zero_equals_pearson_of_daily_counts(spark):
    days = defaultdict(lambda: [0, 0])
    for r in load_table(spark, "events", SF_DIR).collect():
        d = r.ts.date()
        if r.event_type == "view":
            days[d][0] += 1
        elif r.event_type == "purchase":
            days[d][1] += 1
    rows = {r.lag: r for r in q_ccf(spark, SF_DIR).collect()}
    assert set(rows) == set(range(_CCF_MAX_LAG + 1))
    ds = sorted(days)
    v = np.array([days[d][0] for d in ds], dtype=float)
    p = np.array([days[d][1] for d in ds], dtype=float)
    assert rows[0].n_pairs == len(ds)
    assert abs(rows[0].ccf - np.corrcoef(v, p)[0, 1]) < 1e-5
    # lag-3: pairs only where day+3 also has events
    byd = {d: days[d] for d in ds}
    import datetime

    pairs = [
        (byd[d][0], byd[d + datetime.timedelta(days=3)][1])
        for d in ds
        if d + datetime.timedelta(days=3) in byd
    ]
    assert rows[3].n_pairs == len(pairs)
    a = np.array([x for x, _ in pairs], dtype=float)
    b = np.array([y for _, y in pairs], dtype=float)
    assert abs(rows[3].ccf - np.corrcoef(a, b)[0, 1]) < 1e-5


def test_hhi_shares_square_sum_and_cr4(spark):
    supp = {
        r.s_suppkey: r.s_nationkey
        for r in load_table(spark, "supplier", SF_DIR).collect()
    }
    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, "nation", SF_DIR).collect()
    }
    rev = defaultdict(lambda: defaultdict(float))
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        nk = supp.get(r.l_suppkey)
        if nk is not None:
            rev[nat[nk]][r.l_suppkey] += r.l_extendedprice
    got = {r.nation: r for r in q_hhi_concentration(spark, SF_DIR).collect()}
    assert set(got) == set(rev)
    for nation, by_s in rev.items():
        tot = sum(by_s.values())
        shares = sorted(
            ((v / tot, k) for k, v in by_s.items()), key=lambda t: (-t[0], t[1])
        )
        hhi = sum(s * s for s, _ in shares) * 10000
        cr4 = sum(s for s, _ in shares[:4])
        r = got[nation]
        assert r.n_suppliers == len(by_s)
        assert abs(r.hhi - hhi) < 0.02
        assert abs(r.cr4 - cr4) < 1e-5
        assert 0 < r.cr4 <= 1.0 + 1e-9


def test_wilcoxon_signed_rank_recompute(spark):
    cell = defaultdict(lambda: [0.0, 0.0])
    for r in load_table(spark, "lineitem", SF_DIR).collect():
        c = cell[(r.l_shipdate.year, r.l_partkey)]
        c[0] += r.l_extendedprice
        c[1] += r.l_quantity
    y1 = min(y for y, _ in cell)
    ds = []
    for (y, pk), (rev, qty) in cell.items():
        if y == y1 and (y1 + 1, pk) in cell:
            rev2, qty2 = cell[(y1 + 1, pk)]
            d = round(rev2 / qty2 - rev / qty, 4)
            if d != 0:
                ds.append(d)
    ads = np.array([abs(d) for d in ds])
    order = np.argsort(ads, kind="stable")
    ranks = np.empty(len(ads))
    sa = ads[order]
    i = 0
    while i < len(sa):
        j = i
        while j < len(sa) and sa[j] == sa[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    w_plus = sum(rk for d, rk in zip(ds, ranks) if d > 0)
    n = len(ds)
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0
    )
    row = q_wilcoxon_signed_rank(spark, SF_DIR).collect()[0]
    assert row.n == n
    assert abs(row.w_plus - w_plus) < 0.2
    assert abs(row.z - z) < 1e-3


def test_readability_flesch_formula(spark):
    import re

    per_source = defaultdict(list)
    for r in load_table(spark, "documents", SF_DIR).collect():
        words = len([w for w in r.text.split(" ") if w])
        if words == 0:
            continue
        sentences = max(len(re.findall(r"[.!?]", r.text)), 1)
        syllables = max(len(re.findall(r"[aeiouy]+", r.text.lower())), 1)
        per_source[r.source].append(
            206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words)
        )
    got = {r.source: r for r in q_readability(spark, SF_DIR).collect()}
    assert set(got) == set(per_source)
    for src, vals in per_source.items():
        r = got[src]
        assert r.n_docs == len(vals)
        assert abs(r.mean_flesch - np.mean(vals)) < 1e-3
        assert abs(r.min_flesch - min(vals)) < 1e-3
        assert abs(r.max_flesch - max(vals)) < 1e-3
