"""Wave-40 unit tests: Python-recomputed ground truth — Fano dispersion
per weekday, monthly OHLC candles, curriculum phase assignment,
centroid silhouette margins, and the quantile-sketch rank bound. DuckDB
oracle parity for the same queries runs in test_oracle_parity.py; these
recompute the math independently of BOTH engines."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

import __spark_entry__ as E
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"
_Q = E.queries()


def _day_counts(spark):
    days = Counter()
    rev = defaultdict(float)
    for r in load_table(spark, "orders", SF).collect():
        d = r.o_orderdate.date() if hasattr(r.o_orderdate, "date") else r.o_orderdate
        days[d] += 1
        rev[d] += r.o_totalprice
    return days, {d: round(v, 4) for d, v in rev.items()}


def test_fano_matches_closed_form(spark):
    days, _ = _day_counts(spark)
    per_dow = defaultdict(list)
    for d, n in days.items():
        per_dow[(d.isoweekday()) % 7].append(n)  # 0=Sunday, the K4 rule
    rows = {r.dow: r for r in _Q["q_fano_burstiness"](spark, SF).collect()}
    assert set(rows) == set(per_dow)
    for dow, ns in per_dow.items():
        k, s1, s2 = len(ns), sum(ns), sum(n * n for n in ns)
        r = rows[dow]
        assert r.k_days == k
        assert r.mean_orders == pytest.approx(round(s1 / k, 6), abs=1e-6)
        assert r.fano == pytest.approx(
            round((k * s2 - s1 * s1) / (k * s1), 6), abs=1e-6
        )


def test_ohlc_matches_day_series(spark):
    _, rev = _day_counts(spark)
    months = defaultdict(list)
    for d, v in rev.items():
        months[d.replace(day=1)].append((d, v))
    rows = {r.m: r for r in _Q["q_ohlc_monthly"](spark, SF).collect()}
    assert set(rows) == set(months)
    for m, dv in months.items():
        dv.sort()
        r = rows[m]
        assert r.n_days == len(dv)
        assert r.open == dv[0][1] and r.close == dv[-1][1]
        vals = [v for _, v in dv]
        assert r.high == round(max(vals), 4) and r.low == round(min(vals), 4)
        assert r.vol == pytest.approx(round(sum(vals), 4), abs=1e-3)


def test_curriculum_phases_partition_by_rank(spark):
    import re

    docs = [
        (r.doc_id, len([t for t in re.split(r"\s+", r.text.lower()) if t]))
        for r in load_table(spark, "documents", SF).collect()
    ]
    docs.sort(key=lambda t: (t[1], t[0]))
    n = len(docs)
    phases = defaultdict(list)
    for rank, (_, ntok) in enumerate(docs, start=1):
        phases[1 + ((rank - 1) * 4) // n].append(ntok)
    rows = {r.phase: r for r in _Q["q_curriculum_buckets"](spark, SF).collect()}
    assert set(rows) == set(phases)
    for p, toks in phases.items():
        r = rows[p]
        assert r.n_docs == len(toks)
        assert (r.min_tok, r.max_tok, r.sum_tok) == (
            min(toks),
            max(toks),
            sum(toks),
        )
        assert r.avg_tok == pytest.approx(round(sum(toks) / len(toks), 6), abs=1e-6)
    # phases are contiguous rank ranges: easy phases never contain a
    # doc longer than any doc of a harder phase's minimum-by-rank
    assert rows[1].n_docs + rows[2].n_docs + rows[3].n_docs + rows[4].n_docs == n


def test_silhouette_matches_centroid_math(spark):
    emb = [
        (r.vec_id, r.label, [float(x) for x in r.embedding])
        for r in load_table(spark, "embeddings", SF).collect()
    ]
    by_label = defaultdict(list)
    for _, l, v in emb:
        by_label[l].append(v)
    cent = {}
    for l, vs in by_label.items():
        dim = len(vs[0])
        cent[l] = [round(sum(v[i] for v in vs) / len(vs), 6) for i in range(dim)]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    mat = defaultdict(list)
    for _, l, v in emb:
        for m, c in cent.items():
            mat[(l, m)].append(cos(v, c))
    rows = {r.label: r for r in _Q["q_embedding_silhouette"](spark, SF).collect()}
    for l in by_label:
        a = round(sum(mat[(l, l)]) / len(mat[(l, l)]), 6)
        b = max(
            round(sum(mat[(l, m)]) / len(mat[(l, m)]), 6)
            for m in cent
            if m != l
        )
        r = rows[l]
        assert r.n_docs == len(by_label[l])
        assert r.cohesion == pytest.approx(a, abs=2e-6)
        assert r.nearest_other == pytest.approx(b, abs=2e-6)
        assert r.margin == pytest.approx(round(a - b, 6), abs=4e-6)
        assert r.separated == (a > b)


def test_quantile_sketch_rank_bound_recomputed(spark):
    vals = sorted(
        r.l_extendedprice for r in load_table(spark, "lineitem", SF).collect()
    )
    n = len(vals)
    rows = _Q["q_quantile_sketch_calibration"](spark, SF).collect()
    assert [r.frac for r in rows] == [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    for r in rows:
        pos = 1 + (n - 1) * r.frac
        lo, hi = vals[math.floor(pos) - 1], vals[min(math.ceil(pos), n) - 1]
        exact = lo + (pos - math.floor(pos)) * (hi - lo)
        assert r.exact_q == pytest.approx(round(exact, 4), abs=1e-4)
        assert r.rank_err_ok  # the GK bound must hold at every tier
