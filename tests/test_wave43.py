"""Wave-43 unit tests: Python-recomputed ground truth for the
Syntetos-Boylan demand-intermittency quadrants and the shingle-space
df profile. DuckDB oracle parity for the same queries runs in
test_oracle_parity.py; these recompute the math independently of BOTH
engines, and pin the substrate-riding plan shapes."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import __spark_entry__ as E
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"
_Q = E.queries()
_WS = re.compile(r"[ \t\n\f\r]+")


def _py_weekly(spark):
    """(part -> {monday_ordinal: qty}) recomputed row-by-row."""
    import datetime

    rows = load_table(spark, "lineitem", SF).select(
        "l_partkey", "l_shipdate", "l_quantity"
    ).collect()
    wk: dict = defaultdict(lambda: defaultdict(int))
    for r in rows:
        d = r.l_shipdate
        if isinstance(d, datetime.datetime):
            d = d.date()
        monday = d - datetime.timedelta(days=d.weekday())
        wk[r.l_partkey][monday] += int(r.l_quantity)
    return wk


def test_demand_intermittency_matches_python_ground_truth(spark):
    wk = _py_weekly(spark)
    counts: Counter = Counter()
    qty: Counter = Counter()
    for part, weeks in wk.items():
        qs = list(weeks.values())
        n = len(qs)
        s1 = sum(qs)
        s2 = sum(q * q for q in qs)
        span_w = (max(weeks) - min(weeks)).days // 7 + 1
        if n == 1:
            c = "single"
        else:
            low_adi = 100 * span_w < 132 * n
            low_cv = 100 * (n * s2 - s1 * s1) < 49 * s1 * s1
            c = (
                "smooth"
                if low_adi and low_cv
                else "intermittent"
                if low_cv
                else "erratic"
                if low_adi
                else "lumpy"
            )
        counts[c] += 1
        qty[c] += s1
    got = {
        r.demand_class: (r.n_parts, r.sum_qty)
        for r in _Q["q_demand_intermittency"](spark, SF).collect()
    }
    assert got == {c: (counts[c], qty[c]) for c in counts}
    # every part classed exactly once
    assert sum(n for n, _ in got.values()) == len(wk)


def test_demand_intermittency_rides_part_revenue_checkpoint(spark):
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        part_revenue,
    )

    part_revenue(spark, SF)  # substrate warm, as in any multi-query session
    plan = (
        _Q["q_demand_intermittency"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # zero fact scans: both moment legs read the checkpointed substrate
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_shingle_profile_matches_python_ground_truth(spark):
    docs = load_table(spark, "documents", SF).select(
        "doc_id", "lang", "text"
    ).collect()
    df: Counter = Counter()
    for r in docs:
        toks = [t for t in _WS.split(r.text.lower()) if t]
        grams = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
        for g in grams:
            df[(r.lang, g)] += 1
    by_lang: dict = defaultdict(list)
    for (lang, _), d in df.items():
        by_lang[lang].append(d)

    def disc(vals, q):
        vals = sorted(vals)
        import math

        return vals[math.ceil(q * len(vals)) - 1]

    got = {r.lang: r for r in _Q["q_shingle_profile"](spark, SF).collect()}
    assert set(got) == set(by_lang)
    for lang, vals in by_lang.items():
        r = got[lang]
        assert r.n_grams == len(vals)
        assert r.n_postings == sum(vals)
        assert r.max_df == max(vals)
        assert r.p50_df == disc(vals, 0.50)
        assert r.p90_df == disc(vals, 0.90)
        hot = sum(v for v in vals if v > 64)
        assert abs(r.hot_share - hot / sum(vals)) < 1e-9


def test_shingle_profile_rides_doc_bigrams_checkpoint(spark):
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_text import (
        _doc_bigrams,
    )

    _doc_bigrams(spark, SF)  # substrate warm
    plan = (
        _Q["q_shingle_profile"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FileScan parquet" not in plan  # no documents re-scan
    assert "Scan ExistingRDD" in plan
    assert "Generate explode" in plan  # the one explode, consumer-local
