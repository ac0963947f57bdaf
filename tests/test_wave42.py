"""Wave-42 unit tests: Python-recomputed ground truth — Page's L
trend, Kendall's W concordance, char-class composition, the
negative-association screen, and the staged dedup cascade. DuckDB
oracle parity for the same queries runs in test_oracle_parity.py;
these recompute the math independently of BOTH engines."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pytest

import __spark_entry__ as E
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.functions.text import (
    MERSENNE_P,
    MINHASH_A,
    MINHASH_B,
    N_BANDS,
    N_MINHASH,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"
_Q = E.queries()
_WS = re.compile(r"[ \t\n\f\r]+")


def test_page_trend_matches_rank_math(spark):
    rev = defaultdict(float)
    for r in load_table(spark, "orders", SF).collect():
        d = r.o_orderdate.date() if hasattr(r.o_orderdate, "date") else r.o_orderdate
        rev[d] += r.o_totalprice
    rev = {d: round(v, 4) for d, v in rev.items()}
    md = defaultdict(float)
    for d, v in rev.items():
        md[(d.replace(day=1), d.isoweekday() % 7)] += v
    md = {k: round(v, 4) for k, v in md.items()}
    months = sorted({m for m, _ in md})
    rsum = Counter()
    for m in months:
        slots = [(md.get((m, j), 0.0), j) for j in range(7)]
        slots.sort()
        for rnk, (_, j) in enumerate(slots, start=1):
            rsum[j] += rnk
    b = len(months)
    L = sum((j + 1) * rsum[j] for j in range(7))
    z = (L - 112.0 * b) / math.sqrt(b * 49.0 * 8.0 * 48.0 / 144.0)
    row = _Q["q_page_trend"](spark, SF).collect()[0]
    assert row.n_months == b
    assert [getattr(row, f"r_dow{j}") for j in range(7)] == [
        rsum[j] for j in range(7)
    ]
    assert row.l_stat == L
    assert row.z == pytest.approx(round(z, 6), abs=1e-6)
    assert row.trend_5pct == (1 if abs(round(z, 6)) > 1.96 else 0)


def test_kendall_w_matches_rank_math(spark):
    types = ("click", "error", "purchase", "signup", "view")
    cnt = defaultdict(Counter)
    for r in load_table(spark, "events", SF).collect():
        if r.event_type in types:
            cnt[r.user_id][r.event_type] += 1
    rsum = Counter()
    for u, c in cnt.items():
        for t in types:
            rk = 1 + sum(
                1
                for o in types
                if o != t
                and (c[o] > c[t] or (c[o] == c[t] and o < t))
            )
            rsum[t] += rk
    m = len(cnt)
    S = sum((rsum[t] - 3 * m) ** 2 for t in types)
    row = _Q["q_kendall_w"](spark, SF).collect()[0]
    assert row.n_users == m
    assert [getattr(row, f"r_{t}") for t in types] == [rsum[t] for t in types]
    assert row.s_stat == S
    assert row.w == pytest.approx(round(S / (10.0 * m * m), 6), abs=1e-6)
    assert row.chi2 == pytest.approx(round(4.0 * S / (10.0 * m), 6), abs=1e-6)
    # sanity: every user contributes a strict permutation summing to 15
    assert sum(rsum.values()) == 15 * m


def test_charclass_mix_matches_char_counts(spark):
    agg = defaultdict(lambda: Counter())
    for r in load_table(spark, "documents", SF).collect():
        c = agg[r.source]
        c["n_docs"] += 1
        c["n_chars"] += len(r.text)
        for ch in r.text:
            if "A" <= ch <= "Z":
                c["upper"] += 1
            elif "a" <= ch <= "z":
                c["lower"] += 1
            elif "0" <= ch <= "9":
                c["digit"] += 1
            elif ch in " \t\n\f\r":
                c["ws"] += 1
            else:
                c["other"] += 1
    rows = {r.source: r for r in _Q["q_charclass_mix"](spark, SF).collect()}
    assert set(rows) == set(agg)
    for s, c in agg.items():
        r = rows[s]
        assert r.n_docs == c["n_docs"] and r.n_chars == c["n_chars"]
        for k in ("upper", "lower", "digit", "ws", "other"):
            assert getattr(r, f"c_{k}") == c[k]
            assert getattr(r, f"share_{k}") == pytest.approx(
                round(c[k] / c["n_chars"], 6), abs=1e-6
            )


def test_negative_association_matches_lift_math(spark):
    baskets = defaultdict(set)
    for r in load_table(spark, "lineitem", SF).collect():
        baskets[r.l_orderkey].add(r.l_partkey)
    item = Counter()
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
    n = len(baskets)
    top = sorted(item, key=lambda p: (-item[p], p))[:20]
    co = Counter()
    tset = set(top)
    for parts in baskets.values():
        hits = sorted(parts & tset)
        for i, a in enumerate(hits):
            for b in hits[i + 1 :]:
                co[(a, b)] += 1
    cand = []
    for i, a in enumerate(sorted(top)):
        for b in sorted(top)[i + 1 :]:
            lift = round(co[(a, b)] * n / (item[a] * item[b]), 6)
            cand.append((lift, a, b, item[a], item[b], co[(a, b)]))
    cand.sort()
    rows = _Q["q_negative_association"](spark, SF).collect()
    assert len(rows) == min(15, len(cand))
    for row, (lift, a, b, ca, cb, nco) in zip(rows, cand[:15]):
        assert (row.part_a, row.part_b) == (a, b)
        assert (row.c_a, row.c_b, row.n_co) == (ca, cb, nco)
        assert row.lift == pytest.approx(lift, abs=1e-6)
        assert row.expected_co == pytest.approx(
            round(ca * cb / n, 6), abs=1e-6
        )


def _minhash_bands_py(tokens):
    hs = [
        int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % MERSENNE_P
        for t in tokens
    ]
    sig = [
        min(((a * h + b) % MERSENNE_P for h in hs), default=MERSENNE_P)
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]
    per = N_MINHASH // N_BANDS
    return [
        "-".join(str(sig[b * per + j]) for j in range(per))
        for b in range(N_BANDS)
    ]


def test_dedup_cascade_matches_funnel_simulation(spark):
    docs = [
        (r.doc_id, r.text)
        for r in load_table(spark, "documents", SF).collect()
    ]
    fp = defaultdict(list)
    for did, text in docs:
        h = hashlib.md5(
            _WS.sub(" ", text.lower()).strip().encode()
        ).hexdigest()
        fp[h].append(did)
    survivors = sorted(min(ids) for ids in fp.values())
    buckets = defaultdict(list)
    texts = dict(docs)
    for did in survivors:
        toks = list(dict.fromkeys(
            t for t in _WS.split(texts[did].lower()) if t
        ))
        for bi, key in enumerate(_minhash_bands_py(toks)):
            buckets[(bi, key)].append(did)
    removed = {
        d
        for mem in buckets.values()
        for d in mem
        if d > min(mem)
    }
    rows = {r.stage: r for r in _Q["q_dedup_cascade"](spark, SF).collect()}
    s1, s2 = rows[1], rows[2]
    assert s1.stage_name == "exact" and s2.stage_name == "minhash_lsh"
    assert s1.n_in == len(docs)
    assert s1.n_out == len(survivors)
    assert s1.n_dropped == len(docs) - len(survivors)
    assert s2.n_in == len(survivors)
    assert s2.n_dropped == len(removed)
    assert s2.n_out == len(survivors) - len(removed)
