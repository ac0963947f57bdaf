"""Unit tests for the wave-10 Misra-Gries sketch (queries_frequency):
the pigeonhole superset guarantee is the correctness foundation of
q_heavy_hitters — if a globally heavy token could be missed by every
per-partition summary, the exact recount would silently under-report.
The oracle parity test verifies end-to-end equality; these verify the
sketch property itself on adversarial splits, without Spark.
"""

from __future__ import annotations

import pandas as pd

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark import (
    queries_frequency as qf,
)


def _run_mg(texts: list[str]) -> tuple[set[str], int]:
    out = pd.concat(list(qf._mg_candidates(iter([pd.DataFrame({"text": texts})]))))
    cands = set(out.loc[out["tok"].notna(), "tok"])
    total = int(out.loc[out["tok"].isna(), "n"].iloc[0])
    return cands, total


def test_mg_counter_budget_and_denominator():
    texts = [f"w{i} w{i} filler{i}" for i in range(5000)]
    cands, total = _run_mg(texts)
    assert len(cands) <= qf._MG_K
    assert total == 3 * 5000


def test_mg_superset_property_single_partition():
    # one token holds 1% of the stream (> n/_MG_K = 0.5%); the rest is
    # a long uniform tail designed to force constant decrements
    heavy = ["hot"] * 100
    tail = [f"t{i}" for i in range(9900)]
    stream = []
    for i, t in enumerate(tail):
        stream.append(t)
        if i % 99 == 0:
            stream.append(heavy.pop() if heavy else "hot")
    cands, total = _run_mg([" ".join(stream)])
    assert total >= 9900
    assert "hot" in cands  # freq(hot) > total/_MG_K ⇒ MG must keep it


def test_mg_superset_property_adversarial_split():
    # split the same stream so the heavy token is diluted across
    # partitions; pigeonhole: it must still be locally heavy in at
    # least one, so the UNION of candidates contains it
    docs = []
    for p in range(8):
        toks = [f"p{p}_{i}" for i in range(1000)]
        toks[::13] = ["hot"] * len(toks[::13])
        docs.append(" ".join(toks))
    all_cands: set[str] = set()
    total = 0
    for d in docs:  # one partition each
        c, t = _run_mg([d])
        all_cands |= c
        total += t
    hot_count = sum(d.split().count("hot") for d in docs)
    assert hot_count > total / qf._MG_K
    assert "hot" in all_cands
