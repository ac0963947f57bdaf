"""Unit tests for the connected-components dedup clustering operator."""

from __future__ import annotations

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.dedup import (
    connected_components,
)


def _cc(spark, edges, vertices):
    e = spark.createDataFrame(edges or [(None, None)], "id_a long, id_b long")
    if not edges:
        e = e.filter("id_a is not null")
    v = spark.createDataFrame([(x,) for x in vertices], "doc_id long")
    out = connected_components(e, v, id_col="doc_id")
    return {r.doc_id: (r.component, r.keep) for r in out.collect()}


def test_two_components_and_singleton(spark):
    # chain 1-2-3, pair 10-11, singleton 20
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)], [1, 2, 3, 10, 11, 20])
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        10: (10, True),
        11: (10, False),
        20: (20, True),
    }


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-9: diameter 9, worst case for min propagation
    edges = [(i, i + 1) for i in range(9)]
    got = _cc(spark, edges, list(range(10)))
    assert all(comp == 0 for comp, _ in got.values())
    assert got[0][1] is True and sum(keep for _, keep in got.values()) == 1


def test_no_edges_all_singletons(spark):
    got = _cc(spark, [], [5, 6, 7])
    assert got == {5: (5, True), 6: (6, True), 7: (7, True)}


def test_matches_union_find_on_random_graphs(spark):
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = 30
        vertices = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(5, 40))
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical min-id per component
        expect = {}
        for v in vertices:
            root = find(v)
            expect.setdefault(root, []).append(v)
        want = {v: min(vs) for vs in expect.values() for v in vs}

        got = {k: c for k, (c, _) in _cc(spark, edges, vertices).items()}
        assert got == want, f"trial {trial}"


def test_dedup_pipeline_equals_full_cc(spark):
    """Exact-collapse → CC-on-reps → expand must equal CC over the full
    near-dup graph on a corpus with planted exact AND near dups."""
    from pyspark.sql import functions as F

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.dedup import (
        connected_components,
        dedup_pipeline,
        minhash_near_dup,
    )

    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").filter(
        F.col("doc_id") % 25 == 0
    )
    # plant exact duplicates of every base doc under shifted ids
    docs = base.union(
        base.withColumn("doc_id", F.col("doc_id") + F.lit(100000))
    )
    full = {
        r.doc_id: r.component
        for r in connected_components(
            minhash_near_dup(docs, 0.7), docs, id_col="doc_id"
        ).collect()
    }
    piped = {
        r.doc_id: r.component for r in dedup_pipeline(docs, 0.7).collect()
    }
    assert piped == full and len(piped) == 2 * base.count()


def test_alternating_matches_union_find(spark):
    import random

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.dedup import (
        connected_components_alternating,
    )

    def run(edges, vertices):
        e = spark.createDataFrame(edges or [(None, None)], "id_a long, id_b long")
        if not edges:
            e = e.filter("id_a is not null")
        v = spark.createDataFrame([(x,) for x in vertices], "doc_id long")
        out = connected_components_alternating(e, v, id_col="doc_id")
        return {r.doc_id: r.component for r in out.collect()}

    # long chain: the case this variant exists for
    got = run([(i, i + 1) for i in range(19)], list(range(20)))
    assert all(c == 0 for c in got.values())

    # random graphs vs union-find
    rng = random.Random(7)
    for trial in range(2):
        n = 25
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(5, 35))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comps = {}
        for v in range(n):
            comps.setdefault(find(v), []).append(v)
        want = {v: min(vs) for vs in comps.values() for v in vs}
        assert run(edges, list(range(n))) == want, f"trial {trial}"
