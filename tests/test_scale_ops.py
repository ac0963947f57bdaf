"""Scale-posture operators: cell-partitioned IVF index with partition
pruning, and the salted join for skewed keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.similarity import (
    ivf_knn,
    ivf_knn_pruned,
    train_centroids_sample,
    write_ivf_index,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.skew import (
    salted_join,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
    load_table,
)

SF = "/root/testdata/sf0.001"


def _probes(emb):
    return emb.filter(F.expr("vec_id % 50 = 0")).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def test_partitioned_ivf_prunes_and_matches_inmemory_ivf(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF)
    cents = train_centroids_sample(emb, n_cells=8)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path, cents)

    pruned = ivf_knn_pruned(spark, path, _probes(emb), cents, k=4, nprobe=2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the probe's cells reach the scan as partition filters
    assert "PartitionFilters: [cell" in plan.replace("PartitionFilters: [isnotnull(cell", "PartitionFilters: [cell")

    # same results as the in-memory operator at the same nprobe
    mem = ivf_knn(_probes(emb), emb, k=4, nprobe=2, centroids=cents)
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, mem.collect()))


def test_partition_pruning_reads_fewer_files(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF)
    cents = train_centroids_sample(emb, n_cells=8)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path, cents)

    full = spark.read.parquet(path)
    one_cell = full.filter(F.col("cell") == 0)
    # partition-pruned row count strictly below the full index
    assert 0 < one_cell.count() < full.count()


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, "lineitem", SF).select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    supp = load_table(spark, "supplier", SF).select("s_suppkey", "s_name")
    plain = li.join(supp, li.l_suppkey == supp.s_suppkey).drop("s_suppkey")

    li2 = li.withColumnRenamed("l_suppkey", "k")
    supp2 = supp.withColumnRenamed("s_suppkey", "k")
    salted = salted_join(li2, supp2, on="k").withColumnRenamed("k", "l_suppkey")

    assert sorted(map(tuple, plain.select(sorted(plain.columns)).collect())) == sorted(
        map(tuple, salted.select(sorted(plain.columns)).collect())
    )


def test_salted_join_hot_equals_plain_join(spark):
    """Hot-key-only salting: identical result to a plain inner join,
    with only keys above the threshold ever replicated."""
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.skew import (
        salted_join_hot,
    )

    li = load_table(spark, "lineitem", SF).select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    supp = load_table(spark, "supplier", SF).select("s_suppkey", "s_name")
    plain = li.join(supp, li.l_suppkey == supp.s_suppkey).drop("s_suppkey")

    li2 = li.withColumnRenamed("l_suppkey", "k")
    supp2 = supp.withColumnRenamed("s_suppkey", "k")
    salted = salted_join_hot(li2, supp2, on="k", hot_threshold=50).withColumnRenamed(
        "k", "l_suppkey"
    )
    assert sorted(map(tuple, plain.select(sorted(plain.columns)).collect())) == sorted(
        map(tuple, salted.select(sorted(plain.columns)).collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    f = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k int, v string")
    d = spark.createDataFrame([(1, "one"), (2, "two")], "k int, name string")
    out = salted_join(f, d, on="k", how="left").collect()
    assert len(out) == 3
    assert {r.k: r.name for r in out}[99] is None


def test_bucketed_tables_join_without_exchange(spark):
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        write_bucketed,
    )

    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_quantity")
    orders = load_table(spark, "orders", SF).select("o_orderkey", "o_totalprice")
    try:
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "okey"), "t_li_bkt", "okey"
        )
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "okey"), "t_ord_bkt", "okey"
        )
        a = spark.table("t_li_bkt")
        b = spark.table("t_ord_bkt")
        joined = a.join(b, "okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: sort-merge join with ZERO shuffle on either side
        assert "Exchange hashpartitioning" not in plan
        # and it is still the correct join
        expect = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bkt")
        spark.sql("DROP TABLE IF EXISTS t_ord_bkt")


def test_skyline_matches_bruteforce_on_random_points(spark):
    """Property: the two-phase skyline equals the O(n²) definition on
    random (price, qty) points, including duplicate-point ties (neither
    dominates, both stay)."""
    import random

    rnd = random.Random(7)
    pts = [(i, round(rnd.uniform(0, 10), 2), round(rnd.uniform(0, 10), 2)) for i in range(300)]
    pts += [(1000, 5.0, 5.0), (1001, 5.0, 5.0)]  # exact duplicates
    df = spark.createDataFrame(pts, "part_id long, price double, qty double").repartition(7)

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.skyline import (
        skyline,
    )

    got = {r.part_id for r in skyline(df).collect()}
    want = {
        pid
        for pid, pr, q in pts
        if not any(
            dp <= pr and dq >= q and (dp < pr or dq > q) for _, dp, dq in pts
        )
    }
    assert got == want


def test_exact_quantiles_grouped_matches_builtin_percentile(spark):
    """The distributed order-statistic quantile must agree with Spark's
    single-buffer exact percentile (same interpolation definition) on
    adversarial data: heavy ties, negatives straddling bucket
    boundaries, and n not divisible by the fraction denominators."""
    import random

    import pytest
    from pyspark.sql import functions as F

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_scale import (
        exact_quantiles_grouped,
    )

    rng = random.Random(5)
    vals = (
        [float(rng.randint(-3, 3)) for _ in range(501)]  # dense ties
        + [rng.uniform(-2000, 2000) for _ in range(351)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
    fracs = [0.01, 0.125, 0.5, 0.875, 0.99]
    got = {
        r.frac: r.quantile
        for r in exact_quantiles_grouped(df, "x", fracs, bucket_width=7.0).collect()
    }
    want = df.agg(
        F.percentile("x", F.array(*[F.lit(p) for p in fracs])).alias("p")
    ).collect()[0].p
    assert len(got) == len(fracs)
    for q, w in zip(fracs, want):
        assert got[q] == pytest.approx(w, abs=1e-9), q


def test_ivf_pruned_probe_cells_is_single_probe_only(spark, tmp_path):
    """probe_cells applies the SAME cell list to every probe row, so a
    multi-probe caller would silently probe wrong cells for all but one
    probe — the call must raise instead (ADVICE r6)."""
    import pytest

    emb = load_table(spark, "embeddings", SF)
    cents = train_centroids_sample(emb, n_cells=8)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path, cents)

    multi = _probes(emb)  # > 1 probe rows
    with pytest.raises(ValueError, match="single-probe"):
        ivf_knn_pruned(spark, path, multi, cents, k=4, probe_cells=[0, 1])
    # declared count is trusted and also enforced
    with pytest.raises(ValueError, match="single-probe"):
        ivf_knn_pruned(
            spark, path, multi, cents, k=4, probe_cells=[0, 1], n_probes=2
        )
    # a genuine single probe with its own cells still works
    one = multi.limit(1)
    got = ivf_knn_pruned(
        spark, path, one, cents, k=4, probe_cells=[0, 1, 2], n_probes=1
    ).collect()
    assert all(r.score is not None for r in got)


def test_grouped_exact_quantiles_matches_numpy_per_group(spark):
    """quantile_cont semantics per group, from the grouped tie-class
    machinery — cross-checked against numpy's linear interpolation on
    each group's sorted values."""
    import numpy as np
    from collections import defaultdict
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_scale import (
        grouped_exact_quantiles,
    )

    li = load_table(spark, "lineitem", SF)
    by_flag = defaultdict(list)
    for r in li.select("l_returnflag", "l_extendedprice").collect():
        by_flag[r.l_returnflag].append(r.l_extendedprice)
    fracs = [0.1, 0.25, 0.5, 0.75, 0.9]
    got = {
        (r.l_returnflag, r.frac): r.quantile
        for r in grouped_exact_quantiles(
            li.select("l_returnflag", "l_extendedprice"),
            "l_extendedprice",
            "l_returnflag",
            fracs,
        ).collect()
    }
    assert len(got) == len(by_flag) * len(fracs)
    for flag, vals in by_flag.items():
        for q in fracs:
            assert abs(got[(flag, q)] - np.quantile(vals, q)) < 1e-6, (flag, q)

def test_quantile_machinery_ignores_nulls(spark):
    """NULLs in the value column must be ignored (quantile_cont /
    percentile semantics). Before the r7-ADVICE fix the NULL class
    inflated every real class's cum via the prefix-sum window but
    dropped out of the bkt equi-join, shifting all order statistics
    (ADVICE r7, queries_scale.py ranked_tie_classes)."""
    import numpy as np
    import pytest
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.queries_scale import (
        exact_quantiles_grouped,
        grouped_exact_quantiles,
    )

    vals = [float(v) for v in range(1, 42)]
    rows = [(("a" if v % 2 else "b"), v) for v in vals]
    rows += [("a", None), ("b", None), ("b", None)]  # the poison rows
    df = spark.createDataFrame(rows, "g string, x double").repartition(4)
    fracs = [0.25, 0.5, 0.75]

    got = {
        r.frac: r.quantile
        for r in exact_quantiles_grouped(df, "x", fracs, bucket_width=7.0).collect()
    }
    for q in fracs:
        assert got[q] == pytest.approx(float(np.quantile(vals, q)), abs=1e-9), q

    by_g = {"a": [v for v in vals if v % 2], "b": [v for v in vals if not v % 2]}
    gq = {
        (r.g, r.frac): r.quantile
        for r in grouped_exact_quantiles(df, "x", "g", fracs, bucket_width=7.0).collect()
    }
    assert len(gq) == len(by_g) * len(fracs)  # no NULL group rows leak out
    for g, gvals in by_g.items():
        for q in fracs:
            assert gq[(g, q)] == pytest.approx(float(np.quantile(gvals, q)), abs=1e-9), (g, q)
