"""Physical-plan shape regressions (SURVEY §4.2: the Catalyst rewrites
we rely on must actually fire). These assertions are the scale
contract: a plan that loses its pushdown/broadcast/top-k shape would
still pass value checks on fixtures but regress catastrophically at
100 TB."""

from __future__ import annotations

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return E.queries()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    plan = _plan(spark, "q_filter_pushdown")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_ship" in plan  # the real predicate, not just IsNotNull
    # column pruning: projection columns only, not the 16-col lineitem schema
    read_schema = plan.split("ReadSchema:")[1]
    assert "l_comment" not in read_schema


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "q_topk_cosine")
    assert "TakeOrderedAndProject" in plan


def test_dim_joins_broadcast_with_partial_agg(spark):
    plan = _plan(spark, "q_join_broadcast")
    assert plan.count("BroadcastHashJoin") >= 2  # nation AND region stay broadcast
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert "SortMergeJoin" not in plan


def test_knn_join_never_shuffles_index_before_scoring(spark):
    plan = _plan(spark, "q_knn_join")
    # probe side broadcast; the only exchange is the per-query window cut
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # Spark 3.5+ pushes a partial top-k below the exchange
    assert "WindowGroupLimit" in plan


def test_semi_anti_stay_semi_anti(spark):
    plan = _plan(spark, "q_join_semi_anti")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_exact_dedup_aggregates_map_side(spark):
    plan = _plan(spark, "q_dedup_exact")
    assert "partial_min" in plan or "partial_count" in plan


@pytest.mark.parametrize(
    "name", ["q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram_jaccard"]
)
def test_sketch_scatter_spreads_single_partition_scan(spark, name):
    # the fixture scan is one file → one partition; scatter must fire
    # here so sketch compute runs at engine parallelism (on a cluster-
    # scale scan it is a no-op — next test)
    plan = _plan(spark, name)
    assert "Exchange RoundRobinPartitioning" in plan


def test_scatter_is_noop_on_well_partitioned_input(spark):
    # the 100 TB contract: a cluster-scale scan (splits >= cores) must
    # pass through scatter untouched — zero added exchanges
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.loaders import (
        scatter,
    )

    df = spark.range(1000).repartition(64)
    assert scatter(df) is df


def test_tpch_q3_broadcasts_dim_and_takes_top10(spark):
    plan = _plan(spark, "q_tpch_shipping_priority")
    assert "BroadcastHashJoin" in plan  # filtered customer dim broadcast
    assert "TakeOrderedAndProject" in plan  # top-10 cut, no global sort
    assert "partial_sum" in plan  # map-side revenue combine


def test_tpch_q5_single_fact_shuffle(spark):
    plan = _plan(spark, "q_tpch_local_volume")
    # supplier⋈nation⋈region and customer all ride broadcasts; the only
    # sort-merge-eligible join is lineitem⋈orders
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") <= 1


def test_pricing_summary_partial_agg_and_pruned_scan(spark):
    plan = _plan(spark, "q_tpch_pricing")
    assert "partial_sum" in plan
    read_schema = plan.split("ReadSchema:")[1]
    assert "l_suppkey" not in read_schema  # 7-col projection reaches the scan


def test_zscore_broadcasts_stats_not_window(spark):
    plan = _plan(spark, "q_anomaly_zscore")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan  # grouped-stats shape, not a per-row window


def test_centroid_partial_aggregates_exploded_rows(spark):
    plan = _plan(spark, "q_vector_centroid")
    assert "Generate posexplode" in plan or "posexplode" in plan
    assert "partial_avg" in plan or "partial_sum" in plan


def test_returned_items_top20_and_broadcasts(spark):
    plan = _plan(spark, "q_tpch_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_dormant_customers_anti_join(spark):
    plan = _plan(spark, "q_tpch_dormant_customers")
    assert "LeftAnti" in plan


def test_nation_volume_all_dims_broadcast(spark):
    plan = _plan(spark, "q_tpch_nation_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1
