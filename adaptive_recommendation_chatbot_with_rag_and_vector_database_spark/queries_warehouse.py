"""Warehouse wave 3 (SURVEY §2.13): the remaining TPC-H query shapes.

Rounds 1-2 covered Q1/Q3/Q5/Q7/Q10/Q13/Q14/Q16/Q18/Q19/Q22 analogs
(queries_analytics.py); this module completes the set — Q2/Q4/Q6/Q8/
Q9/Q11/Q12/Q15/Q17/Q20/Q21 analogs adapted to the driver's star schema
(no partsupp table, no commit/receipt dates — substitutions documented
per query). With it, every one of the 22 canonical warehouse query
shapes has a DataFrame-first implementation and an exact DuckDB oracle.

Scale notes follow the repo's exchange-budget discipline (SURVEY §8):
every dimension side is broadcast, aggregates are map-side partial,
and each query keeps at most the fact-fact shuffles the shape
fundamentally requires (Q21's triple lineitem self-join is the known
worst case of the whole TPC-H suite on any engine).

Determinism: float outputs rounded in BOTH the Spark query and the
oracle SQL; equality-on-aggregate filters (Q2/Q15) compare rounded
values so summation order cannot flip them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query
from .sources.loaders import cust_revenue, load_table, part_revenue


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


@query(
    "q_tpch_simple_agg",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_simple_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecast revenue change: pure filter + global
    aggregate. All three predicates push to the parquet scan
    (PushedFilters), the projection prunes to 4 columns, and the
    exchange carries exactly one partial-sum row per task — the
    cheapest possible shape at any scale."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q_tpch_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q_tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority checking. The reference schema has
    no commit/receipt dates, so the EXISTS probes for a returned line
    (l_returnflag = 'R') instead of a late one — same decorrelated
    left-semi shape. One shuffle on orderkey for the semi join (both
    sides filtered first), then a 5-group aggregate."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    returned = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_tpch_shipmode",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q_tpch_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style shipping-mode priority split (no l_shipmode in
    the schema — l_linestatus is the grouping stand-in). One fact-fact
    shuffle on orderkey, then conditional counts combined map-side into
    two groups."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@query(
    "q_tpch_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: quarterly revenue per supplier,
    keep the max (ties all surface, like the spec's view formulation).
    The revenue aggregate shuffles once on suppkey; the scalar max is a
    1-row broadcast joined back; supplier names broadcast. Rounding
    before the max comparison makes the equality robust to summation
    order."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("_mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q_tpch_small_qty_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey AS pk, round(0.5 * avg(l_quantity), 6) AS half_avg
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1'
      GROUP BY l_partkey)
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_small
    FROM lineitem JOIN part_avg ON pk = l_partkey
    WHERE l_quantity < half_avg
    """,
)
def q_tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity-order revenue: the correlated
    `l_quantity < 0.5 * avg(l_quantity) per part` subquery,
    decorrelated into a per-part aggregate joined back to the fact.
    Brand filter broadcasts into BOTH passes so only the brand's
    lineitems are aggregated or probed; the join-back keys on partkey
    (the correlation key), one shuffle each side. The threshold is
    rounded on both sides so the float comparison cannot flip at the
    boundary."""
    part_b = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem")
    brand_lines = li.join(F.broadcast(part_b), li.l_partkey == part_b.p_partkey)
    part_avg = brand_lines.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(0.5 * F.avg("l_quantity"), 6).alias("half_avg")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "q_tpch_important_nations",
    oracle="""
    WITH supp_value AS (
      SELECT s_nationkey, sum(l_extendedprice * l_quantity) AS val
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      GROUP BY s_nationkey)
    SELECT n_name, round(val, 2) AS value
    FROM supp_value JOIN nation ON n_nationkey = s_nationkey
    WHERE val > (SELECT sum(val) * 0.04 FROM supp_value)
    """,
)
def q_tpch_important_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style important stock value (no partsupp table —
    shipped value per supplier nation stands in). Supplier dim
    broadcasts into the fact scan, the per-nation aggregate is ~25
    partial rows, and the HAVING threshold is a scalar subquery over
    those same rows — computed once and broadcast back, no second fact
    scan."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    sv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("val"))
        # lazy checkpoint (r12 scan-dupe paydown): the ~25-row nation
        # rollup feeds the HAVING threshold AND the filtered join — as
        # plain subtrees the fact scan+aggregate ran twice per call
        .localCheckpoint(eager=False)
    )
    thr = sv.agg((F.sum("val") * 0.04).alias("_thr"))
    nation = _t(spark, sf_dir, "nation")
    return (
        sv.join(F.broadcast(thr), sv.val > F.col("_thr"))
        .join(F.broadcast(nation), sv.s_nationkey == nation.n_nationkey)
        .select("n_name", F.round("val", 2).alias("value"))
    )


@query(
    "q_tpch_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             min(round(l_extendedprice / l_quantity, 2)) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    best AS (SELECT pk, min(unit_price) AS best_price FROM offers GROUP BY pk)
    SELECT p_partkey, p_name, s_name, unit_price
    FROM offers JOIN best USING (pk)
    JOIN part ON p_partkey = pk JOIN supplier ON s_suppkey = sk
    WHERE p_size <= 5 AND unit_price = best_price
    """,
)
def q_tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier (no partsupp — observed
    unit price from lineitem stands in for ps_supplycost). The small
    part filter broadcasts BEFORE the offer aggregate so only eligible
    parts are grouped; the per-part min is a window over the partkey
    partition the aggregate already produced (WindowGroupLimit-free:
    equality keeps ties, as Q2's spec does). Unit prices are rounded
    before min on both sides."""
    part_small = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5).select(
        "p_partkey", "p_name"
    )
    li = _t(spark, sf_dir, "lineitem")
    offers = (
        li.join(F.broadcast(part_small), li.l_partkey == part_small.p_partkey)
        .groupBy("p_partkey", "p_name", F.col("l_suppkey").alias("sk"))
        .agg(
            F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)).alias(
                "unit_price"
            )
        )
    )
    w = Window.partitionBy("p_partkey")
    supp = _t(spark, sf_dir, "supplier")
    return (
        offers.withColumn("_best", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("_best"))
        .join(F.broadcast(supp), F.col("sk") == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "unit_price")
    )


@query(
    "q_tpch_market_share",
    oracle="""
    WITH rev AS (
      SELECT year(o_orderdate) AS yr, n2.n_name AS supp_nation,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT yr, round(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                              ELSE 0 END) / sum(volume), 4) AS mkt_share
    FROM rev GROUP BY yr
    """,
)
def q_tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: one nation's slice of the
    revenue sold into a region's customers, per year. The region filter
    collapses to a set of nation keys that semi-prunes customers before
    broadcast; lineitem⋈orders is the single fact-fact shuffle, every
    other side broadcasts. Numerator and denominator are one
    conditional-sum pass (no self-join)."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    asia_keys = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(asia_keys),
        F.col("c_nationkey") == asia_keys.n_nationkey,
        "left_semi",
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    n2 = nation.select(
        F.col("n_nationkey").alias("_nk2"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_nk2"))
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", volume).otherwise(0.0)
                )
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q_tpch_product_profit",
    oracle="""
    SELECT n_name AS supp_nation, year(o_orderdate) AS o_year,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4))
                            * (1 - CAST(l_discount AS DECIMAL(15,4)))
                          - 0.5 * CAST(p_retailprice AS DECIMAL(15,4))
                                * CAST(l_quantity AS DECIMAL(15,4)))
                      AS DOUBLE), 2) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY supp_nation, o_year
    """,
)
def q_tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-line profit (no ps_supplycost — half the
    part's retail price per unit stands in for cost). The p_name LIKE
    filter makes the part side small enough to broadcast, which prunes
    lineitem before the single fact-fact shuffle against orders;
    supplier and nation broadcast. Profit expression folds into the
    map-side partial sum. Money arithmetic runs in DECIMAL so the sum
    is exact and order-independent — the double formulation landed on a
    round-to-2 boundary that flipped between engines."""
    part_g = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    dec = lambda c: F.col(c).cast("decimal(15,4)")  # noqa: E731
    profit = dec("l_extendedprice") * (1 - dec("l_discount")) - F.expr(
        "CAST(0.5 AS DECIMAL(2,1))"
    ) * dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(F.broadcast(part_g), li.l_partkey == part_g.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("profit"))
    )


@query(
    "q_tpch_excess_quantity",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey HAVING sum(l_quantity) > 300)
    """,
)
def q_tpch_excess_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style excess-quantity suppliers: who shipped more than
    a threshold of the filtered part family this year. The IN-subquery
    decorrelates to aggregate → HAVING → left-semi join; the part
    filter broadcasts into the fact scan, the aggregate shuffles once
    on suppkey, and the surviving keys (≤ |supplier|) broadcast into
    the supplier dim — the fact table never moves twice."""
    part_s = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    heavy = (
        li.join(F.broadcast(part_s), li.l_partkey == part_s.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 300)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return supp.join(
        F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q_tpch_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q_tpch_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style waiting suppliers (no receipt/commit dates —
    sole-returner in a multi-supplier finished order stands in for
    sole-late). EXISTS → left-semi, NOT EXISTS → left-anti, both on
    the orderkey equi-key with the suppkey inequality as join residual;
    this is canonically TPC-H's heaviest query (three passes over
    lineitem) and the semi/anti formulation is the shape every
    warehouse engine picks — no distinct, no count-filter rewrite, so
    the anti side short-circuits on first match."""
    li = _t(spark, sf_dir, "lineitem")
    orders_f = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    supp = _t(spark, sf_dir, "supplier")
    cand = (
        l1.join(orders_f, F.col("l1.l_orderkey") == orders_f.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        cand.join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- Event-pipeline shapes (§2.13 W12-W14) ---------------------------------


@query(
    "q_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0
             END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_idx
    FROM marked
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (W12): label every event with its session
    ordinal via the lag-gap + running-sum idiom (30-minute gap). This
    is the ASSIGNMENT form — each row keeps its session id for
    downstream feature joins — complementing q_stream_session_window's
    per-session AGGREGATE form. Both windows share one partitioning
    (user_id), so the plan has a single exchange and two window passes
    over already-sorted partitions."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > 1800),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return ev.select(
        "user_id", "event_id", F.sum(is_new).over(run).alias("session_idx")
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
      FROM events)
    SELECT cohort_week, act_week, count(*) AS n_users
    FROM firsts JOIN activity USING (user_id)
    GROUP BY cohort_week, act_week
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (W13): users keyed by first-seen
    week, counted per activity week — the classic growth-analytics
    shape. Two aggregates over the same user_id partitioning (min-ts
    cohort, distinct activity weeks) joined on user_id; the cohort side
    is |users| rows and broadcastable, the output is |weeks|² cells."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("act_week")
    ).distinct()
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy("cohort_week", "act_week")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q_approx_sketch",
    oracle="""
    SELECT count(DISTINCT user_id) AS exact_users,
           round(quantile_cont(value, 0.5), 4) AS exact_p50,
           true AS cd_ok, true AS p50_ok
    FROM events
    """,
)
def q_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-sketch accuracy verdict (W14): HyperLogLog++
    count-distinct and t-digest-style percentile_approx, each checked
    against the exact aggregate computed in the same pass. The oracle
    pins the exact values and the verdict booleans (sketches are
    deterministic for fixed data), making sketch quality
    driver-checkable the same way q_ann_recall does for ANN. At 100 TB
    the sketches are the only viable form — fixed-size partial state
    vs collect-all-values — so proving their error bound IS the
    operator's contract."""
    ev = _t(spark, sf_dir, "events")
    # aggregate each function exactly ONCE, derive the verdicts in a
    # post-agg projection — repeating countDistinct/percentile inside
    # the boolean expressions made the aggregate evaluate them 3× each
    # (measured 2× wall on the bench tier)
    stats = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        # accuracy=1000: rank error ≤ n/1000, an order cheaper to build
        # and merge than 10000 while still far inside the 1 % verdict
        # tolerance below (sketch size is what the exchange carries)
        F.expr("approx_percentile(value, 0.5, 1000)").alias("ap50"),
    )
    return stats.select(
        "exact_users",
        F.round("p50", 4).alias("exact_p50"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("cd_ok"),
        (F.abs(F.col("ap50") - F.col("p50")) <= 0.01 * F.abs(F.col("p50")) + 0.01).alias(
            "p50_ok"
        ),
    )


# --- W19/W16: RFM customer segmentation --------------------------------------


@query(
    "q_rfm_segmentation",
    oracle="""
    WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS md FROM orders),
    cust AS (
      SELECT o.o_custkey,
             datediff('day', max(CAST(o.o_orderdate AS DATE)), mx.md)
               AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders o, mx GROUP BY o.o_custkey, mx.md),
    scored AS (
      SELECT c.c_nationkey,
             ntile(5) OVER (PARTITION BY c.c_nationkey
               ORDER BY cust.recency_days ASC, cust.o_custkey) AS r_q,
             ntile(5) OVER (PARTITION BY c.c_nationkey
               ORDER BY cust.frequency DESC, cust.o_custkey) AS f_q,
             ntile(5) OVER (PARTITION BY c.c_nationkey
               ORDER BY cust.monetary_cents DESC, cust.o_custkey) AS m_q,
             cust.monetary_cents
      FROM cust JOIN customer c ON cust.o_custkey = c.c_custkey)
    SELECT r_q, f_q, m_q,
           CASE WHEN r_q = 1 AND f_q <= 2 AND m_q <= 2 THEN 'champion'
                WHEN r_q >= 4 AND f_q <= 2 THEN 'at_risk'
                WHEN r_q >= 4 AND f_q >= 4 THEN 'lost'
                ELSE 'regular' END AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary_cents) AS BIGINT) AS total_monetary_cents
    FROM scored GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (W19/W16): score every purchasing customer by
    Recency (days since last order, vs the corpus max date — data-driven
    so replicated tiers need no change), Frequency, and Monetary
    (integer cents), cut each dimension into quintiles, and roll the
    125 (R,F,M) cells up with the standard lifecycle labels
    (champion / at_risk / lost / regular) — the segmentation CRM
    campaigns are keyed on.

    Quintiles are ntile(5) WITHIN NATION with a custkey tie-break —
    ntile over a keyed partition is the scalable form (the global-cut
    alternative is the bucketed-rank pattern q_decile_lift shows); the
    per-nation framing is also the analytically honest one, since
    order recency/value distributions differ by market.

    Plan shape: one custkey aggregate over the facts (map-side
    partials), a broadcast customer-dimension join, three ntile windows
    SHARING the single nation-keyed exchange (same partition key), and
    a ≤125-cell rollup. The facts are scanned once; no global sort."""
    orders = load_table(spark, "orders", sf_dir)
    mx = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("md")
    )
    cust = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "md")
        .agg(
            F.datediff(F.col("md"), F.max(F.to_date("o_orderdate"))).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
    )
    dim = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    scored = cust.join(
        F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey")
    ).select(
        "c_nationkey",
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
    )
    base = Window.partitionBy("c_nationkey")
    scored = scored.select(
        F.ntile(5)
        .over(base.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
        .alias("r_q"),
        F.ntile(5)
        .over(base.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        .alias("f_q"),
        F.ntile(5)
        .over(base.orderBy(F.desc("monetary_cents"), F.asc("o_custkey")))
        .alias("m_q"),
        "monetary_cents",
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("total_monetary_cents"),
        )
        .select(
            "r_q",
            "f_q",
            "m_q",
            F.when(
                (F.col("r_q") == 1) & (F.col("f_q") <= 2) & (F.col("m_q") <= 2),
                "champion",
            )
            .when((F.col("r_q") >= 4) & (F.col("f_q") <= 2), "at_risk")
            .when((F.col("r_q") >= 4) & (F.col("f_q") >= 4), "lost")
            .otherwise("regular")
            .alias("segment"),
            "n_customers",
            "total_monetary_cents",
        )
        .orderBy("r_q", "f_q", "m_q")
    )


# --- W21/W17: top session navigation paths -----------------------------------

_PATH_GAP_S = 1800
_PATH_LEN = 4
_PATH_TOPK = 10


@query(
    "q_session_path_topk",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, ts, substr(event_type, 1, 1) AS c,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > {_PATH_GAP_S} * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, event_id, ts, c,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM ev),
    paths AS (
      SELECT substr(string_agg(c, '' ORDER BY ts, event_id), 1,
                    {_PATH_LEN}) AS path
      FROM sessions GROUP BY user_id, sid),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM paths),
    counted AS (
      SELECT path, CAST(count(*) AS BIGINT) AS n FROM paths GROUP BY path)
    SELECT path, n,
           round(n / CAST(tot.n_sessions AS DOUBLE), 5) AS share,
           CAST(row_number() OVER (ORDER BY n DESC, path ASC) AS BIGINT)
             AS rank
    FROM counted, tot
    ORDER BY n DESC, path ASC LIMIT {_PATH_TOPK}
    """,
)
def q_session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session navigation paths (W21/W17): sessionize by the
    {_PATH_GAP_S // 60}-minute gap rule (W12's lag-gap + running-sum
    idiom), render each session as its first {_PATH_LEN} event-type
    initials IN EVENT ORDER, and rank the {_PATH_TOPK} most common
    paths with traffic share — the "how do users actually move"
    report behind funnel design (Y9 checks ONE hypothesized order;
    this discovers the orders that exist).

    Ordering inside a session is pinned by (ts, event_id) on both
    engines — Spark builds the path by sorting an array of
    (ts, event_id, initial) structs (the LG4 discipline: array_sort's
    lexicographic struct order IS the event order), DuckDB by an
    ORDER BY inside string_agg. Path counts are exact integers.

    Plan shape: one user-keyed exchange serves the gap window, the
    running session-id sum, AND the per-session collect (subset
    clustering); the path rollup carries ≤|paths| ≤ |types|^{_PATH_LEN}
    partials per mapper, and the final top-k is a
    TakeOrderedAndProject over that bounded set."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > _PATH_GAP_S * 1_000_000
        ),
        1,
    ).otherwise(0)
    sessions = ev.select(
        "user_id",
        F.struct(
            F.col("ts").alias("t"),
            F.col("event_id").alias("e"),
            F.substring("event_type", 1, 1).alias("c"),
        ).alias("step"),
        F.sum(is_new).over(run).alias("sid"),
    )
    paths = (
        sessions.groupBy("user_id", "sid")
        .agg(F.array_sort(F.collect_list("step")).alias("steps"))
        .select(
            F.concat_ws(
                "",
                F.slice(
                    F.transform(F.col("steps"), lambda s: s["c"]),
                    1,
                    _PATH_LEN,
                ),
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # total sessions = Σn over the BOUNDED path table (≤ |types|^len
    # rows), taken as a window over counted rather than a separate
    # scalar branch: collect_list is non-determinism-flagged, which
    # blocks exchange reuse, so a second consumer of `paths` would
    # re-execute the whole fact-sized sessionization (caught by plan
    # audit; measured 69 s → 36 s at the 100 M-event tier)
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        counted.select(
            "path",
            "n",
            F.round(
                F.col("n") / F.sum("n").over(w_all).cast("double"), 5
            ).alias("share"),
            F.row_number().over(w_rank).cast("long").alias("rank"),
        )
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(_PATH_TOPK)
    )


# --- W23/W18: order-to-ship cycle-time percentiles ----------------------------


@query(
    "q_order_cycle_time",
    oracle="""
    WITH shipped AS (
      SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
      FROM lineitem GROUP BY l_orderkey),
    cyc AS (
      SELECT o.o_orderpriority AS priority,
             datediff('day', CAST(o.o_orderdate AS DATE), s.last_ship)
               AS cycle_days
      FROM orders o JOIN shipped s ON o.o_orderkey = s.l_orderkey)
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY cycle_days) AS p50_days,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY cycle_days) AS p90_days,
           round(CAST(sum(cycle_days) AS BIGINT)
                 / CAST(count(*) AS DOUBLE), 4) AS mean_days
    FROM cyc GROUP BY priority ORDER BY priority
    """,
)
def q_order_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship cycle time (W23/W18): days from order placement to
    the LAST line shipment, summarized per priority as p50/p90/mean —
    the order-to-cash operational metric every fulfillment dashboard
    leads with, and the warehouse twin of TM7's SLO percentiles
    (there the subject was a metric stream; here it is a two-table
    lifecycle join).

    Determinism: cycle lengths are integer days; the percentiles are
    discrete (actual observations, the LG3 rule); the mean is one exact
    BIGINT sum with a single double division.

    Plan shape: the lineitem side collapses to one row per order
    (map-side-combined max) BEFORE the join, so the orderkey-keyed join
    moves |orders|-sized sides only; the rollup exchange carries
    |priorities| percentile states. At 100 TB both exchanges ride the
    same orderkey partitioning."""
    shipped = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("last_ship"))
    )
    cyc = (
        load_table(spark, "orders", sf_dir)
        .join(shipped, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff("last_ship", F.to_date("o_orderdate")).alias(
                "cycle_days"
            ),
        )
    )
    return (
        cyc.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cycle_days)")
            .cast("long")
            .alias("p50_days"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY cycle_days)")
            .cast("long")
            .alias("p90_days"),
            F.round(
                F.sum("cycle_days").cast("long")
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("mean_days"),
        )
        .orderBy("priority")
    )


# --- W19: funnel step-transition timing --------------------------------------


@query(
    "q_funnel_timing",
    oracle="""
    WITH u AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view')     AS t_view,
             min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id),
    gaps AS (
      SELECT 'view->click' AS step,
             CAST(floor(epoch(t_click)) AS BIGINT)
               - CAST(floor(epoch(t_view)) AS BIGINT) AS gap_s
      FROM u WHERE t_click > t_view
      UNION ALL
      SELECT 'click->purchase' AS step,
             CAST(floor(epoch(t_purchase)) AS BIGINT)
               - CAST(floor(epoch(t_click)) AS BIGINT) AS gap_s
      FROM u WHERE t_click > t_view AND t_purchase > t_click)
    SELECT step,
           CAST(count(*) AS BIGINT) AS n_users,
           round(quantile_cont(gap_s, 0.50), 1) AS p50_s,
           round(quantile_cont(gap_s, 0.90), 1) AS p90_s,
           round(avg(gap_s), 1) AS mean_s
    FROM gaps GROUP BY step ORDER BY step
    """,
)
def q_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step-transition timing (W19): q_funnel counts who
    converts; this measures HOW LONG each conversion step takes —
    median/p90/mean seconds from first view to first click and from
    first click to first purchase, the numbers a growth team reads to
    find where users stall. Same 100 TB shape as the funnel itself: one
    user-keyed hash aggregate collapses the event volume to three
    timestamps per user, the step gaps are row-local arithmetic, and
    the exact interpolated percentiles aggregate a |converting-users|
    frame per step (switch to approx_percentile's mergeable t-digest
    when even that frame outgrows a task, per Y4's note)."""
    ev = _t(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    u = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    clicked = F.col("t_click") > F.col("t_view")
    g1 = u.filter(clicked).select(
        F.lit("view->click").alias("step"),
        (F.col("t_click").cast("long") - F.col("t_view").cast("long")).alias(
            "gap_s"
        ),
    )
    g2 = u.filter(clicked & (F.col("t_purchase") > F.col("t_click"))).select(
        F.lit("click->purchase").alias("step"),
        (
            F.col("t_purchase").cast("long") - F.col("t_click").cast("long")
        ).alias("gap_s"),
    )
    pct = F.percentile("gap_s", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        g1.unionByName(g2)
        .groupBy("step")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            pct.alias("_p"),
            F.round(F.avg("gap_s"), 1).alias("mean_s"),
        )
        .select(
            "step",
            "n_users",
            F.round(F.col("_p")[0], 1).alias("p50_s"),
            F.round(F.col("_p")[1], 1).alias("p90_s"),
            "mean_s",
        )
        .orderBy("step")
    )


# --- W20: cohort LTV curve ----------------------------------------------------


@query(
    "q_cohort_ltv",
    oracle="""
    WITH first_year AS (
      SELECT o_custkey AS c, CAST(min(year(o_orderdate)) AS BIGINT) AS cohort
      FROM orders GROUP BY o_custkey),
    yearly AS (
      SELECT o_custkey AS c, CAST(year(o_orderdate) AS BIGINT) AS y,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY 1, 2),
    size AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
             FROM first_year GROUP BY cohort),
    cohort_rev AS (
      SELECT f.cohort, y.y - f.cohort AS age, sum(y.rev) AS rev
      FROM yearly y JOIN first_year f ON y.c = f.c
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort, age,
             sum(rev) OVER (PARTITION BY cohort ORDER BY age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
      FROM cohort_rev)
    SELECT cum.cohort, CAST(cum.age AS BIGINT) AS age, size.n_customers,
           round(cum.cum_rev / size.n_customers, 2) AS cum_rev_per_customer
    FROM cum JOIN size USING (cohort)
    ORDER BY cohort, age
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve (W20): customers cohorted by first-
    order year, cumulative revenue per cohort member by account age —
    the LTV table that prices acquisition spend (q_cohort_retention
    counts who RETURNS; this measures what they are WORTH). Shape: one
    custkey-keyed aggregate each for first-year and yearly revenue,
    joined on the customer key (co-partitioned — AQE plans one
    exchange pair), then a (cohort, age) rollup that is |years|² rows;
    the running sum windows over ≤|years| rows per cohort. At 100 TB
    only the two customer-keyed aggregates touch fact data."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"),
        F.year("o_orderdate").cast("long").alias("y"),
        "o_totalprice",
    )
    # (r12 note: a lazy checkpoint of the (customer, year) rollup
    # feeding all three consumers measured wall-NEGATIVE in interleaved
    # A/B at sf0.1 — the checkpoint's plan-conversion cost exceeds the
    # saved duplicate aggregate on this sub-second query — and was
    # reverted, the d63a41f discipline)
    first_year = o.groupBy("c").agg(F.min("y").alias("cohort"))
    yearly = o.groupBy("c", "y").agg(F.sum("o_totalprice").alias("rev"))
    size = first_year.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    cohort_rev = (
        yearly.join(first_year, "c")
        .groupBy("cohort", (F.col("y") - F.col("cohort")).alias("age"))
        .agg(F.sum("rev").alias("rev"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cohort_rev.select(
        "cohort", F.col("age").cast("long").alias("age"), F.sum("rev").over(w).alias("cum_rev")
    )
    return (
        cum.join(F.broadcast(size), "cohort")
        .select(
            "cohort",
            "age",
            "n_customers",
            F.round(F.col("cum_rev") / F.col("n_customers"), 2).alias(
                "cum_rev_per_customer"
            ),
        )
        .orderBy("cohort", "age")
    )


# --- W21: Pareto revenue concentration ---------------------------------------


@query(
    "q_pareto_concentration",
    oracle="""
    WITH cust AS (
      SELECT o_custkey, sum(o_totalprice) AS rev
      FROM orders GROUP BY o_custkey),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rev) AS total FROM cust),
    b AS (SELECT *, CAST(floor(rev / 1000) AS BIGINT) AS bkt FROM cust),
    bc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS bn FROM b GROUP BY 1),
    boff AS (
      SELECT bkt,
             CAST(coalesce(sum(bn) OVER (ORDER BY bkt DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS off
      FROM bc),
    ranked AS (
      SELECT b.rev,
             boff.off + row_number() OVER (
               PARTITION BY b.bkt ORDER BY b.rev DESC, b.o_custkey) AS rnk,
             tot.n, tot.total
      FROM b JOIN boff ON b.bkt = boff.bkt, tot),
    agg AS (
      SELECT ((rnk - 1) * 10) // n AS decile,
             CAST(count(*) AS BIGINT) AS n_customers,
             sum(rev) AS rev, max(total) AS total
      FROM ranked GROUP BY 1)
    SELECT decile, n_customers,
           round(rev / total, 5) AS rev_share,
           round(sum(rev) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / total, 5) AS cum_share
    FROM agg ORDER BY decile
    """,
)
def q_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC revenue-concentration curve (W21): rank customers
    by lifetime revenue, cut into deciles, report each decile's revenue
    share and the cumulative (Lorenz) share — "do 20% of customers
    drive 80% of revenue". q_decile_lift ranks by a MODEL score against
    a label; this ranks by the metric itself to audit concentration.
    Same single-partition-free rank machinery: floor-bucket offsets
    broadcast (1000-dollar buckets keep the offset table driver-scale),
    within-bucket windows carry the parallelism, exact decile cut on
    the integer rank."""
    cust = cust_revenue(spark, sf_dir).select(
        "o_custkey", F.col("rev_raw").alias("rev")
    )
    tot = cust.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("rev").alias("total")
    )
    b = cust.withColumn("bkt", F.floor(F.col("rev") / 1000).cast("long"))
    bc = b.groupBy("bkt").agg(F.count(F.lit(1)).cast("long").alias("bn"))
    w_off = Window.orderBy(F.desc("bkt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    boff = bc.select(
        "bkt",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).cast("long").alias("off"),
    )
    w_in = Window.partitionBy("bkt").orderBy(
        F.desc("rev"), F.asc("o_custkey")
    )
    ranked = (
        b.join(F.broadcast(boff), "bkt")
        .crossJoin(F.broadcast(tot))
        .select(
            "rev",
            (F.col("off") + F.row_number().over(w_in)).alias("rnk"),
            "n",
            "total",
        )
    )
    agg = (
        ranked.select(
            F.expr("(rnk - 1) * 10 DIV n").alias("decile"), "rev", "total"
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("rev").alias("rev"),
            F.max("total").alias("total"),
        )
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return agg.select(
        "decile",
        "n_customers",
        F.round(F.col("rev") / F.col("total"), 5).alias("rev_share"),
        F.round(F.sum("rev").over(w_cum) / F.col("total"), 5).alias(
            "cum_share"
        ),
    ).orderBy("decile")


# --- W22: open-order backlog aging --------------------------------------------


@query(
    "q_backlog_aging",
    oracle="""
    WITH snap AS (SELECT max(o_orderdate) AS asof FROM orders),
    open_o AS (
      SELECT o_orderkey, o_totalprice,
             date_diff('day', o_orderdate, snap.asof) AS age_d
      FROM orders, snap WHERE o_orderstatus = 'O'),
    b AS (
      SELECT CASE WHEN age_d <= 90 THEN '0-90d'
                  WHEN age_d <= 365 THEN '91-365d'
                  WHEN age_d <= 730 THEN '1-2y'
                  ELSE '>2y' END AS bucket,
             o_totalprice
      FROM open_o)
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS open_value
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def q_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging (W22): orders still open ('O') bucketed
    by age at the data's own snapshot date, with value at risk per
    bucket — the operations dashboard that turns "how behind are we"
    into a number (q_inventory_aging ages unconsumed LOTS; this ages
    unfulfilled DEMAND). The snapshot derives from the data (max order
    date: reproducible, no wall clock), broadcasts as one row, and the
    rest is a pushdown-filtered scan plus a 4-group aggregate."""
    o = _t(spark, sf_dir, "orders")
    snap = o.agg(F.max("o_orderdate").alias("asof"))
    open_o = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(snap))
        .select(
            "o_totalprice",
            F.datediff(F.col("asof"), F.col("o_orderdate")).alias("age_d"),
        )
    )
    bucket = (
        F.when(F.col("age_d") <= 90, "0-90d")
        .when(F.col("age_d") <= 365, "91-365d")
        .when(F.col("age_d") <= 730, "1-2y")
        .otherwise(">2y")
    )
    return (
        open_o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("open_value"),
        )
        .orderBy("bucket")
    )


# --- W23: revenue waterfall ----------------------------------------------------


@query(
    "q_revenue_waterfall",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
           round(sum(l_extendedprice), 2) AS gross,
           round(sum(l_extendedprice * l_discount), 2) AS discount_given,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS net,
           round(sum(l_extendedprice * (1 - l_discount) * l_tax), 2) AS tax_collected,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS billed
    FROM lineitem GROUP BY year(l_shipdate) ORDER BY year
    """,
)
def q_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall (W23): the gross → discount → net → tax →
    billed decomposition per ship year — the finance bridge that
    explains WHERE the delta between list price and cash came from
    (TPC-H Q1 summarizes one slice; this is the full-ledger
    decomposition over time). Pure map-side arithmetic folded by one
    year-keyed aggregate: five running sums in a single pass, scan-
    bound at 100 TB with every expression in whole-stage codegen."""
    li = _t(spark, sf_dir, "lineitem")
    ext, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        li.groupBy(F.year("l_shipdate").cast("long").alias("year"))
        .agg(
            F.round(F.sum(ext), 2).alias("gross"),
            F.round(F.sum(ext * disc), 2).alias("discount_given"),
            F.round(F.sum(ext * (1 - disc)), 2).alias("net"),
            F.round(F.sum(ext * (1 - disc) * tax), 2).alias("tax_collected"),
            F.round(F.sum(ext * (1 - disc) * (1 + tax)), 2).alias("billed"),
        )
        .orderBy("year")
    )


# --- W24: supplier scorecard ----------------------------------------------------


@query(
    "q_supplier_scorecard",
    oracle="""
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(avg(l_discount), 5) AS avg_discount,
           round(avg(CASE WHEN l_returnflag = 'R'
                          THEN 1.0 ELSE 0.0 END), 5) AS return_rate
    FROM lineitem GROUP BY l_suppkey
    ORDER BY revenue DESC, l_suppkey LIMIT 20
    """,
)
def q_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier scorecard (W24): the multi-metric vendor review —
    revenue, volume, average discount conceded, and return rate per
    supplier, top 20 by revenue. TPC-H Q21 finds the WORST
    suppliers by one signal; a procurement review reads all of them
    at once. One supplier-keyed aggregate (all four metrics are
    partial-aggregable conditional sums), TakeOrdered on the rounded
    revenue with a key tie-break."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.avg("l_discount"), 5).alias("avg_discount"),
            F.round(
                F.avg(
                    F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)
                ),
                5,
            ).alias("return_rate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_suppkey"))
        .limit(20)
    )


# --- W25: price/volume/mix revenue bridge ------------------------------------


@query(
    "q_pvm_bridge",
    oracle="""
    WITH py AS (
      SELECT year(l_shipdate) AS yr, l_partkey,
             sum(l_extendedprice) AS rev, sum(l_quantity) AS q,
             sum(l_extendedprice) / sum(l_quantity) AS p
      FROM lineitem GROUP BY 1, 2),
    y0 AS (SELECT min(yr) AS y FROM py),
    a AS (SELECT l_partkey, rev, q, p FROM py, y0 WHERE yr = y0.y),
    b AS (SELECT l_partkey, rev, q, p FROM py, y0 WHERE yr = y0.y + 1),
    joined AS (
      SELECT coalesce(a.l_partkey, b.l_partkey) AS pk,
             a.rev AS rev0, a.q AS q0, a.p AS p0,
             b.rev AS rev1, b.q AS q1, b.p AS p1
      FROM a FULL OUTER JOIN b ON a.l_partkey = b.l_partkey),
    eff AS (
      SELECT sum(coalesce(rev0, 0)) AS rev_y0,
             sum(coalesce(rev1, 0)) AS rev_y1,
             sum(CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL
                      THEN (p1 - p0) * q0 ELSE 0 END) AS price_eff,
             sum(CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL
                      THEN p0 * (q1 - q0) ELSE 0 END) AS volume_eff,
             sum(CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL
                      THEN (p1 - p0) * (q1 - q0) ELSE 0 END) AS mix_eff,
             sum(CASE WHEN rev0 IS NULL THEN rev1 ELSE 0 END) AS new_rev,
             -sum(CASE WHEN rev1 IS NULL THEN rev0 ELSE 0 END) AS lost_rev
      FROM joined)
    SELECT round(rev_y0, 2) AS rev_y0,
           round(rev_y1, 2) AS rev_y1,
           round(rev_y1 - rev_y0, 2) AS delta,
           round(price_eff, 2) AS price_effect,
           round(volume_eff, 2) AS volume_effect,
           round(mix_eff, 2) AS mix_effect,
           round(new_rev, 2) AS new_parts_rev,
           round(lost_rev, 2) AS lost_parts_rev,
           CASE WHEN abs((rev_y1 - rev_y0)
                         - (price_eff + volume_eff + mix_eff
                            + new_rev + lost_rev)) < 0.01
                THEN 1 ELSE 0 END AS exact
    FROM eff
    """,
)
def q_pvm_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume/mix revenue bridge (W25): decompose the first
    year-over-year revenue change into price effect (Δp·q₀), volume
    effect (p₀·Δq), the price×volume cross ("mix") term, and
    new/discontinued-part revenue — the finance bridge behind every
    "why did revenue move" review (W23's waterfall decomposes WITHIN a
    period; this decomposes the change BETWEEN periods). The five
    effects sum to the delta ALGEBRAICALLY — rev₁−rev₀ =
    (p₁−p₀)q₀ + p₀(q₁−q₀) + (p₁−p₀)(q₁−q₀) per common part, rev₁ for
    new, −rev₀ for lost — and the ``exact`` column asserts the
    conservation inside the query (1e-2 tolerance over float
    association noise). Scale shape: one (year, part) cell aggregate,
    a part-keyed full outer join between two year slices, one
    effects rollup."""
    li = _t(spark, sf_dir, "lineitem")
    # lazy checkpoint: the (year, part) cell table feeds the base-year
    # scalar AND both year slices — as plain plan subtrees the fact
    # aggregate ran 3× per call (4 scans in the r11 scan-dupe sweep);
    # the shared RDD node computes once inside the same job.
    py = (
        li.groupBy(F.year("l_shipdate").alias("yr"), "l_partkey")
        .agg(
            F.sum("l_extendedprice").alias("rev"),
            F.sum("l_quantity").alias("q"),
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    y0 = py.agg(F.min("yr").alias("y"))
    a = py.join(F.broadcast(y0), py.yr == F.col("y")).select(
        "l_partkey",
        F.col("rev").alias("rev0"),
        F.col("q").alias("q0"),
        F.col("p").alias("p0"),
    )
    b = py.join(F.broadcast(y0), py.yr == F.col("y") + 1).select(
        "l_partkey",
        F.col("rev").alias("rev1"),
        F.col("q").alias("q1"),
        F.col("p").alias("p1"),
    )
    j = a.join(b, "l_partkey", "full_outer")
    both = F.col("rev0").isNotNull() & F.col("rev1").isNotNull()
    eff = j.agg(
        F.sum(F.coalesce("rev0", F.lit(0.0))).alias("rev_y0"),
        F.sum(F.coalesce("rev1", F.lit(0.0))).alias("rev_y1"),
        F.sum(
            F.when(both, (F.col("p1") - F.col("p0")) * F.col("q0")).otherwise(
                0.0
            )
        ).alias("price_eff"),
        F.sum(
            F.when(both, F.col("p0") * (F.col("q1") - F.col("q0"))).otherwise(
                0.0
            )
        ).alias("volume_eff"),
        F.sum(
            F.when(
                both,
                (F.col("p1") - F.col("p0")) * (F.col("q1") - F.col("q0")),
            ).otherwise(0.0)
        ).alias("mix_eff"),
        F.sum(
            F.when(F.col("rev0").isNull(), F.col("rev1")).otherwise(0.0)
        ).alias("new_rev"),
        (-F.sum(
            F.when(F.col("rev1").isNull(), F.col("rev0")).otherwise(0.0)
        )).alias("lost_rev"),
    )
    total = (
        F.col("price_eff")
        + F.col("volume_eff")
        + F.col("mix_eff")
        + F.col("new_rev")
        + F.col("lost_rev")
    )
    return eff.select(
        F.round("rev_y0", 2).alias("rev_y0"),
        F.round("rev_y1", 2).alias("rev_y1"),
        F.round(F.col("rev_y1") - F.col("rev_y0"), 2).alias("delta"),
        F.round("price_eff", 2).alias("price_effect"),
        F.round("volume_eff", 2).alias("volume_effect"),
        F.round("mix_eff", 2).alias("mix_effect"),
        F.round("new_rev", 2).alias("new_parts_rev"),
        F.round("lost_rev", 2).alias("lost_parts_rev"),
        F.when(
            F.abs((F.col("rev_y1") - F.col("rev_y0")) - total) < 0.01, 1
        )
        .otherwise(0)
        .alias("exact"),
    )


# --- W26: customer revenue-decile transition matrix ----------------------------


@query(
    "q_decile_transition",
    oracle="""
    WITH rev AS (
      SELECT year(o_orderdate) AS yr, o_custkey,
             round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY 1, 2),
    y1 AS (SELECT min(yr) AS y FROM rev),
    rk AS (
      SELECT yr, o_custkey,
             row_number() OVER (PARTITION BY yr ORDER BY rev, o_custkey)
               AS rn,
             count(*) OVER (PARTITION BY yr) AS n
      FROM rev, y1 WHERE yr IN (y, y + 1)),
    dec AS (
      SELECT yr, o_custkey,
             CAST(floor(10.0 * (rn - 1) / n) AS BIGINT) + 1 AS dec
      FROM rk),
    pairs AS (
      SELECT a.dec AS d_from, b.dec AS d_to
      FROM dec a JOIN dec b ON a.o_custkey = b.o_custkey, y1
      WHERE a.yr = y AND b.yr = y + 1)
    SELECT d_from, d_to, CAST(count(*) AS BIGINT) AS n_cust,
           round(count(*) / sum(count(*)) OVER (), 6) AS share
    FROM pairs GROUP BY d_from, d_to ORDER BY d_from, d_to
    """,
)
def q_decile_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue-decile migration matrix (W26, wave 33): where
    last year's decile-d customers land this year — the mobility view
    behind churn-risk and upsell targeting (a heavy diagonal means a
    sticky base; mass under the diagonal means decay). Determinism:
    revenue rounds to 2 decimals BEFORE ranking, rank is unique via the
    custkey tie-break, and deciles come from the closed form
    floor(10·(rank−1)/n)+1 — never engine-order ntile. Scale shape
    (r11 job paydown, VERDICT r10 weak item — was grouped tie classes
    + a (yr, rev)-keyed shuffle join of two customer-sized frames at
    22 jobs): the per-year rank is the direct bucketed two-phase row
    rank (the q_curriculum_buckets idiom) — customers hash-bucket by
    rev div 1000, per-(yr, bucket) counts roll into broadcast-sized
    offsets (with the per-year total riding the same tiny frame, so no
    separate size aggregate), and rn = offset + row_number inside the
    (yr, bucket) window ordered (rev, custkey): one aggregate, one
    broadcast join, one keyed window — no tie-class checkpoint, no
    customer×customer shuffle join. The transition join is
    custkey-keyed; the share denominator is a window over the ≤100-row
    matrix."""
    from .sources.loaders import daily_orders

    od = _t(spark, sf_dir, "orders")
    rev = od.groupBy(
        F.year("o_orderdate").alias("yr"), "o_custkey"
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    # first order year off the shared daily_orders checkpoint (min day
    # == min o_orderdate), not a second fact scan
    y1 = int(
        daily_orders(spark, sf_dir)
        .agg(F.year(F.min("d")).alias("y"))
        .collect()[0]
        .y
    )
    # (yr, custkey, rev, bkt) rollup checkpointed: the bucket-count
    # build AND the rank join both consume it — uncheckpointed, the
    # fact scan re-ran once per consumer (the frame is ≤2·|customers|
    # rows at any SF)
    two = (
        rev.filter(F.col("yr").isin(y1, y1 + 1))
        .withColumn("bkt", F.floor(F.col("rev") / 1000.0).cast("long"))
        .localCheckpoint(eager=True)
    )
    bc = two.groupBy("yr", "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("bn")
    )
    w_off = (
        Window.partitionBy("yr")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # offsets AND per-year totals off the same ~|yr×buckets|-row frame
    boff = bc.select(
        "yr",
        "bkt",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).cast("long").alias("off"),
        F.sum("bn").over(Window.partitionBy("yr")).cast("long").alias("n"),
    )
    w_in = Window.partitionBy("yr", "bkt").orderBy("rev", "o_custkey")
    ranked = (
        two.join(F.broadcast(boff), ["yr", "bkt"])
        .withColumn("rn", F.col("off") + F.row_number().over(w_in))
        .select(
            "yr",
            "o_custkey",
            (
                F.floor(10.0 * (F.col("rn") - 1) / F.col("n")).cast("long") + 1
            ).alias("dec"),
        )
        # both transition sides (d_from / d_to) read the decile table —
        # checkpoint so the rank machinery runs once
        .localCheckpoint(eager=True)
    )
    a = ranked.filter(F.col("yr") == y1).select(
        "o_custkey", F.col("dec").alias("d_from")
    )
    b = ranked.filter(F.col("yr") == y1 + 1).select(
        "o_custkey", F.col("dec").alias("d_to")
    )
    m = (
        a.join(b, "o_custkey")
        .groupBy("d_from", "d_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
    )
    return m.select(
        "d_from",
        "d_to",
        "n_cust",
        F.round(
            F.col("n_cust") / F.sum("n_cust").over(Window.partitionBy()), 6
        ).alias("share"),
    ).orderBy("d_from", "d_to")


# --- W27: discount-band margin profile -----------------------------------------


@query(
    "q_discount_margin",
    oracle="""
    WITH b AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
             count(*) AS n_lines,
             sum(l_extendedprice) AS g,
             sum(l_extendedprice * (1 - l_discount)) AS net
      FROM lineitem GROUP BY 1)
    SELECT disc_pct, CAST(n_lines AS BIGINT) AS n_lines,
           round(g, 2) AS gross, round(net, 2) AS net,
           round(net / g, 6) AS net_ratio,
           round(g / sum(g) OVER (), 6) AS gross_share
    FROM b ORDER BY disc_pct
    """,
)
def q_discount_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-band margin profile (W27, wave 33): gross vs net
    revenue and volume share per integer discount percent — the pricing
    dashboard behind "is the 10%-off band buying us anything". One
    pushdown-pruned fact aggregate with map-side partials; the share
    denominator is a window over the ~11-row band table, never a second
    fact scan."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_discount"
    )
    b = li.groupBy(
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("l_extendedprice").alias("g"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "net"
        ),
    )
    return b.select(
        "disc_pct",
        "n_lines",
        F.round("g", 2).alias("gross"),
        F.round("net", 2).alias("net"),
        F.round(F.col("net") / F.col("g"), 6).alias("net_ratio"),
        F.round(
            F.col("g") / F.sum("g").over(Window.partitionBy()), 6
        ).alias("gross_share"),
    ).orderBy("disc_pct")


# --- W28: per-nation top-supplier revenue share ---------------------------------


@query(
    "q_top_supplier_share",
    oracle="""
    WITH rev AS (
      SELECT n_name, s_name,
             sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1, 2),
    tot AS (SELECT n_name, sum(rev) AS tot FROM rev GROUP BY 1),
    rk AS (
      SELECT rev.n_name, s_name, rev, tot,
             row_number() OVER (
               PARTITION BY rev.n_name ORDER BY rev DESC, s_name) AS rn
      FROM rev JOIN tot ON rev.n_name = tot.n_name)
    SELECT n_name, s_name, CAST(rn AS BIGINT) AS rn,
           round(rev, 2) AS revenue, round(rev / tot, 6) AS share
    FROM rk WHERE rn <= 3 ORDER BY n_name, rn
    """,
)
def q_top_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-3 suppliers with their revenue share (W28, wave
    34): the concentration drill-down under W24's scorecard — who
    actually carries each nation's volume, and how dominant are they.
    Scale shape: one fact aggregate with both dims broadcast; the
    nation totals come from a second rollup of the (nation, supplier)
    table JOINED back (never a whole-nation window over fact rows);
    the rn <= 3 cut runs as WindowGroupLimit below the exchange
    (plan-pinned)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", "s_name")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev")
        )
        # lazy checkpoint (r12 scan-dupe paydown): the |nation×supplier|
        # rollup feeds the nation totals AND the ranked join-back — as
        # plain subtrees the fact scan+aggregate ran twice per call
        .localCheckpoint(eager=False)
    )
    tot = rev.groupBy("n_name").agg(F.sum("rev").alias("tot"))
    w = Window.partitionBy("n_name").orderBy(F.desc("rev"), F.asc("s_name"))
    return (
        rev.join(tot, "n_name")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "n_name",
            "s_name",
            F.col("rn").cast("long").alias("rn"),
            F.round("rev", 2).alias("revenue"),
            F.round(F.col("rev") / F.col("tot"), 6).alias("share"),
        )
        .orderBy("n_name", "rn")
    )


# --- W29: Lorenz curve deciles + Gini coefficient ----------------------------


@query(
    "q_lorenz_gini",
    oracle="""
    WITH cust AS (
      SELECT o_custkey, round(sum(o_totalprice), 4) AS rev
      FROM orders GROUP BY 1),
    b AS (SELECT *, CAST(floor(rev / 10000.0) AS BIGINT) AS bkt FROM cust),
    bc AS (SELECT bkt, CAST(count(*) AS BIGINT) AS bn FROM b GROUP BY 1),
    boff AS (
      SELECT bkt,
             CAST(coalesce(sum(bn) OVER (ORDER BY bkt
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS off
      FROM bc),
    ranked AS (
      SELECT b.rev,
             boff.off + row_number() OVER (
               PARTITION BY b.bkt ORDER BY b.rev, b.o_custkey) AS rnk
      FROM b JOIN boff USING (bkt)),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(rev) AS t,
             sum(rnk * rev) AS rs
      FROM ranked),
    dec AS (
      SELECT ((rnk - 1) * 10) // (SELECT n FROM tot) AS decile,
             CAST(count(*) AS BIGINT) AS n_customers,
             round(sum(rev), 4) AS decile_rev
      FROM ranked GROUP BY 1)
    SELECT decile, n_customers, decile_rev,
           round(decile_rev / (SELECT t FROM tot), 6) AS rev_share,
           round(sum(decile_rev) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / (SELECT t FROM tot), 6) AS cum_share,
           round(2.0 * (SELECT rs FROM tot)
                   / ((SELECT n FROM tot) * (SELECT t FROM tot))
                 - ((SELECT n FROM tot) + 1.0) / (SELECT n FROM tot),
                 6) AS gini
    FROM dec ORDER BY decile
    """,
)
def q_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve deciles + Gini (W29, wave 35): customer revenue
    concentration as the classic inequality curve — rank customers by
    spend ascending, cut into population deciles, report each decile's
    revenue share and the cumulative (Lorenz) share, plus the exact
    rank-formula Gini G = 2·Σrᵢxᵢ/(n·Σxᵢ) − (n+1)/n. W21's Pareto/ABC
    gives the top-heavy cut points; this gives the whole curve and the
    single-number summary an exec dashboard tracks quarter over
    quarter.

    The ascending global rank uses the two-phase floor-bucket idiom
    (q_decile_lift's exact-ntile): bucket offsets prefix-sum on a
    |buckets|-row side, within-bucket row_number windows carry the
    parallelism — no single-partition sort over customers. All counts
    int64; revenue rounds at the customer rollup before ranking so
    tie-breaks agree across engines."""
    cust = cust_revenue(spark, sf_dir).select("o_custkey", "rev")
    b = cust.withColumn("bkt", F.floor(F.col("rev") / 10000.0).cast("long"))
    bc = b.groupBy("bkt").agg(F.count(F.lit(1)).cast("long").alias("bn"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = bc.select(
        "bkt",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).cast("long").alias("off"),
    )
    w_in = Window.partitionBy("bkt").orderBy("rev", "o_custkey")
    ranked = (
        b.join(boff, "bkt")
        .select(
            "rev",
            (F.col("off") + F.row_number().over(w_in)).cast("long").alias("rnk"),
        )
        .localCheckpoint()
    )
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").alias("t"),
        F.sum(F.col("rnk") * F.col("rev")).alias("rs"),
    ).collect()[0]
    n, t, rs = tot["n"], tot["t"], tot["rs"]
    gini_raw = 2.0 * rs / (n * t) - (n + 1.0) / n
    dec = ranked.groupBy(
        (((F.col("rnk") - 1) * 10) / F.lit(n)).cast("long").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.sum("rev"), 4).alias("decile_rev"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return dec.select(
        "decile",
        "n_customers",
        "decile_rev",
        F.round(F.col("decile_rev") / F.lit(t), 6).alias("rev_share"),
        F.round(F.sum("decile_rev").over(w_cum) / F.lit(t), 6).alias("cum_share"),
        F.round(F.lit(gini_raw), 6).alias("gini"),
    ).orderBy("decile")


# --- W30: Theil inequality index with between/within decomposition -----------


@query(
    "q_theil_index",
    oracle="""
    WITH cust AS (
      SELECT o.o_custkey,
             round(sum(o.o_totalprice), 4) AS rev
      FROM orders o GROUP BY 1),
    lab AS (
      SELECT n.n_name AS nation, c2.rev
      FROM cust c2
      JOIN customer c ON c.c_custkey = c2.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS big_n, sum(rev) AS big_x
      FROM lab),
    mu AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n_customers,
             sum(rev) AS xg,
             sum(rev) / count(*) AS mu_g
      FROM lab GROUP BY nation),
    g AS (
      SELECT m.nation, m.n_customers, m.xg,
             sum((l.rev / m.mu_g) * ln(l.rev / m.mu_g)) AS tsum
      FROM lab l JOIN mu m USING (nation)
      GROUP BY m.nation, m.n_customers, m.xg),
    parts AS (
      SELECT g.nation, g.n_customers,
             g.xg / t.big_x AS share,
             g.tsum / g.n_customers AS theil_g,
             (g.xg / t.big_x)
               * ln((g.xg / t.big_x) / (g.n_customers
                                        / CAST(t.big_n AS DOUBLE)))
               AS between_g
      FROM g, tot t)
    SELECT nation, n_customers,
           round(share, 6) AS rev_share,
           round(theil_g, 6) AS theil_within_g,
           round(between_g, 6) AS between_contrib,
           round(sum(share * theil_g) OVER () + sum(between_g) OVER (), 6)
             AS theil_total
    FROM parts ORDER BY nation
    """,
)
def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index with exact between/within-nation
    decomposition (W30, wave 38): how unequal is customer revenue, and
    how much of the inequality lives BETWEEN nations vs WITHIN them —
    the decomposition Gini cannot do (W29's Lorenz/Gini reports the
    level; Theil attributes it). T_g = (1/n_g)·Σ (x/μ_g)·ln(x/μ_g),
    between_g = s_g·ln(s_g/p_g), T = Σ s_g·T_g + Σ between_g.

    100 TB shape: one orders aggregate to customer revenue, two
    broadcast dimension hops to the nation label, per-nation windows
    carry μ_g onto each row inside the nation-keyed exchange, and the
    output is 25 rows. Customer revenue rounds to 4 decimals (module
    convention) before any ratio; ln association identical on both
    sides."""
    cust = cust_revenue(spark, sf_dir).select("o_custkey", "rev")
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    n = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    # (r12 note: a lazy checkpoint of `lab` for its two consumers
    # measured wall-NEGATIVE in interleaved A/B at sf0.1 — the duplicate
    # side is two broadcast dimension hops over the already-checkpointed
    # cust_revenue substrate, cheaper than the checkpoint — reverted)
    lab = (
        cust.join(F.broadcast(c), cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("nation", "rev")
    )
    w_g = Window.partitionBy("nation")
    mu_g = F.sum("rev").over(w_g) / F.count(F.lit(1)).over(w_g)
    g = (
        lab.select(
            "nation",
            "rev",
            ((F.col("rev") / mu_g) * F.log(F.col("rev") / mu_g)).alias("t_i"),
        )
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("rev").alias("xg"),
            F.sum("t_i").alias("tsum"),
        )
    )
    tot = lab.agg(
        F.count(F.lit(1)).cast("long").alias("big_n"),
        F.sum("rev").alias("big_x"),
    )
    parts = g.crossJoin(F.broadcast(tot)).select(
        "nation",
        "n_customers",
        (F.col("xg") / F.col("big_x")).alias("share"),
        (F.col("tsum") / F.col("n_customers")).alias("theil_g"),
        (
            (F.col("xg") / F.col("big_x"))
            * F.log(
                (F.col("xg") / F.col("big_x"))
                / (F.col("n_customers") / F.col("big_n").cast("double"))
            )
        ).alias("between_g"),
    )
    w_all = Window.partitionBy()
    return parts.select(
        "nation",
        "n_customers",
        F.round("share", 6).alias("rev_share"),
        F.round("theil_g", 6).alias("theil_within_g"),
        F.round("between_g", 6).alias("between_contrib"),
        F.round(
            F.sum(F.col("share") * F.col("theil_g")).over(w_all)
            + F.sum("between_g").over(w_all),
            6,
        ).alias("theil_total"),
    ).orderBy("nation")


# --- W31: ABC-XYZ inventory classification -----------------------------------


@query(
    "q_abc_xyz",
    oracle="""
    WITH pr AS (
      SELECT l_partkey, round(sum(l_extendedprice), 4) AS rev
      FROM lineitem GROUP BY 1),
    abc AS (
      SELECT l_partkey, rev,
             sum(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / sum(rev) OVER () AS cum_share
      FROM pr),
    abc_c AS (
      SELECT l_partkey, rev,
             CASE WHEN cum_share <= 0.8 THEN 'A'
                  WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc
      FROM abc),
    wk AS (
      SELECT l_partkey,
             CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2),
    cv AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(qty) AS BIGINT) AS s1,
             CAST(sum(qty * qty) AS BIGINT) AS s2
      FROM wk GROUP BY 1),
    xyz_c AS (
      SELECT l_partkey,
             CASE WHEN m = 1 THEN 'Z'
                  WHEN sqrt(greatest(s2 / CAST(m AS DOUBLE)
                            - (s1 / CAST(m AS DOUBLE))
                              * (s1 / CAST(m AS DOUBLE)), 0.0))
                       / (s1 / CAST(m AS DOUBLE)) <= 0.5 THEN 'X'
                  WHEN sqrt(greatest(s2 / CAST(m AS DOUBLE)
                            - (s1 / CAST(m AS DOUBLE))
                              * (s1 / CAST(m AS DOUBLE)), 0.0))
                       / (s1 / CAST(m AS DOUBLE)) <= 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM cv),
    tot AS (SELECT sum(rev) AS total_rev FROM pr)
    SELECT a.abc, x.xyz,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(a.rev), 4) AS class_rev,
           round(sum(a.rev) / max(t.total_rev), 6) AS rev_share
    FROM abc_c a JOIN xyz_c x USING (l_partkey), tot t
    GROUP BY a.abc, x.xyz ORDER BY a.abc, x.xyz
    """,
)
def q_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory classification (W31, wave 38): every part
    classed by revenue contribution (A = first 80%% of cumulative
    revenue, B = to 95%%, C = tail — W21's Pareto cut applied at the
    part level) × demand regularity (weekly-demand coefficient of
    variation: X ≤ 0.5 steady, Y ≤ 1.0, Z erratic or single-week),
    reported as the 3×3 matrix of part counts and revenue share — the
    planning grid every supply-chain text builds stocking policy on.

    100 TB shape: two fact aggregates (part revenue; part×week
    quantity, int64-exact so the CV moments are deterministic), one
    revenue-ordered running-share window (single-partition but only
    |parts| rows after the rollup — the W21 trade, documented there),
    and a part-keyed join of two part-keyed rollups. Revenue rounds to
    4 decimals before ranking (module convention)."""
    # BOTH legs ride the shared session substrate (checkpointed
    # part×yr×week rows, r11 grain): the ABC window, the join and the
    # total re-aggregate that tiny frame instead of re-scanning the
    # fact; round(Σ partials, 4) equals round(Σ rows, 4) because gross
    # is an exact 2-dp quantity, and the weekly CV moments below re-sum
    # exact int64 qty partials (see part_revenue docstring)
    pr = part_revenue(spark, sf_dir).groupBy("l_partkey").agg(
        F.round(F.sum("gross"), 4).alias("rev")
    )
    w_cum = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    abc = pr.select(
        "l_partkey",
        "rev",
        (F.sum("rev").over(w_cum) / F.sum("rev").over(w_all)).alias(
            "cum_share"
        ),
    ).select(
        "l_partkey",
        "rev",
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    wk = (
        part_revenue(spark, sf_dir)
        .groupBy("l_partkey", "week")
        .agg(F.sum("qty").cast("long").alias("qty"))
    )
    cv = wk.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("qty").cast("long").alias("s1"),
        F.sum(F.col("qty") * F.col("qty")).cast("long").alias("s2"),
    )
    mean = F.col("s1") / F.col("m").cast("double")
    cv_val = F.sqrt(
        F.greatest(
            F.col("s2") / F.col("m").cast("double") - mean * mean, F.lit(0.0)
        )
    ) / mean
    xyz = cv.select(
        "l_partkey",
        F.when(F.col("m") == 1, "Z")
        .when(cv_val <= 0.5, "X")
        .when(cv_val <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    tot = pr.agg(F.sum("rev").alias("total_rev"))
    return (
        abc.join(xyz, "l_partkey")
        .crossJoin(F.broadcast(tot))
        .groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(F.sum("rev"), 4).alias("class_rev"),
            F.round(F.sum("rev") / F.max("total_rev"), 6).alias("rev_share"),
        )
        .orderBy("abc", "xyz")
    )


# --- W32: net / gross revenue retention by month --------------------------------


@query(
    "q_revenue_retention",
    oracle="""
    WITH cm AS (
      SELECT o_custkey AS cust,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2),
    j AS (
      SELECT CAST(p.m + INTERVAL 1 MONTH AS DATE) AS m,
             p.cents AS pc, c.cents AS cc
      FROM cm p
      LEFT JOIN cm c
        ON c.cust = p.cust AND c.m = CAST(p.m + INTERVAL 1 MONTH AS DATE))
    SELECT m,
           CAST(count(*) AS BIGINT) AS n_prev_cust,
           CAST(sum(CASE WHEN cc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained,
           CAST(sum(pc) AS BIGINT) AS base_cents,
           CAST(sum(coalesce(cc, 0)) AS BIGINT) AS retained_cents,
           CAST(sum(CASE WHEN cc IS NULL THEN 0
                         ELSE least(pc, cc) END) AS BIGINT) AS gross_cents,
           round(sum(coalesce(cc, 0)) / CAST(sum(pc) AS DOUBLE), 6) AS nrr,
           round(sum(CASE WHEN cc IS NULL THEN 0 ELSE least(pc, cc) END)
                 / CAST(sum(pc) AS DOUBLE), 6) AS grr
    FROM j GROUP BY m ORDER BY m
    """,
)
def q_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net / gross revenue retention by month (W32, wave 41): for each
    month m, take the cohort of customers who spent in m−1 (the base),
    and measure how much of that base's revenue recurs in m — NRR
    includes expansion (a retained customer spending MORE counts
    fully), GRR caps each customer at their prior-month spend (pure
    retention, expansion excluded) — the two SaaS-board metrics that
    W13's user-count cohort matrix and W20's LTV curve do not express,
    because both need the customer-level min() against the prior
    month. New customers in m are excluded by construction (they have
    no base).

    Exactness: revenue enters as integer CENTS (round-then-cast, the
    M30 rule) so the per-(customer, month) rollup, the least(), and
    every monthly sum are exact int64 on both engines (Σcents ≈ 3e16
    at the 1000× tier < 2^63, documented); NRR/GRR divide identical
    integers, rounded 6-dp.

    Shape: ONE fact rollup keyed on (customer, month), lazily
    checkpointed because the month-shift self-join reads it twice;
    the self-join is co-keyed on (customer, month) — a single
    exchange pair at any scale — and the final month-keyed rollup is
    |months|-row. No window, no sort except the |months|-row output
    ORDER BY."""
    o = load_table(spark, "orders", sf_dir)
    cm = (
        o.select(
            F.col("o_custkey").alias("cust"),
            F.trunc("o_orderdate", "month").alias("m"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("cust", "m")
        .agg(F.sum("c").cast("long").alias("cents"))
        .localCheckpoint(eager=False)
    )
    prev = cm.select(
        "cust", F.add_months("m", 1).alias("m"), F.col("cents").alias("pc")
    )
    cur = cm.select("cust", "m", F.col("cents").alias("cc"))
    j = prev.join(cur, ["cust", "m"], "left")
    gross = F.when(F.col("cc").isNull(), 0).otherwise(
        F.least("pc", "cc")
    )
    return (
        j.groupBy("m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_prev_cust"),
            F.sum(F.when(F.col("cc").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_retained"),
            F.sum("pc").cast("long").alias("base_cents"),
            F.sum(F.coalesce("cc", F.lit(0))).cast("long").alias(
                "retained_cents"
            ),
            F.sum(gross).cast("long").alias("gross_cents"),
            F.round(
                F.sum(F.coalesce("cc", F.lit(0)))
                / F.sum("pc").cast("double"),
                6,
            ).alias("nrr"),
            F.round(F.sum(gross) / F.sum("pc").cast("double"), 6).alias(
                "grr"
            ),
        )
        .orderBy("m")
    )


# --- W33: Syntetos-Boylan demand-intermittency classification ----------------


@query(
    "q_demand_intermittency",
    oracle="""
    WITH wk AS (
      SELECT l_partkey,
             CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2),
    st AS (
      SELECT l_partkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(qty) AS BIGINT) AS s1,
             CAST(sum(qty * qty) AS BIGINT) AS s2,
             CAST((max(week) - min(week)) / 7 + 1 AS BIGINT) AS span_w
      FROM wk GROUP BY 1),
    cls AS (
      SELECT l_partkey, n, s1, s2, span_w,
             CASE WHEN n = 1 THEN 'single'
                  WHEN 100 * span_w < 132 * n
                       AND 100 * (n * s2 - s1 * s1) < 49 * s1 * s1
                    THEN 'smooth'
                  WHEN 100 * span_w >= 132 * n
                       AND 100 * (n * s2 - s1 * s1) < 49 * s1 * s1
                    THEN 'intermittent'
                  WHEN 100 * span_w < 132 * n THEN 'erratic'
                  ELSE 'lumpy' END AS demand_class
      FROM st),
    tot AS (SELECT CAST(sum(s1) AS BIGINT) AS tq FROM st)
    SELECT demand_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(s1) AS BIGINT) AS sum_qty,
           round(sum(s1) / CAST(max(t.tq) AS DOUBLE), 6) AS qty_share,
           round(min(span_w / CAST(n AS DOUBLE)), 6) AS min_adi,
           round(max(span_w / CAST(n AS DOUBLE)), 6) AS max_adi,
           round(max((n * s2 - s1 * s1) / CAST(s1 * s1 AS DOUBLE)), 6)
             AS max_cv2
    FROM cls, tot t
    GROUP BY demand_class ORDER BY demand_class
    """,
)
def q_demand_intermittency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos-Boylan demand-intermittency classification (W33, wave
    43): every part classed by average demand interval (ADI =
    inclusive week span over demand weeks) × squared coefficient of
    variation of nonzero weekly demand (CV²), into the four
    forecasting quadrants — smooth (ADI < 1.32, CV² < 0.49: use
    exponential smoothing), intermittent (sparse but regular: use
    Croston), erratic (frequent but volatile: use SBA), lumpy (both:
    the unforecastable tail) — plus 'single' for one-demand-week
    parts, where CV² degenerates. The demand-pattern dual of W31's
    ABC-XYZ: XYZ cuts on CV alone; the SB quadrants are what decides
    WHICH forecasting model each part gets.

    Exactness: both threshold comparisons are EXACT INTEGER
    inequalities — ADI ≥ 1.32 ⇔ 100·span_w ≥ 132·n and CV² ≥ 0.49 ⇔
    100·(n·s2 − s1²) ≥ 49·s1² (CV² = var/mean² = (n·s2 − s1²)/s1²
    with population moments over exact int64 weekly sums) — so the
    class boundary can never float-flip across engines; the reported
    min/max ADI/CV² are order statistics of exact-integer ratios
    (single division each) and qty_share divides int64 sums. Int64
    bound: 49·s1² ≤ 5e17 at the 100× lineitem tier (s1 ≤ ~1e7 per
    part), margin ~18× to 2^63; the 1000× mega-tiers replicate
    orders/events only, so the bound is tier-complete as documented.

    Shape: the weekly rollup is the shared part_revenue (part, yr,
    week) checkpoint re-aggregated to (part, week) — zero fact scans
    in the per-query plan (the W31 substrate doing double duty); then
    one part-keyed moment aggregate, one broadcast total, one ≤5-row
    final group. Week spans re-derive from the checkpoint's week
    column, exact DATE arithmetic on Mondays (span divisible by 7)."""
    wk = (
        part_revenue(spark, sf_dir)
        .groupBy("l_partkey", "week")
        .agg(F.sum("qty").cast("long").alias("qty"))
    )
    st = wk.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qty").cast("long").alias("s1"),
        F.sum(F.col("qty") * F.col("qty")).cast("long").alias("s2"),
        (
            (F.datediff(F.max("week"), F.min("week")) / 7).cast("long") + 1
        ).alias("span_w"),
    )
    cv2_num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    cls = st.withColumn(
        "demand_class",
        F.when(F.col("n") == 1, "single")
        .when(
            (100 * F.col("span_w") < 132 * F.col("n"))
            & (100 * cv2_num < 49 * F.col("s1") * F.col("s1")),
            "smooth",
        )
        .when(
            (100 * F.col("span_w") >= 132 * F.col("n"))
            & (100 * cv2_num < 49 * F.col("s1") * F.col("s1")),
            "intermittent",
        )
        .when(100 * F.col("span_w") < 132 * F.col("n"), "erratic")
        .otherwise("lumpy"),
    )
    tot = st.agg(F.sum("s1").cast("long").alias("tq"))
    return (
        cls.crossJoin(F.broadcast(tot))
        .groupBy("demand_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("s1").cast("long").alias("sum_qty"),
            F.round(F.sum("s1") / F.max("tq").cast("double"), 6).alias(
                "qty_share"
            ),
            F.round(
                F.min(F.col("span_w") / F.col("n").cast("double")), 6
            ).alias("min_adi"),
            F.round(
                F.max(F.col("span_w") / F.col("n").cast("double")), 6
            ).alias("max_adi"),
            F.round(
                F.max(
                    cv2_num / (F.col("s1") * F.col("s1")).cast("double")
                ),
                6,
            ).alias("max_cv2"),
        )
        .orderBy("demand_class")
    )
