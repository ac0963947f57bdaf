"""Relational operator coverage (SURVEY §2.2-2.8): projections, filters,
joins, aggregations, windows, set ops, scalar functions — each as a
DataFrame-API query with a DuckDB oracle twin.

Determinism: float aggregates rounded on both sides; window orderings
carry an id tie-break; result sets are small aggregates or id-keyed rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query
from .sources.loaders import load_table
from .operators.retrieval import REFUSAL_MESSAGE, REFUSAL_PREFIX


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# --- scans & projections (S6, P3) -----------------------------------------


@query(
    "q_scan_documents",
    oracle="""
    SELECT doc_id, lang, source, n_chars, length(text) AS text_len
    FROM documents
    """,
)
def q_scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + projection over the corpus (SURVEY S2/S6; the
    engine-side view of /root/reference/AI.py:61-71's text extraction —
    fixtures carry pre-extracted text, see SURVEY §2.1)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.length("text").alias("text_len"),
    )


# --- filters & reference post-processing (P1, P2, P4) ----------------------


@query(
    "q_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_discount > 0.05
      AND l_returnflag = 'R'
    """,
)
def q_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive filters + column pruning, both pushed to the parquet
    scan by Catalyst (verified in tests via explain; SURVEY P4)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_discount") > 0.05)
        & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")


_REFUSAL_SQL = REFUSAL_PREFIX.replace("'", "''")
_REFUSAL_MSG_SQL = REFUSAL_MESSAGE.replace("'", "''")


@query(
    "q_relevance_filter",
    oracle=f"""
    WITH answers AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN '{_REFUSAL_SQL} about ' || lang
                  ELSE text END AS answer
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN substr(answer, 1, {len(REFUSAL_PREFIX)}) = '{_REFUSAL_SQL}'
                THEN '{_REFUSAL_MSG_SQL}'
                ELSE split_part(answer, chr(10), 1) END AS answer
    FROM answers
    """,
)
def q_relevance_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's answer post-processing (P1+P2,
    /root/reference/AI.py:176-185): refusal-prefix predicate → canned
    message, otherwise first-line cut. Synthetic answers exercise both
    branches (doc_id % 7 rows get a refusal-shaped answer)."""
    docs = _t(spark, sf_dir, "documents")
    answers = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(REFUSAL_PREFIX + " about "), F.col("lang")),
        )
        .otherwise(F.col("text"))
        .alias("answer"),
    )
    cleaned = F.when(
        F.col("answer").startswith(REFUSAL_PREFIX), F.lit(REFUSAL_MESSAGE)
    ).otherwise(F.split_part(F.col("answer"), F.lit("\n"), F.lit(1)))
    return answers.select("doc_id", cleaned.alias("answer"))


@query(
    "q_first_line",
    oracle="""
    SELECT doc_id, split_part(text, chr(10), 1) AS first_line
    FROM documents
    """,
)
def q_first_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-line projection (P2, /root/reference/AI.py:185)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.split_part(F.col("text"), F.lit("\n"), F.lit(1)).alias("first_line"),
    )


# --- aggregations (A3, A4, A5) ---------------------------------------------


@query(
    "q_agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                            AS sum_qty,
           round(sum(l_extendedprice), 4)                       AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)    AS sum_disc_price,
           round(avg(l_quantity), 6)                            AS avg_qty,
           round(avg(l_discount), 6)                            AS avg_disc,
           count(*)                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped hash aggregate (A3): partial map-side combine +
    final agg chosen by Catalyst automatically."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders,
           round(sum(o_totalprice), 4) AS revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (A4)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           count(*)                  AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup / grouping sets (A5): per-group, per-flag, and grand-total
    rows with NULL fill — identical null semantics in DuckDB."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q_session_history",
    oracle="""
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS journey,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def q_session_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session ordered message-list rebuild (A6) — the batch view of
    the reference's SimpleChatMessageHistory (/root/reference/AI.py:19-30,
    155-161): collect_list over (ts, id)-ordered structs, no UDAF."""
    ev = _t(spark, sf_dir, "events")
    pair = F.struct(
        F.col("ts").alias("ts"), F.col("event_id").alias("event_id"),
        F.col("event_type").alias("event_type"),
    )
    return ev.groupBy("user_id").agg(
        F.concat_ws(
            ">", F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["event_type"])
        ).alias("journey"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- joins (J3-J7) ----------------------------------------------------------


@query(
    "q_join_inner",
    oracle="""
    SELECT c_mktsegment,
           round(sum(o_totalprice), 4) AS revenue,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join (J3); Catalyst picks broadcast for the small side."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "q_join_outer",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (J3) preserving order-less customers, then an
    order-count histogram."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "q_join_broadcast",
    oracle="""
    SELECT r_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicit broadcast of every dimension (J4): the
    fact table is never shuffled — the shape that matters at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "q_join_semi_anti",
    oracle="""
    SELECT 'with_orders' AS bucket, count(*) AS n
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'without_orders' AS bucket, count(*) AS n
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi / left-anti joins (J5) — the generalized form of the
    reference's index-existence check (S5, /root/reference/AI.py:48)."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_orders").alias("bucket"), "n")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("without_orders").alias("bucket"), "n")
    )
    return semi.unionByName(anti)


@query(
    "q_join_range",
    oracle="""
    SELECT a.event_type,
           count(*) AS n_pairs,
           round(sum(b.value), 4) AS follow_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    GROUP BY a.event_type
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join (J6): pairs of events by the same user within a
    5-minute follow window. The equality key keeps it a hash join with a
    range residual — the scale-sane band-join shape (no nested loop)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(F.col("b.value")), 4).alias("follow_value"),
        )
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT event_id, user_id, o_orderkey AS last_orderkey
    FROM (
      SELECT e.event_id, e.user_id, o.o_orderkey,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J7): for each event, the latest prior order of the
    same customer — the UNION + keyed-window form, the scalable as-of:
    tag both streams into one (user, time, kind) relation and take the
    last non-null order key over an unbounded-preceding frame. Work is
    O((|events| + |orders|) log) per key, independent of history DEPTH
    — the pair-join + max_by alternative enumerates every (event, prior
    order) candidate, which grows with |events| × orders-per-customer
    and measured 12.7 s vs 1.1 s at the 10× fact tier (100 orders per
    customer); at 100 TB history depth is unbounded, so the pair term
    is the scale killer and this form is the one that survives.

    Ordering encodes the exact max_by/window tie-break: at equal
    timestamp an order sorts BEFORE the event that may claim it
    (``o_orderdate <= ts`` is inclusive) via kind 0 < 1, and among
    same-date orders the largest o_orderkey sorts last, so ``last()``
    picks it. Events with no prior order surface NULL and are dropped
    — inner-join semantics, same as the oracle's window-over-join."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("okey"),
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("okey"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", "okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = ev.unionByName(o).withColumn(
        "last_orderkey", F.last("okey", ignorenulls=True).over(w)
    )
    return (
        tagged.filter(
            (F.col("kind") == 1) & F.col("last_orderkey").isNotNull()
        )
        .select("event_id", "user_id", "last_orderkey")
    )


# --- windows (W1-W3) --------------------------------------------------------


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via window rank (W1/O3)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
    FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic (W2) — the "previous message in session" pattern
    (/root/reference/AI.py:168→182)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", "value", F.lag("value").over(w).alias("prev_value")
    )


@query(
    "q_window_frame",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS running_value
    FROM events
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec running aggregate (W3)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
    )


# --- set operations (U1-U3) -------------------------------------------------


@query(
    "q_set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union + distinct (U1)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "q_set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect (U2)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """except (U3)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (set) semantics, unlike bag exceptAll


# --- scalar function families (F3/F4/F9/F10/F12) ---------------------------


@query(
    "q_scalar_math_string",
    oracle="""
    SELECT p_brand,
           count(*) AS n_parts,
           round(avg(p_retailprice), 6)        AS avg_price,
           round(sum(ln(p_retailprice + 1)), 6) AS sum_log_price,
           max(length(p_name))                 AS max_name_len,
           min(upper(substr(p_type, 1, 5)))    AS min_type_prefix
    FROM part
    GROUP BY p_brand
    """,
)
def q_scalar_math_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + string scalar families (F3/F4/F10) under one aggregate."""
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        F.round(F.sum(F.log(F.col("p_retailprice") + 1)), 6).alias("sum_log_price"),
        F.max(F.length("p_name")).alias("max_name_len"),
        F.min(F.upper(F.substring("p_type", 1, 5))).alias("min_type_prefix"),
    )


@query(
    "q_json_dates",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
           count(*) AS n
    FROM events
    GROUP BY date_trunc('day', ts)
    """,
)
def q_json_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (F12) + date truncation (F9) over the events
    stream table."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("day")
        .agg(F.round(F.avg("k"), 6).alias("avg_k"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_corpus_slice",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           round(avg(n_chars), 6) AS avg_chars
    FROM documents
    WHERE lang IN ('en', 'fr', 'de')
    GROUP BY lang, source
    """,
)
def q_corpus_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language/source corpus slicing (X4)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(F.col("lang").isin("en", "fr", "de"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


# --- source/sink format coverage (S-surface) -------------------------------


@query(
    "q_source_formats",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_csv,  round(sum(o_totalprice), 2) AS sum_csv,
           count(*) AS n_json, round(sum(o_totalprice), 2) AS sum_json,
           count(*) AS n_orc,  round(sum(o_totalprice), 2) AS sum_orc,
           count(*) AS n_xml,  round(sum(o_totalprice), 2) AS sum_xml
    FROM orders
    WHERE o_orderkey % 8 = 0
    GROUP BY o_orderstatus
    """,
)
def q_source_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink format coverage: the orders table round-trips
    through CSV, JSON-lines, ORC, and XML (Spark 4 built-in) sinks, is
    read back with explicit schemas, and each copy must aggregate
    identically to the parquet original (the oracle reads parquet only
    — any serialization drift in any format fails the hash). Text
    formats carry a pinned timestampFormat; reads never inferSchema.
    The roundtrip carries a deterministic 1/8 keyed slice of orders:
    format fidelity is per-row, so a larger sample buys no extra
    checking power, only serialization wall-time (this query is a
    driver-budget eater otherwise — 4 ser/de roundtrips).

    Each run stages into its own directory (mkdtemp): the write→read
    roundtrip is not atomic, so a shared fixed path would let two
    concurrent runs (driver + bench) interleave an overwrite with a
    read — the q_schema_evolution /tmp-collision class. The staging
    dir is deleted before returning: the tiny grouped result is
    eagerly localCheckpoint-ed (lineage cut, files no longer needed),
    so repeated bench/pytest runs don't accumulate 4 orders-slice
    copies per run in /tmp."""
    import shutil
    import tempfile

    from .sources.loaders import roundtrip

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 8 == 0)
    base = tempfile.mkdtemp(prefix="spark_graft_io_")
    try:
        # the four sink writes are independent jobs over disjoint
        # directories — run them from a thread pool so each format's
        # ser/de overlaps the others' (guide §2.6; the loop form paid
        # four sequential write walls, 3.7 s solo-warm at sf0.1). The
        # read-back aggregates stay ONE lazy joined plan, forced once
        # by the eager checkpoint below.
        from concurrent.futures import ThreadPoolExecutor

        fmts = ("csv", "json", "orc", "xml")
        with ThreadPoolExecutor(max_workers=len(fmts)) as pool:
            backs = list(
                pool.map(
                    lambda fmt: (
                        fmt,
                        roundtrip(orders, f"{base}/orders_{fmt}", fmt),
                    ),
                    fmts,
                )
            )
        out = None
        for fmt, back in backs:
            agg = back.groupBy("o_orderstatus").agg(
                F.count(F.lit(1)).alias(f"n_{fmt}"),
                F.round(F.sum("o_totalprice"), 2).alias(f"sum_{fmt}"),
            )
            out = agg if out is None else out.join(agg, "o_orderstatus")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@query(
    "q_schema_evolution",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey % 16 = 8 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_with_priority,
           count(DISTINCT CASE WHEN o_orderkey % 16 = 8
                               THEN o_orderpriority END)
             AS n_priorities,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    WHERE o_orderkey % 8 = 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (S10): half the slice is written WITHOUT
    the ``o_orderpriority`` column (the 'old' files), half WITH it
    (the 'new' files, appended to the same directory), and a single
    ``mergeSchema`` parquet read must union the schemas — old rows
    surface NULL priority, new rows keep theirs. This is the lakehouse
    contract every long-lived 100 TB table depends on: producers add
    columns without rewriting history, consumers read one logical
    schema. The oracle re-derives the expected merge from the orders
    view (CASE on the same keyed split), so any silent column drop,
    misalignment, or NULL-fill error fails the hash. mergeSchema costs
    a footer read per file — at scale you pin the merged schema in a
    catalog instead; the read path is otherwise identical."""
    import tempfile

    slice_ = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderkey") % 8 == 0
    )
    old = slice_.filter(F.col("o_orderkey") % 16 == 0).drop("o_orderpriority")
    new = slice_.filter(F.col("o_orderkey") % 16 == 8)
    # Per-run unique staging dir: the overwrite-then-append pair is NOT
    # atomic, so a fixed shared path lets two concurrent runs (driver +
    # bench, parallel pytest) interleave the halves — doubled 'new'
    # rows or a mid-write read, failing the hash with a misleading
    # symptom. mkdtemp gives each run its own directory.
    import shutil

    stage = tempfile.mkdtemp(prefix="spark_graft_orders_evo_")
    base = stage + "/data"
    try:
        old.write.mode("overwrite").parquet(base)
        new.write.mode("append").parquet(base)
        merged = spark.read.option("mergeSchema", "true").parquet(base)
        return (
            merged.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("o_orderpriority").isNotNull().cast("long")).alias(
                    "n_with_priority"
                ),
                F.count_distinct("o_orderpriority").alias("n_priorities"),
                F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            )
            .orderBy("o_orderstatus")
            # tiny grouped result, eagerly materialized so the staging
            # dir can be deleted before returning (no /tmp accumulation
            # across repeated bench/pytest runs)
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
