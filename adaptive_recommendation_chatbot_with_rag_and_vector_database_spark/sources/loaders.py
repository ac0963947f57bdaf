"""Parquet sources for the driver's fixture tables (SURVEY §2.1 S6).

One parquet file per table under ``{sf_dir}/{name}.parquet``. All loads
are plain ``spark.read.parquet`` so Catalyst gets the native vectorized
reader, predicate pushdown, and column pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Some fixture generations write events.ts as parquet
        # TIMESTAMP(NANOS), which Spark's reader rejects
        # (PARQUET_TYPE_ILLEGAL) unless nanosAsLong is set. The conf is
        # runtime-settable, so set it here rather than relying on the
        # session factory — load_table must work in ANY SparkSession
        # (the correctness harness builds its own vanilla session).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Pin UTC for BOTH timestamp layouts, not just the NTZ branch:
        # date-bucketing (to_date, date_trunc) over events must match
        # the UTC-naive DuckDB oracle even in a non-UTC vanilla
        # session, regardless of which layout the fixture carries.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # NANOS layout: ts surfaced as long (ns since epoch) via
            # nanosAsLong; truncate to µs exactly as DuckDB does so the
            # oracle sees identical values. Integer division — ns values
            # (~1.7e18) overflow double precision.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, TimestampNTZType):
            # MICROS layout (isAdjustedToUTC=false → TIMESTAMP_NTZ):
            # normalize to TimestampType — NTZ can't be cast to bigint
            # (epoch math) and isn't a valid watermark/event-time column.
            # The UTC session pin above makes the NTZ wall-clock map to
            # the same instants DuckDB sees (duckdb timestamps are
            # UTC-naive), in ANY session, not just the factory's.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: session-cached day-level orders rollup, keyed by (applicationId,
#: sf_dir): five temporal/measurement queries (q_kendall_tau,
#: q_runs_test, q_holt_forecast, q_evt_gumbel,
#: q_seasonality_strength) each consume the SAME orders->day
#: aggregate, so computing it once per session and localCheckpointing
#: the |days|-row result replaces four duplicate fact scans+exchanges
#: in any run that executes them together (VERDICT r8 #4). Per-day
#: values (count / 4-dp-rounded sum / 4-dp-rounded max) are exactly
#: what each consumer computed standalone, so sharing changes no
#: result and no oracle.
_DAILY_ORDERS_CACHE: dict = {}


def daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, n_orders, rev, mx) per order day — d = to_date(o_orderdate),
    n_orders = count, rev = round(sum(o_totalprice), 4),
    mx = round(max(o_totalprice), 4) — eagerly checkpointed once per
    (session, sf_dir). The module rounding convention (4 decimals at
    the day level BEFORE any downstream moment/comparison) is applied
    here so every consumer inherits cross-engine-stable inputs."""
    from pyspark.sql import functions as F

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _DAILY_ORDERS_CACHE.get(key)
    if hit is not None:
        return hit
    daily = (
        load_table(spark, "orders", sf_dir)
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("rev"),
            F.round(F.max("o_totalprice"), 4).alias("mx"),
        )
        .localCheckpoint()
    )
    _DAILY_ORDERS_CACHE[key] = daily
    return daily


#: session-cached part-level revenue rollup, keyed by (applicationId,
#: sf_dir): q_rbo_rank_overlap and q_abc_xyz each independently
#: re-aggregated lineitem to part revenue (VERDICT r9 weak-item lever).
#: Grain is (l_partkey, yr) with RAW gross/net sums so each consumer
#: applies its own period split and the module 4-dp rounding on top.
#: Re-aggregating year-partials is value-identical after round(.,4):
#: gross/net are exact 2-4-decimal quantities, so the true per-part sum
#: is an exact 4-dp decimal and the two-stage float error (~1e-9 rel)
#: never reaches the 5e-5 rounding boundary — oracles unchanged.
_PART_REVENUE_CACHE: dict = {}

#: session-cached customer lifetime-revenue rollup: q_lorenz_gini,
#: q_theil_index (rounded rev) and q_pareto_concentration (raw rev)
#: each re-scanned orders for the same per-customer sum. Both the
#: 4-dp-rounded and raw values are carried so every consumer reads
#: bit-identical inputs to its standalone form — no oracle changes.
_CUST_REVENUE_CACHE: dict = {}


def part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_partkey, yr, week, gross, net, qty) per part × ship-year ×
    ship-week — yr = year(l_shipdate), week = the Monday of
    date_trunc('week', l_shipdate), gross = sum(l_extendedprice), net =
    sum(l_extendedprice*(1-l_discount)), both RAW (consumers round at
    their own grain), qty = int64 sum(l_quantity) — eagerly
    checkpointed once per (session, sf_dir).

    The grain was refined yr → (yr, week) in r11 so q_abc_xyz's
    weekly-demand CV moments ride the same single fact scan (VERDICT
    r10 weak-item lever): a straddling New-Year week appears as two
    (yr, week) rows, so revenue consumers re-aggregating by part/yr and
    demand consumers re-aggregating by part/week are BOTH exact —
    int64 qty re-sums exactly, and re-aggregating gross/net partials is
    value-identical after round(.,4) because gross/net are exact
    2-4-decimal quantities (the true per-part sum is an exact 4-dp
    decimal; three-stage float error ~1e-9 rel never reaches the 5e-5
    rounding boundary). |part×week-present| rows: bounded by dimension
    × calendar, never the fact, so the checkpoint stays small at any
    scale factor."""
    from pyspark.sql import functions as F

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _PART_REVENUE_CACHE.get(key)
    if hit is not None:
        return hit
    pr = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy(
            "l_partkey",
            F.year("l_shipdate").alias("yr"),
            F.to_date(F.date_trunc("week", "l_shipdate")).alias("week"),
        )
        .agg(
            F.sum("l_extendedprice").alias("gross"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "net"
            ),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
        .localCheckpoint()
    )
    _PART_REVENUE_CACHE[key] = pr
    return pr


def cust_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, rev, rev_raw) per ordering customer — rev =
    round(sum(o_totalprice), 4) (the module convention q_lorenz_gini /
    q_theil_index rank on), rev_raw the unrounded sum
    (q_pareto_concentration buckets on it) — eagerly checkpointed once
    per (session, sf_dir). |customers| rows."""
    from pyspark.sql import functions as F

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _CUST_REVENUE_CACHE.get(key)
    if hit is not None:
        return hit
    cust = (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("rev"),
            F.sum("o_totalprice").alias("rev_raw"),
        )
        .localCheckpoint()
    )
    _CUST_REVENUE_CACHE[key] = cust
    return cust


#: session-cached per-document token/length counts: six registered
#: queries (q_curriculum_buckets, q_token_count, q_padding_efficiency,
#: q_span_corruption, q_pack_sequences, q_corpus_mixture,
#: q_token_fertility, q_text_stats) each re-tokenized the full corpus
#: to derive one or two scalar counts from the same scan (VERDICT r10
#: weak-item lever for q_curriculum_buckets). Counts are exact
#: integers, so sharing changes no value and no oracle. BOTH tokenizer
#: contracts are carried: ``n_tok`` (the engine-wide lowercase/``\s+``
#: contract of functions/tokenize.py) and ``nt_space`` (the raw
#: single-space split q_pack_sequences/q_corpus_mixture mirror with
#: DuckDB ``string_split(text, ' ')``).
_DOC_TOKENS_CACHE: dict = {}


def doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source, chars, n_tok, nt_space, bpe_tok) per
    document — chars = length(text), n_tok = |lower/\\s+ tokens|,
    nt_space = |split-on-' ' tokens|, bpe_tok = BPE-ish regex match
    count — eagerly checkpointed once per (session, sf_dir). All four
    counts are Spark ``int`` (the native F.size/regexp_count type), so
    every consumer reads the exact column type it computed standalone.
    |docs| rows × 7 scalars: the checkpoint is dimension-sized, never
    corpus-sized, at any scale factor."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _DOC_TOKENS_CACHE.get(key)
    if hit is not None:
        return hit
    dt = doc_tokens_frame(spark, sf_dir).localCheckpoint()
    _DOC_TOKENS_CACHE[key] = dt
    return dt


def doc_tokens_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-checkpointed :func:`doc_tokens` build plan — exposed
    separately so plan tests can assert the scan-side properties
    (single FileScan, codegen-only counting, pruned read schema) that
    the checkpoint otherwise hides behind ``Scan ExistingRDD``
    (ADVICE r10 #1's lesson applied at introduction time)."""
    from pyspark.sql import functions as F

    from ..functions.text import token_count_bpe, token_count_ws

    # scatter = min-parallelism guard (see _doc_sketch): the fixture
    # scan is ONE partition and the triple tokenize is the whole build
    # cost; on a well-partitioned cluster scan this is a no-op.
    return scatter(load_table(spark, "documents", sf_dir)).select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("chars"),
        token_count_ws("text").alias("n_tok"),
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias(
            "nt_space"
        ),
        token_count_bpe("text").alias("bpe_tok"),
    )


def clear_substrate_caches() -> int:
    """Drop every session-substrate cache entry (ADVICE r9: the
    module-level caches otherwise hold checkpointed DataFrames for the
    life of the process, including entries for stopped sessions).
    Returns the number of entries dropped. Unpersisting is left to
    session teardown — localCheckpoint blocks die with their
    SparkContext — so this only releases the Python references."""
    from .. import (
        queries_curation,
        queries_graphstats,
        queries_mlops,
        queries_retrieval,
        queries_scale,
        queries_stats,
        queries_text,
        queries_vector,
    )

    caches = (
        queries_retrieval._RM_HITS_CACHE,
        queries_stats._ORDER_VALUE_CLASSES_CACHE,
        queries_stats._ORDER_VALUE_PIVOT_CACHE,
        queries_text._DOC_SKETCH_CACHE,
        queries_text._DOC_BIGRAMS_CACHE,
        queries_graphstats._EDGES_CACHE,
        queries_graphstats._CN_EDGES_CACHE,
        queries_curation._BIPARTITE_CACHE,
        _DAILY_ORDERS_CACHE,
        _PART_REVENUE_CACHE,
        _CUST_REVENUE_CACHE,
        _DOC_TOKENS_CACHE,
        queries_scale._PRICE_CLASSES_G_CACHE,
        queries_scale._PRICE_CLASSES_CACHE,
        queries_scale._ALS_RECS,
        queries_mlops._SCORE_CLASSES_CACHE,
        queries_vector._CHUNK_INDEX_CACHE,
        queries_vector._GT_PANEL_CACHE,
        queries_vector._ANN_RESULT_CACHE,
    )
    n = sum(len(c) for c in caches)
    for c in caches:
        c.clear()
    return n


def warm_substrates(spark: SparkSession, sf_dir: str) -> dict:
    """Build every session substrate eagerly, returning {name: sec}.

    Called from bench warm-up so substrate construction is a visible
    line item instead of silently landing inside whichever consumer
    query happens to run first (VERDICT r9 #5/#6: q_ann_recall read
    12.2 s in the r9 pair purely because it built the shared ground-
    truth panel). Consumers hit the session caches afterwards, exactly
    as they do in any multi-query session."""
    import time

    from .. import (
        queries_curation,
        queries_graphstats,
        queries_retrieval,
        queries_scale,
        queries_stats,
        queries_text,
        queries_vector,
    )
    from ..queries_mlops import _score_classes as _mlops_classes

    timings = {}
    for name, build in (
        ("daily_orders", lambda: daily_orders(spark, sf_dir)),
        ("part_revenue", lambda: part_revenue(spark, sf_dir)),
        ("cust_revenue", lambda: cust_revenue(spark, sf_dir)),
        ("doc_tokens", lambda: doc_tokens(spark, sf_dir)),
        (
            "price_classes",
            lambda: (
                queries_scale.price_classes_grouped(spark, sf_dir),
                queries_scale.price_classes(spark, sf_dir),
            ),
        ),
        ("score_classes", lambda: _mlops_classes(spark, sf_dir)),
        ("chunk_index", lambda: queries_vector._chunk_index(spark, sf_dir)),
        ("ann_exact_panel", lambda: queries_vector._exact_panel(spark, sf_dir)),
        ("ann_lsh_result", lambda: queries_vector._ann_result(spark, sf_dir, "lsh")),
        (
            "ann_ivf12_result",
            lambda: queries_vector._ann_result(spark, sf_dir, "ivf12"),
        ),
        (
            "ann_auto_result",
            lambda: queries_vector._ann_result(spark, sf_dir, "auto"),
        ),
        ("als_recs", lambda: queries_scale._als_recs(spark, sf_dir)),
        ("doc_sketch", lambda: queries_text._doc_sketch(spark, sf_dir)),
        ("doc_bigrams", lambda: queries_text._doc_bigrams(spark, sf_dir)),
        (
            "copurchase_edges",
            lambda: queries_graphstats._undirected_edges(spark, sf_dir),
        ),
        (
            "bipartite_edges",
            lambda: queries_curation._bipartite_edges(spark, sf_dir),
        ),
        (
            "order_value_classes",
            lambda: queries_stats._order_value_classes(spark, sf_dir),
        ),
        (
            "order_value_pivot",
            lambda: queries_stats._order_value_pivot(spark, sf_dir),
        ),
        (
            "cn_edges",
            lambda: queries_graphstats._cn_edges(spark, sf_dir),
        ),
        (
            "rm_hits",
            lambda: queries_retrieval._rm_hits(spark, sf_dir),
        ),
    ):
        t0 = time.perf_counter()
        build()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def release_local_checkpoint(df: DataFrame) -> bool:
    """Unpersist the RDD blocks behind a ``localCheckpoint``-ed frame
    (ADVICE r11 #3: ``DataFrame.unpersist()`` only clears CacheManager
    entries and is a silent no-op for checkpoint blocks, which
    otherwise live until the SparkContext dies). ONLY safe once no
    live plan still reads the frame — a localCheckpoint has no lineage
    to recompute from. Returns False if the frame is not
    LogicalRDD-backed (nothing to release)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        return True
    except Exception:
        return False


def scatter(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Guarantee minimum parallelism for a per-row expensive downstream
    stage (Python UDFs, sketch expressions): repartition ONLY when the
    input arrives under-partitioned (e.g. a small single-file scan = ONE
    partition, so every UDF row would run on one core).

    On well-partitioned input — any real cluster scan, where splits ≥
    cores — this is a no-op returning ``df`` unchanged: no exchange
    enters the plan, so at 100 TB scatter costs nothing (asserted in
    tests/test_plans.py). The earlier unconditional form also served as
    a CollapseProject barrier; measured on Spark 4.x the optimizer no
    longer duplicates non-cheap aliased expressions into their
    references, so the barrier role is obsolete and the exchange was
    pure overhead."""
    spark = df.sparkSession
    target = partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key`` — the
    co-located-join layout: two tables bucketed the same way join
    bucket-to-bucket with NO exchange on either side (asserted in
    tests/test_scale_ops.py). At 100 TB this converts every recurring
    join/agg on the key from a full shuffle into a local merge —
    bucketing is amortized once at write time."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def roundtrip(
    df: DataFrame,
    path: str,
    fmt: str,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Write ``df`` in ``fmt`` (csv/json/orc/parquet/xml) and read it
    back with the SAME explicit schema — never inferSchema, which costs
    a full extra pass and can silently widen types. Text formats get a
    pinned timestampFormat so the value roundtrip is exact."""
    opts = {"timestampFormat": timestamp_format}
    if fmt == "csv":
        opts["header"] = "true"
    elif fmt == "xml":
        # Spark 4 built-in XML source; rowTag is mandatory on both sides
        opts["rowTag"] = "row"
    df.write.options(**opts).mode("overwrite").format(fmt).save(path)
    return (
        df.sparkSession.read.options(**opts).schema(df.schema).format(fmt).load(path)
    )
