"""Streaming-surface queries (SURVEY §2.9 T1-T4), batch-first.

Per the batch-first rule (SURVEY §2.9), every operator here is the
batch twin runnable on ``events.parquet`` so the DuckDB oracle can
check it; the true streaming execution (``readStream`` →
``applyInPandasWithState`` / windowed agg → ``writeStream``) of the
SAME builders is verified in tests/test_streaming.py via
batch/stream result equality.

Watermark divergence (T4), documented per SURVEY: the reference's
session store accepts arbitrarily late appends
(/root/reference/AI.py:24 — plain list append); our streaming engine
DROPS events later than the watermark. ``q_stream_watermark`` defines
that semantic exactly (arrival order = ``event_id``; watermark =
running max event time − 10 min) so it is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query
from .sources.loaders import load_table

SESSION_GAP = "30 minutes"
WATERMARK_DELAY = "10 minutes"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "events", sf_dir)


# --- T1: keyed session state ------------------------------------------------


@query(
    "q_stateful_session",
    oracle="""
    WITH lc AS (
      SELECT user_id, max(event_id) AS clear_id
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT e.user_id,
           count(*) AS total_events,
           CAST(sum(CASE WHEN e.event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clears,
           CAST(sum(CASE WHEN lc.clear_id IS NULL OR e.event_id > lc.clear_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_since_clear,
           max(e.ts) AS last_ts
    FROM events e LEFT JOIN lc ON e.user_id = lc.user_id
    GROUP BY e.user_id
    """,
)
def q_stateful_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed session state (T1): get-or-create / append / clear-tombstone
    replay of the reference's session store (/root/reference/AI.py:155-161,
    23-30), as the BATCH view: pure relational aggregation (map-side
    partial agg + one broadcast-able "last clear" join) — the shape that
    scans a 100 TB event log without a Python stage. The imperative
    state machine itself lives in streaming/session_state.py: its
    ``applyInPandasWithState`` streaming path and grouped-map batch twin
    (``replay_sessions_batch``, SURVEY §2.10 D3) are equality-tested
    against each other AND against this relational form in
    tests/test_streaming.py — three independent implementations of one
    semantic."""
    ev = _events(spark, sf_dir).select("user_id", "event_id", "event_type", "ts")
    lc = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.max("event_id").alias("clear_id"))
    )
    return (
        ev.join(lc, "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.sum(
                F.when(F.col("event_type") == "signup", 1).otherwise(0)
            ).alias("n_clears"),
            F.sum(
                F.when(
                    F.col("clear_id").isNull()
                    | (F.col("event_id") > F.col("clear_id")),
                    1,
                ).otherwise(0)
            ).alias("n_since_clear"),
            F.max("ts").alias("last_ts"),
        )
    )


# --- T2: tumbling event-time windows ---------------------------------------


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (T2) via ``F.window`` — the
    exact operator the streaming plan uses (epoch-aligned, so identical
    to date_trunc in the oracle)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


# --- T3: session windows ----------------------------------------------------


@query(
    "q_stream_session_window",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '{SESSION_GAP}'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30-min inactivity gap (T3) via
    ``F.session_window`` — a new session starts when the gap to the
    previous event is >= the gap (Spark merges windows overlapping in
    [ts, ts+gap)); the oracle restates that as gaps-and-islands."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# --- T4: watermark / late-data drop ----------------------------------------


@query(
    "q_stream_watermark",
    oracle=f"""
    WITH r AS (
      SELECT ts,
             max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM events
    )
    SELECT date_trunc('hour', ts) AS window_start,
           count(*) AS n_total,
           CAST(sum(CASE WHEN prev_max IS NULL
                           OR ts >= prev_max - INTERVAL '{WATERMARK_DELAY}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM r
    GROUP BY 1
    """,
)
def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics (T4), made exact for the oracle:
    per-key arrival order = event_id within user_id, watermark =
    running max(ts) − 10 min over that key's arrivals, a row is
    dropped iff it arrives older than its key's watermark. Keying the
    arrival order on user_id keeps the semantic pinned while making
    the window ``partitionBy(user_id)`` — a parallel per-key sort, no
    single-partition global sort, so the pinned plan is the one a
    1000-executor cluster would run. The production path is
    ``withWatermark`` where Spark tracks the max per-partition and
    merges."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("ts").over(w)
    kept = (
        prev_max.isNull()
        | (F.col("ts") >= prev_max - F.expr(f"INTERVAL {WATERMARK_DELAY}"))
    ).cast("long")
    return (
        ev.select("user_id", "ts", kept.alias("kept"))
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_total"), F.sum("kept").alias("n_kept"))
    )


# --- T6: stream-static enrichment join -------------------------------------


def enrich_events(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment: attach the customer dimension to an
    event stream (batch or streaming DataFrame — same code, the
    unified-API guarantee) and aggregate per (segment, event_type).
    The static side is broadcast; on a stream, Spark re-plans the
    broadcast per micro-batch, so dimension updates are picked up
    without restarting the query. No watermark needed: stream-static
    joins are stateless."""
    dim = F.broadcast(
        customers.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return (
        events.join(dim, "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@query(
    "q_stream_enrich",
    oracle="""
    SELECT c_mktsegment, event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    JOIN customer ON c_custkey = user_id
    GROUP BY c_mktsegment, event_type
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-static enrichment join (T6); the
    streaming execution is asserted equal in tests/test_streaming.py."""
    return enrich_events(
        _events(spark, sf_dir), load_table(spark, "customer", sf_dir)
    )


# --- T10: stream-stream interval join --------------------------------------

ATTRIBUTION_WINDOW = "30 minutes"


def attribution_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every
    view by the same user in the preceding 30 minutes (the classic
    ad-attribution shape). Batch or streaming DataFrames — same code,
    the unified-API guarantee. On streams, both sides carry watermarks
    (set by the caller) and the time-bound join condition lets Spark
    evict buffered state once the watermark passes ``v.ts + 30 min`` —
    bounded state, the thing an unconstrained stream-stream join
    lacks. The join itself is user_id-keyed, so at 100 TB/day both
    streams shuffle once on user_id and each partition buffers only
    its own keys' 30-minute horizon."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return v.join(
        p,
        [
            v.user_id == p.user_id,
            F.col("purchase_ts") >= F.col("view_ts"),
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}"),
        ],
    ).select(
        "view_id",
        "purchase_id",
        v.user_id.alias("user_id"),
        F.round(
            (
                F.unix_micros("purchase_ts") - F.unix_micros("view_ts")
            ) / 60_000_000.0,
            2,
        ).alias("lag_minutes"),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id,
           p.event_id AS purchase_id,
           v.user_id,
           round(epoch_us(p.ts - v.ts) / 60000000.0, 2) AS lag_minutes,
           round(p.value, 4) AS purchase_value
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL '30 minutes'
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (T10); the true
    two-stream watermarked execution of the SAME builder is asserted
    equal in tests/test_streaming.py."""
    ev = _events(spark, sf_dir)
    return attribution_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )


# --- T11: sliding (hopping) event-time windows ------------------------------


@query(
    "q_stream_sliding",
    oracle="""
    WITH two AS (
      SELECT event_type, value,
             time_bucket(INTERVAL 5 MINUTE, ts) AS w_start
      FROM events
      UNION ALL
      SELECT event_type, value,
             time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE
      FROM events
    )
    SELECT w_start, event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM two GROUP BY w_start, event_type
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time windows (T11): 10-minute windows
    every 5 minutes via ``F.window(ts, '10 minutes', '5 minutes')`` —
    the moving-aggregate form between T2's tumbling and T7's trailing
    range frame. Spark assigns each event to its ⌈len/slide⌉ = 2
    overlapping epoch-aligned windows at SCAN time (a 2-row Expand,
    map-side), then one keyed aggregation — no self-join, no window
    sort, and the streaming execution of the identical expression
    keeps one running partial per open window under the watermark. The
    oracle re-derives the two window starts per event with
    ``time_bucket`` (epoch-aligned for 5-minute buckets) and a 2-way
    union — same assignment, same counts, value-hash equal."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --- T12: streaming keyed-upsert materialization (foreachBatch MERGE) --------


@query(
    "q_stream_upsert_merge",
    oracle="""
    SELECT user_id, last_ts, last_event_id, last_event_type, last_value
    FROM (
      SELECT user_id, ts AS last_ts, event_id AS last_event_id,
             event_type AS last_event_type, value AS last_value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_stream_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keyed-upsert materialization (T12): a REAL Structured
    Streaming run — the event table is staged as 2 files, consumed with
    ``maxFilesPerTrigger=1`` (so the fold genuinely runs ≥2
    micro-batches — one cross-batch boundary — asserted; r11 trimmed 4
    staged files to 2 —
    the fold's batching-invariance makes the final state provably
    identical, and two MERGE rounds already exercise the cross-batch
    path, so the extra two rounds bought only micro-batch sequencing
    wall), and each batch MERGEs
    latest-per-key into a versioned parquet state via ``foreachBatch``
    (streaming/upsert_merge.py — the replace-per-key sibling of
    ``index_stream``'s append-only maintenance). Unlike the module's
    batch-twin queries, the oracle here checks the final state of the
    actual multi-batch streaming execution: because "latest" is an
    associative+commutative struct-max fold with a total order
    (ts, event_id), the materialized table is provably independent of
    how the stream was micro-batched — the batch-global argmax the
    oracle computes. Any violation of that invariance (a lost update, a
    non-atomic state flip, replay duplication) hash-mismatches."""
    import shutil
    import tempfile

    from .streaming.upsert_merge import (
        current_state_path,
        upsert_merge_stream,
    )

    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    work = tempfile.mkdtemp(prefix="spark_graft_upsert_merge_")
    try:
        staged = f"{work}/staged"
        ev.repartition(2).write.parquet(staged)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        batches: list = []
        q = upsert_merge_stream(
            stream,
            state_root=f"{work}/state",
            checkpoint_path=f"{work}/ckpt",
            key="user_id",
            batch_counter=batches,
        )
        q.awaitTermination()
        # 2 staged files under maxFilesPerTrigger=1 must yield exactly
        # one micro-batch per file; fewer means the writer emitted one
        # non-empty file or the reader coalesced triggers — either way
        # the cross-batch MERGE path this query exists to exercise did
        # not run (ADVICE r11 #4: the assert is deliberately zero-slack
        # and tied to the staging count above)
        assert len(batches) >= 2, (
            f"stream ran {len(batches)} micro-batch(es) for 2 staged "
            "files under maxFilesPerTrigger=1 — the cross-batch merge "
            "boundary was never crossed"
        )
        final = spark.read.parquet(current_state_path(f"{work}/state"))
        # eager checkpoint: the staged/state files are deleted below,
        # so the returned plan must not re-read them at collect time
        return final.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
