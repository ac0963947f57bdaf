"""Training-data pipeline wave 4 (SURVEY §2.14): the corpus-curation
operators a large-scale LLM data pipeline runs between raw scrape and
tokenized shards — decontamination, quality filtering, mixture
weighting, sequence packing — plus three time-interval operators
(rolling window, sweep-line concurrency, SCD2) that the reference's
event-history handling implies (chat session timelines,
chat_history.py-style recency; see SURVEY §1).

Every query has an exact DuckDB oracle. Portability rules observed
throughout: floats rounded identically on both sides, double→int casts
go through floor() (DuckDB CAST rounds, Spark truncates), Spark []
indexing is 0-based vs DuckDB 1-based, and running sums always pin an
explicit ROWS frame with a full tie-break (the default RANGE frame
would merge ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query
from .sources.loaders import doc_tokens, load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "documents", sf_dir)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "events", sf_dir)


# --- X: corpus curation ----------------------------------------------------


@query(
    "q_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents),
    grams AS (
      SELECT doc_id,
             unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                     t[i+3] || ' ' || t[i+4]
                     for i in generate_series(1, len(t) - 4)]) AS g
      FROM toks),
    eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
    train_grams AS (
      SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 50 <> 0)
    SELECT t.doc_id, count(*) AS n_hits
    FROM train_grams t JOIN eval_grams e USING (g)
    GROUP BY t.doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (X8): flag training docs sharing any
    word 5-gram with the eval split (doc_id % 50 = 0), the n-gram
    overlap check every LLM data pipeline runs before training
    (WMDP/GPT-3-style 13-gram filtering, here 5-gram to suit the
    fixture corpus). Both sides explode to DISTINCT per-doc shingles;
    the eval shingle set is globally distinct and BROADCAST — at 100 TB
    the eval set is a benchmark suite (MBs), so the contamination scan
    is one shuffle-free map-side hash probe over training shingles plus
    one count aggregation, never a fact-fact shuffle.

    Operator ORDER is the scale decision: the broadcast probe runs
    FIRST and the per-doc shingle dedup (``count_distinct``) runs over
    the SURVIVORS only. The earlier form distincted the full training
    shingle stream before probing — a corpus-sized exchange that
    contradicted the paragraph above (caught by the 100× tier sweep);
    on real data contamination hits are benchmark-sized, so the
    post-probe aggregate's exchange is too."""
    grams_expr = (
        "transform(sequence(0, size(t) - 5), "
        "i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))"
    )
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"),
    )
    grams = (
        toks.filter(F.size("t") >= 5)
        .select("doc_id", F.explode(F.expr(grams_expr)).alias("g"))
    )
    eval_grams = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    train_grams = grams.filter(F.col("doc_id") % 50 != 0)
    return (
        train_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )


@query(
    "q_doc_repetition",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    wc AS (
      SELECT doc_id, w, count(*) AS c FROM words WHERE w <> ''
      GROUP BY doc_id, w)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tok,
           round(1.0 - count(*) / sum(c), 4) AS dup_ratio,
           round(max(c) / sum(c), 4) AS top_word_ratio
    FROM wc GROUP BY doc_id
    """,
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition scoring (X9), the Gopher/MassiveText
    quality-filter family: duplicate-token ratio and top-single-word
    mass per doc. One explode + two hash aggregates: the first shuffle
    carries map-side-combined (doc_id, word) partial counts (bounded by
    per-doc vocabulary, not token occurrences), the second one row per
    doc — both shrink, never amplify, the scan."""
    words = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    return wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.round(1.0 - F.count(F.lit(1)) / F.sum("c"), 4).alias("dup_ratio"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_word_ratio"),
    )


@query(
    "q_corpus_mixture",
    oracle="""
    WITH grp AS (
      SELECT lang, source,
             CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
                  AS BIGINT) AS n_tok
      FROM documents GROUP BY lang, source)
    SELECT lang, source, n_tok,
           round(n_tok / sum(n_tok) OVER (), 6) AS token_share,
           round(sqrt(n_tok) / sum(sqrt(n_tok)) OVER (), 6) AS sample_weight
    FROM grp
    """,
)
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture weighting (X10): token share per (lang, source)
    bucket and a temperature-smoothed (alpha=0.5, i.e. sqrt) sampling
    weight — the mixture table a multilingual training run feeds its
    sampler. The global normalization runs on the POST-aggregate frame
    (|langs|x|sources| rows, not |docs|), so the single-partition
    window is a few hundred rows at any corpus scale."""
    # nt_space is the substrate's raw single-space split count — the
    # exact int this query computed standalone (NOT the lower/\s+
    # contract; both live on doc_tokens).
    grp = (
        doc_tokens(spark, sf_dir)
        .select("lang", "source", F.col("nt_space").alias("nt"))
        .groupBy("lang", "source")
        .agg(F.sum("nt").alias("n_tok"))
    )
    w = Window.partitionBy()
    return grp.select(
        "lang",
        "source",
        "n_tok",
        F.round(F.col("n_tok") / F.sum("n_tok").over(w), 6).alias("token_share"),
        F.round(
            F.sqrt("n_tok") / F.sum(F.sqrt("n_tok")).over(w), 6
        ).alias("sample_weight"),
    )


@query(
    "q_pack_sequences",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS nt
      FROM documents),
    packed AS (
      SELECT lang, nt,
             CAST(floor(
               (sum(nt) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - nt) / 2048.0) AS BIGINT) AS bucket
      FROM toks)
    SELECT lang, bucket, count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tok
    FROM packed GROUP BY lang, bucket
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (X11): assign docs to fixed 2048-token context
    buckets per language by running-token offset (a doc lands in the
    bucket where it starts) — the deterministic packing step that turns
    a curated corpus into training shards. Running sum over an explicit
    ROWS frame keyed (lang, doc_id); at scale the window partitions by
    lang, so each language packs independently in parallel and the
    exchange carries one int per doc. Bucket ids via floor() (NOT a
    bare double cast: Spark truncates, DuckDB rounds)."""
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = doc_tokens(spark, sf_dir).select(
        "doc_id", "lang", F.col("nt_space").alias("nt")
    )
    packed = toks.select(
        "lang",
        "nt",
        F.floor((F.sum("nt").over(w) - F.col("nt")) / 2048.0).alias("bucket"),
    )
    return packed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("nt").alias("n_tok")
    )


# --- T: time-interval operators over the event log -------------------------


@query(
    "q_rolling_window",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER trail, 4) AS roll_sum,
           count(*) OVER trail AS roll_n
    FROM events
    WINDOW trail AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling aggregate per user (T7): the
    time-range-frame window behind rate limiting, rolling engagement,
    and recency features. Spark expresses the RANGE INTERVAL frame as
    rangeBetween over unix microseconds — value-based, so it is exact
    for irregular event spacing (no resample grid needed). One
    exchange on user_id; each user's timeline sorts locally."""
    us = 3_600_000_000  # 1 hour in microseconds
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-us, 0)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("roll_sum"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )


@query(
    "q_concurrency_sweep",
    oracle="""
    WITH iv AS (
      SELECT event_id, event_type, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value * 60000000) AS BIGINT) AS e
      FROM events),
    pts AS (
      SELECT event_type, s AS t, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS delta, event_id FROM iv),
    run AS (
      SELECT event_type,
             sum(delta) OVER (PARTITION BY event_type
                              ORDER BY t, delta, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS load
      FROM pts)
    SELECT event_type, CAST(max(load) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY event_type
    """,
)
def q_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency per event type (T8): each event
    holds a resource for `value` minutes; the classic interval
    max-overlap problem as +1/-1 boundary points and a running sum.
    Ends sort before starts at equal timestamps (delta -1 < +1), so
    touching intervals don't double-count; event_id completes the
    deterministic tie-break.

    TWO-PHASE prefix sum (the q_pack_sequences pattern), because the
    naive window keyed only on event_type caps parallelism at
    |types| ≈ 5: one task sorts the whole type no matter the cluster
    size — measured 22× superlinear at the 100× tier (20 M boundary
    points on 5 tasks), and at 1000× it is THE scale killer of the
    round-2 global-window class. Instead: (1) points bucket by UTC
    day (time-ordered, so day asc + in-day order = global order) and
    each (type, day) computes its LOCAL running sum in parallel;
    (2) per-(type, day) delta totals — |types| × |days| rows — get an
    exclusive running-total-of-prior-days window (tiny frame) and
    broadcast back; the global running load is local + prior-day
    offset. Peak per type is the max over that sum."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * 60_000_000).cast("long")
        ).alias("e"),
    )
    pts = (
        ev.select(
            "event_type",
            "event_id",
            F.explode(
                F.array(
                    F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                    F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
                )
            ).alias("p"),
        )
        .select("event_type", "event_id", "p.t", "p.delta")
        .withColumn("day", (F.col("t") / F.lit(86_400_000_000)).cast("long"))
    )
    w_local = (
        Window.partitionBy("event_type", "day")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pts.withColumn("local_run", F.sum("delta").over(w_local))
    # derive day totals from the ALREADY-SHUFFLED local stream (same
    # partitioning keys → no second scan, no second exchange)
    day_totals = local.groupBy("event_type", "day").agg(
        F.sum("delta").alias("day_delta")
    )
    w_days = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = day_totals.select(
        "event_type",
        "day",
        F.coalesce(F.sum("day_delta").over(w_days), F.lit(0)).alias("offset"),
    )
    run = local.join(F.broadcast(offsets), ["event_type", "day"]).select(
        "event_type", (F.col("local_run") + F.col("offset")).alias("load")
    )
    return run.groupBy("event_type").agg(F.max("load").alias("peak_concurrency"))


@query(
    "q_scd2",
    oracle="""
    SELECT user_id, event_id, event_type, round(value, 4) AS value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to
    FROM events
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 (T9): turn an append-only
    change log into validity intervals — each user state row is valid
    from its own timestamp until the next change (NULL = current row).
    The complement of q_cdc_latest (which keeps only the newest):
    history-preserving dimension builds for as-of analytics. One lead()
    window per user; the join-free interval construction shuffles each
    row once."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )


# --- W15: snapshot diff / reconciliation -------------------------------------


@query(
    "q_table_diff",
    oracle="""
    WITH before AS (SELECT * FROM orders),
    after AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 101 = 0
    ),
    classified AS (
      SELECT CASE
               WHEN a.o_orderkey IS NULL THEN 'added'
               WHEN b.o_orderkey IS NULL THEN 'deleted'
               WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
                 OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                 OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
                 OR a.o_orderdate IS DISTINCT FROM b.o_orderdate
                 OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
                 THEN 'modified'
               ELSE 'unchanged'
             END AS change_type,
             coalesce(b.o_totalprice, 0.0) - coalesce(a.o_totalprice, 0.0)
               AS delta
      FROM before a FULL OUTER JOIN after b ON a.o_orderkey = b.o_orderkey
    )
    SELECT change_type, count(*) AS n_rows,
           round(sum(delta), 2) AS price_delta
    FROM classified GROUP BY change_type
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / reconciliation (W15): classify every key of two
    table versions as added / deleted / modified / unchanged — the
    audit primitive behind CDC validation, replica reconciliation, and
    "what did this pipeline run change". The synthetic after-image
    deterministically deletes the %97 keys, bumps the %89 prices, and
    inserts shifted-key copies of the %101 rows, so every class is
    non-empty and the expected deltas are recomputable.

    Plan shape: one full outer join keyed on the primary key — both
    sides shuffle-partition on o_orderkey and AQE may sort-merge it;
    classification is a null-safe column compare projected BEFORE the
    final tiny aggregate, so nothing wider than the join itself ever
    shuffles. At 100 TB the same plan runs with column-pruned
    comparison hashes (sha2 over the compared columns) so the join
    carries (key, hash) instead of full rows; the fixture rows are
    narrow enough that hashing would only add parity risk between the
    engines' float formatting, so the compare stays columnar here."""
    orders = load_table(spark, "orders", sf_dir)
    before = orders
    after = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 101 == 0).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
    )
    a = before.select([F.col(c).alias(f"a_{c}") for c in before.columns])
    b = after.select([F.col(c).alias(f"b_{c}") for c in after.columns])
    joined = a.join(b, a.a_o_orderkey == b.b_o_orderkey, "full_outer")
    differs = (
        ~F.col("a_o_custkey").eqNullSafe(F.col("b_o_custkey"))
        | ~F.col("a_o_orderstatus").eqNullSafe(F.col("b_o_orderstatus"))
        | ~F.col("a_o_totalprice").eqNullSafe(F.col("b_o_totalprice"))
        | ~F.col("a_o_orderdate").eqNullSafe(F.col("b_o_orderdate"))
        | ~F.col("a_o_orderpriority").eqNullSafe(F.col("b_o_orderpriority"))
    )
    classified = joined.select(
        F.when(F.col("a_o_orderkey").isNull(), "added")
        .when(F.col("b_o_orderkey").isNull(), "deleted")
        .when(differs, "modified")
        .otherwise("unchanged")
        .alias("change_type"),
        (
            F.coalesce("b_o_totalprice", F.lit(0.0))
            - F.coalesce("a_o_totalprice", F.lit(0.0))
        ).alias("delta"),
    )
    return classified.groupBy("change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("delta"), 2).alias("price_delta"),
    )
