"""Governance wave 9 (SURVEY §2.19): the corpus-governance operators a
100 TB ingest runs before and after every curation pass — a one-scan
column profiler (the data-quality report), PageRank over the
co-purchase graph (the canonical damped power iteration, the ranking
generalization of the reference's retrieve-then-recommend loop,
/root/reference/AI.py:131-147), per-label embedding outlier scoring
(embedding-space quality filtering before ANN indexing), and a seeded
deterministic corpus permutation with a per-shard audit (reproducible
training-data ordering).

Every query has an exact DuckDB oracle. Portability rules as in
queries_pipeline.py: floats rounded identically on both sides, integer
sums cast to BIGINT (DuckDB sum(int) is HUGEINT), doubles stringified
through DECIMAL(18,2) so both engines render "31.00", deterministic
tie-breaks on every top-k cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from .sources.loaders import load_table


# --- G1: one-scan column profiler ------------------------------------------

# (column, kind) pairs profiled on lineitem; kind picks the min/max
# stringification rule shared with the oracle.
_PROFILE_COLS = (
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_returnflag", "str"),
    ("l_shipdate", "date"),
)


def _minmax_str(col: str, kind: str, agg) -> F.Column:
    c = agg(col)
    if kind == "num":
        return c.cast("decimal(18,2)").cast("string")
    if kind == "date":
        return c.cast("date").cast("string")
    return c


def _sql_minmax(col: str, kind: str, fn: str) -> str:
    if kind == "num":
        return f"CAST(CAST({fn}({col}) AS DECIMAL(18,2)) AS VARCHAR)"
    if kind == "date":
        return f"CAST(CAST({fn}({col}) AS DATE) AS VARCHAR)"
    return f"{fn}({col})"


_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS col_name,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           {_sql_minmax(c, kind, "min")} AS min_val,
           {_sql_minmax(c, kind, "max")} AS max_val
    FROM lineitem
    """
    for c, kind in _PROFILE_COLS
)


@query(
    "q_data_profile",
    oracle=f"SELECT * FROM ({_PROFILE_ORACLE}) ORDER BY col_name",
)
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: per-column row/null/distinct counts and
    min/max, the data-quality report that gates every ingest. One
    aggregate branch PER COLUMN, unioned — on columnar parquet the
    five single-column passes read exactly the bytes one 5-column pass
    would (ReadSchema prunes each branch to its column), and each
    branch plans the plain 2-phase distinct aggregate. The rejected
    alternative — all five ``count_distinct`` in one aggregate — goes
    through the multi-distinct Expand, which multiplies the row stream
    ×(columns+1) through the aggregation pipeline: measured 7.6 s vs
    0.13 s for this form at sf0.1 (58×). At cluster scale the exact
    distincts swap to ``approx_count_distinct`` (HLL, fixed-size
    partial state) — exact here so the oracle can hash-check."""
    li = load_table(spark, "lineitem", sf_dir)
    parts = []
    for c, kind in _PROFILE_COLS:
        parts.append(
            li.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                _minmax_str(c, kind, F.min).alias("min_val"),
                _minmax_str(c, kind, F.max).alias("max_val"),
            ).select(
                F.lit(c).alias("col_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_val",
                "max_val",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name")


# --- G2: PageRank over the co-purchase part graph --------------------------

_PR_DAMP = 0.85
_PR_ITER = 3


def _sql_pagerank() -> str:
    """Fixed-iteration PageRank unrolled as CTEs (r0 → r3)."""
    steps = []
    prev = "r0"
    for it in range(1, _PR_ITER + 1):
        steps.append(
            f"""r{it} AS (
      SELECT verts.v,
             (1 - {_PR_DAMP}) / n.nv
               + {_PR_DAMP} * coalesce(s.m, 0) AS r
      FROM verts CROSS JOIN n
      LEFT JOIN (
        SELECT e.b AS v, sum(p.r / e.d) AS m
        FROM {prev} p JOIN edges_d e ON e.a = p.v
        GROUP BY e.b
      ) s ON s.v = verts.v
    )"""
        )
        prev = f"r{it}"
    joined = ",\n    ".join(steps)
    return f"""
    WITH li_s AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey % 20 = 0),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li_s a JOIN li_s b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    edges AS (
      SELECT pa AS a, pb AS b FROM pairs
      UNION ALL SELECT pb, pa FROM pairs),
    deg AS (SELECT a, count(*)::DOUBLE AS d FROM edges GROUP BY a),
    edges_d AS (
      SELECT edges.a, edges.b, deg.d FROM edges JOIN deg USING (a)),
    verts AS (SELECT DISTINCT a AS v FROM edges),
    n AS (SELECT count(*)::DOUBLE AS nv FROM verts),
    r0 AS (SELECT v, 1.0 / n.nv AS r FROM verts CROSS JOIN n),
    {joined}
    SELECT verts.v AS part_id,
           round({prev}.r * n.nv, 6) AS score
    FROM verts CROSS JOIN n JOIN {prev} ON {prev}.v = verts.v
    ORDER BY score DESC, part_id LIMIT 25
    """


@query("q_pagerank", oracle=_sql_pagerank())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 fixed iterations) over the
    co-purchase part graph: parts linked when they appear in the same
    order, score normalized so 1.0 = uniform rank. The iterative-graph
    pattern at scale, same discipline as
    operators/dedup.connected_components and q_graph_walk: the
    edge+degree list materializes ONCE (localCheckpoint) and every
    iteration is one edge-keyed equi-join plus a groupBy-sum whose
    shuffle carries O(|verts|) rank mass — never the edge list again,
    never a driver-side matrix. The co-purchase decimation
    (l_orderkey % 20) bounds the pair term per order; at 100 TB the
    same plan shards by edge key and the rank vector stays a
    partitioned DataFrame."""
    # the (a < b) co-purchase pairs are the session-cached graph
    # substrate shared with the whole queries_graphstats family
    # (identical decimation and construction — the module docstrings'
    # "same graph" contract, now literally one checkpoint)
    from .queries_graphstats import _undirected_edges

    pairs = _undirected_edges(spark, sf_dir)
    edges = pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).cast("double").alias("d"))
    edges_d = edges.join(deg, "a").localCheckpoint(eager=False)
    # vertex set materializes once as well — every iteration's rank
    # rebuild and the scalar |V| recount read it, and without the
    # checkpoint each of the 3 iterations would re-run the distinct
    # (an O(|V|) shuffle apiece)
    verts = (
        edges_d.select(F.col("a").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = verts.agg(F.count(F.lit(1)).cast("double").alias("nv"))
    r = verts.crossJoin(F.broadcast(n)).select(
        "v", (F.lit(1.0) / F.col("nv")).alias("r")
    )
    for _ in range(_PR_ITER):
        contrib = (
            r.join(edges_d, r.v == edges_d.a)
            .groupBy(F.col("b").alias("cv"))
            .agg(F.sum(F.col("r") / F.col("d")).alias("m"))
        )
        r = (
            verts.crossJoin(F.broadcast(n))
            .join(contrib, F.col("v") == F.col("cv"), "left")
            .select(
                "v",
                (
                    F.lit(1 - _PR_DAMP) / F.col("nv")
                    + F.lit(_PR_DAMP) * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("r"),
            )
        )
    return (
        r.crossJoin(F.broadcast(n))
        .select(
            F.col("v").alias("part_id"),
            F.round(F.col("r") * F.col("nv"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "part_id")
        .limit(25)
    )


# --- G3: per-label embedding outlier scoring -------------------------------


@query(
    "q_embedding_outliers",
    oracle="""
    WITH dims AS (
      SELECT vec_id, label,
             unnest(generate_series(1, len(embedding))) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    stats AS (
      SELECT label, i, avg(x) AS mu,
             greatest(stddev_pop(x), 1e-9) AS sd
      FROM dims GROUP BY label, i),
    z AS (
      SELECT d.vec_id, d.label, abs((d.x - s.mu) / s.sd) AS az
      FROM dims d JOIN stats s USING (label, i))
    SELECT vec_id, label, round(max(az), 4) AS z_max
    FROM z GROUP BY vec_id, label
    ORDER BY z_max DESC, vec_id LIMIT 30
    """,
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier scoring: per-(label, dimension) mean and
    population stddev, each vector scored by its max |z| over
    dimensions — the quality filter that drops corrupt embeddings
    before they poison an ANN index or a centroid classifier
    (complements q_centroid_classifier). Shape at scale: posexplode →
    hash aggregate keyed on (label, dim) — partial aggregation
    combines map-side, so the stats shuffle carries |labels| × dim
    rows regardless of corpus size; the join back broadcasts the tiny
    stats table; the per-vector max is a second map-combined
    aggregate."""
    dims = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("i", "xf"),
    ).select("vec_id", "label", "i", F.col("xf").cast("double").alias("x"))
    stats = dims.groupBy("label", "i").agg(
        F.avg("x").alias("mu"),
        F.greatest(F.stddev_pop("x"), F.lit(1e-9)).alias("sd"),
    )
    z = dims.join(F.broadcast(stats), ["label", "i"]).select(
        "vec_id",
        "label",
        F.abs((F.col("x") - F.col("mu")) / F.col("sd")).alias("az"),
    )
    return (
        z.groupBy("vec_id", "label")
        .agg(F.round(F.max("az"), 4).alias("z_max"))
        .orderBy(F.desc("z_max"), "vec_id")
        .limit(30)
    )


# --- G4: seeded deterministic permutation + shard audit --------------------

_SHUF_MULT = 2654435761  # Knuth multiplicative constant
_SHUF_SEED = 12345
_SHUF_MOD = 2147483647
_N_SHARDS = 64


@query(
    "q_shuffle_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             (doc_id * {_SHUF_MULT} + {_SHUF_SEED}) % {_SHUF_MOD} AS h
      FROM documents)
    SELECT h % {_N_SHARDS} AS shard,
           count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           min(h) AS h_min,
           max(h) AS h_max
    FROM h GROUP BY shard ORDER BY shard
    """,
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic corpus permutation with a per-shard audit:
    a multiplicative hash of doc_id (seeded, engine-portable integer
    arithmetic — NOT rand(), which no two engines or reruns agree on)
    assigns every document a reproducible shuffle position and a shard;
    the audit table (per-shard count, id checksum, hash range) is what
    a training run records so the exact data order can be replayed.
    At scale the write is ``repartitionByRange(shard, h)`` →
    ``partitionBy(shard)`` parquet — one range shuffle, balanced by
    construction because the hash is uniform; the audit here is the
    same groupBy the writer's commit protocol logs. Map-side partial
    aggregation keeps the exchange at 64 rows per mapper."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    h = docs.select(
        "doc_id",
        ((F.col("doc_id") * _SHUF_MULT + _SHUF_SEED) % _SHUF_MOD).alias("h"),
    )
    return (
        h.groupBy((F.col("h") % _N_SHARDS).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.min("h").alias("h_min"),
            F.max("h").alias("h_max"),
        )
        .orderBy("shard")
    )


# --- G5: distribution-drift detection (two-sample KS) ----------------------


@query(
    "q_ks_drift",
    oracle="""
    WITH vals AS (SELECT DISTINCT n_chars AS v FROM documents),
    src AS (SELECT source, count(*)::DOUBLE AS n FROM documents GROUP BY 1),
    cnt AS (SELECT source, n_chars AS v, count(*) AS c
            FROM documents GROUP BY 1, 2),
    grid AS (SELECT s.source, s.n, vals.v FROM src s CROSS JOIN vals),
    cdf AS (
      SELECT g.source, g.v,
             sum(COALESCE(c.c, 0)) OVER (PARTITION BY g.source ORDER BY g.v)
               / g.n AS f
      FROM grid g LEFT JOIN cnt c ON c.source = g.source AND c.v = g.v),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             max(abs(a.f - b.f)) AS ks
      FROM cdf a JOIN cdf b ON a.v = b.v AND a.source < b.source
      GROUP BY 1, 2)
    SELECT src_a, src_b, round(ks, 6) AS ks
    FROM pairs ORDER BY ks DESC, src_a, src_b LIMIT 25
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift detection (G5): for every
    source pair, KS = max |CDF_a(x) − CDF_b(x)| of the document-length
    distribution, top-25 most-drifted pairs — the distribution monitor
    that catches a crawler or preprocessing change shifting one
    source's shape while means stay similar. Exact, not sampled: CDFs
    are integer prefix sums over the shared value grid (one window per
    source partition), the pair comparison joins per-VALUE rows (grid ×
    sources, never raw documents), and the max aggregates per pair.
    At 100 TB the grid is the scale knob — quantize values into fixed
    bins and the same plan runs with a bounded grid while the KS
    becomes binned-exact (the standard production tradeoff)."""
    # lazy checkpoint: cdf feeds BOTH sides of the pair join — as
    # plain plan subtrees the grid+window pipeline ran twice per
    # call (6 fact scans in the r11 scan-dupe sweep); the shared
    # RDD node computes once inside the same job. Grid-sized rows.
    cdf = ks_cdf_frame(spark, sf_dir).localCheckpoint(eager=False)
    a = cdf.select(
        F.col("source").alias("src_a"), "v", F.col("f").alias("fa")
    )
    b = cdf.select(
        F.col("source").alias("src_b"), "v", F.col("f").alias("fb")
    )
    return (
        a.join(b, "v")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.max(F.abs(F.col("fa") - F.col("fb"))).alias("ks"))
        .select("src_a", "src_b", F.round("ks", 6).alias("ks"))
        .orderBy(F.desc("ks"), "src_a", "src_b")
        .limit(25)
    )


def ks_cdf_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-checkpointed per-(source, value) CDF build of
    :func:`q_ks_drift` — exposed so plan tests can assert the keyed
    prefix window and map-side partial counts the lazy checkpoint
    otherwise hides behind ``Scan ExistingRDD`` (ADVICE r11 #1, the
    ``order_value_classes_frame`` pattern)."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    vals = docs.select(F.col("n_chars").alias("v")).distinct()
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    cnt = docs.groupBy(
        "source", F.col("n_chars").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    grid = src.crossJoin(vals)
    w = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(cnt, ["source", "v"], "left")
        .select(
            "source",
            "v",
            "n",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
        .withColumn("f", F.sum("c").over(w) / F.col("n"))
    )


# --- W19/G6: Benford first-digit conformance screen -------------------------

#: log10(1 + 1/d) for d = 1..9, Python-formatted once and injected into
#: BOTH engines (computing log10 engine-side risks a ulp straddling the
#: rounding boundary; a shared literal cannot).
_BENFORD_SHARES = (
    "0.3010299956639812",
    "0.17609125905568124",
    "0.12493873660829992",
    "0.09691001300805642",
    "0.07918124604762482",
    "0.06694678963061322",
    "0.05799194697768673",
    "0.05115252244738129",
    "0.04575749056067514",
)
#: chi-square critical value, df=8, alpha=0.05
_BENFORD_CRIT = "15.50731305586545"


@query(
    "q_benford",
    oracle=f"""
    WITH o AS (
      SELECT o_orderpriority AS priority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c
      FROM orders WHERE o_totalprice > 0),
    d AS (
      SELECT priority,
             CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
      FROM o),
    counts AS (
      SELECT priority, digit, CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY 1, 2),
    dense AS (
      SELECT p.priority, CAST(dig.digit AS INT) AS digit,
             coalesce(counts.n, 0) AS n,
             (CAST([{", ".join(_BENFORD_SHARES)}] AS DOUBLE[])
              )[CAST(dig.digit AS INT)] AS s
      FROM (SELECT DISTINCT priority FROM o) p
      CROSS JOIN generate_series(1, 9) AS dig(digit)
      LEFT JOIN counts
        ON counts.priority = p.priority AND counts.digit = dig.digit),
    tot AS (
      SELECT priority, CAST(sum(n) AS BIGINT) AS nt FROM dense GROUP BY 1),
    chi AS (
      SELECT dense.priority,
             round(sum((dense.n - tot.nt * dense.s)
                       * (dense.n - tot.nt * dense.s)
                       / (tot.nt * dense.s)), 4) AS chi2
      FROM dense JOIN tot ON dense.priority = tot.priority
      GROUP BY dense.priority)
    SELECT dense.priority, dense.digit, dense.n,
           round(dense.n / CAST(tot.nt AS DOUBLE), 5) AS obs_share,
           round(dense.s, 5) AS exp_share,
           chi.chi2,
           CASE WHEN chi.chi2 > CAST({_BENFORD_CRIT} AS DOUBLE)
                THEN 1 ELSE 0 END AS flagged
    FROM dense
    JOIN tot ON dense.priority = tot.priority
    JOIN chi ON dense.priority = chi.priority
    ORDER BY dense.priority, dense.digit
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen (W19/G6): compare each order
    priority's first-significant-digit distribution of ``o_totalprice``
    against Benford's law and flag groups whose chi-square statistic
    exceeds the df=8, α=0.05 critical value — the classic forensic
    first pass over financial columns (fabricated amounts rarely
    respect the log-uniform leading digit).

    The first digit is taken from the DECIMAL STRING of the integer
    cents value — ×100 shifts the decimal point without changing the
    leading digit — because ``floor(x / 10^floor(log10(x)))`` can
    misclassify values one ulp under a power of ten. Expected shares
    are shared literals (see _BENFORD_SHARES); missing digits densify
    via a priorities × 1..9 frame so zero cells still contribute their
    expected mass to the statistic.

    Plan shape: one (priority, digit) aggregate with map-side partials
    — at most |priorities|×9 partial rows per mapper — then everything
    downstream joins ≤45-row summaries. The facts are scanned once."""
    o = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
    )
    counts = o.select(
        "priority",
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit"),
    ).groupBy("priority", "digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    shares = F.array(*[F.lit(float(s)) for s in _BENFORD_SHARES])
    dense = (
        o.select("priority")
        .distinct()
        .select("priority", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit"))
        .select("priority", F.col("digit").cast("int").alias("digit"))
        .join(counts, ["priority", "digit"], "left")
        .select(
            "priority",
            "digit",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
            F.element_at(shares, F.col("digit")).alias("s"),
        )
        # lazy checkpoint: |priority|×9 rows feeding the total, the
        # chi² rollup and the final projection — as plain plan subtrees
        # the orders scan+digit agg re-ran per reference (8 fact scans
        # in the r11 scan-dupe sweep); the shared RDD node computes
        # once inside the same job. Values unchanged.
        .localCheckpoint(eager=False)
    )
    tot = dense.groupBy("priority").agg(F.sum("n").cast("long").alias("nt"))
    densed = dense.join(F.broadcast(tot), "priority")
    chi_term = (F.col("n") - F.col("nt") * F.col("s")) * (
        F.col("n") - F.col("nt") * F.col("s")
    ) / (F.col("nt") * F.col("s"))
    chi = densed.groupBy("priority").agg(F.round(F.sum(chi_term), 4).alias("chi2"))
    return (
        densed.join(F.broadcast(chi), "priority")
        .select(
            "priority",
            "digit",
            "n",
            F.round(F.col("n") / F.col("nt").cast("double"), 5).alias("obs_share"),
            F.round(F.col("s"), 5).alias("exp_share"),
            "chi2",
            F.when(F.col("chi2") > F.lit(float(_BENFORD_CRIT)), 1)
            .otherwise(0)
            .alias("flagged"),
        )
        .orderBy("priority", "digit")
    )


# --- W20/G7: data-contract expectation audit ---------------------------------

_EXP_DATE_LO = "1990-01-01"
_EXP_DATE_HI = "2005-12-31"


@query(
    "q_expectation_audit",
    oracle=f"""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders),
    checks AS (
      SELECT 'orderkey_unique' AS expectation,
             (SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
              FROM orders) AS n_violations
      UNION ALL
      SELECT 'custkey_referential',
             (SELECT CAST(count(*) AS BIGINT) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'totalprice_positive',
             (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_totalprice IS NULL OR o_totalprice <= 0)
      UNION ALL
      SELECT 'status_in_domain',
             (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_orderstatus IS NULL
                 OR o_orderstatus NOT IN ('O', 'F', 'P'))
      UNION ALL
      SELECT 'orderdate_bounded',
             (SELECT CAST(count(*) AS BIGINT) FROM orders
              WHERE o_orderdate IS NULL
                 OR CAST(o_orderdate AS DATE) < DATE '{_EXP_DATE_LO}'
                 OR CAST(o_orderdate AS DATE) > DATE '{_EXP_DATE_HI}'))
    SELECT checks.expectation, n.n_rows, checks.n_violations,
           round(checks.n_violations / CAST(n.n_rows AS DOUBLE), 6)
             AS violation_rate,
           CASE WHEN checks.n_violations = 0 THEN 1 ELSE 0 END AS passed
    FROM checks, n ORDER BY expectation
    """,
)
def q_expectation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract expectation audit (W20/G7): the
    Great-Expectations-style gate a table passes before downstream
    consumers may read it — uniqueness of the primary key, referential
    integrity of the customer FK, positivity, a value domain, and a
    date-range bound — each reported as (expectation, violations, rate,
    pass) rather than a single boolean, because the REPORT is the
    product: it is what lands in the data-quality dashboard and what a
    failed SLA pages on. Complements G1's descriptive profile with
    normative checks (G1 says what IS, this says what MUST BE).

    Plan shape: the row-local checks (positivity, domain, bounds) fold
    into ONE conditional aggregate over a single scan; uniqueness is
    one exact count-distinct (the one key-shuffled stage — at 100 TB
    that exchange is the audit's honest cost, and the key is the PK so
    it cannot skew); the FK check is a broadcast anti-join count. The
    verdict table is 5 rows assembled from scalars."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    row_local = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct(F.col("o_orderkey")).cast("long").alias("n_keys"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_price"),
        F.sum(
            F.when(
                F.col("o_orderstatus").isNull()
                | ~F.col("o_orderstatus").isin("O", "F", "P"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_status"),
        F.sum(
            F.when(
                F.col("o_orderdate").isNull()
                | (F.to_date("o_orderdate") < F.lit(_EXP_DATE_LO).cast("date"))
                | (F.to_date("o_orderdate") > F.lit(_EXP_DATE_HI).cast("date")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("v_date"),
    )
    v_fk = (
        orders.join(
            F.broadcast(cust),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v_fk"))
    )
    scalars = row_local.crossJoin(F.broadcast(v_fk))
    checks = scalars.select(
        "n_rows",
        F.expr(
            "stack(5,"
            " 'orderkey_unique', n_rows - n_keys,"
            " 'custkey_referential', v_fk,"
            " 'totalprice_positive', v_price,"
            " 'status_in_domain', v_status,"
            " 'orderdate_bounded', v_date"
            ") AS (expectation, n_violations)"
        ),
    )
    return (
        checks.select(
            "expectation",
            "n_rows",
            F.col("n_violations").cast("long").alias("n_violations"),
            F.round(
                F.col("n_violations") / F.col("n_rows").cast("double"), 6
            ).alias("violation_rate"),
            F.when(F.col("n_violations") == 0, 1).otherwise(0).alias("passed"),
        )
        .orderBy("expectation")
    )


# --- G8: data-freshness SLA audit -------------------------------------------

_FRESH_SLA_MIN = 24 * 60  # stale when a source lags the feed by a day


@query(
    "q_freshness_audit",
    oracle=f"""
    WITH g AS (SELECT max(ts) AS gmax FROM events),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             max(ts) AS last_ts
      FROM events GROUP BY event_type)
    SELECT event_type, n_events, CAST(last_ts AS VARCHAR) AS last_ts,
           (CAST(floor(epoch(gmax)) AS BIGINT)
            - CAST(floor(epoch(last_ts)) AS BIGINT)) // 60 AS lag_minutes,
           CASE WHEN (CAST(floor(epoch(gmax)) AS BIGINT)
                      - CAST(floor(epoch(last_ts)) AS BIGINT)) // 60
                     > {_FRESH_SLA_MIN}
                THEN 'stale' ELSE 'fresh' END AS status
    FROM s, g ORDER BY event_type
    """,
)
def q_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness SLA audit (G8): per event source, when did data
    last arrive and how far does it lag the newest event in the feed —
    the first dashboard any ingestion pipeline gets, and the check that
    catches a silently-dead producer before its absence skews every
    downstream aggregate. One hash aggregate over the facts (max/count
    partials combine map-side); the global watermark derives from the
    per-source maxima (|sources| rows) and broadcasts back. Lag is
    integer epoch-minute arithmetic — exact on both engines.

    Timestamps surface as strings because the driver compare hashes
    values lexically; epoch math stays on the typed column."""
    ev = load_table(spark, "events", sf_dir)
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    g = s.agg(F.max("last_ts").alias("gmax"))
    lag = F.floor(
        (F.col("gmax").cast("long") - F.col("last_ts").cast("long")) / 60
    ).cast("long")
    return (
        s.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n_events",
            F.col("last_ts").cast("string").alias("last_ts"),
            lag.alias("lag_minutes"),
            F.when(lag > _FRESH_SLA_MIN, "stale")
            .otherwise("fresh")
            .alias("status"),
        )
        .orderBy("event_type")
    )
