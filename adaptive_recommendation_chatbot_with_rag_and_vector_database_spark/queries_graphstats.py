"""Graph-statistics & trending wave 11 (SURVEY §2.21): triangle
counting under degree orientation (the scale-canonical wedge-join
algorithm), the log-bucketed degree distribution (the power-law
sanity check every graph pipeline reports), and per-window trending
top-k over the event stream (the leaderboard a feed ranker refreshes
per window) — the graph/temporal summary layer over the same
co-purchase structure q_pagerank and q_graph_walk rank.

Every query has an exact DuckDB oracle. The triangle oracle counts
id-ordered closed triples (a<b<c) — the same total the degree-oriented
Spark plan produces, so the hash check verifies the algorithm across
two different enumeration orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query
from .sources.loaders import load_table

# Co-purchase graph construction shared with q_pagerank (same
# decimation, so the two queries describe the same graph).
_GRAPH_SQL = """
    li_s AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey % 20 = 0),
    e AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM li_s a JOIN li_s b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT a AS v, count(*) AS d FROM sym GROUP BY a)
"""


#: session-cached co-purchase edge list, keyed by (applicationId,
#: sf_dir): SIX consumers (triangle count, degree distribution,
#: assortativity, Katz, k-core, PageRank) each re-derived the SAME
#: lineitem self-join before — the module's single heaviest repeated
#: subplan. One checkpoint per session serves them all.
_EDGES_CACHE: dict = {}


def _undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-purchase edge list (a < b), checkpointed once per
    (session, sf_dir): every consumer (degrees, orientation, wedge
    stats, |E|, PageRank's symmetrization) reads ONE materialization
    instead of re-deriving the lineitem self-join per query."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _EDGES_CACHE.get(key)
    if hit is not None:
        return hit
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_orderkey") % 20 == 0)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    _EDGES_CACHE[key] = e
    return e


# --- I1: triangle count + clustering coefficient ---------------------------


@query(
    "q_triangle_count",
    oracle=f"""
    WITH {_GRAPH_SQL},
    tri AS (
      SELECT count(*) AS t
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    wedge AS (SELECT sum(d * (d - 1) / 2.0) AS w FROM deg)
    SELECT (SELECT count(*) FROM deg) AS n_verts,
           (SELECT count(*) FROM e) AS n_edges,
           tri.t AS n_triangles,
           round(3.0 * tri.t / greatest(wedge.w, 1), 6) AS clustering
    FROM tri CROSS JOIN wedge
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count and global clustering coefficient of the
    co-purchase graph, via DEGREE ORIENTATION (compact-forward): every
    undirected edge is directed from its lower-(degree, id) endpoint
    to the higher, wedges enumerate ordered out-neighbor pairs, and a
    closing oriented edge completes each triangle exactly once. The
    orientation is the scale insight: out-degree under degree order is
    O(sqrt(|E|)), so the wedge join's fan-out is bounded even when a
    hub vertex has millions of neighbors — the id-ordered naive join
    (which the ORACLE uses, same total) explodes on hubs. Edges
    checkpoint once; the wedge→closure step is an edge-keyed equi-join
    + broadcast-free semi-join on (src, dst); counts combine
    map-side."""
    e = _undirected_edges(spark, sf_dir)
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    # orient each undirected edge low→high by (degree, id)
    ed = (
        e.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(
                    F.col("a").alias("src"),
                    F.col("b").alias("dst"),
                    F.col("db").alias("dst_d"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("src"),
                    F.col("a").alias("dst"),
                    F.col("da").alias("dst_d"),
                )
            )
            .alias("o")
        )
        .select("o.src", "o.dst", "o.dst_d")
        .localCheckpoint(eager=False)
    )
    w1, w2 = ed.alias("w1"), ed.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.src") == F.col("w2.src"))
        & (
            (F.col("w1.dst_d") < F.col("w2.dst_d"))
            | (
                (F.col("w1.dst_d") == F.col("w2.dst_d"))
                & (F.col("w1.dst") < F.col("w2.dst"))
            )
        ),
    ).select(F.col("w1.dst").alias("src"), F.col("w2.dst").alias("dst"))
    tri = wedges.join(ed.select("src", "dst"), ["src", "dst"], "left_semi")
    t = tri.agg(F.count(F.lit(1)).alias("t"))
    # wedge total, |V| and |E| are scalar aggregates riding broadcasts
    # — never driver-side .count() literals baked into the plan
    wedge_total = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2.0).alias("w"),
        F.count(F.lit(1)).alias("nv"),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("ne"))
    return (
        t.crossJoin(F.broadcast(wedge_total))
        .crossJoin(F.broadcast(n_edges))
        .select(
            F.col("nv").alias("n_verts"),
            F.col("ne").alias("n_edges"),
            F.col("t").alias("n_triangles"),
            F.round(
                F.lit(3.0) * F.col("t") / F.greatest(F.col("w"), F.lit(1.0)), 6
            ).alias("clustering"),
        )
    )


# --- I2: log-bucketed degree distribution ----------------------------------


@query(
    "q_degree_distribution",
    oracle=f"""
    WITH {_GRAPH_SQL}
    SELECT CAST(floor(log2(d)) AS BIGINT) AS bucket,
           count(*) AS n_verts,
           min(d) AS d_min,
           max(d) AS d_max
    FROM deg GROUP BY bucket ORDER BY bucket
    """,
)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree distribution of the co-purchase graph —
    the power-law sanity report a graph pipeline emits before choosing
    join strategies (it is how you SEE the hub problem that degree
    orientation and salting solve). Degrees are one keyed count; the
    bucket histogram is a second aggregate over |V| rows with map-side
    combine; log2/floor are codegen'd expressions. Output is
    O(log d_max) rows regardless of graph size."""
    e = _undirected_edges(spark, sf_dir)
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    )
    return (
        deg.groupBy(
            F.floor(F.log2("d")).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_verts"),
            F.min("d").alias("d_min"),
            F.max("d").alias("d_max"),
        )
        .orderBy("bucket")
    )


# --- I3: per-window trending top-k -----------------------------------------


@query(
    "q_trending_topk",
    oracle="""
    WITH c AS (
      SELECT date_trunc('day', ts) AS window_start, event_type,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT window_start, event_type, cnt,
             row_number() OVER (
               PARTITION BY window_start
               ORDER BY cnt DESC, event_type) AS rank
      FROM c)
    SELECT window_start, event_type, cnt, rank
    FROM r WHERE rank <= 3
    ORDER BY window_start, rank
    """,
)
def q_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-3 event types per day — the per-window leaderboard
    a feed ranker refreshes each window. Counts reduce first (one
    keyed aggregate with map-side combine: the exchange carries
    |windows|×|types| partials, never raw events), then the rank
    window runs over that ALREADY-AGGREGATED frame, keyed on the
    window — and the rank filter plans WindowGroupLimit, the partial
    per-partition top-k below the exchange. The streaming twin is the
    same aggregation under `window(ts, '1 day')` with a watermark;
    this batch form is the replayable oracle-checked semantics."""
    from pyspark.sql import Window

    c = (
        load_table(spark, "events", sf_dir)
        .groupBy(F.to_date("ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("cnt"), F.asc("event_type")
    )
    return (
        c.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .orderBy("window_start", "rank")
    )


# --- W22/I4: common-neighbor link prediction ---------------------------------

#: co-purchase decimation (the G2/q_pagerank slice) and the hub guard:
#: parts connecting more than this many customers are dropped before
#: pair enumeration — the max_df idiom that bounds the pair space
_CN_ORDER_MOD = 20
_CN_MAX_DEG = 25
_CN_TOPK = 20

#: session-cached (c, p, d) sampled customer–part co-purchase edges
#: (o_orderkey % _CN_ORDER_MOD = 0, distinct pairs) with the part
#: degree d ≤ _CN_MAX_DEG attached: q_common_neighbors and
#: q_adamic_adar build the IDENTICAL frame per call (the r11 scan-dupe
#: sweep counted 8 and 4 fact scans per plan respectively — the edge
#: subtree re-ran for every consumer branch). Counts/degrees are exact
#: int64; both consumers apply their own further filters on top, so
#: sharing changes no value.
_CN_EDGES_CACHE: dict = {}


def _cn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _CN_EDGES_CACHE.get(key)
    if hit is not None:
        return hit
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderkey") % _CN_ORDER_MOD == 0
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    e = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        # lazy checkpoint: e feeds the degree aggregate AND the join
        # back — materialized once on first use during the build
        .localCheckpoint(eager=False)
    )
    pdeg = e.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("d"))
    kept = (
        e.join(pdeg, "p")
        .filter(F.col("d") <= _CN_MAX_DEG)
        .select("c", "p", "d")
        .localCheckpoint()
    )
    # drop e's intermediate blocks once the eager substrate holds the
    # result (ADVICE r11 #3: the lazy checkpoint otherwise keeps its
    # MEMORY_AND_DISK blocks alive for the whole session alongside
    # `kept`, pure dead weight after this point; plain unpersist() is
    # a no-op for checkpoint blocks)
    from .sources.loaders import release_local_checkpoint

    release_local_checkpoint(e)
    _CN_EDGES_CACHE[key] = kept
    return kept


@query(
    "q_common_neighbors",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey % {_CN_ORDER_MOD} = 0),
    pdeg AS (SELECT p, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY p),
    kept AS (
      SELECT e.c, e.p FROM e JOIN pdeg ON e.p = pdeg.p
      WHERE pdeg.d <= {_CN_MAX_DEG}),
    cdeg AS (SELECT c, CAST(count(*) AS BIGINT) AS d FROM kept GROUP BY c),
    pairs AS (
      SELECT a.c AS ca, b.c AS cb, CAST(count(*) AS BIGINT) AS common
      FROM kept a JOIN kept b ON a.p = b.p AND a.c < b.c
      GROUP BY a.c, b.c),
    scored AS (
      SELECT pairs.ca, pairs.cb, pairs.common,
             round(pairs.common
                   / CAST(da.d + db.d - pairs.common AS DOUBLE), 5)
               AS jaccard
      FROM pairs
      JOIN cdeg da ON pairs.ca = da.c
      JOIN cdeg db ON pairs.cb = db.c)
    SELECT ca, cb, common, jaccard FROM scored
    ORDER BY common DESC, ca ASC, cb ASC LIMIT {_CN_TOPK}
    """,
)
def q_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction (W22/I4): rank customer pairs by
    how many parts they both purchase (plus neighborhood Jaccard) —
    the simplest link predictor that actually works, and the
    "customers like you" primitive behind collaborative filtering
    (V6's ALS learns it latently; this computes it exactly). Hub parts
    — those connecting more than {_CN_MAX_DEG} customers — are dropped
    BEFORE pair enumeration (the max_df idiom every dedup operator
    here uses): a part bought by everyone predicts nothing and alone
    would contribute O(|C|²) pairs.

    Plan shape: the bipartite edge list materializes once; the pair
    space is a part-keyed self-join bounded by Σ_p deg(p)² with
    deg ≤ {_CN_MAX_DEG}, so it is linear in parts — never |C|×|C|.
    Degree tables join on the vocabulary-sized axes. The top-k is a
    TakeOrderedAndProject over the pair aggregate."""
    # hub-filtered sampled edges from the session substrate (shared
    # with q_adamic_adar; d ≤ _CN_MAX_DEG already applied — degree-1
    # parts stay, exactly as the standalone build kept them)
    kept = _cn_edges(spark, sf_dir).select("c", "p")
    cdeg = kept.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a = kept.select(F.col("c").alias("ca"), "p")
    b = kept.select(F.col("c").alias("cb"), F.col("p").alias("pb"))
    pairs = (
        a.join(b, (F.col("p") == F.col("pb")) & (F.col("ca") < F.col("cb")))
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    da = cdeg.select(F.col("c").alias("ca"), F.col("d").alias("da"))
    db = cdeg.select(F.col("c").alias("cb"), F.col("d").alias("db"))
    return (
        pairs.join(da, "ca")
        .join(db, "cb")
        .select(
            "ca",
            "cb",
            "common",
            F.round(
                F.col("common")
                / (F.col("da") + F.col("db") - F.col("common")).cast("double"),
                5,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("common"), F.asc("ca"), F.asc("cb"))
        .limit(_CN_TOPK)
    )


# --- I5: Adamic-Adar link prediction ----------------------------------------


@query(
    "q_adamic_adar",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey % {_CN_ORDER_MOD} = 0),
    pdeg AS (SELECT p, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY p),
    kept AS (
      SELECT e.c, e.p, pdeg.d FROM e JOIN pdeg ON e.p = pdeg.p
      WHERE pdeg.d BETWEEN 2 AND {_CN_MAX_DEG}),
    pairs AS (
      SELECT a.c AS ca, b.c AS cb,
             CAST(count(*) AS BIGINT) AS common,
             round(sum(1.0 / ln(a.d)), 5) AS aa_score
      FROM kept a JOIN kept b ON a.p = b.p AND a.c < b.c
      GROUP BY a.c, b.c)
    SELECT ca, cb, common, aa_score FROM pairs
    ORDER BY aa_score DESC, ca ASC, cb ASC LIMIT {_CN_TOPK}
    """,
)
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (I5): q_common_neighbors' weighted
    sibling — each shared part contributes 1/ln(degree) instead of 1,
    so rare co-purchases carry more predictive evidence than popular
    ones (the classic fix for raw common-neighbor counts being
    dominated by near-hub items). Same hub discipline: parts above
    {_CN_MAX_DEG} customers are dropped BEFORE pair enumeration, and
    degree-1 parts are dropped too (they produce no pairs; excluding
    them up front also keeps 1/ln(d) away from the d=1 pole).

    Plan shape mirrors q_common_neighbors — the pair space is the
    part-keyed self-join bounded by Σ deg², linear in parts — but the
    per-pair weight is carried ON the edge rows (each kept edge
    already knows its part's degree), so the score needs NO extra join
    after the pair aggregate: one groupBy computes count and weighted
    sum together."""
    # session substrate (shared with q_common_neighbors) already
    # carries d ≤ _CN_MAX_DEG; this query's extra d ≥ 2 filter applies
    # on top — identical to the standalone build
    kept = _cn_edges(spark, sf_dir).filter(F.col("d") >= 2)
    a = kept.select(F.col("c").alias("ca"), "p", "d")
    b = kept.select(F.col("c").alias("cb"), F.col("p").alias("pb"))
    return (
        a.join(b, (F.col("p") == F.col("pb")) & (F.col("ca") < F.col("cb")))
        .groupBy("ca", "cb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("d"))), 5).alias("aa_score"),
        )
        .orderBy(F.desc("aa_score"), F.asc("ca"), F.asc("cb"))
        .limit(_CN_TOPK)
    )


# --- I6: degree assortativity coefficient -------------------------------------


@query(
    "q_assortativity",
    oracle=f"""
    WITH {_GRAPH_SQL},
    j AS (
      SELECT da.d AS x, db.d AS y
      FROM sym JOIN deg da ON da.v = sym.a
               JOIN deg db ON db.v = sym.b),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM j)
    SELECT m AS n_directed_edges,
           round((m * sxy - sx * sy) /
                 (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6)
             AS assortativity
    FROM s
    """,
)
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (I6, wave 37): the Pearson correlation of
    endpoint degrees over the directed edge list of the co-purchase
    graph — do hub parts co-occur with hubs (assortative, r>0) or with
    leaves (disassortative, r<0)? The one-number structure summary
    read beside I2's degree distribution: social graphs run positive,
    catalog/co-purchase graphs typically negative, and a sign flip
    after an ingest is a graph-corruption smell.

    All five correlation sums are exact int64 over the symmetric edge
    list (both directions, the standard convention); the only floats
    are the final two sqrts. Scale shape: the checkpointed edge list
    (shared with I1/I2) joins the |V|-row degree table twice — both
    joins keyed on a vertex id — then one scalar aggregate; nothing
    downstream of the degree join scales beyond |E|."""
    e = _undirected_edges(spark, sf_dir)
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    j = (
        sym.join(deg.select(F.col("v").alias("a"), F.col("d").alias("x")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("y")), "b")
    )
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("m").alias("n_directed_edges"),
        F.round(num / (F.sqrt(denx) * F.sqrt(deny)), 6).alias("assortativity"),
    )


# --- I7: Katz centrality (bounded 3-hop) ---------------------------------------

_KATZ_ALPHA = 0.05
_KATZ_K = 20


@query(
    "q_katz_centrality",
    oracle=f"""
    WITH {_GRAPH_SQL},
    h1 AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS h FROM sym GROUP BY 1),
    h2 AS (
      SELECT s.a AS v, CAST(sum(h1.h) AS BIGINT) AS h
      FROM sym s JOIN h1 ON h1.v = s.b GROUP BY 1),
    h3 AS (
      SELECT s.a AS v, CAST(sum(h2.h) AS BIGINT) AS h
      FROM sym s JOIN h2 ON h2.v = s.b GROUP BY 1),
    katz AS (
      SELECT h1.v, h1.h AS walks_1, h2.h AS walks_2, h3.h AS walks_3,
             CAST({_KATZ_ALPHA} AS DOUBLE) * (h1.h
               + CAST({_KATZ_ALPHA} AS DOUBLE)
               * (h2.h + CAST({_KATZ_ALPHA} AS DOUBLE) * h3.h)) AS score
      FROM h1 JOIN h2 ON h2.v = h1.v JOIN h3 ON h3.v = h1.v)
    SELECT v AS part, walks_1, walks_2, walks_3,
           round(score, 6) AS katz
    FROM katz ORDER BY score DESC, v LIMIT {_KATZ_K}
    """,
)
def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality, 3-hop truncation (I7, wave 39): Σₖ αᵏ·(Aᵏ1)ᵥ
    with α = 0.05 over the co-purchase graph — the walk-counting
    centrality between degree (k=1, I2's view) and PageRank (k→∞,
    G2's view). Truncating at 3 hops bounds the iteration by the
    OPERATOR, not the data (the Holt lesson): three vertex-keyed
    join+agg rounds, each message-sized.

    Exactness: the walk counts A1, A²1, A³1 are exact int64 all the
    way (the hop joins sum integer counts); floats appear only in the
    final Horner-form score α(h1 + α(h2 + α·h3)), written identically
    on both sides, so the top-{_KATZ_K} cut and tie-break are stable.
    Scale: each hop shuffles on the vertex key; hub fan-out is the
    orientation-capped co-purchase graph shared with I1/G2 (same
    decimation — the queries describe the same graph)."""
    sym_half = _undirected_edges(spark, sf_dir)
    sym = sym_half.unionByName(
        sym_half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    h1 = sym.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("h")
    )
    def hop(prev):
        return (
            sym.join(prev.withColumnRenamed("v", "b_v"), F.col("b") == F.col("b_v"))
            .groupBy(F.col("a").alias("v"))
            .agg(F.sum("h").cast("long").alias("h"))
        )
    h2 = hop(h1)
    h3 = hop(h2)
    katz = (
        h1.withColumnRenamed("h", "walks_1")
        .join(h2.withColumnRenamed("h", "walks_2"), "v")
        .join(h3.withColumnRenamed("h", "walks_3"), "v")
        .select(
            F.col("v").alias("part"),
            "walks_1",
            "walks_2",
            "walks_3",
            (
                _KATZ_ALPHA
                * (
                    F.col("walks_1")
                    + _KATZ_ALPHA
                    * (F.col("walks_2") + _KATZ_ALPHA * F.col("walks_3"))
                )
            ).alias("score"),
        )
    )
    return (
        katz.orderBy(F.desc("score"), F.asc("part"))
        .limit(_KATZ_K)
        .select(
            "part",
            "walks_1",
            "walks_2",
            "walks_3",
            F.round("score", 6).alias("katz"),
        )
    )


# --- I8: k-core peel (bounded rounds) -------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    # each round's edge list MUST be MATERIALIZED: s_i references
    # s_{i-1} twice (the two keep-joins), and DuckDB inlines
    # non-materialized CTEs per reference — the unrolled chain would
    # re-execute the base self-join 2^rounds times (measured 324 s at
    # sf0.1 vs 2 s materialized)
    steps = []
    prev = "sym"
    for i in range(1, _KCORE_ROUNDS + 1):
        steps.append(
            f"""d{i} AS MATERIALIZED (
      SELECT a AS v, CAST(count(*) AS BIGINT) AS d FROM {prev} GROUP BY 1),
    keep{i} AS MATERIALIZED (SELECT v FROM d{i} WHERE d >= {_KCORE_K}),
    s{i} AS MATERIALIZED (
      SELECT s.a, s.b FROM {prev} s
      JOIN keep{i} ka ON ka.v = s.a
      JOIN keep{i} kb ON kb.v = s.b)"""
        )
        prev = f"s{i}"
    joined = ",\n    ".join(steps)
    return f"""
    WITH {_GRAPH_SQL},
    {joined},
    core AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS d FROM {prev} GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_core_vertices,
           CAST(sum(d) / 2 AS BIGINT) AS n_core_edges,
           CAST(min(d) AS BIGINT) AS min_degree,
           CAST(max(d) AS BIGINT) AS max_degree
    FROM core
    """


@query("q_kcore_peel", oracle=_kcore_oracle())
def q_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peel (I8, wave 39): {_KCORE_ROUNDS} rounds of
    "drop every vertex with degree < {_KCORE_K} and the edges touching
    it" over the co-purchase graph, reporting the surviving core's
    size and degree range — the density-core extraction a recommender
    runs before community detection (peripheral one-off purchases
    drown co-occurrence signals). Bounded rounds make the operator
    deterministic and its cost fixed.

    Round shape (r11, VERDICT r10 weak-item lever — was degree
    aggregate + two vertex-keyed semi-joins ≈ 3 jobs/round with their
    broadcast materializations): the symmetric edge list means
    degree(v) = |rows with a = v| = |rows with b = v|, so both
    endpoint degrees attach as two unordered COUNT windows
    (partitionBy a, then partitionBy b) in ONE linear pipeline —
    scan → window → exchange → window → filter, two keyed exchanges,
    zero joins, zero broadcasts. The filter condition is symmetric, so
    the edge list stays symmetric round over round and the
    window-degree identity keeps holding. And because each round
    references its predecessor exactly ONCE (a linear operator chain —
    unlike the join form, whose three references per round would blow
    the plan up 3^rounds without checkpoints), the whole
    {_KCORE_ROUNDS}-round peel plus the final core aggregate compiles
    to ONE lazy plan = ONE Spark job of 2·rounds pipelined exchanges
    on a shrinking edge list — no per-round checkpoint jobs at all
    (the Y12 checkpoint discipline exists for BRANCHING iteration;
    a linear chain doesn't need it). The oracle unrolls the same
    {_KCORE_ROUNDS} rounds as chained CTEs — identical fixpoint
    prefix on both engines even if the true core needs more rounds."""
    edges_half = _undirected_edges(spark, sf_dir)
    sym = edges_half.unionByName(
        edges_half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    # r12 (guide §2.4 — two operations keyed the same way share one
    # exchange): ALTERNATE the window orientation per round. Both
    # endpoint degrees are computed on the same pre-filter edge list,
    # so the order of the two windows inside a round is free — ending
    # round t on key k and starting round t+1 on the SAME k lets the
    # filter in between preserve the hashpartitioning and the second
    # window reuse it: the exchange sequence collapses from
    # a,b|a,b|a,b… (12 exchanges) to a,b|b,a|a,b… (7), and the final
    # core aggregate (keyed on a) rides round 6's closing a-partition
    # for free. Same windows, same filter, same values every round —
    # plan shape only.
    for i in range(_KCORE_ROUNDS):
        if i % 2 == 0:
            sym = sym.withColumn("da", F.count(F.lit(1)).over(wa)).withColumn(
                "db", F.count(F.lit(1)).over(wb)
            )
        else:
            sym = sym.withColumn("db", F.count(F.lit(1)).over(wb)).withColumn(
                "da", F.count(F.lit(1)).over(wa)
            )
        sym = sym.filter(
            (F.col("da") >= _KCORE_K) & (F.col("db") >= _KCORE_K)
        ).select("a", "b")
    core = sym.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    return core.agg(
        F.count(F.lit(1)).cast("long").alias("n_core_vertices"),
        (F.sum("d") / 2).cast("long").alias("n_core_edges"),
        F.min("d").cast("long").alias("min_degree"),
        F.max("d").cast("long").alias("max_degree"),
    )


# --- I9: bounded label-propagation communities ----------------------------------

_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    # every round's labeling MUST be MATERIALIZED: round t references
    # l{t-1} twice (neighbor-min and carry-forward) and each summary
    # row reads its round's labeling again — DuckDB inlines
    # non-materialized CTEs per reference, so the unrolled chain would
    # re-execute the base graph self-join exponentially many times
    # (the q_kcore_peel lesson, measured 324 s vs 2 s there)
    steps = []
    prev = "l0"
    for t in range(1, _LPA_ROUNDS + 1):
        steps.append(
            f"""n{t} AS MATERIALIZED (
      SELECT sym.a AS v, min(lp.l) AS nm
      FROM sym JOIN {prev} lp ON lp.v = sym.b GROUP BY sym.a),
    l{t} AS MATERIALIZED (
      SELECT p.v, least(p.l, coalesce(n{t}.nm, p.l)) AS l,
             CASE WHEN least(p.l, coalesce(n{t}.nm, p.l)) < p.l
                  THEN 1 ELSE 0 END AS ch
      FROM {prev} p LEFT JOIN n{t} ON n{t}.v = p.v)"""
        )
        prev = f"l{t}"
    rounds_sql = ",\n    ".join(steps)
    summaries = [
        """SELECT 0 AS round, CAST(0 AS BIGINT) AS n_changed,
              CAST(count(DISTINCT l) AS BIGINT) AS n_labels,
              CAST(sum(l) AS BIGINT) AS label_sum FROM l0"""
    ] + [
        f"""SELECT {t} AS round, CAST(sum(ch) AS BIGINT) AS n_changed,
              CAST(count(DISTINCT l) AS BIGINT) AS n_labels,
              CAST(sum(l) AS BIGINT) AS label_sum FROM l{t}"""
        for t in range(1, _LPA_ROUNDS + 1)
    ]
    union = "\n    UNION ALL\n    ".join(summaries)
    return f"""
    WITH {_GRAPH_SQL},
    verts AS MATERIALIZED (SELECT DISTINCT a AS v FROM sym),
    l0 AS MATERIALIZED (SELECT v, v AS l FROM verts),
    {rounds_sql}
    SELECT * FROM ({union}) ORDER BY round
    """


@query("q_label_propagation", oracle=_lpa_oracle())
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded min-label propagation over the co-purchase graph (I9,
    wave 41): every vertex starts labeled with its own id; each
    synchronous round every vertex adopts the minimum of its own and
    its neighbors' labels. After r rounds each label has flooded its
    r-hop ball, so the per-round convergence trace (labels remaining,
    vertices that moved) measures community structure at increasing
    radius — the bounded-iteration core of both LPA community
    detection and hash-min connected components (Y12 runs the
    alternating CC algorithm to FIXPOINT on the dedup graph; this is
    the fixed-budget streaming-friendly variant whose cost is known in
    advance, the form a 100 TB pipeline schedules).

    Exactness: labels are vertex ids (int64), min/least are exact, and
    the trace columns (moved count, distinct labels, label-sum
    checksum) are integer aggregates — nothing floats. Label-sum bound:
    Σ labels ≤ |V|·max(id) ≈ 4e14 at the 1000× tier ≪ 2^63.

    Shape: per round, ONE vertex-keyed neighbor-min aggregate over the
    checkpointed edge list and one co-keyed left join back — both
    exchanges keyed on the vertex id, per-round cost linear in |E| at
    any scale (the hub worst case is a wide min-combine, which Spark
    partial-aggregates map-side). Each labeling materializes
    (localCheckpoint) because the next round AND its summary row both
    read it — the same double-consumer rule the oracle enforces with
    AS MATERIALIZED."""
    e = _undirected_edges(spark, sf_dir)
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # (r12 note: converting the per-round checkpoints to LAZY — one
    # final job instead of 4 barrier jobs — measured flat-to-WORSE in
    # back-to-back runs (1.2 -> 1.3-2.5 s): each lazy conversion still
    # pays the same Catalyst plan->RDD cost at build time and the tiny
    # barrier jobs were never the wall. Kept eager, the d63a41f
    # discipline.)
    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("l"))
        .localCheckpoint()
    )
    summaries = [
        labels.agg(
            F.lit(0).alias("round"),
            F.lit(0).cast("long").alias("n_changed"),
            F.countDistinct("l").cast("long").alias("n_labels"),
            F.sum("l").cast("long").alias("label_sum"),
        )
    ]
    for t in range(1, _LPA_ROUNDS + 1):
        # ONE vertex-keyed aggregate per round (r11, guide §2.4): the
        # neighbor labels and each vertex's own label union into a
        # single min-combine that yields BOTH the new label (min over
        # self+neighbors — identical to least(l, min-neighbor)) and
        # the old label (max of the self-only column), so the old
        # 3-exchange round (neighbor join → groupBy → left-join back)
        # collapses to join + groupBy: 32 → ~20 jobs, 2.4 → 1.5 s.
        nbr = sym.join(
            labels.select(F.col("v").alias("b"), F.col("l").alias("cand")),
            "b",
        ).select(
            F.col("a").alias("v"),
            "cand",
            F.lit(None).cast("long").alias("own"),
        )
        own = labels.select("v", F.col("l").alias("cand"), F.col("l").alias("own"))
        stepped = (
            nbr.union(own)
            .groupBy("v")
            .agg(F.min("cand").alias("l"), F.max("own").alias("old"))
            .select(
                "v",
                "l",
                F.when(F.col("l") < F.col("old"), 1).otherwise(0).alias("ch"),
            )
        )
        labels = stepped.localCheckpoint()
        summaries.append(
            labels.agg(
                F.lit(t).alias("round"),
                F.sum("ch").cast("long").alias("n_changed"),
                F.countDistinct("l").cast("long").alias("n_labels"),
                F.sum("l").cast("long").alias("label_sum"),
            )
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.union(s)
    return out.orderBy("round")
