"""Training-data pipeline wave 6 (SURVEY §2.16): the curation and
layout operators that close the gap between a filtered corpus and
training shards — rule-cascade quality filtering with per-rule drop
accounting (C4/Gopher-style), corpus-LM perplexity scoring, span-level
dedup, Z-order data layout, a random-walk co-purchase recommender (the
graph generalization of the reference's retrieval-then-recommend loop,
/root/reference/AI.py:131-147), and a train/test nearest-centroid
classifier over the embedding space (the shape of a fasttext-style
quality classifier, with an exact oracle instead of invariants).

Every query has an exact DuckDB oracle. Portability rules as in
queries_pipeline.py: floats rounded identically on both sides, log10
(not ln — DuckDB ``log`` is log10), double→int through floor, explicit
ROWS frames, deterministic tie-breaks on every top-k cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query
from .sources.loaders import load_table, scatter

# Shared tokenizer expressions (functions/tokenize — the engine-wide
# tokenization contract, one source for both engines).
from .functions.tokenize import SQL_TOKS as _SQL_TOKS  # noqa: E402
from .functions.tokenize import toks_col  # noqa: E402


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "documents", sf_dir)


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        toks_col().alias("toks"),
    )


# --- C1: quality-filter cascade -------------------------------------------


@query(
    "q_filter_cascade",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             len({_SQL_TOKS}) AS nw,
             len(list_distinct({_SQL_TOKS})) /
               greatest(len({_SQL_TOKS}), 1)::DOUBLE AS dr,
             list_avg(list_transform({_SQL_TOKS}, x -> len(x))) AS mwl
      FROM documents)
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN nw < 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS drop_short,
           CAST(sum(CASE WHEN nw >= 30 AND dr < 0.42 THEN 1 ELSE 0 END)
             AS BIGINT) AS drop_rep,
           CAST(sum(CASE WHEN nw >= 30 AND dr >= 0.42
                     AND (mwl < 3.8 OR mwl > 5.2) THEN 1 ELSE 0 END)
             AS BIGINT) AS drop_len,
           CAST(sum(CASE WHEN nw >= 30 AND dr >= 0.42
                     AND mwl BETWEEN 3.8 AND 5.2 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept
    FROM t GROUP BY lang
    """,
)
def q_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality-filter cascade with per-rule drop
    accounting: min length, duplicate-token ratio, mean-word-length
    band, applied in fixed order so each dropped doc is attributed to
    its FIRST failing rule — the audit table a corpus curation run
    reports before training. One scan, one hash aggregate keyed on
    lang: every rule is a Catalyst expression over the token array, so
    at 100 TB this is scan-speed map work plus a |langs|-row shuffle."""
    t = _toks(spark, sf_dir).select(
        "lang",
        F.size("toks").alias("nw"),
        (
            F.size(F.array_distinct("toks"))
            / F.greatest(F.size("toks"), F.lit(1)).cast("double")
        ).alias("dr"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
            lambda acc: acc / F.greatest(F.size("toks"), F.lit(1)),
        ).alias("mwl"),
    )
    short = F.col("nw") < 30
    rep = F.col("dr") < 0.42
    lenr = (F.col("mwl") < 3.8) | (F.col("mwl") > 5.2)
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(short.cast("long")).alias("drop_short"),
        F.sum((~short & rep).cast("long")).alias("drop_rep"),
        F.sum((~short & ~rep & lenr).cast("long")).alias("drop_len"),
        F.sum((~short & ~rep & ~lenr).cast("long")).alias("n_kept"),
    )


# --- C2: corpus unigram LM scoring ----------------------------------------


@query(
    "q_unigram_lm",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents),
    wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
    corpus AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM wc GROUP BY w),
    tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n, count(*) AS v FROM corpus)
    SELECT wc.doc_id,
           CAST(sum(wc.c) AS BIGINT) AS n_tok,
           round(sum(wc.c * log10((corpus.cw + 1.0) / (tot.n + tot.v)))
                 / sum(wc.c), 4) AS avg_logp
    FROM wc JOIN corpus USING (w) CROSS JOIN tot
    GROUP BY wc.doc_id
    """,
)
def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram language-model scoring: train add-one-smoothed
    unigram probabilities over the whole corpus, score each document by
    mean log10 probability — the KenLM-perplexity quality signal of
    CCNet/RedPajama-style pipelines, reduced to the unigram order the
    fixture supports. Two hash aggregates build the LM ((doc, word)
    partials combine map-side); the model itself is a vocabulary-sized
    table, BROADCAST back onto the per-doc word counts — at 100 TB the
    LM is MBs while the corpus is the fact side, so scoring is one
    shuffle-free probe plus a per-doc aggregate."""
    words = (
        _toks(spark, sf_dir)
        .select("doc_id", F.explode("toks").alias("w"))
    )
    # lazy checkpoint (r12 scan-dupe paydown): the (doc, word) counts
    # feed the corpus LM build AND the scoring probe — as plain
    # subtrees the tokenize+explode pass ran three times per call
    # (the vocabulary rollup re-derived it once more under `tot`)
    wc = (
        words.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    corpus = wc.groupBy("w").agg(F.sum("c").alias("cw"))
    tot = corpus.agg(
        F.sum("cw").alias("n"), F.count(F.lit(1)).alias("v")
    )
    scored = wc.join(F.broadcast(corpus), "w").join(F.broadcast(tot))
    logp = F.col("c") * F.log10(
        (F.col("cw") + 1.0) / (F.col("n") + F.col("v"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.round(F.sum(logp) / F.sum("c"), 4).alias("avg_logp"),
    )


# --- C3: span-level dedup --------------------------------------------------


@query(
    "q_span_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    spans AS (
      SELECT doc_id,
             unnest([struct_pack(i := i,
                                 s := array_to_string(toks[i:i+7], ' '))
                     for i in generate_series(1, len(toks), 8)]) AS sp
      FROM t),
    keyed AS (
      SELECT doc_id, sp.i AS i, sp.s AS s,
             doc_id * 1000000 + sp.i AS k
      FROM spans),
    firsts AS (SELECT s, min(k) AS k_min FROM keyed GROUP BY s)
    SELECT doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN k = k_min THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM keyed JOIN firsts USING (s)
    GROUP BY doc_id
    """,
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level dedup (the line-level dedup step of C4, over fixed
    8-word spans since the fixture corpus has no line structure): every
    span keeps only its globally-first occurrence, ordered by
    (doc_id, position). Per doc: spans emitted vs spans kept. The span
    table shuffles once keyed on span text for the group-min, then once
    on doc_id for the per-doc rollup — both keyed exchanges; duplicate
    mass shrinks the second shuffle, never grows it."""
    # size > 0 guard: sequence(1, 0, 8) THROWS on Spark (start > stop
    # with positive step) while the oracle's generate_series returns
    # empty — an empty document must contribute no spans, not abort
    t = _toks(spark, sf_dir).filter(F.size("toks") > 0)
    spans = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks"), F.lit(8)),
                lambda i: F.struct(
                    i.alias("i"),
                    F.concat_ws(" ", F.slice("toks", i, 8)).alias("s"),
                ),
            )
        ).alias("sp"),
    ).select(
        "doc_id",
        F.col("sp.i").alias("i"),
        F.col("sp.s").alias("s"),
        (F.col("doc_id") * 1000000 + F.col("sp.i")).alias("k"),
    )
    firsts = spans.groupBy("s").agg(F.min("k").alias("k_min"))
    return (
        spans.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("k") == F.col("k_min")).cast("long")).alias("n_kept"),
        )
    )


# --- C4: Z-order layout ----------------------------------------------------


def _z_terms_sql(x: str, y: str) -> str:
    return " + ".join(
        f"((({x} >> {i}) & 1) << {2 * i}) + ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    )


@query(
    "q_zorder_layout",
    oracle=f"""
    WITH d AS (
      SELECT (o_custkey & 255) AS x,
             (datediff('day', DATE '1992-01-01', o_orderdate) & 255) AS y
      FROM orders),
    z AS (SELECT x, y, ({_z_terms_sql('x', 'y')}) AS zval FROM d)
    SELECT zval >> 6 AS zbucket,
           count(*) AS n,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max
    FROM z GROUP BY zbucket
    """,
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) data layout: bit-interleave two clustering
    dimensions (customer bucket, order-day bucket) into one sort key
    and report per-Z-range occupancy and min/max extents — the layout
    stat that makes 2-D data skipping work. Writing a 100 TB fact table
    sorted by zval gives every file a tight min/max envelope on BOTH
    dimensions, so either-column predicates prune files (the same
    mechanism as Delta/Iceberg Z-ordering); the interleave itself is 16
    static bit-ops, pure scan-side codegen. Bucket extents here make
    the locality driver-checkable: each bucket covers 64 consecutive Z
    values, i.e. at most an 8x8 tile of the (x, y) plane."""
    d = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").bitwiseAND(255).alias("x"),
        F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
        .bitwiseAND(255)
        .alias("y"),
    )
    zval = None
    for i in range(8):
        term = F.shiftleft(
            F.shiftright("x", i).bitwiseAND(1), 2 * i
        ) + F.shiftleft(F.shiftright("y", i).bitwiseAND(1), 2 * i + 1)
        zval = term if zval is None else zval + term
    z = d.select("x", "y", zval.alias("zval"))
    return z.groupBy(F.shiftright("zval", 6).alias("zbucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )


# --- C5: random-walk co-purchase recommender -------------------------------


#: session-cached customer↔part bipartite co-purchase edges + degrees:
#: q_graph_walk's three hops and both degree frames all read the same
#: distinct (c, p) edge list, and the orders⋈lineitem+distinct build is
#: most of the query's wall — build it once per (session, sf_dir) like
#: the part-part edges substrate in queries_graphstats.
_BIPARTITE_CACHE: dict = {}


def _bipartite_edges(spark: SparkSession, sf_dir: str):
    """(edges(c, p), degc(c, dc), degp(p, dp)) — distinct co-purchase
    pairs with per-side degrees, each eagerly checkpointed once per
    (session, sf_dir); |edges| is bounded by distinct customer-part
    pairs, degrees by the dimensions."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _BIPARTITE_CACHE.get(key)
    if hit is not None:
        return hit
    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("c"), "o_orderkey"
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", F.col("l_partkey").alias("p")
    )
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("c", "p")
        .distinct()
        .localCheckpoint()
    )
    degc = edges.groupBy("c").agg(F.count(F.lit(1)).alias("dc")).localCheckpoint()
    degp = edges.groupBy("p").agg(F.count(F.lit(1)).alias("dp")).localCheckpoint()
    out = (edges, degc, degp)
    _BIPARTITE_CACHE[key] = out
    return out



@query(
    "q_graph_walk",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    degc AS (SELECT c, count(*) AS dc FROM edges GROUP BY c),
    degp AS (SELECT p, count(*) AS dp FROM edges GROUP BY p),
    seeds AS (
      SELECT c, 1.0 / (SELECT count(*) FROM degc WHERE c % 97 = 0) AS m
      FROM degc WHERE c % 97 = 0),
    m1 AS (
      SELECT e.p, sum(s.m / d.dc) AS m
      FROM seeds s JOIN edges e USING (c) JOIN degc d USING (c)
      GROUP BY e.p),
    m2 AS (
      SELECT e.c, sum(m1.m / d.dp) AS m
      FROM m1 JOIN edges e USING (p) JOIN degp d USING (p)
      GROUP BY e.c),
    m3 AS (
      SELECT e.p, sum(m2.m / d.dc) AS m
      FROM m2 JOIN edges e USING (c) JOIN degc d USING (c)
      GROUP BY e.p)
    SELECT p AS part_id, round(m, 6) AS score
    FROM m3
    ORDER BY score DESC, part_id
    LIMIT 20
    """,
)
def q_graph_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-hop random walk over the customer-part co-purchase graph:
    seed customers spread uniform mass, each hop distributes mass along
    edges weighted by 1/out-degree (customer→part→customer→part), and
    the top-20 parts by arrival mass are the recommendations — the
    co-visitation graph recommender that generalizes the reference's
    retrieve-then-recommend loop (/root/reference/AI.py:131-147) to
    collaborative structure. The iterative-graph pattern at scale: the
    edge list and degrees materialize ONCE per session (the
    _bipartite_edges checkpoint, r11 — they were the query's whole
    wall), and every hop is an edge-keyed equi-join plus a groupBy-sum
    — the same partitioning reused hop to hop, mass vectors only ever
    O(|vertices|)."""
    edges, degc, degp = _bipartite_edges(spark, sf_dir)
    seeds = degc.filter(F.col("c") % 97 == 0).select("c")
    n_seeds = seeds.select(F.count(F.lit(1)).alias("ns"))
    m0 = seeds.join(F.broadcast(n_seeds)).select(
        "c", (F.lit(1.0) / F.col("ns")).alias("m")
    )
    m1 = (
        m0.join(edges, "c")
        .join(degc, "c")
        .groupBy("p")
        .agg(F.sum(F.col("m") / F.col("dc")).alias("m"))
    )
    m2 = (
        m1.join(edges, "p")
        .join(degp, "p")
        .groupBy("c")
        .agg(F.sum(F.col("m") / F.col("dp")).alias("m"))
    )
    m3 = (
        m2.join(edges, "c")
        .join(degc, "c")
        .groupBy("p")
        .agg(F.sum(F.col("m") / F.col("dc")).alias("m"))
    )
    return (
        m3.select(F.col("p").alias("part_id"), F.round("m", 6).alias("score"))
        .orderBy(F.desc("score"), "part_id")
        .limit(20)
    )


# --- C6: nearest-centroid classifier over embeddings -----------------------


@query(
    "q_centroid_classifier",
    oracle="""
    WITH dims AS (
      SELECT vec_id, label,
             unnest(generate_series(1, len(embedding))) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    cent AS (
      SELECT label AS clabel, i, avg(x) AS v
      FROM dims WHERE vec_id % 5 <> 0 GROUP BY label, i),
    dist AS (
      SELECT d.vec_id, d.label AS true_label, c.clabel,
             sum((d.x - c.v) * (d.x - c.v)) AS d2
      FROM dims d JOIN cent c USING (i)
      WHERE d.vec_id % 5 = 0
      GROUP BY d.vec_id, d.label, c.clabel),
    ranked AS (
      SELECT vec_id, true_label, clabel,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel)
               AS rn
      FROM dist)
    SELECT true_label,
           count(*) AS n_test,
           CAST(sum(CASE WHEN clabel = true_label THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct
    FROM ranked WHERE rn = 1 GROUP BY true_label
    """,
)
def q_centroid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test nearest-centroid classification over the embedding
    space: fit per-label centroids on the training split (vec_id % 5
    != 0), classify the held-out split by squared-L2 argmin with a
    label tie-break, report per-label test counts and hits — the shape
    of an embedding-space quality classifier (fasttext-style corpus
    filtering), with an EXACT oracle rather than invariants. At 100 TB
    the model side is |labels| centroid rows, BROADCAST; scoring is a
    shuffle-free map over the test scan plus one |labels|-row
    aggregate. Centroid fitting is one keyed aggregate over (label,
    dim) partial sums."""
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    train = emb.filter(F.col("vec_id") % 5 != 0)
    test = scatter(emb.filter(F.col("vec_id") % 5 == 0))
    cent = (
        train.select("label", F.posexplode("e").alias("i", "x"))
        .groupBy(F.col("label").alias("clabel"), "i")
        .agg(F.avg("x").alias("v"))
        .groupBy("clabel")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "v"))),
                lambda s: s["v"],
            ).alias("cvec")
        )
    )
    d2 = F.aggregate(
        F.zip_with("e", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = test.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        F.col("label").alias("true_label"),
        "clabel",
        d2.alias("d2"),
    )
    pred = scored.groupBy("vec_id", "true_label").agg(
        F.min_by("clabel", F.struct("d2", "clabel")).alias("pred_label")
    )
    return pred.groupBy("true_label").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum((F.col("pred_label") == F.col("true_label")).cast("long")).alias(
            "n_correct"
        ),
    )


# --- C7: corpus bigram LM scoring -------------------------------------------


@query(
    "q_bigram_lm",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
    big AS (
      SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
               ELSE [toks[i] || ' ' || toks[i+1]
                     for i in generate_series(1, len(toks) - 1)] END) AS big
      FROM t),
    bg AS (SELECT doc_id, split_part(big, ' ', 1) AS w1, big FROM big),
    bc AS (SELECT doc_id, w1, big, count(*) AS c FROM bg GROUP BY ALL),
    corpus AS (SELECT big, CAST(sum(c) AS BIGINT) AS cb FROM bc GROUP BY big),
    hist AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw FROM bc GROUP BY w1),
    voc AS (SELECT count(DISTINCT w) AS v FROM (
              SELECT unnest(toks) AS w FROM t))
    SELECT bc.doc_id,
           CAST(sum(bc.c) AS BIGINT) AS n_bigrams,
           round(sum(bc.c * log10((corpus.cb + 1.0) / (hist.cw + voc.v)))
                 / sum(bc.c), 4) AS avg_logp
    FROM bc JOIN corpus USING (big) JOIN hist USING (w1) CROSS JOIN voc
    GROUP BY bc.doc_id
    """,
)
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram LM scoring (C7): q_unigram_lm's second-order
    sibling — train add-one-smoothed bigram probabilities
    P(w2 | w1) = (c(w1 w2)+1) / (c(w1 ·)+V) over the corpus, score each
    document by mean log10 conditional probability. The order-2 LM is
    what actually separates shuffled word salad from fluent text (the
    unigram model scores both identically), which is why perplexity
    filters run at least bigram order.

    Same 100 TB shape as C2: the (doc, bigram) counts are two hash
    aggregates with map-side partials; the bigram table and the
    first-word histogram are vocabulary-sized and BROADCAST onto the
    per-doc counts; V is one scalar. Bigrams build inside the array
    domain (zip_with over the token array and its shift — codegen, no
    Python), so the fact-side cost is one exchange keyed on doc_id."""
    from .functions.tokenize import toks_col

    t = load_table(spark, "documents", sf_dir).select(
        "doc_id", toks_col().alias("toks")
    )
    n1 = F.greatest(F.size("toks") - 1, F.lit(0))
    bg = t.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("toks", 1, n1),
                F.slice("toks", 2, n1),
                lambda a, b: F.struct(
                    a.alias("w1"), F.concat_ws(" ", a, b).alias("big")
                ),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.w1").alias("w1"), F.col("s.big").alias("big"))
    # ONE fact pass: bc feeds THREE consumers (the bigram table, the
    # first-word histogram, and the per-doc scoring join) — the
    # uncheckpointed plan re-ran the tokenize+explode+agg subtree for
    # each (4 parquet scans in plans/r11/q_bigram_lm_before.txt, no
    # exchange reuse; guide §5 localCheckpoint). Counts are exact
    # ints, so the re-aggregations are value-identical.
    bc = (
        bg.groupBy("doc_id", "w1", "big")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    corpus = bc.groupBy("big").agg(F.sum("c").cast("long").alias("cb"))
    hist = bc.groupBy("w1").agg(F.sum("c").cast("long").alias("cw"))
    # V = |corpus vocabulary|: countDistinct over the session doc-sketch
    # substrate's per-doc DISTINCT token arrays — the union of per-doc
    # distinct sets has exactly the corpus's distinct tokens, so the
    # value is identical to re-tokenizing the corpus (which the old
    # form did: a 4th full scan for one scalar).
    from .queries_text import _doc_sketch

    voc = (
        _doc_sketch(spark, sf_dir)
        .select(F.explode("toks").alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    scored = (
        bc.join(F.broadcast(corpus), "big")
        .join(F.broadcast(hist), "w1")
        .crossJoin(F.broadcast(voc))
    )
    logp = F.col("c") * F.log10(
        (F.col("cb") + 1.0) / (F.col("cw") + F.col("v"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.round(F.sum(logp) / F.sum("c"), 4).alias("avg_logp"),
    )


# --- C8: DSIR-style importance resampling --------------------------------------

_DSIR_K = 50  # resampled documents
_DSIR_A = 1103515245
_DSIR_M = 1048576


@query(
    "q_importance_resampling",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest({_SQL_TOKS}) AS w FROM documents),
    vocab AS (
      SELECT w,
             CAST(count(*) AS BIGINT) AS c_p,
             CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS c_t
      FROM tok GROUP BY 1),
    tot AS (
      SELECT CAST(sum(c_p) AS BIGINT) AS n_p,
             CAST(sum(c_t) AS BIGINT) AS n_t,
             CAST(count(*) AS BIGINT) AS v
      FROM vocab),
    llr AS (
      SELECT t.doc_id,
             round(sum(ln((vocab.c_t + 1) / CAST(tot.n_t + tot.v AS DOUBLE))
                       - ln((vocab.c_p + 1) / CAST(tot.n_p + tot.v AS DOUBLE))),
                   4) AS llr
      FROM tok t JOIN vocab ON vocab.w = t.w, tot
      GROUP BY 1),
    keyed AS (
      SELECT l.doc_id, d.lang, l.llr,
             round(l.llr - ln(-ln(
               ((l.doc_id % {_DSIR_M}) * {_DSIR_A} + 17) % {_DSIR_M} / 
                 CAST({_DSIR_M} AS DOUBLE) + 0.5 / {_DSIR_M})), 6) AS gumbel_key
      FROM llr l JOIN documents d USING (doc_id))
    SELECT CAST(row_number() OVER (ORDER BY gumbel_key DESC, doc_id) AS BIGINT)
             AS rank,
           doc_id, lang, llr, gumbel_key
    FROM keyed
    ORDER BY gumbel_key DESC, doc_id LIMIT {_DSIR_K}
    """,
)
def q_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling (C8, wave 37): score every
    document by the unigram log-likelihood ratio between a TARGET
    distribution (the English slice, standing in for "looks like the
    eval domain") and the full-corpus PROPOSAL — add-1 smoothed over
    the shared vocabulary — then draw a without-replacement sample of
    the top-{_DSIR_K} via seeded Gumbel-top-k (key = llr + Gumbel(LCG
    uniform)), the exp-weighted sampler Xie et al.'s DSIR uses to
    up-weight domain-relevant documents in a pretraining mix. A rand()
    Gumbel is unreplayable; the LCG form replays on any engine/retry
    (the L1/L8 discipline).

    Scale shape: BOTH language models come from ONE token aggregate
    (the target is a filtered count of the same pass — no second
    corpus scan); the per-document score is a token→vocab equi-join
    (broadcast-able vocabulary) plus a doc-keyed sum; the final cut is
    a TakeOrdered heap. ln is evaluated on identical double ratios on
    both engines; the Gumbel key rounds to 6dp with a doc_id
    tie-break."""
    docs = load_table(spark, "documents", sf_dir)
    # ONE token explode into a (doc, lang, word, count) rollup that is
    # eagerly checkpointed: the vocabulary LMs, the totals scalar AND
    # the per-doc llr join all read it — the un-checkpointed form
    # re-exploded the corpus three times (measured 4.8 s vs 2.2 s at
    # the 10x docs tier)
    dw = (
        docs.select("doc_id", "lang", F.explode(toks_col("text")).alias("w"))
        .groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint()
    )
    vocab = dw.groupBy("w").agg(
        F.sum("cnt").cast("long").alias("c_p"),
        F.sum(F.when(F.col("lang") == "en", F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("c_t"),
    )
    tot = vocab.agg(
        F.sum("c_p").cast("long").alias("n_p"),
        F.sum("c_t").cast("long").alias("n_t"),
        F.count(F.lit(1)).cast("long").alias("v"),
    ).collect()[0]
    n_p, n_t, v = tot["n_p"], tot["n_t"], tot["v"]
    term = F.log((F.col("c_t") + 1) / F.lit(float(n_t + v))) - F.log(
        (F.col("c_p") + 1) / F.lit(float(n_p + v))
    )
    llr = (
        dw.join(vocab, "w")
        .groupBy("doc_id")
        .agg(F.round(F.sum(term * F.col("cnt")), 4).alias("llr"))
    )
    u = (
        ((F.col("doc_id") % _DSIR_M) * _DSIR_A + 17) % _DSIR_M
    ) / F.lit(float(_DSIR_M)) + 0.5 / _DSIR_M
    keyed = llr.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        "llr",
        F.round(F.col("llr") - F.log(-F.log(u)), 6).alias("gumbel_key"),
    )
    w = Window.orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
    return (
        keyed.orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
        .limit(_DSIR_K)
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "doc_id",
            "lang",
            "llr",
            "gumbel_key",
        )
    )


# --- C9: staged dedup-cascade accounting ----------------------------------------


def _cascade_oracle() -> str:
    from .functions.text import N_BANDS
    from .queries_text import _sql_minhash_bands

    surv_docs = (
        "(SELECT d.doc_id, d.text FROM documents d "
        "WHERE d.doc_id IN (SELECT doc_id FROM surv)) sd"
    )
    band_union = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS bi, band{b} AS key FROM bandtbl"
        for b in range(N_BANDS)
    )
    return f"""
    WITH fp AS MATERIALIZED (
      SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
             CAST(min(doc_id) AS BIGINT) AS keep,
             CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1),
    surv AS MATERIALIZED (SELECT keep AS doc_id FROM fp),
    bandtbl AS MATERIALIZED (
      SELECT * FROM ({_sql_minhash_bands(surv_docs)})),
    bands AS MATERIALIZED (
      {band_union}),
    mn AS MATERIALIZED (
      SELECT bi, key, min(doc_id) AS mn FROM bands GROUP BY 1, 2),
    removed AS MATERIALIZED (
      SELECT DISTINCT bands.doc_id
      FROM bands JOIN mn USING (bi, key)
      WHERE bands.doc_id > mn.mn),
    s1 AS (
      SELECT 1 AS stage, 'exact' AS stage_name,
             CAST(sum(c) AS BIGINT) AS n_in,
             CAST(sum(c) - count(*) AS BIGINT) AS n_dropped,
             CAST(count(*) AS BIGINT) AS n_out
      FROM fp),
    s2 AS (
      SELECT 2 AS stage, 'minhash_lsh' AS stage_name,
             (SELECT CAST(count(*) AS BIGINT) FROM surv) AS n_in,
             (SELECT CAST(count(*) AS BIGINT) FROM removed) AS n_dropped,
             (SELECT CAST(count(*) AS BIGINT) FROM surv)
             - (SELECT CAST(count(*) AS BIGINT) FROM removed) AS n_out)
    SELECT * FROM s1 UNION ALL SELECT * FROM s2 ORDER BY stage
    """


@query("q_dedup_cascade", oracle=_cascade_oracle())
def q_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged dedup-cascade accounting (C9, wave 42): the production
    dedup pipeline is a FUNNEL — cheap exact hashing first, then
    near-dup sketching over the survivors — and what operators review
    is the per-stage drop report this query emits: (stage, n_in,
    n_dropped, n_out) for stage 1 (exact fingerprint collapse, X1's
    rule) and stage 2 (MinHash-LSH keep-min over the survivors, X2's
    banding). Composing the stages changes the numbers — stage 2's
    drops are counted AFTER exact collapse, which no single dedup
    query reports — and the keep-min convention makes the funnel
    deterministic.

    The stage-2 scale insight: keep-min near-dup removal needs NO pair
    enumeration at all — a doc is removed iff its id exceeds the
    minimum id of AT LEAST ONE of its 4 LSH buckets, so the whole
    stage is one bucket-keyed min-aggregate and one co-keyed join back
    (the pair space that even the banded X2 pipeline materializes
    never exists here). All counts are exact int64 on both engines
    (md5 fingerprints, integer minhash from shared constants).

    Shape: one in-row md5 pass over documents for stage 1; stage 2
    rides the session doc-sketch checkpoint (tokenize+hash once,
    shared with X2/X18), restricted to survivors by an id-keyed
    semi-join; the band explode is 4 rows per doc, checkpointed
    lazily because the bucket-min and membership passes both read it.
    Oracle materializes every multi-consumer CTE (the k-core
    lesson)."""
    from .functions.text import fingerprint, minhash_bands
    from .queries_text import _doc_sketch, _docs

    fp = (
        _docs(spark, sf_dir)
        .groupBy(fingerprint("text").alias("h"))
        .agg(
            F.min("doc_id").cast("long").alias("keep"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    surv = fp.select(F.col("keep").alias("doc_id"))
    sk = _doc_sketch(spark, sf_dir).join(surv, "doc_id", "left_semi")
    bands = (
        sk.select(
            "doc_id",
            F.posexplode(minhash_bands(F.col("sig"))).alias("bi", "key"),
        )
        .localCheckpoint(eager=False)
    )
    mn = bands.groupBy("bi", "key").agg(F.min("doc_id").alias("mn"))
    removed = (
        bands.join(mn, ["bi", "key"])
        .filter(F.col("doc_id") > F.col("mn"))
        .select("doc_id")
        .distinct()
    )
    s1 = fp.agg(
        F.lit(1).alias("stage"),
        F.lit("exact").alias("stage_name"),
        F.sum("c").cast("long").alias("n_in"),
        (F.sum("c") - F.count(F.lit(1))).cast("long").alias("n_dropped"),
        F.count(F.lit(1)).cast("long").alias("n_out"),
    )
    nsurv = fp.agg(F.count(F.lit(1)).cast("long").alias("ns"))
    nrem = removed.agg(F.count(F.lit(1)).cast("long").alias("nr"))
    s2 = (
        nsurv.crossJoin(F.broadcast(nrem))
        .select(
            F.lit(2).alias("stage"),
            F.lit("minhash_lsh").alias("stage_name"),
            F.col("ns").alias("n_in"),
            F.col("nr").alias("n_dropped"),
            (F.col("ns") - F.col("nr")).alias("n_out"),
        )
    )
    return s1.union(s2).orderBy("stage")
