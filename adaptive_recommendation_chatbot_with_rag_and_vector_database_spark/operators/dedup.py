"""Deduplication operators (SURVEY §2.11 X1/X2; BASELINE.json north
star). The reference's only dedup-shaped mechanism is its LRU cache
keyed on full chunk contents (/root/reference/AI.py:89-96) — exact
dedup by content identity. The scale generalizations below are the
standard LLM-corpus pipeline:

- ``exact_dedup``     — content-hash groupBy, keep min-id representative.
- ``minhash_near_dup``— MinHash signatures → banded LSH buckets →
  candidate pairs via bucket equi-join → exact Jaccard verification.
  Only bucket-colliding pairs are ever compared: the join is on a
  band-key string, shuffle-partitionable, never a cross product.
- ``simhash_near_dup``— Charikar simhash + byte-band blocking +
  Hamming-distance verification.
- ``jaccard_join``    — exact token-set Jaccard over blocked pairs
  (the verification primitive, also exposed directly).
- ``embedding_near_dup`` — cosine-threshold pairs over an embedding
  column (semantic near-dup).

All sketches are Catalyst expressions over md5-based portable hashes
(functions/text.py) — deterministic, UDF-free, oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    distinct_tokens,
    fingerprint,
    minhash_bands,
    minhash_signature,
    simhash,
    token_hashes,
)
from ..functions.vector import cosine_sim


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One representative row (min id) per normalized-content
    fingerprint: (content_hash, rep_id, n_copies)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias(f"rep_{id_col}"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _with_sketch(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = distinct_tokens(text_col)
    return df.select(
        F.col(id_col),
        toks.alias("toks"),
        token_hashes(toks).alias("tokh"),
    )


def minhash_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Candidate pairs (id_a < id_b) that collide in ≥1 LSH band.

    The band equi-join and the pair dedup run over bare (id_a, id_b)
    ints; the token arrays are attached afterwards by two id-keyed
    joins. On near-dup-heavy corpora a document pair collides in
    several bands, so deduping BEFORE attaching payload keeps the wide
    arrays out of both the join shuffle and the dropDuplicates
    exchange — on the sf0.1 corpus (≥4M colliding pairs) this is the
    difference between shuffling megabytes and gigabytes."""
    from ..sources.loaders import scatter

    sk = scatter(_with_sketch(df, id_col, text_col))
    bands = sk.select(
        id_col, minhash_bands(minhash_signature(F.col("tokh"))).alias("bands")
    )
    b = bands.select(id_col, F.posexplode("bands").alias("band", "key"))
    left = b.select(F.col(id_col).alias("id_a"), "band", "key")
    right = b.select(F.col(id_col).alias("id_b"), "band", "key")
    ids = (
        left.join(right, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    toks = sk.select(id_col, "toks")
    return ids.join(
        toks.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a")),
        "id_a",
    ).join(
        toks.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b")),
        "id_b",
    )


def _jaccard(toks_a, toks_b):
    inter = F.size(F.array_intersect(toks_a, toks_b)).cast("double")
    union = (F.size(toks_a) + F.size(toks_b)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_near_dup(
    df: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH candidates verified by exact Jaccard ≥ threshold:
    (id_a, id_b, jaccard)."""
    cand = minhash_candidates(df, id_col, text_col)
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(_jaccard(F.col("toks_a"), F.col("toks_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_values(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — 32-bit packed simhash per document."""
    sk = _with_sketch(df, id_col, text_col)
    return sk.select(id_col, simhash(F.col("tokh")).alias("simhash"))


def simhash_near_dup(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming, blocked
    on the 4 signature bytes (a pair within distance 3 must agree on at
    least one byte — pigeonhole over 4 blocks)."""
    sh = simhash_values(df, id_col, text_col)
    bytes_arr = F.array(
        *[
            F.shiftright(F.col("simhash"), 8 * i).bitwiseAND(F.lit(255))
            for i in range(4)
        ]
    )
    blocked = sh.select(
        id_col, "simhash", F.posexplode(bytes_arr).alias("block", "byte")
    )
    a = blocked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "block", "byte"
    )
    b = blocked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "block", "byte"
    )
    pairs = (
        a.join(b, ["block", "byte"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def jaccard_join(
    left: DataFrame,
    right: DataFrame,
    on,
    threshold: float = 0.0,
    id_left: str = "id_a",
    id_right: str = "id_b",
    toks_left: str = "toks_a",
    toks_right: str = "toks_b",
) -> DataFrame:
    """Exact token-set Jaccard over explicitly blocked pairs."""
    joined = left.join(right, on).filter(F.col(id_left) < F.col(id_right))
    return joined.select(
        id_left,
        id_right,
        F.round(_jaccard(F.col(toks_left), F.col(toks_right)), 6).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def passjoin_candidates(
    keys: DataFrame,
    t: int,
    probe_pred,
    id_col: str = "doc_id",
    block_col: str = "lang",
    sig_col: str = "sig",
    max_sig_len: int | None = None,
) -> DataFrame:
    """PassJoin segment blocking for edit-distance joins (Li/Deng/Feng,
    ICDE 2011): returns DISTINCT candidate pairs ``(id_a, id_b)`` with
    ``id_a < id_b``, ``id_a`` satisfying ``probe_pred``, guaranteed a
    SUPERSET of all same-block pairs within edit distance ``t`` — the
    caller verifies candidates with ``levenshtein(..., t)``.

    Pigeonhole soundness: partition the partner string into ``t+1``
    segments (even partition). An alignment with ≤ t edits can touch at
    most t segments, so at least one segment survives edit-free and
    appears VERBATIM in the probe, with its start shifted by at most t
    (net insertions−deletions before it). So: the partner side emits its
    t+1 segment substrings keyed on (block, gram); the probe side emits
    every substring whose length matches a plausible partner's segment
    length (partner length within ±t, segment lengths ⌊L/(t+1)⌋ …
    ⌈L/(t+1)⌉); the equi-join on (block, gram) plus the |Δposition| ≤ t
    and |Δlength| ≤ t filters yields the candidates. Partners shorter
    than t+1 chars (segments would be empty, the pigeonhole degenerates)
    go through a tiny length-filtered block join instead — such strings
    only pair within length ± t anyway.

    Scale shape: the shuffle key is the segment substring itself, so the
    candidate space is governed by actual gram co-occurrence — linear in
    corpus size on low-duplication corpora — instead of the O(|block|²)
    pair space of a block-nested-loop; the probe side emits
    O(t · sig_len) grams per row before any join. Candidate ids are
    deduplicated BARE (two ints) before the caller re-attaches payload,
    the same discipline as ``inverted_index_jaccard``."""
    nseg = t + 1
    k = keys.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        F.col(sig_col).alias("_sig"),
        F.length(sig_col).alias("_len"),
    )
    # partner side: t+1 even-partition segments of every string with
    # _len >= t+1 (segment i covers [i*(L div n) + min(i, L mod n), +len))
    segs = (
        k.filter(F.col("_len") >= nseg)
        .select(
            F.col("_id").alias("id_b"),
            "_blk",
            "_sig",
            F.col("_len").alias("_len_b"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, {t}), i -> named_struct("
                    f"'p', i * (_len div {nseg}) + least(i, _len % {nseg}), "
                    f"'l', (_len div {nseg}) + if(i < _len % {nseg}, 1, 0)))"
                )
            ).alias("_s"),
        )
        .select(
            "id_b",
            "_blk",
            "_len_b",
            F.col("_s.p").alias("_pb"),
            F.expr("substring(_sig, _s.p + 1, _s.l)").alias("_gram"),
        )
    )
    # probe side: all substrings whose length matches some partner
    # segment length for partner lengths in [max(t+1, M-t), M+t]
    ghi = F.col("_len") + F.lit(t)
    if max_sig_len is not None:
        ghi = F.least(ghi, F.lit(max_sig_len))
    pg = (
        k.filter(probe_pred(F.col("_id")))
        .withColumn("_glo", F.greatest(F.lit(nseg), F.col("_len") - F.lit(t)))
        .withColumn("_ghi", ghi)
        .withColumn("_lmin", F.expr(f"_glo div {nseg}"))
        .withColumn(
            "_lmax",
            F.least(F.expr(f"(_ghi + {nseg - 1}) div {nseg}"), F.col("_len")),
        )
        .filter(F.col("_lmax") >= F.col("_lmin"))
        .select(
            F.col("_id").alias("id_a"),
            "_blk",
            "_sig",
            F.col("_len").alias("_len_a"),
            F.explode(F.expr("sequence(_lmin, _lmax)")).alias("_gl"),
        )
        .select(
            "id_a",
            "_blk",
            "_len_a",
            "_gl",
            "_sig",
            F.explode(F.expr("sequence(0, _len_a - _gl)")).alias("_pa"),
        )
        .select(
            "id_a",
            "_blk",
            "_len_a",
            F.col("_pa"),
            F.expr("substring(_sig, _pa + 1, _gl)").alias("_gram"),
        )
    )
    long_cands = (
        pg.join(segs, ["_blk", "_gram"])
        .filter(
            (F.abs(F.col("_pa") - F.col("_pb")) <= t)
            & (F.abs(F.col("_len_a") - F.col("_len_b")) <= t)
            & (F.col("id_a") < F.col("id_b"))
        )
        .select("id_a", "id_b")
    )
    short_b = k.filter(F.col("_len") < nseg).select(
        F.col("_id").alias("id_b"), "_blk", F.col("_len").alias("_len_b")
    )
    short_cands = (
        k.filter(probe_pred(F.col("_id")))
        .select(F.col("_id").alias("id_a"), "_blk", F.col("_len").alias("_len_a"))
        .join(short_b, "_blk")
        .filter(
            (F.abs(F.col("_len_a") - F.col("_len_b")) <= t)
            & (F.col("id_a") < F.col("id_b"))
        )
        .select("id_a", "id_b")
    )
    return long_cands.unionByName(short_cands).distinct()


def _inverted_pair_counts(
    grams: DataFrame,
    id_col: str,
    block_col: str,
    grams_col: str,
    probe_pred,
    max_df: int | None,
) -> DataFrame:
    """Shared candidate-pair substrate for the inverted-index set
    similarities: explode grams, equi-join on (block, gram) so ONLY
    pairs sharing ≥1 gram ever materialize, count shared grams per
    pair. Returns (id_a, id_b, _sz_a, _sz_b, _inter) with id_a < id_b.
    See ``inverted_index_jaccard`` for the max_df / probe_pred
    semantics."""
    sized = grams.select(
        F.col(id_col),
        F.col(block_col).alias("_blk"),
        F.col(grams_col).alias("_grams"),
        F.size(grams_col).alias("_sz"),
    )
    ex = sized.select(id_col, "_blk", "_sz", F.explode("_grams").alias("_gram"))
    if max_df is not None:
        df_counts = ex.groupBy("_blk", "_gram").agg(F.count(F.lit(1)).alias("_df"))
        ex = ex.join(
            df_counts.filter(F.col("_df") <= max_df).drop("_df"), ["_blk", "_gram"]
        )
    a = ex.select(
        F.col(id_col).alias("id_a"), "_blk", "_gram", F.col("_sz").alias("_sz_a")
    )
    if probe_pred is not None:
        a = a.filter(probe_pred(F.col("id_a")))
    b = ex.select(
        F.col(id_col).alias("id_b"), "_blk", "_gram", F.col("_sz").alias("_sz_b")
    )
    return (
        a.join(b, ["_blk", "_gram"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "_sz_a", "_sz_b")
        .agg(F.count(F.lit(1)).cast("double").alias("_inter"))
    )


def inverted_index_jaccard(
    grams: DataFrame,
    id_col: str = "doc_id",
    block_col: str = "lang",
    grams_col: str = "bigrams",
    probe_pred=None,
    threshold: float = 0.0,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-set Jaccard via an inverted index: explode grams,
    equi-join on (block, gram) so ONLY pairs sharing ≥1 gram ever
    materialize, count shared grams per pair, derive Jaccard from set
    sizes. Compared to blocked-pair + array_intersect this replaces an
    O(|block|²) pair space with one scaled by actual co-occurrence, and
    the shuffle key is the gram itself — partitionable at corpus scale.

    ``max_df`` (document frequency cap) drops grams occurring in more
    than that many documents before the self-join: the standard
    stop-shingle guard against skewed join keys at 100 TB. None = exact
    (no gram dropped); results then match the naive definition exactly.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    inter = _inverted_pair_counts(
        grams, id_col, block_col, grams_col, probe_pred, max_df
    )
    jac = F.round(
        F.col("_inter")
        / (F.col("_sz_a") + F.col("_sz_b") - F.col("_inter")).cast("double"),
        6,
    )
    return (
        inter.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def inverted_index_overlap(
    grams: DataFrame,
    id_col: str = "doc_id",
    block_col: str = "lang",
    grams_col: str = "bigrams",
    probe_pred=None,
    threshold: float = 0.0,
    max_df: int | None = None,
) -> DataFrame:
    """Overlap coefficient (asymmetric-containment dedup, X19):
    ``|A ∩ B| / min(|A|, |B|)`` over the same inverted-index candidate
    substrate as ``inverted_index_jaccard``. The min-size denominator is
    the subset-detection form: a short document wholly contained in a
    longer one scores 1.0 where Jaccard dilutes toward |A|/|B| — the
    screen that catches quote-expansion and boilerplate-wrapped copies
    in an LLM corpus (the case MinHash/Jaccard near-dup structurally
    under-scores).

    Returns (id_a, id_b, containment) with id_a < id_b,
    containment ≥ threshold. Same scale posture as the Jaccard form:
    pair space bounded by gram co-occurrence, gram-keyed shuffle,
    optional ``max_df`` stop-shingle cap.
    """
    inter = _inverted_pair_counts(
        grams, id_col, block_col, grams_col, probe_pred, max_df
    )
    ov = F.round(
        F.col("_inter") / F.least("_sz_a", "_sz_b").cast("double"), 6
    )
    return (
        inter.select("id_a", "id_b", ov.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_filter: str | None = None,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Semantic near-dup: pairs with cosine ≥ threshold. ``probe_filter``
    (SQL predicate on the left side) bounds the pair space; at scale the
    real pre-filter is an ANN bucketing (operators/similarity.py).

    With no ``probe_filter`` the pair space is the full n² cross — an
    escape hatch for small corpora only, so it must be requested
    EXPLICITLY with ``allow_all_pairs=True``. Raising here (rather than
    silently planning an all-pairs join) is the guard-rail that keeps a
    100 TB caller from launching a quadratic job by forgetting one
    argument; scale users go through LSH/IVF bucketing instead."""
    from ..sources.loaders import scatter

    if probe_filter is None and not allow_all_pairs:
        raise ValueError(
            "embedding_near_dup without probe_filter is an all-pairs "
            "cross join; pass allow_all_pairs=True for small corpora, "
            "or pre-bucket with operators/similarity.py (LSH/IVF) at scale"
        )
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")
    )
    if probe_filter:
        # Bounded probe side → broadcast is safe and avoids shuffling
        # the streamed side entirely.
        a = F.broadcast(a.filter(F.expr(probe_filter.replace(id_col, "id_a"))))
    # else: a is the ENTIRE vector table — forcing a broadcast there
    # risks driver/executor OOM at exactly the corpus scale this
    # operator targets; leave the join strategy to the planner/AQE.
    # scatter the full (right) side: pair scoring parallelizes over it
    b = scatter(
        df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    )
    return (
        b.crossJoin(a)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_sim(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph: the
    clustering step of a corpus dedup pipeline (pairs → clusters →
    keep one representative per cluster). Generalizes the reference's
    content-identity dedup (/root/reference/AI.py:89-96) to transitive
    near-identity.

    Algorithm: iterative min-label propagation. Each round every vertex
    takes the min component id over itself and its neighbors — one
    equi-join (labels ⋈ edges on vertex id) plus one groupBy-min per
    round, both shuffle-partitioned on the vertex id, so successive
    rounds reuse the same hash partitioning. Converges in O(graph
    diameter) rounds; LSH near-dup graphs are unions of near-cliques
    (diameter ≤ ~2), so 3-4 rounds in practice. ``localCheckpoint``
    truncates lineage each round — without it the plan doubles per
    iteration and the driver, not the data, becomes the bottleneck.
    For adversarial long-chain graphs at 100 TB use
    ``connected_components_alternating`` (large-star/small-star,
    O(log² n) rounds); the propagation loop below is the right default
    for dedup-shaped graphs.

    Returns (id_col, component, keep): component = min reachable id,
    keep = this row is the cluster representative.
    """
    # Materialize the symmetric edge list once: every propagation round
    # joins it, and each round also runs a convergence-count action —
    # without the checkpoint the (potentially expensive) upstream pair
    # pipeline would re-execute twice per round. No distinct: the
    # groupBy-min absorbs duplicate edges for free, so deduping would
    # only add a full edge shuffle.
    pairs = edges.select(F.col(src).alias("_v"), F.col(dst).alias("_n"))
    sym = pairs.union(
        pairs.select(F.col("_n").alias("_v"), F.col("_v").alias("_n"))
    ).localCheckpoint(eager=True)
    labels = vertices.select(
        F.col(id_col).alias("_v"), F.col(id_col).alias("_comp")
    ).localCheckpoint(eager=False)
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            labels.join(sym, "_v")
            .groupBy(F.col("_n").alias("_v"))
            .agg(F.min("_comp").alias("_ncomp"))
        )
        # Carry a changed flag through the checkpoint: the convergence
        # test is then a filter-count over already-materialized rows,
        # not another labels ⋈ labels join per round.
        new_comp = F.least(F.col("_comp"), F.coalesce("_ncomp", "_comp"))
        stepped = (
            labels.join(neighbor_min, "_v", "left")
            .select(
                "_v",
                new_comp.alias("_new"),
                (new_comp < F.col("_comp")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        labels = stepped.select("_v", F.col("_new").alias("_comp"))
        if stepped.filter("_chg").count() == 0:
            converged = True
            break
    if not converged:
        # Unconverged propagation returns WRONG labels (some vertices
        # still carry a non-minimal component id) — never silently.
        import warnings

        warnings.warn(
            f"connected_components: max_iter={max_iter} exhausted without "
            "convergence; returned labels may be non-minimal. Raise "
            "max_iter or use connected_components_alternating "
            "(O(log^2 n) rounds) for long-chain graphs.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(
        F.col("_v").alias(id_col),
        F.col("_comp").alias("component"),
        (F.col("_v") == F.col("_comp")).alias("keep"),
    )


def dedup_pipeline(
    docs: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full corpus dedup at production shape: exact-collapse first
    (content-hash groupBy → min-id representative), THEN near-dup
    connected components over representatives only, then expand the
    component assignment back over all rows.

    Semantics-preserving relative to running CC over the full near-dup
    graph: identical content ⇒ identical token set ⇒ Jaccard 1 and
    identical MinHash bands, so each exact-dup group is a clique whose
    cross-group connectivity is exactly its representative's, and the
    min-id component of a cluster equals the min over its group
    representatives. The point is cost: web-scale corpora are
    duplicate-heavy, and the verified pair list within an exact-dup
    clique is quadratic in clique size — collapsing first removes that
    term entirely (measured: the 90 %-duplicate 10× smoke corpus drops
    from ~50 k docs to ~5 k reps before any pair is enumerated).

    Returns (id_col, component, keep) over ALL input rows.
    """
    groups = docs.select(F.col(id_col), fingerprint(text_col).alias("_fp"))
    reps = groups.groupBy("_fp").agg(F.min(id_col).alias("_rep"))
    mapping = groups.join(reps, "_fp").select(id_col, "_rep")
    rep_docs = docs.join(
        reps.select(F.col("_rep").alias(id_col)), id_col, "left_semi"
    )
    edges = minhash_near_dup(rep_docs, threshold, id_col, text_col)
    cc = connected_components(edges, rep_docs, id_col=id_col)
    return (
        mapping.join(
            cc.select(F.col(id_col).alias("_rep"), "component"), "_rep"
        )
        .select(
            id_col,
            "component",
            (F.col(id_col) == F.col("component")).alias("keep"),
        )
    )


def connected_components_alternating(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", public algorithm): converges in O(log² n) rounds on ANY
    graph, including long chains where min-label propagation
    (``connected_components``) needs O(diameter) rounds. Use this
    variant when the pair graph may contain adversarially long paths;
    for LSH near-dup graphs (near-cliques) the propagation loop wins on
    constant factors.

    Both star operations are expressed as groupBy-min + equi-join —
    never a collect_list of neighbors, so a hot node's neighborhood is
    streamed through the aggregate rather than materialized (the skew
    case the algorithm exists to handle). Each round's edge set is
    deduped and localCheckpoint'ed; convergence = edge set stable
    (count + two independent checksums).

    Returns (id_col, component, keep) — identical contract to
    ``connected_components``.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def stats(df: DataFrame):
        r = df.agg(
            F.count(F.lit(1)),
            F.sum(F.col("u") * F.lit(1000003) + F.col("v")),
            F.sum(F.col("u") + F.col("v") * F.lit(999983)),
        ).collect()[0]
        return tuple(r)

    prev = stats(e)
    converged = False
    for _ in range(max_iter):
        # large-star: every neighbor v > u links to min(Γ(u) ∪ {u})
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mv"))
        m = F.least(F.col("u"), F.col("_mv"))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("_u"), m.alias("_v"))
            .filter(F.col("_u") != F.col("_v"))
            .select(
                F.greatest("_u", "_v").alias("u"), F.least("_u", "_v").alias("v")
            )
            .distinct()
        )
        # small-star: key each edge on its larger endpoint; all smaller
        # neighbors (and the key itself) link to the smallest
        mins2 = ls.groupBy("u").agg(F.min("v").alias("_m"))
        relink = (
            ls.join(mins2, "u")
            .filter(F.col("v") != F.col("_m"))
            .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        )
        keyed = mins2.select("u", F.col("_m").alias("v"))
        e = (
            relink.union(keyed)
            .filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = stats(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # A non-star residual edge set makes the left join below emit
        # duplicate rows per vertex — surface it instead of silently
        # returning a malformed labeling.
        import warnings

        warnings.warn(
            f"connected_components_alternating: max_iter={max_iter} "
            "exhausted without edge-set convergence; labels may be "
            "duplicated/non-minimal. Raise max_iter.",
            RuntimeWarning,
            stacklevel=2,
        )
    # converged edge set is a star per component: (member, component-min)
    labels = (
        vertices.select(F.col(id_col).alias("_v"))
        .join(
            e.select(F.col("u").alias("_v"), F.col("v").alias("_c")), "_v", "left"
        )
        .select("_v", F.coalesce("_c", F.col("_v")).alias("_comp"))
    )
    return labels.select(
        F.col("_v").alias(id_col),
        F.col("_comp").alias("component"),
        (F.col("_v") == F.col("_comp")).alias("keep"),
    )
