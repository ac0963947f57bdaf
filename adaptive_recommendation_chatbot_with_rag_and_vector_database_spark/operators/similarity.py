"""Approximate nearest-neighbor search (SURVEY §2.3 J2 scale path;
BASELINE.json north star "similarity search").

The reference delegates ANN to a serverless vector index
(/root/reference/AI.py:49-55). The Spark-native equivalents here trade
the O(N·Q) brute-force cross product for bucketed equi-joins — the only
join shape that survives a 100 TB index:

- ``lsh_knn``: sign-random-projection LSH (Charikar 2002, the cosine
  LSH family). ``n_planes`` hyperplanes → per-vector bit signature →
  banded into ``n_bands`` codes. Probe and index rows meet on
  ``(band, code)`` — a plain shuffle-hash/broadcast equi-join on a
  low-cardinality key — then candidates are exactly re-ranked. Recall
  tunes with bands/planes (more bands → higher recall, more
  candidates).
- ``ivf_knn``: inverted-file index (IVF-Flat, à la Faiss). Centroids
  are trained driver-side on a bounded sample (classic IVF practice —
  the codebook is tiny and static) and shipped in a UDF closure.
  Probing ``nprobe`` of ``n_cells`` cells scans ~nprobe/n_cells of the
  index.

Both are deterministic (fixed seed → fixed planes/centroids). Signature
and cell assignment are Arrow-batched numpy matrix multiplies (dense
vector math is the one place a vectorized kernel beats interpreted
Catalyst folds by ~100×); candidate re-ranking stays JVM-side so exact
and approximate paths score identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vector import cosine_sim

SEED = 42


def _band_codes_udf(planes: np.ndarray, n_bands: int):
    """Arrow-batched band codes: one (batch × dim) @ (dim × planes)
    matrix multiply per batch, sign bits packed into per-band integer
    codes. The codebook rides to executors inside the UDF closure (it
    is tiny and static — the broadcast-variable shape). A per-plane
    Catalyst expression would evaluate an interpreted fold per plane
    per row; the numpy kernel is two orders of magnitude faster."""
    n_planes = planes.shape[0]
    per_band = n_planes // n_bands
    weights = (2 ** np.arange(per_band - 1, -1, -1)).astype(np.int64)
    pl = planes.T.copy()  # dim × n_planes

    @F.pandas_udf(T.ArrayType(T.IntegerType(), containsNull=False))
    def codes(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # batch × dim
        bits = (mat.astype(np.float64) @ pl >= 0).astype(np.int64)
        banded = bits.reshape(len(mat), n_bands, per_band) @ weights
        return pd.Series(list(banded.astype(np.int32)))

    return codes


def _nearest_cells_udf(centroids: np.ndarray, n: int):
    """Arrow-batched IVF cell assignment: cosine scores against the
    broadcast codebook in one matrix multiply, stable argsort (ties →
    lower cell id), top-``n`` cell ids per vector."""
    cb = centroids.T.copy()  # dim × n_cells

    @F.pandas_udf(T.ArrayType(T.IntegerType(), containsNull=False))
    def cells(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        sims = mat @ cb
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n]
        return pd.Series(list(order.astype(np.int32)))

    return cells


def _round6_duck(x: np.ndarray) -> np.ndarray:
    """Vectorized twin of ranking._round6: DuckDB ``round(x, 6)``
    semantics (half away from zero) on binary doubles."""
    return np.where(
        x >= 0,
        np.floor(x * 1e6 + 0.5) / 1e6,
        np.ceil(x * 1e6 - 0.5) / 1e6,
    )


def maxsim_label_partials(emb: DataFrame, probes: list) -> DataFrame:
    """Per-partition MaxSim partials for late-interaction scoring:
    returns ``(label, query_id, ms)`` where ``ms`` is the partition's
    max round-6 cosine between any of its label-``label`` vectors and
    probe ``query_id``; a global ``groupBy(label, query_id).max`` then
    yields the exact per-group MaxSim.

    ``probes`` is ``[(query_id, vector), ...]`` — query-token
    embeddings, bounded by construction (the same smallness assumption
    a broadcast join makes), riding to executors in the UDF closure.

    The kernel accumulates dot products and squared norms dimension by
    dimension in strict index order over float64 — the SAME floating
    additions, in the SAME order, as the Catalyst
    ``aggregate(zip_with(...))`` fold, so scores are bit-identical to
    the relational form while one numpy pass replaces per-pair array
    allocation. Partial max happens INSIDE the UDF, so the exchange
    carries at most |labels| × |probes| rows per partition — never the
    |rows| × |probes| pair space. At 8 M pairs this measured 10× over
    the crossJoin+HOF plan; at 100 TB the pair space never
    materializes at all."""
    qids = np.array([q for q, _ in probes], dtype=np.int64)
    P = np.array([list(v) for _, v in probes], dtype=np.float64)
    n_q, dim = P.shape if P.size else (0, 0)
    pn2 = np.zeros(n_q)
    for i in range(dim):
        pn2 = pn2 + P[:, i] * P[:, i]
    pn = np.sqrt(pn2)

    def part(batches):
        best: dict[int, np.ndarray] = {}
        for pdf in batches:
            if len(pdf) == 0 or n_q == 0:
                continue
            A = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            labels = pdf["label"].to_numpy()
            n, d = A.shape
            acc = np.zeros((n, n_q))
            an2 = np.zeros(n)
            for i in range(d):
                acc += np.outer(A[:, i], P[:, i])
                an2 = an2 + A[:, i] * A[:, i]
            denom = np.sqrt(an2)[:, None] * pn[None, :]
            s = _round6_duck(
                np.where(denom > 0.0, acc / np.where(denom > 0.0, denom, 1.0), 0.0)
            )
            for lab in np.unique(labels):
                m = s[labels == lab].max(axis=0)
                best[lab] = np.maximum(best[lab], m) if lab in best else m
        if best:
            labs = sorted(best)
            yield pd.DataFrame(
                {
                    "label": np.repeat(np.array(labs, dtype=np.int32), n_q),
                    "query_id": np.tile(qids, len(labs)),
                    "ms": np.concatenate([best[lab] for lab in labs]),
                }
            )

    return emb.select("label", "embedding").mapInPandas(
        part, "label int, query_id long, ms double"
    )


def lsh_knn(
    probes: DataFrame,
    index: DataFrame,
    k: int = 4,
    dim: int = 64,
    n_planes: int = 16,
    n_bands: int = 8,
    query_id: str = "query_id",
    query_vec: str = "qvec",
    index_id: str = "vec_id",
    index_vec: str = "embedding",
) -> DataFrame:
    """Approximate kNN via banded cosine LSH; returns
    (query_id, vec_id, score, rnk) with rnk <= k per probe. Pairs that
    share no band bucket are never scored — that is the approximation."""
    from ..sources.loaders import scatter

    rng = np.random.RandomState(SEED)
    planes = rng.normal(size=(n_planes, dim))

    codes = _band_codes_udf(planes, n_bands)
    index = scatter(index)  # signature computation at full parallelism
    idx_b = index.select(
        F.col(index_id),
        F.col(index_vec),
        F.posexplode(codes(F.col(index_vec))).alias("band", "code"),
    )
    prb_b = probes.select(
        F.col(query_id),
        F.col(query_vec),
        F.posexplode(codes(F.col(query_vec))).alias("band", "code"),
    )
    cand = (
        idx_b.join(F.broadcast(prb_b), ["band", "code"])
        .filter(F.col(index_id) != F.col(query_id))
        .select(query_id, index_id, query_vec, index_vec)
        .dropDuplicates([query_id, index_id])
    )
    scored = cand.select(
        query_id,
        index_id,
        F.round(cosine_sim(F.col(index_vec), F.col(query_vec)), 6).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(index_id))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


# Trained codebooks memoized per (cache_key, n_cells, sample_rows,
# iters): an IVF codebook is a STATIC index artifact — real deployments
# train it once at index-build time and persist it alongside the index
# (write_ivf_index does exactly that via the partition layout). Within a
# session, repeated probes against the same corpus must not re-run the
# KMeans fit. Keyed only when the caller passes a stable corpus
# identity (e.g. the sf_dir); anonymous DataFrames never memoize.
_CODEBOOKS: dict[tuple, np.ndarray] = {}


def train_centroids_sample(
    index: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    iters: int = 10,
    cache_key: str | None = None,
) -> np.ndarray:
    """IVF codebook training as a distributed MLlib ``KMeans`` fit on a
    bounded DataFrame sample — the driver never touches vector data;
    only the tiny static (n_cells × dim) codebook comes back, which is
    exactly the payload the assignment UDFs ship out anyway.

    Determinism: fixed seed, ``limit(sample_rows)`` over the scan's
    stable order, and centroids L2-normalized then lexicographically
    sorted so cell ids don't depend on MLlib's internal cluster
    ordering (the cell-partitioned index layout must be reproducible
    across builds — see ``write_ivf_index``)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    key = None
    if cache_key is not None:
        key = (cache_key, n_cells, sample_rows, iters, vec_col)
        cached = _CODEBOOKS.get(key)
        if cached is not None:
            return cached

    sample = index.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    ).limit(sample_rows)
    # KMeans re-scans its input EVERY iteration; without the persist the
    # limit+cast+to-vector pipeline re-executes ``iters`` times.
    sample = sample.persist()
    try:
        model = KMeans(k=n_cells, maxIter=iters, seed=SEED).fit(sample)
    finally:
        sample.unpersist()
    centroids = np.array(model.clusterCenters(), dtype=np.float64)
    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    centroids = centroids / np.where(norms > 0, norms, 1.0)
    # lexicographic sort over components → stable, order-free cell ids
    out = centroids[np.lexsort(centroids.T[::-1])]
    if key is not None:
        _CODEBOOKS[key] = out
    return out


def write_ivf_index(
    index: DataFrame,
    path: str,
    centroids: np.ndarray,
    index_id: str = "vec_id",
    index_vec: str = "embedding",
) -> None:
    """Persist the index PARTITIONED BY its IVF cell — the 100 TB
    layout: a probe touching ``nprobe`` of ``n_cells`` cells then reads
    only those partition directories (PartitionFilters at the scan; see
    ``ivf_knn_pruned``), so query cost scales with nprobe/n_cells of
    the index instead of a full scan."""
    from ..sources.loaders import scatter

    assign = _nearest_cells_udf(centroids, 1)
    (
        scatter(index)
        .select(
            F.col(index_id),
            F.col(index_vec),
            assign(F.col(index_vec))[0].alias("cell"),
        )
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_knn_pruned(
    spark,
    path: str,
    probes: DataFrame,
    centroids: np.ndarray,
    k: int = 4,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "qvec",
    index_id: str = "vec_id",
    index_vec: str = "embedding",
) -> DataFrame:
    """IVF probe over a cell-partitioned index with STATIC partition
    pruning: the probe set is small by definition, so its ``nprobe``
    cells are resolved driver-side and pushed as a partition filter —
    the scan never opens a non-probed cell's files. Same candidate
    semantics as ``ivf_knn``."""
    assignp = _nearest_cells_udf(centroids, nprobe)
    prb_c = probes.select(
        F.col(query_id),
        F.col(query_vec),
        F.explode(assignp(F.col(query_vec))).alias("cell"),
    )
    probed_cells = sorted(
        {r.cell for r in prb_c.select("cell").distinct().collect()}
    )
    idx = spark.read.parquet(path).filter(F.col("cell").isin(probed_cells))
    cand = (
        idx.join(F.broadcast(prb_c), "cell")
        .filter(F.col(index_id) != F.col(query_id))
        .select(query_id, index_id, query_vec, index_vec)
    )
    scored = cand.select(
        query_id,
        index_id,
        F.round(cosine_sim(F.col(index_vec), F.col(query_vec)), 6).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(index_id))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def ivf_knn_batch(
    probes: DataFrame,
    index: DataFrame,
    k: int = 4,
    n_cells: int = 16,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "qvec",
    index_id: str = "vec_id",
    index_vec: str = "embedding",
    centroids: np.ndarray | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """IVF-Flat kNN for LARGE probe batches — identical candidate
    semantics to ``ivf_knn``, different physical shape. ``ivf_knn``
    broadcasts the probe set into the cell join (right for a handful of
    interactive queries); at batch-join scale (say 10⁷ probes against a
    10⁹-row index) the probe side no longer fits a broadcast and the
    driver must not collect anything probe-sized. Here BOTH sides are
    cell-assigned by the same Arrow-batched codebook kernel and meet in
    a plain shuffle equi-join on ``cell`` (AQE picks the physical
    join; nothing is pinned).

    The post-join pair space is then cut in TWO stages so the pair
    space is never shuffled twice: (1) per-(query, cell) top-k via a
    window over ``(query_id, cell)`` — the join output is already
    hash-partitioned on ``cell``, which satisfies the clustered
    distribution on ``(query_id, cell)``, so this step adds NO
    exchange; (2) the ≤ k·nprobe survivors per query take the final
    per-query top-k, a shuffle of k·nprobe rows per probe instead of
    the full candidate space. Exactly the map-side-combine discipline
    a 100 TB batch join needs."""
    from ..sources.loaders import scatter

    if centroids is None:
        centroids = train_centroids_sample(
            index, n_cells, index_vec, cache_key=cache_key
        )

    assign1 = _nearest_cells_udf(centroids, 1)
    assignp = _nearest_cells_udf(centroids, nprobe)
    idx_c = scatter(index).select(
        F.col(index_id),
        F.col(index_vec),
        assign1(F.col(index_vec))[0].alias("cell"),
    )
    prb_c = scatter(probes).select(
        F.col(query_id),
        F.col(query_vec),
        F.explode(assignp(F.col(query_vec))).alias("cell"),
    )
    scored = (
        idx_c.join(prb_c, "cell")
        .filter(F.col(index_id) != F.col(query_id))
        .select(
            "cell",
            query_id,
            index_id,
            F.round(cosine_sim(F.col(index_vec), F.col(query_vec)), 6).alias(
                "score"
            ),
        )
    )
    wc = Window.partitionBy(query_id, "cell").orderBy(
        F.desc("score"), F.asc(index_id)
    )
    survivors = (
        scored.withColumn("crnk", F.row_number().over(wc))
        .filter(F.col("crnk") <= k)
        .drop("crnk", "cell")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(index_id))
    return (
        survivors.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        # a probe's nprobe cells can hand the window duplicate
        # (query, index) pairs only if an index row were assigned to
        # two cells — assign1 gives exactly one cell per index row, so
        # candidates are unique by construction (same as ivf_knn)
    )


def ivf_knn(
    probes: DataFrame,
    index: DataFrame,
    k: int = 4,
    n_cells: int = 16,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "qvec",
    index_id: str = "vec_id",
    index_vec: str = "embedding",
    centroids: np.ndarray | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """IVF-Flat approximate kNN: assign index rows to their nearest
    centroid cell, probe the ``nprobe`` nearest cells per query, exact
    re-rank within candidates. At scale the index side would be written
    partitioned by ``cell`` so probing prunes partitions at the scan.
    ``cache_key`` (a stable corpus identity like the data dir) memoizes
    the trained codebook across calls — train-once-probe-many."""
    from ..sources.loaders import scatter

    if centroids is None:
        # train BEFORE scattering: sample order stays scan-deterministic
        centroids = train_centroids_sample(
            index, n_cells, index_vec, cache_key=cache_key
        )

    assign1 = _nearest_cells_udf(centroids, 1)
    assignp = _nearest_cells_udf(centroids, nprobe)
    idx_c = scatter(index).select(
        F.col(index_id),
        F.col(index_vec),
        assign1(F.col(index_vec))[0].alias("cell"),
    )
    prb_c = probes.select(
        F.col(query_id),
        F.col(query_vec),
        F.explode(assignp(F.col(query_vec))).alias("cell"),
    )
    cand = (
        idx_c.join(F.broadcast(prb_c), "cell")
        .filter(F.col(index_id) != F.col(query_id))
        .select(query_id, index_id, query_vec, index_vec)
    )
    scored = cand.select(
        query_id,
        index_id,
        F.round(cosine_sim(F.col(index_vec), F.col(query_vec)), 6).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(index_id))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def brute_topk_partials(
    emb: DataFrame,
    probes: list,
    k: int,
    dims: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Per-partition exact-kNN partials at multiple embedding-prefix
    truncations: returns ``(trunc_dim, query_id, vec_id, score)`` rows
    holding each Arrow batch's top-k candidates per (probe, truncation);
    a global per-(trunc_dim, query_id) window then yields the exact
    top-k. The ``maxsim_label_partials`` discipline generalized from
    max-reduction to top-k-reduction: scoring stays in one numpy pass,
    the reduction happens INSIDE the UDF, and the exchange carries at
    most |dims|·|probes|·k rows per batch — never the |rows| × |probes|
    pair space.

    Prefix truncations share work: dot products and squared norms
    accumulate dimension by dimension in strict index order over
    float64 (bit-identical to the Catalyst ``aggregate(zip_with(...))``
    fold and to ``_round6_duck`` rounding), and each requested dim
    snapshots the running accumulator — scoring 16+32+64 dims costs one
    64-dim pass, not three.

    ``probes`` is ``[(query_id, vector), ...]``, bounded by construction
    (the broadcast-smallness assumption, same as the centroid /
    hyperplane closures)."""
    qids = np.array([q for q, _ in probes], dtype=np.int64)
    P = np.array([list(v) for _, v in probes], dtype=np.float64)
    n_q = P.shape[0] if P.size else 0
    dims_sorted = sorted(dims)
    pn: dict[int, np.ndarray] = {}
    pn2 = np.zeros(n_q)
    j = 0
    for d in dims_sorted:
        while j < d:
            pn2 = pn2 + P[:, j] * P[:, j]
            j += 1
        pn[d] = np.sqrt(pn2.copy())

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0 or n_q == 0:
                continue
            A = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy().astype(np.int64)
            n = A.shape[0]
            acc = np.zeros((n, n_q))
            an2 = np.zeros(n)
            out_d, out_q, out_v, out_s = [], [], [], []
            j = 0
            for d in dims_sorted:
                while j < d:
                    acc += np.outer(A[:, j], P[:, j])
                    an2 = an2 + A[:, j] * A[:, j]
                    j += 1
                denom = np.sqrt(an2)[:, None] * pn[d][None, :]
                s = _round6_duck(
                    np.where(
                        denom > 0.0, acc / np.where(denom > 0.0, denom, 1.0), 0.0
                    )
                )
                for qi in range(n_q):
                    col = s[:, qi]
                    mask = (
                        ids != qids[qi]
                        if exclude_self
                        else np.ones(n, dtype=bool)
                    )
                    cand_ids = ids[mask]
                    cand_s = col[mask]
                    if cand_ids.size == 0:
                        continue
                    # (score desc, vec_id asc) — lexsort keys are
                    # last-key-primary
                    order = np.lexsort((cand_ids, -cand_s))[:k]
                    out_d.extend([d] * len(order))
                    out_q.extend([qids[qi]] * len(order))
                    out_v.extend(cand_ids[order])
                    out_s.extend(cand_s[order])
            if out_d:
                yield pd.DataFrame(
                    {
                        "trunc_dim": np.array(out_d, dtype=np.int32),
                        "query_id": np.array(out_q, dtype=np.int64),
                        "vec_id": np.array(out_v, dtype=np.int64),
                        "score": np.array(out_s, dtype=np.float64),
                    }
                )

    return emb.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
    ).mapInPandas(
        part, "trunc_dim int, query_id long, vec_id long, score double"
    )
