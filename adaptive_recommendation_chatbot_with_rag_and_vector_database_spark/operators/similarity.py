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
  the codebook is tiny and static), broadcast as literals; assignment
  and probing are pure Catalyst expressions. Probing ``nprobe`` of
  ``n_cells`` cells scans ~nprobe/n_cells of the index.

Both are deterministic (fixed seed → fixed planes/centroids) and keep
every per-row computation JVM-side; numpy appears only at codebook
training time on the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_sim

SEED = 42


def _dot_lit(vec_col, plane: np.ndarray):
    lit = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _band_codes(vec_col, planes: np.ndarray, n_bands: int):
    """Bit signature from hyperplane signs, packed into per-band codes."""
    n_planes = planes.shape[0]
    per_band = n_planes // n_bands
    bits = [(_dot_lit(vec_col, planes[i]) >= 0).cast("int") for i in range(n_planes)]
    codes = []
    for b in range(n_bands):
        code = F.lit(0)
        for j in range(per_band):
            code = code * 2 + bits[b * per_band + j]
        codes.append(code)
    return F.array(*codes)


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

    index = scatter(index)  # signature computation at full parallelism
    idx_b = index.select(
        F.col(index_id),
        F.col(index_vec),
        F.posexplode(_band_codes(F.col(index_vec), planes, n_bands)).alias(
            "band", "code"
        ),
    )
    prb_b = probes.select(
        F.col(query_id),
        F.col(query_vec),
        F.posexplode(_band_codes(F.col(query_vec), planes, n_bands)).alias(
            "band", "code"
        ),
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


def train_centroids_sample(
    index: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    sample_rows: int = 4096,
    iters: int = 10,
) -> np.ndarray:
    """Driver-side Lloyd's k-means on a bounded sample — the IVF
    codebook. Deterministic (fixed seed, fixed sample order)."""
    sample = np.array(
        [r[0] for r in index.select(vec_col).limit(sample_rows).collect()],
        dtype=np.float64,
    )
    rng = np.random.RandomState(SEED)
    centroids = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(iters):
        # cosine assignment on normalized data ≈ euclidean on the sphere
        sims = sample @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
                norm = np.linalg.norm(centroids[c])
                if norm > 0:
                    centroids[c] /= norm
    return centroids


def _nearest_cells(vec_col, centroids: np.ndarray, n: int):
    """Indices of the n nearest centroids as an array column (JVM-side:
    score array → sorted (score, idx) structs → slice)."""
    scores = F.array(*[_dot_lit(vec_col, c) for c in centroids])
    ranked = F.array_sort(
        F.zip_with(
            scores,
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
        )
    )
    return F.transform(F.slice(ranked, 1, n), lambda s: s["cell"])


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
) -> DataFrame:
    """IVF-Flat approximate kNN: assign index rows to their nearest
    centroid cell, probe the ``nprobe`` nearest cells per query, exact
    re-rank within candidates. At scale the index side would be written
    partitioned by ``cell`` so probing prunes partitions at the scan."""
    from ..sources.loaders import scatter

    if centroids is None:
        # train BEFORE scattering: sample order stays scan-deterministic
        centroids = train_centroids_sample(index, n_cells, index_vec)

    idx_c = scatter(index).select(
        F.col(index_id),
        F.col(index_vec),
        _nearest_cells(F.col(index_vec), centroids, 1)[0].alias("cell"),
    )
    prb_c = probes.select(
        F.col(query_id),
        F.col(query_vec),
        F.explode(_nearest_cells(F.col(query_vec), centroids, nprobe)).alias("cell"),
    )
    cand = (
        idx_c.join(F.broadcast(prb_c), "cell")
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
