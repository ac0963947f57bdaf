"""The reference's query path, Spark-first (SURVEY §3.2 restatement).

Reference pipeline (/root/reference/AI.py): chunk (AI.py:84-85) → embed +
upsert to cosine index (AI.py:48-55,96) → top-k retrieve (AI.py:135-139,
k=4 default) → "stuff" context concat (AI.py:142,99-105) → LLM (outside
the engine's deterministic surface) → refusal predicate + first-line cut
(AI.py:176-185).

Spark shapes, chosen for the 100 TB posture:

- ``build_chunk_index``: chunker UDF + posexplode + embedding UDF, plus a
  ``sha2`` content hash per chunk — the storage-backed equivalent of the
  reference's LRU memoization (AI.py:89-96): an idempotent writer can
  anti-join on ``content_hash`` and skip re-embedding identical content.
- ``topk_cosine``: the query vector rides along as a broadcast-sized
  literal; scoring is JVM-side (functions.vector) and the top-k is
  ``orderBy(desc).limit(k)``, which Catalyst executes as
  ``TakeOrderedAndProject`` — per-partition heaps + driver merge, never a
  global sort. That is exactly the distributed form of a vector-index
  top-k scan.
- ``knn_join``: N queries × M index. The query side is broadcast (it is
  the small side by construction); the per-query cut is a window
  ``row_number() <= k``. At 100 TB index scale the broadcast avoids
  shuffling the index entirely — the only full pass is the scan itself.
  For sub-linear behavior see operators/similarity.py (LSH / IVF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.chunker import DEFAULT_CHUNK_SIZE, chunk_documents
from ..functions.embedder import EMBED_DIM, embedding_udf
from ..functions.vector import cosine_sim, cosine_sim_to_const  # noqa: F401
from .similarity import cosine_sim_arrow

# Reference constants (BASELINE.md): retrieval k=4, refusal prefix.
DEFAULT_K = 4
REFUSAL_PREFIX = "The context provided does not contain specific information"
REFUSAL_MESSAGE = (
    "I'm sorry, I can only answer questions related to the provided context."
)


def build_chunk_index(
    docs: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """documents → chunk_embeddings(doc_id, chunk_id, text, embedding,
    content_hash); the engine's vector-index build (S4 + F6 + F8).

    The input is scattered to engine parallelism first: the chunker and
    embedder are the pipeline's two Python stages, and a small
    single-file scan would otherwise feed them ONE task."""
    from ..sources.loaders import scatter

    chunks = chunk_documents(scatter(docs), chunk_size=chunk_size)
    embed = embedding_udf(dim)
    return chunks.select(
        "doc_id",
        "chunk_id",
        "text",
        embed(F.col("text")).alias("embedding"),
        F.sha2(F.col("text"), 256).alias("content_hash"),
    )


def write_index_if_absent(index: DataFrame, spark, table: str = "chunk_embeddings") -> None:
    """Create-if-absent index sink (S4/S5; reference existence check at
    /root/reference/AI.py:48). Catalog check + saveAsTable."""
    if not spark.catalog.tableExists(table):
        index.write.saveAsTable(table)


def _path_exists(spark, path: str) -> bool:
    """Hadoop-FS existence check — distinguishes 'no index yet' from a
    real read failure (corrupt file, permission error), which must
    propagate: swallowing it would re-embed and APPEND the whole batch,
    silently duplicating index rows and breaking the idempotent-replay
    guarantee streaming/index_stream.py relies on."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def write_index_incremental(
    docs: DataFrame,
    path: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    dim: int = EMBED_DIM,
) -> int:
    """Content-hash-incremental index build — the storage-backed form of
    the reference's LRU memoization (/root/reference/AI.py:89-96, keyed
    on chunk contents). Two-level reuse:

    - identity on ``(doc_id, content_hash)``: a chunk already indexed
      for THIS document is skipped entirely (the anti-join). Keying on
      the hash alone would drop a new document whose text is
      byte-identical to another doc's chunk, making it unreachable by
      doc-scoped retrieval — the reference memoizes the embedding per
      content but still stores every chunk.
    - embedding reuse on ``content_hash``: a new (doc, chunk) row whose
      text hash already exists anywhere in the index copies the stored
      embedding instead of re-running the embedder — exactly the
      reference's LRU semantics, storage-backed.

    At scale this shape works because embedding is the expensive stage
    (a model call per chunk) and both joins are hash-keyed shuffles over
    column-pruned parquet reads. Appends new rows; returns how many
    chunk rows were newly appended."""
    from ..sources.loaders import scatter

    spark = docs.sparkSession
    chunks = chunk_documents(scatter(docs), chunk_size=chunk_size).withColumn(
        "content_hash", F.sha2(F.col("text"), 256)
    )
    embed = embedding_udf(dim)
    if _path_exists(spark, path):
        existing = spark.read.parquet(path)
        seen_keys = existing.select("doc_id", "content_hash").distinct()
        chunks = chunks.join(seen_keys, ["doc_id", "content_hash"], "left_anti")
        known = existing.select("content_hash", "embedding").dropDuplicates(
            ["content_hash"]
        )
        reused = chunks.join(known, "content_hash", "inner").select(
            "doc_id", "chunk_id", "text", "embedding", "content_hash"
        )
        fresh = chunks.join(
            known.select("content_hash"), "content_hash", "left_anti"
        ).select(
            "doc_id",
            "chunk_id",
            "text",
            embed(F.col("text")).alias("embedding"),
            "content_hash",
        )
        new_rows = fresh.unionByName(reused)
    else:
        new_rows = chunks.select(
            "doc_id",
            "chunk_id",
            "text",
            embed(F.col("text")).alias("embedding"),
            "content_hash",
        )
    # localCheckpoint would also work; count-then-append keeps it simple
    # and the count is the caller's idempotency signal.
    new_rows = new_rows.persist()
    try:
        n = new_rows.count()
        if n:
            new_rows.write.mode("append").parquet(path)
        return n
    finally:
        new_rows.unpersist()


def topk_cosine(
    index: DataFrame,
    query_vec,
    k: int = DEFAULT_K,
    vec_col: str = "embedding",
    id_cols: tuple[str, ...] = ("vec_id",),
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Top-k cosine similarity search for ONE query vector (J1/O1).

    ``query_vec`` is a Python list/np array; it becomes an array literal
    in the plan (broadcast to every task for free). Deterministic
    tie-break on the first id column.
    """
    scored = index.select(
        *id_cols,
        *payload_cols,
        cosine_sim_to_const(F.col(vec_col), query_vec).alias("score"),
    )
    # orderBy+limit → TakeOrderedAndProject (no global sort at scale)
    return scored.orderBy(F.desc("score"), *[F.asc(c) for c in id_cols]).limit(k)


def knn_join(
    queries: DataFrame,
    index: DataFrame,
    k: int = DEFAULT_K,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    index_id: str = "vec_id",
    index_vec: str = "embedding",
    max_probe_rows: int = 65536,
    exclude_self: bool = False,
) -> DataFrame:
    """Batch kNN join (J2/J8/O3): per query row, the k nearest index rows
    by cosine. Exact (brute-force), via ``similarity.brute_knn_block``:
    the probe panel rides in the kernel closure (the same smallness
    assumption broadcasting it made), each Arrow batch scores a dense
    BLAS block and reduces to per-probe top-k in place — the
    |index| × |probes| pair space never exists as rows (the old
    broadcast-crossJoin duplicated both vectors onto every pair row:
    ~800 GB of traffic, 289 s, at the 200 k × 4 k tier; the kernel runs
    the same tier in ~14 s). Ranks on the ROUNDED score with an id
    tie-break, like every oracle-backed top-k in the repo.

    DRIVER-MEMORY BOUND: the probe side is collected to the driver to
    build the kernel closure, so this API is for panel-sized query
    batches only — ``max_probe_rows`` (default 65 536 ≈ 34 MB of
    64-float vectors) guards the collect and raises instead of OOMing
    the driver. Oversized probe batches belong on ``knn_auto``, which
    routes them to the cell-cogrouped ``ivf_knn_batch`` with no
    probe-sized collect anywhere; the approximate scale paths live in
    operators/similarity.py."""
    from ..sources.loaders import scatter
    from .similarity import brute_knn_block

    head = queries.select(query_id, query_vec).limit(max_probe_rows + 1).collect()
    if len(head) > max_probe_rows:
        raise ValueError(
            f"knn_join collects the probe side to the driver; got more than "
            f"max_probe_rows={max_probe_rows} query rows — use knn_auto "
            f"(routes large probe batches to ivf_knn_batch) or raise the cap "
            f"if driver memory genuinely allows it"
        )
    panel = [(r[0], r[1]) for r in head]
    # min-parallelism guard: a small single-split index scan would run
    # the whole blocked scoring in ONE task; no-op on well-partitioned
    # input (see loaders.scatter)
    partials = brute_knn_block(
        scatter(index),
        panel,
        k,
        index_id=index_id,
        index_vec=index_vec,
        exclude_self=exclude_self,
    ).withColumnRenamed("query_id", query_id).withColumnRenamed(
        "vec_id", index_id
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(index_id))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_auto(
    queries: DataFrame,
    index: DataFrame,
    k: int = DEFAULT_K,
    ann_threshold_rows: int = 1_000_000,
    index_rows: int | None = None,
    probe_threshold_rows: int = 1024,
    probe_rows: int | None = None,
    query_id: str = "query_id",
    query_vec: str = "qvec",
    index_id: str = "vec_id",
    index_vec: str = "embedding",
    cache_key: str | None = None,
) -> DataFrame:
    """Route the batch kNN join on BOTH cardinalities: exact brute
    force below ``ann_threshold_rows`` index rows; above it, the probe
    batch size picks the approximate engine — banded cosine LSH for
    genuinely interactive probe batches (``probe_rows <=
    probe_threshold_rows``; LSH candidates cost ~N/2^bits PER PROBE
    even with the size-adaptive banding, so the broadcast-probe path is
    capped at ~10³ probes — beyond that the per-probe candidate scans
    multiply past what the cell-bounded batch join costs), shuffle-join IVF
    (``similarity.ivf_knn_batch``) once it does not (batch-join regime:
    10⁷ probes × 10⁹-row index must meet in a cell-keyed shuffle, with
    no probe-sized broadcast or driver collect anywhere). This is the
    reference's brute-force→ANN delegation split
    (/root/reference/AI.py:49-55, Pinecone serverless ANN) as an
    API-level pre-plan decision (SURVEY §4.3: deliberately NOT an
    injected Catalyst rule). Pass ``index_rows`` / ``probe_rows`` when
    the caller already knows the cardinalities (catalog stats,
    manifest) to skip the counts.

    Uniform output shape in every regime:
    (query_id, index_id, score, rank).
    """
    if index_rows is None:
        index_rows = index.count()
    if index_rows <= ann_threshold_rows:
        # exclude_self for CROSS-REGIME uniformity: every approximate
        # route (lsh_knn, ivf_knn, ivf_knn_batch) masks index_id ==
        # query_id, so the exact route must too — otherwise the same
        # probe set flips semantics when the index crosses the
        # threshold (caught by q_knn_auto_quality's no_self verdict)
        out = knn_join(
            queries,
            index,
            k=k,
            query_id=query_id,
            query_vec=query_vec,
            index_id=index_id,
            index_vec=index_vec,
            exclude_self=True,
        ).select(
            query_id, index_id, F.round(F.col("score"), 6).alias("score"), "rank"
        )
        return out
    if probe_rows is None:
        probe_rows = queries.count()
    if probe_rows > probe_threshold_rows:
        from .similarity import ivf_knn_batch

        return ivf_knn_batch(
            queries,
            index,
            k=k,
            query_id=query_id,
            query_vec=query_vec,
            index_id=index_id,
            index_vec=index_vec,
            index_rows=index_rows,
            cache_key=cache_key,
        ).select(query_id, index_id, "score", F.col("rnk").alias("rank"))
    from .similarity import lsh_knn

    dim = len(index.select(index_vec).first()[0])
    return lsh_knn(
        queries,
        index,
        k=k,
        dim=dim,
        query_id=query_id,
        query_vec=query_vec,
        index_id=index_id,
        index_vec=index_vec,
        index_rows=index_rows,
    ).select(query_id, index_id, "score", F.col("rnk").alias("rank"))


def stuff_context(
    retrieved: DataFrame,
    group_cols: tuple[str, ...] = (),
    text_col: str = "text",
    order_col: str = "score",
    sep: str = "\n\n",
) -> DataFrame:
    """Order-preserving "stuff" context assembly (A1; reference
    create_stuff_documents_chain at /root/reference/AI.py:142): concat
    retrieved chunk texts, best score first, into one ``context`` string.

    Implemented with ``collect_list`` over structs + ``array_sort`` +
    ``transform`` + ``concat_ws`` — a map-side-combining hash aggregate,
    no custom UDAF (SURVEY §2.10 D4).
    """
    # array_sort on structs sorts ascending by the first field; negate
    # the score so the best-scoring chunk comes first.
    pair = F.struct(
        (-F.col(order_col).cast("double")).alias("o"), F.col(text_col).alias("t")
    )
    agg = F.concat_ws(
        sep, F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["t"])
    ).alias("context")
    if group_cols:
        return retrieved.groupBy(*group_cols).agg(agg)
    return retrieved.groupBy().agg(agg)


def postprocess_answers(
    answers: DataFrame,
    answer_col: str = "answer",
    refusal_prefix: str = REFUSAL_PREFIX,
    refusal_message: str = REFUSAL_MESSAGE,
) -> DataFrame:
    """Refusal predicate + first-line projection (P1+P2; reference
    /root/reference/AI.py:176-185): an answer starting with the refusal
    prefix becomes the canned message; otherwise keep its first line."""
    col = F.col(answer_col)
    cleaned = F.when(
        col.startswith(refusal_prefix), F.lit(refusal_message)
    ).otherwise(F.split(col, "\n").getItem(0))
    return answers.withColumn(answer_col, cleaned)
