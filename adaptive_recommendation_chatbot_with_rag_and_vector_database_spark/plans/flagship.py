"""Flagship end-to-end query (SURVEY §7 minimum slice).

The reference's full deterministic query path in ONE lazy logical plan:
documents → recursive chunks (F5) → deterministic embeddings (F8) →
top-k cosine retrieval for a literal question (J1/O1, k=4 per
/root/reference/AI.py:138) → order-preserving context concat (A1,
AI.py:142). The only non-deterministic stage of the reference — the
external LLM call (AI.py:173) — is a pluggable boundary and not part of
the engine plan (SURVEY §3.2).

Returns one row per retrieved chunk with the assembled context attached:
``(chunk_id, doc_id, score, text, context)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embedder import EMBED_DIM, embed_text
from ..operators.retrieval import DEFAULT_K, build_chunk_index, topk_cosine
from ..sources.loaders import load_table

DEFAULT_QUESTION = "What items were shipped and what were the order priorities?"


def flagship(
    spark: SparkSession,
    sf_dir: str = "/root/testdata/sf0.001",
    question: str = DEFAULT_QUESTION,
    k: int = DEFAULT_K,
) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    index = build_chunk_index(docs)
    qvec = embed_text(question, EMBED_DIM)

    top = topk_cosine(
        index,
        qvec,
        k=k,
        id_cols=("doc_id", "chunk_id"),
        payload_cols=("text",),
    )

    # Assemble the stuffed context (best chunk first) and attach it to
    # every retrieved row. A global-frame window over the k retrieved
    # rows keeps the whole pipeline ONE plan subtree — an aggregate-
    # and-rejoin would execute the chunk→embed→score lineage twice.
    # The unpartitioned window is safe here: its input is exactly k rows
    # (post TakeOrderedAndProject), never the corpus.
    from pyspark.sql import Window

    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pair = F.struct((-F.col("score")).alias("o"), F.col("text").alias("t"))
    ctx = F.concat_ws(
        "\n\n",
        F.transform(F.array_sort(F.collect_list(pair).over(w)), lambda s: s["t"]),
    )
    return top.select("chunk_id", "doc_id", "score", "text", ctx.alias("context"))
