"""Continuous vector-index maintenance from a document stream.

The reference rebuilds its index per upload behind an LRU cache
(/root/reference/AI.py:89-96, 206-210). The streaming equivalent keeps
one parquet index continuously fresh: each micro-batch of documents is
chunked, content-hash anti-joined against the existing index, and only
genuinely new chunks are embedded and appended
(operators/retrieval.write_index_incremental). foreachBatch + the
stream checkpoint give exactly-once file consumption; the content-hash
skip additionally makes the append IDEMPOTENT under batch replay, so a
crash between append and checkpoint commit cannot duplicate index rows
— the replayed batch anti-joins to empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..functions.chunker import DEFAULT_CHUNK_SIZE
from ..functions.embedder import EMBED_DIM
from ..operators.retrieval import write_index_incremental


def index_stream(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    dim: int = EMBED_DIM,
) -> StreamingQuery:
    """Start (availableNow) an index-maintenance query over a streaming
    DataFrame of documents ``(doc_id, text, ...)``; returns the running
    ``StreamingQuery`` (caller awaits termination)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_index_incremental(
            batch_df, index_path, chunk_size=chunk_size, dim=dim
        )

    return (
        doc_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
