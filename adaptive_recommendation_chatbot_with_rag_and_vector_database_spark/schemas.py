"""Frozen schemas for the engine's tables (FIXTURES.md; SURVEY.md §1).

The driver's parquet fixtures carry these schemas already — they are
declared here (a) to document the data model, (b) for streaming sources
that cannot infer schemas, and (c) so derived tables (chunk embeddings,
session snapshots) have one authoritative shape.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- fixture tables -------------------------------------------------------

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# --- derived tables (built by this engine) --------------------------------

# Chunk rows produced by the recursive chunker (reference: LangChain
# split_documents at /root/reference/AI.py:83-86).
CHUNKS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_id", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

# Vector-index records (reference: Pinecone upserts at
# /root/reference/AI.py:49-55,96) — chunk + embedding + content hash
# used for idempotent (cache-equivalent) index builds.
CHUNK_EMBEDDINGS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_id", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
        T.StructField("content_hash", T.StringType(), False),
    ]
)

# Chat message log (reference: SimpleChatMessageHistory at
# /root/reference/AI.py:19-30; session store AI.py:155-161).
MESSAGES = T.StructType(
    [
        T.StructField("session_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)
