"""Binary document source (S2/S3) and incremental index sink (S4+F6)."""

from __future__ import annotations

import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.retrieval import (
    write_index_incremental,
)
from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.sources.binary_docs import (
    load_binary_documents,
    path_doc_id,
    pdf_extractor,
    utf8_extractor,
)


@pytest.fixture()
def corpus_dir(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha document with some words")
    (d / "b.txt").write_text("beta document\n\nsecond paragraph")
    (d / "bad.bin").write_bytes(b"\xff\xfe\xfa broken \xff")
    return str(d)


def test_binary_scan_extracts_utf8(spark, corpus_dir):
    docs = load_binary_documents(spark, corpus_dir, glob="*.txt").orderBy("path")
    rows = docs.collect()
    assert [r.text for r in rows] == [
        "alpha document with some words",
        "beta document\n\nsecond paragraph",
    ]
    assert all(r.doc_id == path_doc_id(r.path) for r in rows)
    assert all(r.byte_len > 0 for r in rows)


def test_invalid_bytes_yield_empty_text_not_failure(spark, corpus_dir):
    # the reference's silent-null contract (/root/reference/AI.py:68-71)
    docs = load_binary_documents(spark, corpus_dir)  # includes bad.bin
    by_path = {r.path.rsplit("/", 1)[-1]: r.text for r in docs.collect()}
    assert by_path["bad.bin"] == ""
    assert by_path["a.txt"].startswith("alpha")


def test_pdf_extractor_is_stubbed_loudly():
    with pytest.raises(NotImplementedError):
        pdf_extractor(b"%PDF-1.4 fake")


def test_doc_id_deterministic_and_positive():
    assert path_doc_id("/x/y.txt") == path_doc_id("/x/y.txt")
    assert path_doc_id("/x/y.txt") != path_doc_id("/x/z.txt")
    assert path_doc_id("/x/y.txt") > 0


def test_incremental_index_skips_existing_content(spark, tmp_path):
    idx = str(tmp_path / "chunk_index")
    def prose(tag: str) -> str:
        return " ".join(f"{tag} sentence number {i} of the corpus." for i in range(30))

    docs1 = spark.createDataFrame(
        [(1, prose("first")), (2, prose("second"))],
        "doc_id long, text string",
    )
    n1 = write_index_incremental(docs1, idx, chunk_size=200)
    assert n1 > 0

    # identical corpus → nothing new embedded (the LRU-cache semantics)
    assert write_index_incremental(docs1, idx, chunk_size=200) == 0

    # one new doc → only its chunks are appended
    docs2 = docs1.union(
        spark.createDataFrame([(3, prose("third"))], "doc_id long, text string")
    )
    n3 = write_index_incremental(docs2, idx, chunk_size=200)
    assert 0 < n3 < n1 + n3

    total = spark.read.parquet(idx)
    assert total.count() == n1 + n3
    assert total.select("content_hash").distinct().count() == n1 + n3
    assert set(total.schema.fieldNames()) == {
        "doc_id",
        "chunk_id",
        "text",
        "embedding",
        "content_hash",
    }


def test_incremental_index_attributes_identical_content_to_new_doc(spark, tmp_path):
    """A NEW document whose text is byte-identical to an already-indexed
    document must still get its own index rows (else it is unreachable
    by doc-scoped retrieval); the embedding is reused per content hash —
    the reference memoizes the embedding but stores every chunk."""
    idx = str(tmp_path / "chunk_index")
    text = " ".join(f"shared sentence number {i} of the corpus." for i in range(30))
    n1 = write_index_incremental(
        spark.createDataFrame([(1, text)], "doc_id long, text string"),
        idx,
        chunk_size=200,
    )
    assert n1 > 0

    both = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    n2 = write_index_incremental(both, idx, chunk_size=200)
    assert n2 == n1  # doc 2 gets the same chunk rows, hash-for-hash

    total = spark.read.parquet(idx)
    assert {r.doc_id for r in total.select("doc_id").distinct().collect()} == {1, 2}
    # reused embeddings: one embedding per content hash across both docs
    assert (
        total.select("content_hash", "embedding").distinct().count()
        == total.select("content_hash").distinct().count()
    )
    # replay of the full corpus appends nothing
    assert write_index_incremental(both, idx, chunk_size=200) == 0


def test_incremental_index_propagates_corrupt_index_read(spark, tmp_path):
    """An EXISTING but unreadable index must raise — treating a read
    failure as 'no index yet' would re-embed and append the whole batch,
    silently duplicating index rows (ADVICE r1)."""
    idx = tmp_path / "chunk_index"
    idx.mkdir()
    (idx / "part-00000.parquet").write_bytes(b"not a parquet file")
    docs = spark.createDataFrame([(1, "some text " * 20)], "doc_id long, text string")
    with pytest.raises(Exception):
        write_index_incremental(docs, str(idx), chunk_size=100)


def test_streaming_index_build_equals_batch(spark, tmp_path):
    """Streaming index maintenance: documents arriving as stream files
    produce the same index as one batch build, and replaying the corpus
    (duplicate arrivals) appends nothing — content-hash idempotency."""
    from pyspark.sql import functions as F

    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.streaming.index_stream import (
        index_stream,
    )

    def prose(tag):
        return " ".join(f"{tag} sentence number {i} here." for i in range(25))

    docs = spark.createDataFrame(
        [(i, prose(f"doc{i}")) for i in range(6)], "doc_id long, text string"
    )
    src = tmp_path / "docs_src"
    docs.filter("doc_id < 3").coalesce(1).write.mode("append").parquet(str(src))

    idx = str(tmp_path / "stream_index")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    index_stream(stream, idx, ckpt, chunk_size=120).awaitTermination()
    n_first = spark.read.parquet(idx).count()
    assert n_first > 0

    # second wave of documents + a duplicate of the first wave
    docs.filter("doc_id >= 3").coalesce(1).write.mode("append").parquet(str(src))
    docs.filter("doc_id < 3").coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    index_stream(stream, idx, ckpt, chunk_size=120).awaitTermination()

    got = spark.read.parquet(idx)
    batch = str(tmp_path / "batch_index")
    write_index_incremental(docs, batch, chunk_size=120)
    want = spark.read.parquet(batch)
    # same indexed CONTENT as one batch build over the full corpus...
    hashes = lambda df: {r.content_hash for r in df.select("content_hash").collect()}  # noqa: E731
    assert hashes(got) == hashes(want)
    # ...no duplicate-arrival inflation (the wave-1 replay files added
    # nothing: stream rows never exceed the one-shot batch build)...
    n_stream = got.count()
    assert n_stream <= want.count()
    # ...and a third run with no new files appends nothing at all
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    index_stream(stream, idx, ckpt, chunk_size=120).awaitTermination()
    assert spark.read.parquet(idx).count() == n_stream
