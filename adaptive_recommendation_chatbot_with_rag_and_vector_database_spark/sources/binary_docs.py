"""Binary document source (SURVEY §2.1 S2/S3): files → text documents.

The reference opens PDFs and concatenates page text, returning "" on
any extraction error — a silent-null source (/root/reference/AI.py:61-71)
— and fans file extraction out over a thread pool (AI.py:74-81). The
Spark restatement gets both for free from a distributed ``binaryFile``
scan: one task per file split, extraction inside an Arrow-batched
``mapInPandas``.

Extractors are pluggable ``bytes -> str`` callables:

- ``utf8_extractor`` (default): decode bytes as UTF-8 text (.txt/.md
  corpora). Real and tested.
- ``pdf_extractor``: PDF page-concatenation via PyMuPDF, matching the
  reference's ``page.get_text()`` loop. The PDF codec is NOT available
  in this environment, so the decode step raises
  ``NotImplementedError`` unless PyMuPDF is importable; the Spark-side
  plumbing (scan → mapInPandas → schema) is identical to the tested
  UTF-8 path and is what this module exists to pin down.

Both honor the reference's error contract: any per-file failure yields
``text=""`` rather than failing the job.

``doc_id`` is a deterministic 63-bit hash of the file path — stable
across runs and executors, no driver-side sequencing (at 100 TB a
monotonic id would serialize the scan; a content-addressed id does
not).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def utf8_extractor(content: bytes) -> str:
    """Decode bytes as UTF-8; silent-empty on failure (AI.py:68-71)."""
    try:
        return content.decode("utf-8")
    except Exception:
        return ""


def pdf_extractor(content: bytes) -> str:
    """Page-concatenated PDF text (reference loop at AI.py:63-67).

    Requires PyMuPDF; raises NotImplementedError when absent (the
    decode is stubbed in this environment — see module docstring)."""
    try:
        import fitz  # PyMuPDF — not installed here; import-gated
    except ImportError as exc:
        raise NotImplementedError(
            "PDF decode requires PyMuPDF, which is not available in this "
            "environment; the Spark plumbing is identical to utf8_extractor"
        ) from exc
    try:
        with fitz.open(stream=content, filetype="pdf") as doc:
            return "".join(page.get_text() for page in doc)
    except Exception:
        return ""  # reference: silent-empty on extraction error


def path_doc_id(path: str) -> int:
    """Deterministic 63-bit doc id from the file path."""
    return int.from_bytes(hashlib.sha256(path.encode()).digest()[:8], "big") >> 1


def read_binary_documents(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Distributed file scan → (path, length, content BINARY)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).select("path", "length", "content")


def extract_documents(
    bin_df: DataFrame,
    extractor: Callable[[bytes], str] = utf8_extractor,
) -> DataFrame:
    """binaryFile rows → documents(doc_id, path, byte_len, text).

    Arrow-batched ``mapInPandas``; per-file extraction errors yield
    ``text=""`` (the reference's silent-null contract), never a task
    failure."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for content in pdf["content"]:
                try:
                    texts.append(extractor(bytes(content)))
                except NotImplementedError:
                    raise  # stubbed codec: surface loudly, do not mask
                except Exception:
                    texts.append("")
            yield pd.DataFrame(
                {
                    "doc_id": [path_doc_id(p) for p in pdf["path"]],
                    "path": pdf["path"],
                    "byte_len": pdf["length"].astype("int64"),
                    "text": texts,
                }
            )

    return bin_df.mapInPandas(extract, DOC_SCHEMA)


def load_binary_documents(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    extractor: Callable[[bytes], str] = utf8_extractor,
) -> DataFrame:
    """One-call S2+S3: scan → extract → documents frame."""
    return extract_documents(read_binary_documents(spark, path, glob), extractor)
