"""Multimodal column support (BASELINE.json north star: treat
image/audio/video as opaque ``binary`` columns with typed metadata).

The container has no image/audio codecs, so the DECODE step is stubbed
(clearly marked, raises ``DecoderUnavailableError``) behind an
import-try — but everything Spark-side is real and tested: the asset
schema, the Arrow-batched ``mapInPandas`` feature extractor, its batch
shape, and the deterministic fallback featurization (pure byte-level
statistics), which stands in for a real embedding/decode at identical
plumbing cost.

At 100 TB: assets are many small binary blobs → read via parquet with
``spark.sql.files.maxPartitionBytes`` sizing, or ``binaryFile`` for raw
dirs; the extractor is a per-partition Arrow loop so codec state is
initialized once per batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("byte_sum", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("histogram8", T.ArrayType(T.DoubleType(), False), False),
    ]
)


class DecoderUnavailableError(NotImplementedError):
    """Raised by the real-decoder path: codec libraries are not in this
    environment. The deterministic byte-level featurizer below is the
    supported fallback."""


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real image decode (PIL/opencv) is unavailable here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise DecoderUnavailableError(
            "image codecs not installed; use extract_features (byte-level)"
        ) from e
    raise DecoderUnavailableError("real decode path intentionally stubbed")


def byte_features(payload: bytes) -> tuple[int, int, float, list[float]]:
    """Deterministic byte-level features (pure function; the testable
    reference for the distributed extractor)."""
    if not payload:
        return 0, 0, 0.0, [0.0] * 8
    arr = np.frombuffer(payload, dtype=np.uint8)
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    probs = counts[counts > 0] / len(arr)
    entropy = float(-(probs * np.log2(probs)).sum())
    hist8 = counts.reshape(8, 32).sum(axis=1) / len(arr)
    return len(arr), int(arr.sum()), round(entropy, 6), [round(float(x), 6) for x in hist8]


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas; SURVEY §2.10 D1 pattern). One numpy pass per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [byte_features(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "byte_len": [f[0] for f in feats],
                    "byte_sum": [f[1] for f in feats],
                    "byte_entropy": [f[2] for f in feats],
                    "histogram8": [f[3] for f in feats],
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def synth_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake assets: document text bytes as payload, kind
    cycled by id — gives the binary plumbing real data to flow through."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def frame_sample(assets: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """STUB-shaped frame sampler: deterministic fake 'frame count' from
    payload size (real video decode is DecoderUnavailable); exercises
    the typed-metadata path."""
    return assets.select(
        "asset_id",
        "kind",
        (F.length("payload") / every_n_bytes).cast("long").alias("n_frames"),
        F.element_at("meta", "lang").alias("lang"),
    )


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("thumb", T.ArrayType(T.DoubleType(), False), False),
    ]
)


def resize_thumbnail(payload: bytes, size: int = 8) -> list[float]:
    """Deterministic stand-in for image resize: strided gather of
    size² evenly-spaced bytes, scaled to [0,1] (the real resize is a
    codec call behind ``decode_image``; this keeps the plumbing —
    fixed-size array out, zero-pad short payloads — byte-exact and
    testable without codecs)."""
    n = size * size
    if not payload:
        return [0.0] * n
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) < n:
        arr = np.pad(arr, (0, n - len(arr)))
    # integer-exact stride (j*(L-1)) // (n-1), NOT float linspace: the
    # gather must be bit-reproducible in any engine (the DuckDB oracle
    # recomputes it over hex(payload)) and float step accumulation can
    # floor off-by-one on exact-integer boundaries
    idx = (np.arange(n, dtype=np.int64) * (len(arr) - 1)) // (n - 1)
    return [round(float(v) / 255.0, 6) for v in arr[idx]]


def resize_images(assets: DataFrame, size: int = 8) -> DataFrame:
    """Arrow-batched 'resize' over binary payloads (mapInPandas): one
    fixed-size thumbnail vector per asset. Identical batch shape and
    partitioning to a real codec resize — swap ``resize_thumbnail``
    for a decoder call when codecs are present."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "thumb": [
                        resize_thumbnail(p if p is not None else b"", size)
                        for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(run, THUMB_SCHEMA)
