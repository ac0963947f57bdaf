from __future__ import annotations

import numpy as np
import pytest

from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.multimodal import (
    DecoderUnavailableError,
    byte_features,
    decode_image,
    extract_features,
    synth_assets_from_documents,
)

from conftest import SF_DIR


def test_decode_is_stubbed():
    with pytest.raises(DecoderUnavailableError):
        decode_image(b"\x89PNG\r\n")


def test_byte_features_pure():
    n, s, e, h = byte_features(b"\x00\x00\xff\xff")
    assert n == 4 and s == 510
    assert abs(e - 1.0) < 1e-9  # two equiprobable symbols
    assert h[0] == 0.5 and h[7] == 0.5 and sum(h) == 1.0
    assert byte_features(b"") == (0, 0, 0.0, [0.0] * 8)


def test_extract_features_matches_pure_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(25)
    assets = synth_assets_from_documents(docs)
    out = {r.asset_id: r for r in extract_features(assets).collect()}
    for row in docs.collect():
        n, s, e, h = byte_features(row.text.encode("utf-8"))
        got = out[row.doc_id]
        assert (got.byte_len, got.byte_sum) == (n, s)
        assert abs(got.byte_entropy - e) < 1e-9
        assert np.allclose(got.histogram8, h)
        assert got.kind in ("image", "audio", "video")


def test_resize_thumbnail_pure():
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.multimodal import (
        resize_thumbnail,
    )

    # strided gather: bytes 0,33,66,99 of range(100) at size=2
    assert resize_thumbnail(bytes(range(100)), 2) == [
        0.0,
        round(33 / 255, 6),
        round(66 / 255, 6),
        round(99 / 255, 6),
    ]
    # short payload zero-pads to size^2 before the gather
    assert resize_thumbnail(b"\xff", 2) == [round(1.0, 6), 0.0, 0.0, 0.0]
    assert resize_thumbnail(b"", 2) == [0.0] * 4


def test_resize_images_matches_pure_reference(spark):
    from adaptive_recommendation_chatbot_with_rag_and_vector_database_spark.operators.multimodal import (
        resize_images,
        resize_thumbnail,
        synth_assets_from_documents,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    assets = synth_assets_from_documents(docs)
    out = {r.asset_id: r.thumb for r in resize_images(assets, size=8).collect()}
    for row in docs.collect():
        expect = resize_thumbnail(row.text.encode("utf-8"), 8)
        assert out[row.doc_id] == expect
        assert len(out[row.doc_id]) == 64
