from .retrieval import (  # noqa: F401
    build_chunk_index,
    topk_cosine,
    knn_join,
    stuff_context,
    postprocess_answers,
)
