from .chunker import split_text_recursive, chunk_documents  # noqa: F401
from .embedder import embed_texts, embedding_udf, EMBED_DIM  # noqa: F401
from .vector import cosine_sim, dot, l2_norm  # noqa: F401
