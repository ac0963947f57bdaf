"""Streaming surface (SURVEY §2.9 T1-T5): keyed session state,
windowed aggregations, watermark semantics, streaming dedup."""
