"""PySpark-native analytics engine covering the query and data-processing
capabilities of the reference RAG system
(``hetalgada15/Adaptive-Recommendation-Chatbot-with-RAG-and-Vector-Database``,
surveyed in ``SURVEY.md``), rebuilt idiomatically on DataFrame / SQL /
Catalyst / Structured Streaming.

Design rules (see SURVEY.md §4, §7):

- DataFrame/SQL everywhere; RDDs nowhere.
- Built-in ``pyspark.sql.functions`` on the hot path; Arrow-vectorized
  pandas UDFs only for the two genuinely Python operators (chunker,
  embedder); row-at-a-time Python UDFs nowhere.
- Everything is a lazy logical plan until the driver acts; no
  ``collect()`` inside operators.
- Scale posture: broadcast small sides, top-k as orderBy+limit
  (``TakeOrderedAndProject``), window-rank for per-group top-k, AQE on.
"""

from .session import get_spark  # noqa: F401
from .sources.loaders import TABLES, load_table, load_tables  # noqa: F401

__version__ = "0.1.0"
