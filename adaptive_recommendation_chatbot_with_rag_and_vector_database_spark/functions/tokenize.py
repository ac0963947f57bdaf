"""The engine-wide tokenization contract, in ONE place.

Every oracle hash-check depends on the Spark tokenizer and the DuckDB
tokenizer agreeing bit-for-bit (lowercase → split on ``\\s+`` → drop
empties). Before this module the pair was declared verbatim in five
query modules; one stale copy would silently break oracle parity for
that module's queries, so both sides now come from here.

The Python-side equivalent (used inside Arrow-batched UDFs, e.g. the
Misra-Gries sketch) is ``text.lower().split()`` — ``str.split()`` with
no argument splits on runs of whitespace and drops empties, the same
contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_toks(col: str = "text") -> str:
    """DuckDB token-list expression over ``col``. With the default
    column this returns the exact byte string every existing oracle
    embeds, so importing it does not re-queue verified queries
    (registry fingerprints are whitespace-normalized but byte
    stability keeps diffs empty)."""
    return rf"list_filter(string_split_regex(lower({col}), '\s+'), x -> x <> '')"


#: the common ``text``-column form, byte-identical to the historical
#: per-module ``_SQL_TOKS`` constants
SQL_TOKS = sql_toks()


def toks_col(col: str = "text") -> Column:
    """Spark Column twin of :func:`sql_toks`. Built lazily — the HOF
    lambda needs an active session to compile."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")
