"""The engine-wide tokenization contract, in ONE place.

Every oracle hash-check depends on the Spark tokenizer and the DuckDB
tokenizer agreeing bit-for-bit (lowercase → split on ``\\s+`` → drop
empties). Before this module the pair was declared verbatim in five
query modules; one stale copy would silently break oracle parity for
that module's queries, so both sides now come from here.

The Python-side equivalent (used inside Arrow-batched UDFs, e.g. the
Misra-Gries sketch) is :func:`py_toks` below. It deliberately does NOT
use bare ``str.split()``: that splits on *Unicode* whitespace (NBSP,
U+2000…U+200A, …) while Java's default ``\\s`` (Spark) and RE2's
``\\s`` (DuckDB) are ASCII-only, so on text containing non-ASCII
whitespace a bare-split tokenizer would build a different token stream
than the two engines being compared.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Java's default ``\s`` class (Pattern docs): ASCII space, tab, LF,
#: vertical tab, form feed, CR. This is what Spark's ``split(_, '\s+')``
#: matches, so the Python twin must match exactly the same bytes.
_ASCII_WS = re.compile("[ \t\n\x0b\f\r]+")


def py_toks(text: str) -> list[str]:
    """Python twin of the Spark/DuckDB tokenizers for use inside
    Arrow-batched UDFs: lowercase → split on runs of ASCII whitespace →
    drop empties. Agrees with :func:`toks_col` and :func:`sql_toks`
    byte-for-byte on any input, not just ASCII fixtures."""
    return [t for t in _ASCII_WS.split(text.lower()) if t]


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
