"""The engine-wide tokenization contract, in ONE place.

Every oracle hash-check depends on the Spark tokenizer and the DuckDB
tokenizer agreeing bit-for-bit (lowercase → split on ``\\s+`` → drop
empties). Before this module the pair was declared verbatim in five
query modules; one stale copy would silently break oracle parity for
that module's queries, so both sides now come from here.

The whitespace class is pinned to RE2's ``\\s`` — ``[ \\t\\n\\f\\r]``,
space/tab/LF/FF/CR and NOTHING else — because that is the one class the
oracle side cannot deviate from (DuckDB regexes are RE2, and every
blessed oracle already embeds ``\\s+``). The two classes an
implementation might reach for by habit both disagree with it on real
bytes:

- Java's default ``\\s`` ALSO matches vertical tab (U+000B), so a
  Spark-side ``split(_, '\\s+')`` tokenizes VT-containing text
  differently than the oracle (found by tests/test_tokenize.py);
  Spark-side splits therefore use :data:`ASCII_WS_PATTERN`, the
  explicit class, never the ``\\s`` shorthand.
- Python's bare ``str.split()`` splits on *Unicode* whitespace (NBSP,
  U+2000…U+200A, …); UDF-side code therefore uses :func:`py_toks`.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: THE whitespace class, written out: RE2's ``\s`` (space, tab, LF, FF,
#: CR — no vertical tab, no Unicode spaces). Valid as a Java regex, an
#: RE2 regex, and a Python regex, so every engine splits on the same
#: bytes. Use this in any Spark ``split``/``regexp_replace`` that an
#: oracle mirrors with ``\s``.
ASCII_WS_PATTERN = "[ \t\n\f\r]+"

_ASCII_WS = re.compile(ASCII_WS_PATTERN)


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
    return F.filter(F.split(F.lower(col), ASCII_WS_PATTERN), lambda x: x != "")
