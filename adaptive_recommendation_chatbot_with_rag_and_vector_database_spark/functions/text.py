"""Text-analysis building blocks (SURVEY §2.11 X1-X3; BASELINE.json
north star: dedup, text analysis, fingerprinting for LLM data
pipelines).

Everything here is a **JVM-side Catalyst expression builder** — no
Python UDFs — so these run at parquet-scan speed over a 100 TB corpus.
The cross-engine hash primitive (used by minhash/simhash so the DuckDB
oracle can reproduce them bit-for-bit) is::

    h(t) = int(hex(md5(t)[:8])) % P      (P = 2^31 - 1)

md5 is available and identical in Spark and DuckDB; arithmetic stays
within int64 because a, h < P  ⇒  a*h + b < 2^62.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenize import ASCII_WS_PATTERN

# --- shared constants (also consumed by the DuckDB oracle SQL) -------------

MERSENNE_P = 2147483647  # 2^31 - 1
N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
SIMHASH_BITS = 32

_rng = np.random.RandomState(7)
MINHASH_A: list[int] = [int(a) | 1 for a in _rng.randint(1, MERSENNE_P, N_MINHASH)]
MINHASH_B: list[int] = [int(b) for b in _rng.randint(0, MERSENNE_P, N_MINHASH)]

STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "it"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une"],
    "de": ["der", "die", "das", "und", "ein", "ist", "nicht"],
    "es": ["el", "los", "las", "de", "y", "un", "es", "que"],
}
# deterministic arbitration order for lang-id score ties
LANG_PRIORITY = ["en", "de", "es", "fr"]

# BPE-ish token regex: letter runs, digit runs, single punctuation
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


# --- tokenization ----------------------------------------------------------


def tokens(text: Column | str) -> Column:
    """Whitespace word tokens of lowercased text (empties dropped)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), ASCII_WS_PATTERN), lambda x: x != "")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def token_hashes(toks: Column) -> Column:
    """Portable per-token hash array: md5-hex-prefix → int64 mod P."""
    return F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
        % MERSENNE_P,
    )


# --- minhash / simhash sketches -------------------------------------------


def minhash_signature(tok_hashes: Column) -> Column:
    """Array of N_MINHASH minhash values over the hashed-token set:
    sig_i = min_t (a_i * h(t) + b_i) mod P  (empty set → P sentinel).

    Single fold over the token array with the whole signature as the
    accumulator (one ``zip_with`` min per token) — the per-permutation
    ``transform``+``array_min`` formulation traverses the array
    N_MINHASH times."""
    init = F.array(
        *[F.lit(MERSENNE_P).cast("bigint") for _ in range(len(MINHASH_A))]
    )
    return F.aggregate(
        tok_hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (F.lit(a).cast("bigint") * h + F.lit(b)) % MERSENNE_P
                    for a, b in zip(MINHASH_A, MINHASH_B)
                ]
            ),
            lambda cur, cand: F.least(cur, cand),
        ),
    )


def minhash_bands(signature: Column, n_bands: int = N_BANDS) -> Column:
    """Band the signature: array of '-'-joined band keys (LSH buckets)."""
    per = N_MINHASH // n_bands
    return F.array(
        *[
            F.concat_ws(
                "-", *[signature[b * per + j].cast("string") for j in range(per)]
            )
            for b in range(n_bands)
        ]
    )


def simhash(tok_hashes: Column, bits: int = SIMHASH_BITS) -> Column:
    """SIMHASH_BITS-bit simhash (Charikar): per bit j, sign of the sum of
    ±1 votes from each distinct token's hash bit j; bits packed little-
    endian into one int64.

    Single pass over the token array: the fold accumulator is the whole
    ``bits``-wide vote vector (one ``zip_with`` per token), then the
    finish lambda packs the signs. The per-bit-aggregate formulation
    would traverse the token array ``bits`` times."""
    weights = F.array(*[F.lit(2**j).cast("bigint") for j in range(bits)])
    votes = F.aggregate(
        tok_hashes,
        F.array_repeat(F.lit(0).cast("bigint"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("bigint") * 2 - 1
                    for j in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
        lambda acc: F.aggregate(
            F.zip_with(
                acc,
                weights,
                lambda vote, weight: F.when(vote >= 0, weight).otherwise(
                    F.lit(0).cast("bigint")
                ),
            ),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ),
    )
    # empty token set → 0, not all-bits-set (the seed makes every vote 0)
    return F.when(F.size(tok_hashes) == 0, F.lit(0).cast("bigint")).otherwise(votes)


# --- analysis scores -------------------------------------------------------


def lang_scores(toks_distinct: Column) -> dict[str, Column]:
    return {
        lang: F.size(
            F.array_intersect(toks_distinct, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in STOPWORDS.items()
    }


def lang_pred(toks_distinct: Column) -> Column:
    """Argmax stopword-overlap language id with deterministic tie order
    (LANG_PRIORITY); 'unknown' when no stopword hits at all."""
    s = lang_scores(toks_distinct)
    expr = F.lit(LANG_PRIORITY[-1])
    # build the CASE chain back-to-front: lang wins if it ties-or-beats
    # every lower-priority language
    for i in range(len(LANG_PRIORITY) - 2, -1, -1):
        lang = LANG_PRIORITY[i]
        rest = [s[o] for o in LANG_PRIORITY[i + 1 :]]
        cond = s[lang] >= (F.greatest(*rest) if len(rest) > 1 else rest[0])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    any_hit = F.greatest(*[s[l] for l in LANG_PRIORITY]) > 0
    return F.when(any_hit, expr).otherwise(F.lit("unknown"))


def token_count_ws(text: Column | str) -> Column:
    return F.size(tokens(text))


def token_count_bpe(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    # regexp_count: same match count as regexp_extract_all + size
    # without materializing the per-row match array
    return F.regexp_count(c, F.lit(TOKEN_REGEX)).cast("int")


def punct_ratio(text: Column | str) -> Column:
    # punct count = chars LEFT after deleting runs of allowed chars —
    # identical to counting [^A-Za-z0-9\s] matches, but the regex
    # engine pays per-MATCH overhead, so matching one greedy run per
    # stretch of clean text instead of one match per punctuation char
    # (or per char scanned by regexp_extract_all's array build) is 32×
    # faster: 17.7 s → 0.55 s for this projection over 500 k docs at
    # the 100× tier, with the same Java \s semantics bit for bit
    c = F.col(text) if isinstance(text, str) else text
    return F.when(
        F.length(c) > 0,
        F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]+", "")).cast("double")
        / F.length(c).cast("double"),
    ).otherwise(F.lit(0.0))


def stopword_ratio(toks_distinct: Column) -> Column:
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    hits = F.size(
        F.array_intersect(toks_distinct, F.array(*[F.lit(w) for w in all_stops]))
    )
    return F.when(
        F.size(toks_distinct) > 0, hits / F.size(toks_distinct).cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: token volume, stopword
    density, low punctuation — the standard cheap pre-filter shape for
    LLM training corpora."""
    td = distinct_tokens(text)
    n = token_count_ws(text)
    return F.round(
        0.4 * F.least(n / F.lit(100.0), F.lit(1.0))
        + 0.4 * stopword_ratio(td)
        + 0.2 * (1.0 - F.least(punct_ratio(text) * 5.0, F.lit(1.0))),
        6,
    )


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.trim(F.regexp_replace(F.lower(c), ASCII_WS_PATTERN, " ")))


def word_bigrams(toks: Column) -> Column:
    """Adjacent word bigrams ('a b') from a token array (order kept).

    zip_with over two slices streams both arrays once — no per-index
    element_at, so cost is linear even if Catalyst inlines ``toks``.
    Pass a *materialized* column (see sources/loaders.scatter) when the
    token array is itself an expensive expression.
    """
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
