"""Text-analysis column functions (north-star: training-data pipeline).

All pure Catalyst expressions (split/transform/filter/aggregate higher-
order functions) — no Python UDFs, so they run inside whole-stage
codegen and scale to a 100 TB `documents` table. The md5-based word
hash is chosen because it is bit-identical in DuckDB (oracle
parity) and uniformly distributed; at cluster scale xxhash64 would be the
cheaper choice and is exposed as ``word_hash_fast``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: small deterministic stopword list shared with the DuckDB oracles.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokenize(text: Column) -> Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    return F.split(text, r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokenize(text)).cast("bigint")


def word_shingles(words: Column, n: int = 3) -> Column:
    """Overlapping word n-grams (shingles) for Jaccard/MinHash dedup.

    Expressed with `transform(sequence(...))` so the whole shingling
    stays JVM-side. 0-based element indexing via ``element_at(w, i+1)``.
    """
    idx = F.sequence(F.lit(0), F.size(words) - n)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(n)]))
    )


def word_hash32(col: Column, seed: int = 0) -> Column:
    """Deterministic 32-bit hash reproducible in ANSI SQL:
    first 8 hex chars of md5(seed || ':' || s) as a bigint."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 8), 16, 10).cast("bigint")


def word_hash_fast(col: Column, seed: int = 0) -> Column:
    """Scale-path hash (xxhash64, single JVM op). Not oracle-portable."""
    return F.xxhash64(col, F.lit(seed))


def stopword_count(words: Column) -> Column:
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w))).cast("bigint")


def punct_count(text: Column) -> Column:
    """Number of non-alphanumeric, non-space characters."""
    return F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")).cast("bigint")


def mean_token_len(words: Column) -> Column:
    return F.aggregate(
        words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    ) / F.size(words)


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1]: rewards mid-length tokens
    and low punctuation density, penalizes stopword stuffing. The exact
    formula is mirrored in the DuckDB oracle (plans/northstar.py)."""
    words = tokenize(text)
    ntok = F.size(words).cast("double")
    mean_len = mean_token_len(words)
    sw_ratio = stopword_count(words) / ntok
    punct_ratio = punct_count(text) / F.length(text).cast("double")
    len_term = F.least(ntok / F.lit(64.0), F.lit(1.0))
    # emitted raw (no decimal rounding): every term derives from integer
    # counts, so the result is bit-deterministic across engines.
    return (
        F.lit(0.4) * len_term
        + F.lit(0.3) * F.least(mean_len / F.lit(6.0), F.lit(1.0))
        + F.lit(0.2) * (1 - sw_ratio)
        + F.lit(0.1) * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lower-cased text. Same bytes in any engine."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))
