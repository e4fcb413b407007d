"""Portable text/hash column helpers.

Everything here is built from engine-agnostic primitives (``md5`` over
UTF-8 strings, whitespace tokenization) so the same logic is expressible
in the DuckDB oracle SQL — Spark's native ``hash``/``xxhash64`` are
murmur-based and do NOT match other engines, so they are never used where
an oracle must reproduce the value.

All helpers are pure Column expressions (JVM-side, codegen'd) — no Python
UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: str | Column) -> Column:
    """Whitespace tokens of lowercased, trimmed text. ARRAY<STRING>.

    Oracle-SQL equivalent: ``string_split_regex(lower(trim(x)), '\\s+')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def md5_bigint(col: Column, nchars: int = 15) -> Column:
    """First ``nchars`` hex chars of md5 → non-negative BIGINT.

    15 hex chars = 60 bits, always fits a signed 64-bit int. Oracle-SQL
    equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT`` (DuckDB).
    """
    return F.conv(F.substring(F.md5(col), 1, nchars), 16, 10).cast("bigint")


def word_shingles(token_col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles from a token array. ARRAY<STRING>.

    Built with ``transform`` over an index ``sequence`` + ``slice`` +
    ``concat_ws`` — pure Catalyst expressions. Documents shorter than
    ``k`` tokens yield a single shingle of the whole text so they still
    participate in dedup.

    Oracle-SQL equivalent (DuckDB)::

        list_distinct(CASE WHEN len(toks) < k THEN [list_aggr(toks, 'string_agg', ' ')]
             ELSE list_transform(range(1, len(toks) - k + 2),
                                 i -> array_to_string(toks[i : i + k - 1], ' ')) END)
    """
    n = F.size(token_col)
    shingled = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", F.slice(token_col, i, k)),
    )
    whole = F.array(F.concat_ws(" ", token_col))
    return F.array_distinct(F.when(n < k, whole).otherwise(shingled))
