"""Query catalog: every implemented operator exposed as a named query.

This is the registry behind ``__spark_entry__.queries()`` /
``oracle_sql()``. Each entry pairs

* a Spark callable ``(spark, sf_dir) -> DataFrame`` exercising engine
  operators, and
* (where SQL-expressible) an ANSI-SQL oracle string DuckDB runs over the
  same parquet tables — the correctness gate hash-compares the two.

Determinism contract (critical for hash parity):

* money aggregation routes through DECIMAL(18,2) on BOTH sides (see
  ``functions.numeric``);
* integer sums in oracle SQL are cast to BIGINT (DuckDB SUM(int) is
  HUGEINT);
* hashes that must match across engines use md5, never Spark's murmur
  ``hash()``;
* every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]

# name -> (spark_callable, oracle_sql | None)
_CATALOG: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _CATALOG[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {k: v[0] for k, v in _CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {k: v[1] for k, v in _CATALOG.items() if v[1] is not None}


_LOADED = False


def _load_all() -> None:
    """Import every query-defining module exactly once (registration side
    effect)."""
    global _LOADED
    if _LOADED:
        return
    from .queries import (  # noqa: F401
        advanced_q,
        core_kpis,
        dedup_q,
        events_q,
        relational,
        sampling_q,
        scale_q,
        similarity_q,
        stats_q,
        temporal_q,
        text_q,
        tpch_q,
        validation_q,
    )

    _LOADED = True
