"""Skew-mitigation operators: salted aggregation and salted joins.

The reference never confronts skew — its heaviest group-by key is
``(category, order_date)`` at single-node scale (reference
``ecs/transformation/transform_task.py:223-227``). At 100 TB a handful of
hot keys (a viral product's category, a flash-sale date) concentrate a
shuffle partition onto one executor and stall the stage. Two standard
mitigations, exposed as composable operators:

* **Salted aggregation** — two-phase: group by ``(key, salt)`` to spread
  a hot key over N reducers, then re-aggregate by ``key``. Requires the
  aggregate to be decomposable (sum/count/min/max; avg as sum+count).
  The engine's DECIMAL money sums are associative, so the two-phase
  result is bit-identical to the single-phase one.
* **Salted join** — explode the *small* side N ways (one copy per salt
  value), salt the large side's key randomly-but-deterministically
  (hash-mod, not rand(), so retried tasks produce identical output), and
  join on ``(key, salt)``. Each hot key's rows now land on N reducers.

Spark's AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``, on by
default in ``session.get_spark``) handles sort-merge-join skew
automatically at runtime; these operators cover the cases AQE does not:
skewed *aggregation*, and deliberate pre-salting when the skew is known
ahead of time (e.g. a static hot-key list).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _salt_expr(cols: Sequence[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of the row's non-key
    columns mod buckets. Deterministic per-row (unlike ``rand()``) so
    speculative/retried tasks emit identical rows — required for
    exactly-once sinks."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name → *partial* aggregate expression;
    the final phase re-aggregates each with the merge function implied by
    its name registration below (sum/min/max/count-as-sum). Only
    decomposable aggregates are accepted; for avg, pass sum and count and
    divide afterwards.
    """
    non_key = [c for c in df.columns if c not in keys]
    salted = df.withColumn(SALT_COL, _salt_expr(non_key, buckets))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    # merge phase: sums and counts re-sum; min/max re-apply themselves.
    # The caller's expression name encodes intent via its prefix.
    def merge(name: str) -> Column:
        if name.startswith(("min_",)):
            return F.min(name)
        if name.startswith(("max_",)):
            return F.max(name)
        return F.sum(name)  # sums, counts, decimal money sums

    return partial.groupBy(*keys).agg(
        *[merge(name).cast(partial.schema[name].dataType).alias(name) for name in aggs]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate ``small`` once per salt bucket
    and spread ``large``'s hot keys across buckets.

    Output equals ``large.join(small, on, how)`` exactly; only the
    physical row distribution changes. ``how`` is limited to inner/left —
    the replicate-small-side trick does not extend to right/full outer.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    non_key = [c for c in large.columns if c != on]
    salted_large = large.withColumn(SALT_COL, _salt_expr(non_key, buckets))
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("bigint"))
    return salted_large.join(replicated_small, [on, SALT_COL], how).drop(SALT_COL)
