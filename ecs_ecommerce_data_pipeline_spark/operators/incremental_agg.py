"""Incremental aggregate maintenance: mergeable partial-aggregate state.

The reference recomputes KPIs from the full validated history on every
batch (``ecs/transformation/transform_task.py:409-413`` re-lists and
re-reads every ``validated/orders/*`` part each run). That is O(history)
per batch — fatal at 100 TB. The scalable pattern is algebraic
aggregation state:

* keep a compact **state table** of per-group partial aggregates
  (exact decimal sums, counts — all associative + commutative);
* each new batch produces its own partials from **only the batch rows**;
* merging = union + one re-aggregation over the partials, cost
  O(|state| + |batch|), never O(history);
* finalization derives the published KPIs (averages, rates) from the
  merged partials with the exact same formulas as a full recompute.

Because every partial is exact (DECIMAL / BIGINT — see
``functions.numeric``), merge-then-finalize is *bit-identical* to a
full-history recompute under any batch split — which is exactly what the
catalog query's oracle proves (the oracle is the plain full-recompute
SQL).

Non-algebraic KPIs (``countDistinct``) get the two-level keyed-state
pattern instead: the state is the distinct (group, member) set itself —
union-distinct to merge, count per group to finalize. The state is as
big as the distinct membership, but merging still never touches raw
history.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import MONEY

# Partial columns carried by the category-KPI state table.
_STATE_COLS = ["rev_sum", "price_cnt", "row_cnt", "returned_cnt"]


def category_kpi_state(prepared: DataFrame) -> DataFrame:
    """Partial-aggregate state for the CategoryKPIs table from one batch.

    Grain: (category, order_date). Every column is an associative
    partial: exact decimal revenue sum, non-null price count (the
    ``avg_order_value`` denominator), row count (the ``avg_return_rate``
    denominator), returned-flag sum. One hash aggregation over batch
    rows only.
    """
    return prepared.groupBy("category", "order_date").agg(
        F.sum(F.col("sale_price").cast(MONEY)).alias("rev_sum"),
        F.count("sale_price").alias("price_cnt"),
        F.count(F.lit(1)).alias("row_cnt"),
        F.sum("returned_item_flag").cast("bigint").alias("returned_cnt"),
    )


def merge_kpi_states(states: list[DataFrame]) -> DataFrame:
    """Merge any number of state tables into one.

    Union + a single hash re-aggregation: decimal/bigint sums are
    associative and commutative, so the result is independent of batch
    boundaries, merge order, and partitioning. On partitioned state
    storage the union's groupBy shuffles only (group, 4 partials) rows —
    O(|state|), never O(raw history).
    """
    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy("category", "order_date").agg(
        *[F.sum(c).alias(c) for c in _STATE_COLS]
    )


def finalize_category_kpis(state: DataFrame) -> DataFrame:
    """Derive the published CategoryKPIs from merged state.

    Identical formulas to ``operators.kpis.category_kpis``: exact decimal
    numerator cast to DOUBLE, divided once by the exact count — so a
    merge-then-finalize over any batch split hash-matches the
    full-history recompute.
    """
    return state.select(
        "category",
        "order_date",
        F.col("rev_sum").cast("double").alias("daily_revenue"),
        (F.col("rev_sum").cast("double") / F.col("price_cnt")).alias(
            "avg_order_value"
        ),
        (F.col("returned_cnt").cast("double") / F.col("row_cnt")).alias(
            "avg_return_rate"
        ),
    )


def distinct_member_state(df: DataFrame, group_col: str, member_col: str) -> DataFrame:
    """Keyed state for an exact countDistinct KPI: the distinct
    (group, member) pairs contributed by one batch.

    countDistinct is not algebraic — no fixed-size partial exists (short
    of an approximate HLL sketch). The exact mergeable form is the
    membership set itself, stored as a two-column state table.
    """
    return df.select(group_col, member_col).distinct()


def merge_distinct_states(states: list[DataFrame]) -> DataFrame:
    """Union-distinct of membership states — associative, idempotent
    (re-delivered batches are absorbed), one shuffle on the pair key."""
    return reduce(DataFrame.unionByName, states).distinct()


def finalize_distinct_count(state: DataFrame, group_col: str, alias: str) -> DataFrame:
    """COUNT(*) per group over the merged membership = exact
    countDistinct over all history."""
    return state.groupBy(group_col).agg(F.count(F.lit(1)).alias(alias))


def negate_state(state: DataFrame, group_cols: list[str]) -> DataFrame:
    """Sign-flip every partial column — the RETRACTION image of a state.

    Sums and counts form a group under addition, so deletes and the old
    image of updates merge as negated partials: applying a CDC changelog
    to a state table is
    ``merge(state, negate(state(removed rows)), state(added rows))`` —
    O(changelog), never O(history). Groups whose row count reaches zero
    must be dropped after the merge (``drop_empty_groups``) to match a
    recompute, which would never have produced them.

    Non-invertible aggregates (min/max, distinct members) cannot retract
    from a scalar partial — they need the keyed membership state
    (``distinct_member_state``) or a recompute of the affected groups.
    """
    partials = [c for c in state.columns if c not in group_cols]
    return state.select(
        *group_cols, *[(-F.col(c)).alias(c) for c in partials]
    )


def drop_empty_groups(state: DataFrame, count_col: str = "row_cnt") -> DataFrame:
    """Remove groups fully retracted away (count reached zero)."""
    return state.filter(F.col(count_col) != 0)


def merge_states(states: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Generic state merge: union + one re-aggregation summing every
    non-group column. The schema IS the contract — any table of
    (group_cols, additive partials) merges, including negated retraction
    images from ``negate_state``."""
    unioned = reduce(DataFrame.unionByName, states)
    partials = [c for c in unioned.columns if c not in group_cols]
    return unioned.groupBy(*group_cols).agg(
        *[F.sum(c).alias(c) for c in partials]
    )
