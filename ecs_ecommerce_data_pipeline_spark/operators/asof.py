"""Temporal join operators Spark lacks natively: as-of join and range join.

The reference has no temporal joins (SURVEY §2.3 — scope decision), but a
training-data / event-analytics engine needs them; both are expressed as
compositions of existing DataFrame ops, never a cartesian product.

**As-of join** ("latest right row at or before each left timestamp") is
built as union → single shuffle on the join key → per-key sort → windowed
forward-fill (``last(..., ignorenulls=True)``). This is the textbook
distributed as-of shape: cost = one shuffle + one sort, same class as a
sort-merge join. Skewed keys (one user with millions of events) are the
risk at 100 TB — mitigate by range-bucketing the timestamp into the
partition key (gap-aligned salting) if a key exceeds executor memory.

**Range join** (point-in-interval) against a SMALL interval dimension is a
broadcast nested-loop join — the broadcast keeps it shuffle-free; with
O(1) intervals per row it is effectively a map. For large interval tables,
bucketize the point column to turn it into an equi-join (not needed here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_val: str,
    out_col: str | None = None,
) -> DataFrame:
    """For each ``left`` row, attach ``right_val`` from the latest
    ``right`` row with the same ``key`` and ``right_ts`` <= ``left_ts``
    (ties on the timestamp break toward the largest ``right_val``).

    Returns ``left``'s columns + ``out_col`` (default: ``asof_<right_val>``).

    The full left row rides through the union (right rows carry nulls
    for the payload columns), so there is exactly ONE shuffle and no
    join-back. This is deliberately the only implementation: an earlier
    variant re-attached the payload by joining back on ``[key, ts]``,
    which silently fans out when ``left`` has duplicate (key, ts) rows —
    the union-carry shape is duplicate-safe by construction (each left
    row is its own window element; see
    ``tests/test_temporal.py::test_asof_duplicate_left_timestamps``).
    """
    out_col = out_col or f"asof_{right_val}"
    rv_type = dict(right.dtypes)[right_val]
    payload = [c for c in left.columns if c not in {key, left_ts}]
    l_tagged = left.select(
        key,
        left_ts,
        *payload,
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias(left_ts),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c in payload],
        F.lit(1).alias("_is_right"),
        F.col(right_val).alias("_rv"),
    )
    # at equal ts the right row must sort BEFORE the left row (<= semantics);
    # _rv ascending makes last() break timestamp ties toward the max value
    w = (
        W.partitionBy(key)
        .orderBy(F.col(left_ts).asc(), F.col("_is_right").desc(), F.col("_rv").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        l_tagged.unionByName(r_tagged)
        .withColumn(
            out_col,
            F.last(F.when(F.col("_is_right") == 1, F.col("_rv")), ignorenulls=True).over(w),
        )
        .filter(F.col("_is_right") == 0)
        .select(key, left_ts, *payload, out_col)
    )


# Back-compat name: "dense" was the duplicate-safe variant before it
# became the only implementation.
asof_join_dense = asof_join


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Join each point row to the interval(s) with lo <= point < hi.

    ``intervals`` must be small (a dimension): it is broadcast, making
    this a shuffle-free BroadcastNestedLoopJoin with O(|intervals|)
    comparisons per row.
    """
    cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    return points.join(F.broadcast(intervals), cond, "left")


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_val: str,
    tolerance_s: float,
    out_col: str | None = None,
) -> DataFrame:
    """``asof_join`` with a staleness bound: the matched right row must
    additionally satisfy ``left_ts - right_ts <= tolerance_s`` (seconds;
    both ts columns must cast to timestamp). Matches older than the
    tolerance come back NULL — the "don't enrich from a quote that's too
    stale" rule of market-data as-of joins.

    Same single-shuffle union-carry plan: the window forward-fills a
    (matched_ts, value) struct instead of the value alone, and the
    tolerance check is a map-side filter after the fill — no extra
    shuffle, duplicate-safe like the base operator.
    """
    out_col = out_col or f"asof_{right_val}"
    rv_type = dict(right.dtypes)[right_val]
    payload = [c for c in left.columns if c not in {key, left_ts}]
    l_tagged = left.select(
        key,
        left_ts,
        *payload,
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(rv_type).alias("_rv"),
        F.lit(None).cast("timestamp").alias("_rts"),
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).cast("timestamp").alias(left_ts),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c in payload],
        F.lit(1).alias("_is_right"),
        F.col(right_val).alias("_rv"),
        F.col(right_ts).cast("timestamp").alias("_rts"),
    )
    w = (
        W.partitionBy(key)
        .orderBy(F.col(left_ts).asc(), F.col("_is_right").desc(), F.col("_rv").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = (
        l_tagged.unionByName(r_tagged)
        .withColumn(
            "_m",
            F.last(
                F.when(F.col("_is_right") == 1, F.struct("_rts", "_rv")),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("_is_right") == 0)
    )
    fresh = (
        F.col(left_ts).cast("timestamp").cast("double")
        - F.col("_m._rts").cast("double")
    ) <= F.lit(float(tolerance_s))
    return filled.select(
        key,
        left_ts,
        *payload,
        F.when(fresh, F.col("_m._rv")).alias(out_col),
    )
