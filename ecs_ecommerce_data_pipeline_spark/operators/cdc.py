"""Change-data-capture: diff two table snapshots into an insert/update/
delete changelog.

The reference pipeline overwrites KPI rows in place (DynamoDB put_item,
``ecs/transformation/transform_task.py:295-339``) — consumers can never
ask "what changed since yesterday?". ``snapshot_diff`` derives exactly
that from any two snapshots, which is the enabling primitive for
incremental downstream consumers (audit trails, cache invalidation,
reverse ETL, feeding ``incremental_agg`` deltas).

Scale shape: ONE full-outer shuffle join on the key — both sides
shuffle once on the same key, so on bucketed/co-partitioned snapshot
storage (``sources/bucketed.py``) it runs shuffle-free. Attribute
comparison is a null-safe conjunction evaluated inside the join's
generated code; no row hashing round-trip, no driver involvement.
Unchanged rows (the overwhelming majority between real snapshots) are
dropped inside the same stage, so the changelog — not the table — is
what flows downstream.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns one row per changed key: ``keys…, change_type ∈ {insert,
    update, delete}, old_<c>/new_<c>`` for each compared column.
    ``compare_cols`` defaults to every shared non-key column. Comparison
    is null-safe (``<=>``): NULL→value and value→NULL are updates,
    NULL→NULL is unchanged.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]

    # explicit presence flags, NOT key-nullness: the join is null-safe,
    # so a NULL key is a legitimate joinable value — inferring presence
    # from `key IS NOT NULL` would misclassify NULL-keyed rows as
    # insert+delete instead of comparing them
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}")) for k in keys],
    )
    joined = o.join(n, cond, "full_outer")

    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
        F.lit(True),
    )
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(~same, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )

    out = joined.select(
        *[
            F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out
