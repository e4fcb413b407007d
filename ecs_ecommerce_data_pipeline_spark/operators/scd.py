"""Slowly-changing-dimension (type 2) maintenance.

The reference's products table is overwritten wholesale each batch
(``transform_task.py`` re-reads the full products CSV; history is lost).
A warehouse-grade engine keeps dimension HISTORY: SCD2 rows carry
``(valid_from, valid_to, is_current)`` and an update closes the current
version and opens a new one — the MERGE-with-history pattern every
at-scale dimension needs.

Shape: one broadcast equi-join between the current dimension and the
update batch (build side = the small batch — the normal case: daily
changed rows vs the full dimension) drives the close/open/no-op logic,
plus one anti probe for brand-new keys. The anti probe CANNOT broadcast
the batch (Spark's LeftAnti only builds the right side, which here is
the dimension's key column), so it shuffles update keys against
dimension keys — O(|dim keys|) shuffle bytes of 8-byte keys, not rows.
No windows, no driver state; cost O(|dim| + |updates|).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    eff_col: str = "eff_date",
    broadcast_updates: bool = True,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``dim``:     (key, *attrs, valid_from, valid_to, is_current) — history
                 rows have ``is_current = false`` and a non-null
                 ``valid_to``; current rows the opposite.
    ``updates``: (key, *attrs, eff_col) — at most one row per key (a
                 batch is deduped upstream to latest-per-key).

    Semantics (classic type 2):

    * current row whose attrs DIFFER from its update → closed
      (``valid_to = eff_date``, ``is_current = false``) and a new
      version row opens (``valid_from = eff_date``);
    * current row with NO update, or an update with identical attrs
      (no-op) → unchanged;
    * update for an unseen key → inserted as a new current row;
    * history rows pass through untouched.
    """
    upd = updates.select(
        F.col(key),
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
        F.col(eff_col).alias("_u_eff"),
        # explicit match marker — inferring "an update arrived" from
        # _u_eff nullness would silently no-op an update row whose
        # effective date is NULL instead of surfacing it as a change
        F.lit(True).alias("_u_present"),
    )
    if broadcast_updates:
        upd = F.broadcast(upd)

    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    joined = cur.join(upd, key, "left")
    # changed = an update arrived AND at least one tracked attribute
    # differs (null-safe) — identical updates are no-ops
    diff: Column = F.lit(False)
    for a in attrs:
        diff = diff | ~F.col(a).eqNullSafe(F.col(f"_u_{a}"))
    changed = F.col("_u_present").isNotNull() & diff

    # existing current rows: closed if a differing update arrived
    kept = joined.select(
        key,
        *attrs,
        "valid_from",
        F.when(changed, F.col("_u_eff")).otherwise(F.col("valid_to")).alias("valid_to"),
        F.when(changed, F.lit(False)).otherwise(F.lit(True)).alias("is_current"),
    )

    # new version rows for differing updates (key exists) — reuse the
    # SAME joined relation so Catalyst computes the join once per branch
    # of the union rather than once per subtree copy
    opened = (
        joined.filter(changed)
        .select(
            key,
            *[F.col(f"_u_{a}").alias(a) for a in attrs],
            F.col("_u_eff").alias("valid_from"),
            F.lit(None).cast(dict(dim.dtypes)["valid_to"]).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )

    # brand-new keys: updates with no current row at all
    inserted = (
        upd.join(cur.select(key), key, "left_anti")
        .select(
            key,
            *[F.col(f"_u_{a}").alias(a) for a in attrs],
            F.col("_u_eff").alias("valid_from"),
            F.lit(None).cast(dict(dim.dtypes)["valid_to"]).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )

    out_cols = [key, *attrs, "valid_from", "valid_to", "is_current"]
    return (
        hist.select(*out_cols)
        .unionByName(kept.select(*out_cols))
        .unionByName(opened)
        .unionByName(inserted)
    )
