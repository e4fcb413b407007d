"""Materialized-view routing: answer rollup queries from aggregate state
instead of raw history.

``operators.incremental_agg`` maintains per-group additive partials
(the state tables that replace the reference's re-read-everything loop,
``ecs/transformation/transform_task.py:409-413``). This module closes
the loop on the *read* side: a rollup whose grouping columns are a
subset of some state table's dims — and whose measures derive from its
partials — never needs the fact table at all. At 100 TB that is the
difference between scanning |state| (thousands of rows) and |history|.

Matching is classic ROLAP view routing:

* a view can answer a request iff ``request dims ⊆ view dims`` and
  every requested partial column exists in the view (additive partials
  re-aggregate to any coarser grain — sums of sums);
* among candidates, pick the view with the FEWEST dims (coarsest
  usable grain ⇒ smallest state to re-aggregate);
* no candidate ⇒ return None and let the caller fall back to the base
  tables — routing is an optimization, never a semantics change.

Correctness contract: partials are exact (DECIMAL/BIGINT), so
re-aggregating a finer-grain state and finalizing gives *bit-identical*
results to a full recompute — pinned by ``mv_rollup_category``'s oracle,
which is the plain recompute SQL.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MaterializedView:
    """A registered aggregate state table.

    ``dims``: grouping columns of the state's grain. ``partials``:
    additive state columns (sums/counts — anything ``F.sum`` merges).
    """

    name: str
    state: DataFrame
    dims: tuple[str, ...]
    partials: tuple[str, ...]


def can_answer(
    view: MaterializedView, dims: list[str], partials: list[str]
) -> bool:
    return set(dims) <= set(view.dims) and set(partials) <= set(view.partials)


def choose_view(
    views: list[MaterializedView], dims: list[str], partials: list[str]
) -> MaterializedView | None:
    """Best usable view: fewest dims, name as the deterministic
    tie-break. None if nothing matches (caller must fall back)."""
    usable = [v for v in views if can_answer(v, dims, partials)]
    if not usable:
        return None
    return min(usable, key=lambda v: (len(v.dims), v.name))


def rollup_from_view(
    view: MaterializedView, dims: list[str], partials: list[str]
) -> DataFrame:
    """Re-aggregate the view's partials to the requested grain.

    One hash aggregation over |state| rows — additive partials stay
    exact under the coarsening, so any finalization formula computed on
    the result is bit-identical to a recompute from history.
    """
    return view.state.groupBy(*dims).agg(
        *[F.sum(c).alias(c) for c in partials]
    )


def route_rollup(
    views: list[MaterializedView],
    dims: list[str],
    partials: list[str],
) -> tuple[MaterializedView, DataFrame] | None:
    """``choose_view`` + ``rollup_from_view``; None when no view can
    answer (the caller falls back to base tables)."""
    view = choose_view(views, dims, partials)
    if view is None:
        return None
    return view, rollup_from_view(view, dims, partials)
