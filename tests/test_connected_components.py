"""Iterative min-label connected components: must reach the transitive-
closure fixpoint on worst-case (chain) graphs, not just the near-clique
graphs LSH produces; oracle parity for the catalog query is covered by
``test_oracle_parity.py``.
"""

from __future__ import annotations

from ecs_ecommerce_data_pipeline_spark.operators.dedup import connected_components


def _components(spark, pairs):
    edges = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    rows = connected_components(edges).collect()
    return {r["node"]: r["component"] for r in rows}


def test_chain_collapses_to_min_label(spark):
    # path 1-2-3-4-5: diameter 4 forces multiple propagation rounds
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_stay_separate(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cycle_and_cross_edges(spark):
    # cycle 5-6-7-5 bridged to 1-2 via (2,5): all one component
    got = _components(spark, [(5, 6), (6, 7), (5, 7), (1, 2), (2, 5)])
    assert set(got.values()) == {1}


def test_incremental_components_equals_full_recompute(spark):
    """CC(old edges) folded with a new batch via star contraction must
    equal CC over the union of all edges — including merges of two old
    components through a new bridge edge, brand-new nodes, and
    untouched components."""
    from ecs_ecommerce_data_pipeline_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    old_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)],
        "doc_a long, doc_b long",
    )
    # bridges components {1,2,3} and {10,11}; extends {20,21}; adds new
    # nodes 40/41; leaves {30,31} untouched
    new_edges = spark.createDataFrame(
        [(3, 10), (21, 22), (40, 41)], "doc_a long, doc_b long"
    )
    full = {
        (r["node"], r["component"])
        for r in connected_components(
            old_edges.unionByName(new_edges)
        ).collect()
    }
    incr = {
        (r["node"], r["component"])
        for r in incremental_components(
            connected_components(old_edges), new_edges
        ).collect()
    }
    assert incr == full
    assert (10, 1) in incr  # the bridge really merged the components
    assert (31, 30) in incr  # untouched component survives
