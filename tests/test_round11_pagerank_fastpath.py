"""Round-11 optimization pin: the single-task PageRank kernel must be
bit-identical to the distributed iteration (2^40 integer-scaled sums are
order-free; every float op is the same elementwise IEEE chain), for both
the global and the personalized form, across the env-gated dispatch.
"""

from __future__ import annotations

from ecs_ecommerce_data_pipeline_spark.operators.graph import (
    pagerank,
    personalized_pagerank,
)

# a graph with a hub, a chain, a 2-cycle and a DANGLING sink (9 only
# ever a dst): exercises outdeg variety and the leak-is-accepted path
_EDGES = [
    (1, 2), (1, 3), (1, 4), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4),
    (7, 8), (8, 7), (3, 9),
]


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def _edges_df(spark):
    return spark.createDataFrame(_EDGES, "src bigint, dst bigint")


def test_pagerank_fast_matches_distributed(spark, monkeypatch):
    fast = _ranks(pagerank(_edges_df(spark), iters=3))
    monkeypatch.setenv("SPARK_GRAFT_PR_SINGLE_TASK_EDGES", "0")
    slow = _ranks(pagerank(_edges_df(spark), iters=3))
    assert set(fast) == set(slow) == {1, 2, 3, 4, 5, 6, 7, 8, 9}
    for n in fast:
        assert fast[n] == slow[n], (n, fast[n], slow[n])  # bit-identical


def test_ppr_fast_matches_distributed(spark, monkeypatch):
    seeds = spark.createDataFrame([(1,), (7,), (99,)], "node bigint")
    fast = _ranks(personalized_pagerank(_edges_df(spark), seeds, iters=3))
    monkeypatch.setenv("SPARK_GRAFT_PR_SINGLE_TASK_EDGES", "0")
    slow = _ranks(
        personalized_pagerank(_edges_df(spark), seeds, iters=3)
    )
    assert set(fast) == set(slow)
    for n in fast:
        assert fast[n] == slow[n], (n, fast[n], slow[n])
    # out-of-graph seed 99 dilutes restart mass (n_seeds = 3): total
    # restart share actually placed is 2/3 of 1
    assert abs(sum(v for n, v in fast.items() if n in (1, 7)) - 0.0) > 0


def test_ppr_string_ids_and_empty_seeds(spark, monkeypatch):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string"
    )
    seeds = spark.createDataFrame([], "node string")
    fast = _ranks(personalized_pagerank(edges, seeds, iters=2))
    monkeypatch.setenv("SPARK_GRAFT_PR_SINGLE_TASK_EDGES", "0")
    slow = _ranks(personalized_pagerank(edges, seeds, iters=2))
    assert fast == slow
    assert all(v == 0.0 for v in fast.values())  # no seeds -> no mass


def test_pagerank_empty_edges(spark):
    empty = spark.createDataFrame([], "src bigint, dst bigint")
    assert pagerank(empty, iters=2).count() == 0
