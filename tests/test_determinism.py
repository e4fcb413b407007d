"""Partitioning-independence: the determinism contract, executed.

The engine claims its results are BIT-IDENTICAL across partitionings
(decimal/integer-scaled sums, pinned tie-breaks). These tests run the
most numerically sensitive queries under two very different shuffle
configurations and require byte-equal results — the property that makes
a 1000-executor run reproduce a laptop run.
"""

from __future__ import annotations

import pytest

from ecs_ecommerce_data_pipeline_spark import catalog

SF = "/root/testdata/sf0.001"

# The queries where a naive implementation (running double sums,
# unpinned ties, partition-dependent sampling) would diverge first.
_SENSITIVE = [
    "stats_moments",
    "graph_pagerank_purchases",
    "sim_kmeans_clusters",
    "sim_lsh_buckets",
    "daily_kpis",
    "split_train_val_test",
    "bm25_retrieval",
    # round-3 additions: window-identity fold, numpy segment fold with
    # cross-batch carry, per-partition Arrow covariance partials
    "capped_running_balance",
    "settled_running_balance",
    "embedding_covariance_arrow",
]


def _rows(spark, name: str, partitions: int):
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = catalog.queries()[name](spark, SF)
        # the catalog tuner re-sets the conf from input size; override
        # AFTER query construction so execution uses our partitioning
        spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
        cols = sorted(df.columns)
        return sorted(
            tuple(repr(r[c]) for c in cols) for r in df.collect()
        )
    finally:
        spark.conf.unset("spark.sql.shuffle.partitions")


@pytest.mark.parametrize("name", _SENSITIVE)
def test_results_identical_across_partitionings(spark, name):
    a = _rows(spark, name, 2)
    b = _rows(spark, name, 17)  # prime, very different layout
    assert a == b, f"{name} diverges across shuffle partitionings"
