"""Round-11 optimization: the single-task Arrow fast path of
``farthest_point_seeds`` must be bit-identical to the distributed
running-max chain (same picks, same centroids, same order), and the
dispatch must be size-gated and env-overridable.
"""

from __future__ import annotations

import pytest

from ecs_ecommerce_data_pipeline_spark.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def fx(spark):
    from ecs_ecommerce_data_pipeline_spark.queries.similarity_q import _clustered_fx

    return _clustered_fx(spark, SF)


def _rows(df):
    return [
        (r.cluster_id, r.seed_vid, tuple(r.centroid))
        for r in df.orderBy("cluster_id").collect()
    ]


def test_fast_path_matches_distributed_chain(fx, monkeypatch):
    fast = _rows(similarity.farthest_point_seeds(fx, k=16))
    monkeypatch.setenv("SPARK_GRAFT_FPS_SINGLE_TASK_DOUBLES", "0")
    slow = _rows(similarity.farthest_point_seeds(fx, k=16))
    assert len(fast) == 16
    # bit-identical: ids, pick order AND centroid doubles
    assert fast == slow


def test_fast_path_k_exceeds_rows(spark):
    small = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)], "vec_id bigint, embedding array<double>"
    )
    out = _rows(similarity.farthest_point_seeds(small, k=8))
    assert len(out) == 5
    assert out[0][1] == 0  # seed_0 = smallest id
    assert sorted(r[0] for r in out) == list(range(5))


def test_dispatch_threshold_env(fx, monkeypatch):
    # threshold 0 => distributed chain; sanity: same first two picks
    monkeypatch.setenv("SPARK_GRAFT_FPS_SINGLE_TASK_DOUBLES", "0")
    slow = _rows(similarity.farthest_point_seeds(fx, k=2))
    monkeypatch.delenv("SPARK_GRAFT_FPS_SINGLE_TASK_DOUBLES")
    fast = _rows(similarity.farthest_point_seeds(fx, k=2))
    assert fast == slow and len(fast) == 2


def test_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert similarity.farthest_point_seeds(empty, k=4).count() == 0
