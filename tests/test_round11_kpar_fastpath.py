"""Round-11 k-means|| single-task fast path: the one-task Arrow kernel
must reproduce the distributed oversample chain EXACTLY — candidates,
weights, and per-round stats (ψ, picks) — because both feed the same
DuckDB-oracle-pinned queries (sim_kmeanspar_rounds / _purity and the
trained IVF-PQ builds)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators import similarity

GATE = "SPARK_GRAFT_KPAR_SINGLE_TASK_DOUBLES"


def _fixture(spark, n=240, dims=6):
    # md5-analytic deterministic vectors, a few near-duplicate ridges so
    # the cost distribution is non-trivial across rounds
    vec = (
        f"transform(sequence(0, {dims - 1}), d -> "
        f"CAST(conv(substr(md5(concat('kpt:', cast(vec_id as string), ':', "
        f"cast(d as string))), 1, 15), 16, 10) AS DOUBLE) / 1152921504606846976.0"
        f" + CAST(vec_id % 4 AS DOUBLE))"
    )
    return spark.range(n).select(
        F.col("id").cast("bigint").alias("vec_id"),
        F.expr(vec).alias("embedding"),
    )


def _run(spark, gate_value, n=240):
    old = os.environ.get(GATE)
    os.environ[GATE] = gate_value
    try:
        cands, stats = similarity.kmeans_parallel_oversample(
            _fixture(spark, n=n), l=8, rounds=3
        )
        rows = sorted(
            (int(r["vid"]), tuple(r["vec"]), float(r["nrm"]), int(r["weight"]))
            for r in cands.collect()
        )
        return rows, stats
    finally:
        if old is None:
            os.environ.pop(GATE, None)
        else:
            os.environ[GATE] = old


def test_kpar_fast_path_matches_distributed(spark):
    fast_rows, fast_stats = _run(spark, str(1 << 30))
    slow_rows, slow_stats = _run(spark, "0")
    assert fast_stats == slow_stats
    assert len(fast_rows) == len(slow_rows)
    for fr, sr in zip(fast_rows, slow_rows):
        assert fr[0] == sr[0]
        assert fr[1] == sr[1]  # bit-identical candidate vectors
        assert fr[2] == sr[2]  # bit-identical norms
        assert fr[3] == sr[3]  # identical attraction weights


def test_kpar_fast_path_empty_input(spark):
    os.environ[GATE] = str(1 << 30)
    try:
        cands, stats = similarity.kmeans_parallel_oversample(
            _fixture(spark).filter(F.col("vec_id") < 0), l=8, rounds=2
        )
        assert cands.count() == 0
        assert [s["n_sampled"] for s in stats] == [0, 0]
    finally:
        os.environ.pop(GATE, None)


def test_kpar_dispatch_respects_gate(spark):
    # gate of 0 must force the distributed loop even for a tiny corpus
    os.environ[GATE] = "0"
    try:
        cands, stats = similarity.kmeans_parallel_oversample(
            _fixture(spark, n=40), l=4, rounds=1
        )
        assert stats[0]["psi_q"] > 0
        assert cands.count() >= 1
    finally:
        os.environ.pop(GATE, None)


