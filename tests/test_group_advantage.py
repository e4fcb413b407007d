"""GRPO group-relative advantage (round 10).

``group_relative_advantage`` materializes the critic-free baseline —
per prompt group: adv = (r − mean)/std on quantized rewards with exact
integer centering.  Pinned here: per-group advantages sum to ~0 and
have unit scale, the zero-variance guard, exact centering arithmetic
on a hand case, and determinism."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_group_advantage_hand_case(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.preference import (
        group_relative_advantage,
    )

    # group 1: rewards 1, 3 (q-units) → mean 2, pop-std 1 → adv ±1
    # group 2: all equal → zero variance → adv 0
    rows = spark.createDataFrame(
        [(1, 0, 1), (1, 1, 3), (2, 0, 5), (2, 1, 5), (2, 2, 5)],
        "prompt_id bigint, sample_idx bigint, reward_q bigint",
    )
    got = {
        (r["prompt_id"], r["sample_idx"]): (r["d_num"], r["adv_q"])
        for r in group_relative_advantage(rows).collect()
    }
    # d = G*r - S: group 1: G=2, S=4 → d = -2, +2
    assert got[(1, 0)] == (-2, -1048576)  # adv exactly -1.0
    assert got[(1, 1)] == (2, 1048576)
    assert got[(2, 0)] == (0, 0)
    assert got[(2, 1)] == (0, 0)
    assert got[(2, 2)] == (0, 0)


def test_group_advantage_normalization_properties(spark):
    from ecs_ecommerce_data_pipeline_spark import catalog

    rows = catalog.queries()["pref_group_advantage"](spark, SF).collect()
    assert rows
    by_group: dict[int, list[float]] = {}
    for r in rows:
        by_group.setdefault(r["prompt_id"], []).append(
            r["adv_q"] / 1048576.0
        )
    for pid, advs in by_group.items():
        assert len(advs) == 8, pid
        m = sum(advs) / len(advs)
        assert abs(m) < 1e-4, (pid, m)  # centered (up to quantization)
        var = sum(a * a for a in advs) / len(advs)
        assert abs(var - 1.0) < 1e-3, (pid, var)  # unit population std


def test_group_advantage_deterministic(spark):
    from ecs_ecommerce_data_pipeline_spark import catalog

    q = catalog.queries()["pref_group_advantage"]
    a = sorted(tuple(r) for r in q(spark, SF).collect())
    b = sorted(tuple(r) for r in q(spark, SF).collect())
    assert a == b
