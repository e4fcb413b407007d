"""Preference / annotation-QA operator invariants: Bradley-Terry
ranking follows dominance, Fleiss' kappa hits its closed-form poles
(perfect agreement = 1, constant-rater disagreement < 0), win rates
reduce exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators import preference


def _comp(spark, rows):
    return spark.createDataFrame(
        rows, "sys_a bigint, sys_b bigint, winner bigint"
    )


def test_winrate_matrix_reduces_exactly(spark):
    df = _comp(spark, [(0, 1, 0), (0, 1, 0), (0, 1, 1), (1, 2, 2)])
    got = {
        (r["sys_a"], r["sys_b"]): (r["n_comparisons"], r["wins_a"],
                                   r["winrate_a"])
        for r in preference.pairwise_winrates(df).collect()
    }
    assert got == {(0, 1): (3, 2, 2.0 / 3.0), (1, 2): (1, 0, 0.0)}


def test_bradley_terry_ranks_by_dominance(spark):
    # A beats B 3:1, B beats C 3:1, A beats C 4:0 — strict dominance
    rows = (
        [(0, 1, 0)] * 3 + [(0, 1, 1)]
        + [(1, 2, 1)] * 3 + [(1, 2, 2)]
        + [(0, 2, 0)] * 4
    )
    out = {
        r["system"]: (r["strength"], r["rnk"])
        for r in preference.bradley_terry(_comp(spark, rows), iters=2)
        .collect()
    }
    assert out[0][1] == 1 and out[1][1] == 2 and out[2][1] == 3
    assert out[0][0] > out[1][0] > out[2][0] > 0


def test_bradley_terry_never_winning_system_gets_row(spark):
    rows = [(0, 1, 0), (0, 1, 0)]
    out = {r["system"]: r["strength"]
           for r in preference.bradley_terry(_comp(spark, rows)).collect()}
    assert set(out) == {0, 1}
    assert out[1] == 0.0  # zero wins -> zero strength, still ranked


def test_fleiss_kappa_perfect_agreement_is_exactly_one(spark):
    rows = [(i, a, i % 3) for i in range(30) for a in range(4)]
    df = spark.createDataFrame(
        rows, "item_id bigint, rater bigint, label bigint"
    )
    got = preference.fleiss_kappa(df).first()
    assert got["n_items"] == 30 and got["n_raters"] == 4
    assert got["p_bar"] == 1.0
    assert got["kappa"] == 1.0


def test_fleiss_kappa_systematic_disagreement_is_negative(spark):
    # every item: raters split 1/1 across two labels -> observed
    # agreement 0, kappa < 0
    rows = [(i, 0, 0) for i in range(20)] + [(i, 1, 1) for i in range(20)]
    df = spark.createDataFrame(
        rows, "item_id bigint, rater bigint, label bigint"
    )
    got = preference.fleiss_kappa(df).first()
    assert got["p_bar"] == 0.0
    assert got["kappa"] < 0.0


def test_cohen_kappa_pairs_poles(spark):
    # raters 0 and 1 agree perfectly; rater 2 labels a constant -> its
    # pairs have p_o = p_e-dominated kappa near 0 or below
    rows = (
        [(i, 0, i % 3) for i in range(30)]
        + [(i, 1, i % 3) for i in range(30)]
        + [(i, 2, 0) for i in range(30)]
    )
    df = spark.createDataFrame(
        rows, "item_id bigint, rater bigint, label bigint"
    )
    got = {
        (r["rater_a"], r["rater_b"]): r
        for r in preference.cohen_kappa_pairs(df).collect()
    }
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    assert got[(0, 1)]["kappa"] == 1.0 and got[(0, 1)]["p_o"] == 1.0
    # constant rater: observed agreement equals chance agreement -> 0
    assert got[(0, 2)]["kappa"] == 0.0
    assert got[(1, 2)]["kappa"] == 0.0
    assert all(r["n_items"] == 30 for r in got.values())
