"""snapshot_diff semantics: every change class, null-safe comparisons,
composite keys."""

from __future__ import annotations

from ecs_ecommerce_data_pipeline_spark.operators.cdc import snapshot_diff


def _by_key(df, key="id"):
    return {r[key]: r for r in df.collect()}


def test_change_classes(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)],
        "id bigint, v string, p double",
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "CHANGED", 3.0), (4, None, 4.0), (5, "e", 5.0)],
        "id bigint, v string, p double",
    )
    got = _by_key(snapshot_diff(old, new, ["id"]))
    assert set(got) == {1, 3, 5}
    assert got[1]["change_type"] == "delete"
    assert got[3]["change_type"] == "update"
    assert got[3]["old_v"] == "c" and got[3]["new_v"] == "CHANGED"
    assert got[5]["change_type"] == "insert"
    # row 2 identical, row 4 NULL<=>NULL — both unchanged, excluded


def test_null_transitions_are_updates(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "id bigint, v string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "id bigint, v string")
    got = _by_key(snapshot_diff(old, new, ["id"]))
    assert got[1]["change_type"] == "update"
    assert got[2]["change_type"] == "update"


def test_include_unchanged_and_composite_key(spark):
    old = spark.createDataFrame([(1, "A", 10), (1, "B", 20)], "k1 bigint, k2 string, v bigint")
    new = spark.createDataFrame([(1, "A", 10), (1, "B", 21)], "k1 bigint, k2 string, v bigint")
    got = snapshot_diff(old, new, ["k1", "k2"], include_unchanged=True).collect()
    types = {(r["k1"], r["k2"]): r["change_type"] for r in got}
    assert types == {(1, "A"): "unchanged", (1, "B"): "update"}


def test_null_key_rows_compare_not_insert_delete(spark):
    """A NULL key is a joinable value under the null-safe join — a
    NULL-keyed row present in both snapshots must classify by its
    attributes, never split into insert+delete."""
    from ecs_ecommerce_data_pipeline_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(None, 1.0), (1, 2.0)], "k int, v double")
    new = spark.createDataFrame([(None, 9.0), (1, 2.0)], "k int, v double")
    got = {
        (r["k"], r["change_type"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {(None, "update")}
