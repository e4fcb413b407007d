"""Expectation-suite semantics on injected bad data: every rule kind
counts exactly the rows constructed to violate it, in one aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators import expectations as X


def _suite_result(spark):
    rows = [
        # (id, code, price, status)
        (1, "A-1", 10.0, "ok"),
        (2, "B-2", -5.0, "ok"),      # between violation
        (2, "C-3", 20.0, "bad"),     # duplicate id + in_set violation
        (None, "x", 30.0, "ok"),     # not_null + matches violations
        (4, None, None, "ok"),       # matches (null) + between (null) violations
    ]
    df = spark.createDataFrame(rows, "id bigint, code string, price double, status string")
    out = X.check(
        df,
        [
            X.not_null("id"),
            X.unique("id"),
            X.between("price", 0.0, 100.0),
            X.in_set("status", ["ok"]),
            X.matches("code", "^[A-Z]-[0-9]$"),
            X.satisfies("price_lt_25", F.col("price") < 25.0),
        ],
    )
    return {r["rule"]: r for r in out.collect()}


def test_rule_counts(spark):
    got = _suite_result(spark)
    assert got["not_null_id"]["violations"] == 1
    assert got["unique_id"]["violations"] == 1  # 4 non-null ids, 3 distinct
    assert got["between_price"]["violations"] == 2  # -5.0 and NULL
    assert got["in_set_status"]["violations"] == 1
    assert got["matches_code"]["violations"] == 2  # 'x' and NULL
    assert got["price_lt_25"]["violations"] == 2  # 30.0 and NULL
    assert all(r["rows_checked"] == 5 for r in got.values())
    assert not any(r["passed"] for r in got.values() if r["violations"])


def test_clean_data_passes(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id bigint, price double")
    out = X.check(df, [X.not_null("id"), X.unique("id"), X.between("price", 0, 10)])
    assert all(r["passed"] for r in out.collect())
