"""Data-quality expectation-suite queries.

The engine twin of "Great Expectations"-style declarative validation,
built on ``operators.expectations`` — the generalization of the
reference's hardcoded checks (``ecs/validation/validate_task.py:153-207``:
required columns, null counts, referential integrity) into a rule
catalog evaluated in one aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators import expectations as X
from ..sources.testdata import load_table

_DQ_ORDERS_SQL = """
WITH base AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_checked,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS v_not_null,
           CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
               AS v_unique,
           CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice BETWEEN 0 AND 200000, FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_between,
           CAST(SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('F','O','P'), FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_in_set,
           CAST(SUM(CASE WHEN NOT COALESCE(regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$'), FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_matches,
           CAST(SUM(CASE WHEN NOT COALESCE(o_orderdate BETWEEN TIMESTAMP '1992-01-01'
                         AND TIMESTAMP '1998-12-31', FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v_daterange
    FROM orders
)
SELECT 'not_null_o_custkey' AS rule, rows_checked, v_not_null AS violations,
       v_not_null = 0 AS passed FROM base
UNION ALL
SELECT 'unique_o_orderkey', rows_checked, v_unique, v_unique = 0 FROM base
UNION ALL
SELECT 'between_o_totalprice', rows_checked, v_between, v_between = 0 FROM base
UNION ALL
SELECT 'in_set_o_orderstatus', rows_checked, v_in_set, v_in_set = 0 FROM base
UNION ALL
SELECT 'matches_o_orderpriority', rows_checked, v_matches, v_matches = 0 FROM base
UNION ALL
SELECT 'orderdate_in_range', rows_checked, v_daterange, v_daterange = 0 FROM base
"""


@register("dq_expectations", _DQ_ORDERS_SQL)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-rule expectation suite over orders — nullability, uniqueness,
    range, domain, format, and date-window checks, all from one scan.
    ``between_o_totalprice`` is a deliberate outlier probe (large orders
    violate it), showing a failing rule reports rather than errors.
    """
    orders = load_table(spark, sf_dir, "orders")
    rules = [
        X.not_null("o_custkey"),
        X.unique("o_orderkey"),
        X.between("o_totalprice", 0, 200000),
        X.in_set("o_orderstatus", ["F", "O", "P"]),
        X.matches("o_orderpriority", "^[1-5]-[A-Z]+$"),
        X.satisfies(
            "orderdate_in_range",
            F.col("o_orderdate").between("1992-01-01", "1998-12-31"),
        ),
    ]
    return X.check(orders, rules)
