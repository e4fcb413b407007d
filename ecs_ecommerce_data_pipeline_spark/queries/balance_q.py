"""Capped running balance: the canonical NOT-window-expressible fold.

A running sum whose next value depends on the CLIPPED previous value
(``bal = min(cap, bal + amount)``) cannot be written with window
functions — the clip feeds back into the accumulation, so no prefix-sum
decomposition exists. This is precisely the case the engine's
"UDFs are the slow path" rule carves out as legitimate: per-key
``applyInPandas`` with Arrow batches, keys parallel across the cluster,
the (inherently sequential) fold running vectorized-per-key in numpy-
speed Python while everything around it stays in Catalyst.

The oracle proves the semantics with a recursive CTE walking each
customer's order sequence — slow, but an independent second
implementation of the same fold.

Determinism: amounts fold in integer CENTS (exact, associativity not
required — the order is pinned by (date, orderkey)), converted to
double once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources.testdata import load_table

_CAP_CENTS = 30_000_000  # $300k credit cap


def capped_balances(
    orders: DataFrame, cap_cents: int = _CAP_CENTS
) -> DataFrame:
    """Per-customer capped running balance over orders in
    (o_orderdate, o_orderkey) order. Returns one row per customer:
    (o_custkey, n_orders, n_caps_hit, final_balance)."""
    import pandas as pd

    prepared = orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("od"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["od", "o_orderkey"])
        bal, hits = 0, 0
        for c in pdf["cents"]:
            bal += int(c)
            if bal > cap_cents:
                bal = cap_cents
                hits += 1
        return pd.DataFrame(
            {
                "o_custkey": [int(pdf["o_custkey"].iloc[0])],
                "n_orders": [len(pdf)],
                "n_caps_hit": [hits],
                "final_balance": [bal / 100.0],
            }
        )

    return prepared.groupBy("o_custkey").applyInPandas(
        fold,
        "o_custkey bigint, n_orders bigint, n_caps_hit bigint, final_balance double",
    )


_BALANCE_SQL = f"""
WITH RECURSIVE ranked AS (
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS STRING), o_orderkey) AS rn
    FROM orders
),
walk AS (
    SELECT o_custkey, rn,
           CASE WHEN cents > {_CAP_CENTS} THEN {_CAP_CENTS} ELSE cents END AS bal,
           CASE WHEN cents > {_CAP_CENTS} THEN 1 ELSE 0 END AS hits
    FROM ranked WHERE rn = 1
    UNION ALL
    SELECT r.o_custkey, r.rn,
           CASE WHEN w.bal + r.cents > {_CAP_CENTS} THEN {_CAP_CENTS}
                ELSE w.bal + r.cents END,
           w.hits + CASE WHEN w.bal + r.cents > {_CAP_CENTS} THEN 1 ELSE 0 END
    FROM walk w JOIN ranked r
      ON r.o_custkey = w.o_custkey AND r.rn = w.rn + 1
)
SELECT o_custkey,
       CAST(MAX(rn) AS BIGINT) AS n_orders,
       CAST(MAX(hits) AS BIGINT) AS n_caps_hit,
       CAST(MAX(CASE WHEN rn = mx THEN bal END) AS DOUBLE) / 100.0 AS final_balance
FROM (SELECT *, MAX(rn) OVER (PARTITION BY o_custkey) AS mx FROM walk) t
GROUP BY o_custkey
"""


@register("capped_running_balance", _BALANCE_SQL)
def q_capped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip-fed running balance per customer — see module docstring for
    why this is the legitimate ``applyInPandas`` case."""
    return capped_balances(load_table(spark, sf_dir, "orders"))
