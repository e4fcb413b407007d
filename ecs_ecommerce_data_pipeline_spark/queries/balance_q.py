"""Capped running balance: the canonical NOT-window-expressible fold.

A running sum whose next value depends on the CLIPPED previous value
(``bal = min(cap, bal + amount)``) cannot be written with window
functions — the clip feeds back into the accumulation, so no prefix-sum
decomposition exists. This is precisely the case the engine's
"UDFs are the slow path" rule carves out as legitimate. The fold runs
at PARTITION granularity (``mapInPandas`` after co-locating and sorting
each key's rows) rather than per-key ``applyInPandas`` — with ~150k
tiny groups the per-group Python-call overhead dominates by an order of
magnitude; the partition-level fold touches each row exactly once.

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

    # Many-small-groups shape: per-group applyInPandas pays a Python
    # call + pandas frame per CUSTOMER (~150k at sf0.1 → tens of
    # seconds). Instead: co-locate each customer on one partition, sort
    # within partitions, and fold whole Arrow batches — per-customer
    # state rides a dict across the partition's batch iterator. One
    # shuffle + one sort, Python touches each ROW once.
    def fold_partition(batches):
        state: dict[int, list[int]] = {}  # cust -> [bal, hits, n]
        for pdf in batches:
            for cust, cents in zip(pdf["o_custkey"], pdf["cents"]):
                st = state.get(cust)
                if st is None:
                    st = state[cust] = [0, 0, 0]
                bal = st[0] + int(cents)
                if bal > cap_cents:
                    bal = cap_cents
                    st[1] += 1
                st[0] = bal
                st[2] += 1
        if state:
            yield pd.DataFrame(
                {
                    "o_custkey": [int(c) for c in state],
                    "n_orders": [v[2] for v in state.values()],
                    "n_caps_hit": [v[1] for v in state.values()],
                    "final_balance": [v[0] / 100.0 for v in state.values()],
                }
            )

    return (
        prepared.repartition("o_custkey")
        .sortWithinPartitions("o_custkey", "od", "o_orderkey")
        .mapInPandas(
            fold_partition,
            "o_custkey bigint, n_orders bigint, n_caps_hit bigint, final_balance double",
        )
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
