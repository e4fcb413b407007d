"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent: a distributed Spark sum and a DuckDB
sum over the same doubles can differ in the last ulps, which breaks
value-hash comparison and makes results nondeterministic across
partitionings. The engine routes money aggregation through
``DECIMAL(18,2)`` — exact and associative — then casts the final result to
DOUBLE. The corresponding oracle-SQL idiom is::

    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)

which yields bit-identical results in any engine and any partitioning.
This also honors the reference sink's Decimal contract
(reference ``ecs/transformation/transform_task.py:299-302`` converts every
money value to ``Decimal(str(x))`` before the DynamoDB write).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def money_sum(col: str | Column) -> Column:
    """Exact, order-independent sum of a 2-decimal money column → DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double")


def money_avg(col: str | Column) -> Column:
    """Mean of a money column, computed as exact decimal sum / count.

    Division happens once, in IEEE double — deterministic given the exact
    numerator, unlike a running double mean.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double") / F.count(c)


def rate(flag: str | Column) -> Column:
    """Mean of a 0/1 integer flag column: exact integer sum / row count."""
    c = F.col(flag) if isinstance(flag, str) else flag
    return F.sum(c).cast("double") / F.count(F.lit(1))
