"""Bucketed (pre-partitioned, co-located) tables: shuffle-free fact-fact
joins.

The reference re-shuffles its facts on every run — its item×order join
(reference ``ecs/transformation/transform_task.py:196-200``) repartitions
both sides by ``order_id`` each execution. At 100 TB that shuffle IS the
job: the orders×lineitem join moves both tables across the network every
time any query touches them.

Bucketing amortizes that shuffle into the write path: store each table
hash-partitioned by its join key into N buckets (``DataFrameWriter
.bucketBy(N, key).sortBy(key)``). Spark's scan then reports
``HashPartitioning(key, N)`` as its output partitioning, and joins /
aggregations on the key require **no Exchange** — verified by
``tests/test_bucketed.py`` walking the physical plan.

Cluster posture:

* bucket count is fixed at write time — size it so one bucket ≈ one task
  (100 TB / N ≲ executor-memory working set); co-joining tables must use
  the SAME bucket count or Spark re-shuffles the smaller side.
* ``sortBy(key)`` makes each bucket file key-sorted → the join degrades
  to a zero-sort merge within each bucket pair.
* bucket pruning: equality predicates on the bucket key scan 1/N of the
  files.

This is plain Spark SQL bucketing (public API: ``bucketBy``/``sortBy``,
session catalog + parquet files) — no external table format needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed managed table (overwriting any prior
    version). The table lands in ``spark.sql.warehouse.dir``."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts the physical plan contains no Exchange on either side —
    the join is executed bucket-by-bucket, fully co-located."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (hash/range/
    single-partition repartitioning of rows) — the assertion primitive for
    co-location tests. BroadcastExchange does NOT count: broadcasting a
    small side ships one copy per executor, it never repartitions the
    fact table."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        "Exchange" in line and "BroadcastExchange" not in line
        for line in plan.splitlines()
    )
