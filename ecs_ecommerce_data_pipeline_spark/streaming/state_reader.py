"""Offline streaming-state introspection (Spark 4 ``statestore`` source).

Stateful streaming queries accumulate their truth inside the state
store; when a pipeline misbehaves, the question is always "what does the
state SAY right now?". The state data source answers it without touching
the running query: it reads the checkpoint's state files as a normal
DataFrame — auditable, joinable against the batch recompute, exportable
before a risky upgrade.

Ops surface this enables (all read-only, query-independent):
* drift audit — state vs a batch recompute of the same aggregate;
* state-size accounting per key/partition before scaling decisions;
* checkpoint migration rehearsal (read old → validate → write new).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_group_state(
    spark: SparkSession, checkpoint_path: str, batch_id: int | None = None
) -> DataFrame:
    """Flattened per-key state of an ``applyInPandasWithState`` /
    aggregation checkpoint: key columns + state columns + partition_id.

    ``batch_id`` pins a historical micro-batch (time travel through the
    checkpoint); default is the latest committed state.
    """
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    raw = reader.load(checkpoint_path)
    return raw.select("key.*", "value.*", "partition_id")
