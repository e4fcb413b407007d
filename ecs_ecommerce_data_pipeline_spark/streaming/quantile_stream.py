"""Streaming maintenance of the mergeable binned-quantile state.

The batch operator (``operators.sketch.quantile_bin_state``) reduces a
batch to ≤ ``n_bins`` BIGINT rows against frozen (vmin, vmax) bounds;
because merging states is an associative count sum, a stream can
maintain corpus percentiles by appending ONE tiny state per micro-batch
and summing at read time — the same store-shape as
``kpi_stream.lsh_dedup_stream``'s signature store:

* each micro-batch writes its own ``_batch_id=N`` partition (dynamic
  overwrite), so an at-least-once replay rewrites exactly its own
  partition — idempotent by construction;
* per-trigger cluster work is O(batch) + one ≤n_bins aggregation; the
  driver never sees row data;
* ``read_quantile_state`` folds every batch partition with one count
  sum; estimates come from ``quantile_from_bins`` unchanged.

The (vmin, vmax) frame is FROZEN at attach time (from table statistics
or a reference batch) — the standard production trade: values outside
the frozen range clamp into the edge bins, degrading the edge-bin
estimate bound but never dropping mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def quantile_state_stream(
    stream: DataFrame,
    vmin: float,
    vmax: float,
    value_col: str,
    state_path: str,
    checkpoint_path: str,
    n_bins: int = 64,
):
    """Attach the quantile-state maintainer to a streaming DataFrame.

    Returns the started StreamingQuery (caller owns its lifecycle)."""
    from ..operators.sketch import quantile_bin_state

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        stats = spark.createDataFrame(
            [(float(vmin), float(vmax))], "_qvmin double, _qvmax double"
        )
        state = quantile_bin_state(batch_df, value_col, stats, n_bins)
        (
            state.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(state_path)
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_quantile_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Merged (bin, c) across every batch partition — one count sum."""
    return (
        spark.read.parquet(state_path)
        .groupBy("bin")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
