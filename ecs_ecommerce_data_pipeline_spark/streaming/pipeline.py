"""Structured Streaming variants of the engine's event operators.

The reference's "near real-time" surface is poll-driven micro-batch
orchestration (SURVEY §2.7): Lambda polls S3, a DynamoDB conditional
update provides exactly-once triggering, late data waits for the next
cycle. The Spark-native equivalents:

* file-source ``readStream`` + ``Trigger.AvailableNow`` = "process
  everything that has arrived, then stop" — the reference's batch
  completeness gate as a trigger mode;
* watermarks = the reference's implicit "late files wait for the next
  poll" policy, made explicit per-event;
* checkpointing + idempotent ``foreachBatch`` sinks = the DynamoDB
  conditional-update exactly-once semantics.

Batch/stream parity: these transformations are the same logical plans as
``queries/events_q.py`` (oracle-checked in batch); Spark's unified
DataFrame API means the streaming runs reuse them unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import money_sum


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch unit; at scale this is a cloud-storage listing source or
    Kafka).

    The stream reads the file's RAW schema (``ts`` arrives as
    epoch-nanos long under ``spark.sql.legacy.parquet.nanosAsLong``) and
    applies the same normalization as the batch loader, so batch and
    stream plans stay twins.
    """
    from ..sources.testdata import _normalize_nanos_ts

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        # the file source requires a directory; glob-filter to the events
        # table only (other parquet files in the dir have other schemas)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # the shared helper handles both nanos-as-long and TIMESTAMP_NTZ
    # sources, producing TIMESTAMP (instant) — identical normalization to
    # the batch loader, so batch and stream outputs union/join cleanly
    return _normalize_nanos_ts(stream, "ts")


def windowed_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 5-minute windowed aggregation with a late-data watermark —
    the streaming twin of ``events_tumbling_5min``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native streaming sessionization via ``session_window`` (dynamic-gap
    windows) — the streaming twin of ``events_sessionize``."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact deduplication on ``event_id`` with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` evicts seen-key state once the
    watermark passes — at 100 TB/day the state store holds one watermark
    window of keys, not the full history (plain ``dropDuplicates`` on a
    stream grows state forever). The at-least-once file/Kafka source +
    this stage = exactly-once event delivery downstream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_with_customer(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (static)
    customer dimension — broadcast, so the stream side never shuffles.
    The standard enrichment shape; for slowly-changing dims re-read the
    dim per batch in ``foreachBatch`` or use an SCD2 snapshot
    (``operators.scd``)."""
    dim = F.broadcast(
        customer.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nation_key"),
        )
    )
    return events.join(dim, "user_id", "left")


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming query to completion over currently-available data
    (the test/driver harness path): memory sink + processAllAvailable.
    Production sinks swap in ``foreachBatch`` with an idempotent keyed
    write + checkpointLocation."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def view_purchase_attribution(
    events: DataFrame, horizon: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval self-join: purchases within ``horizon`` of
    a view by the same user (the streaming twin of
    ``queries/events_q.py::events_attribution``).

    Both sides carry watermarks and the join condition bounds
    ``purchase_ts`` to ``[view_ts, view_ts + horizon]``, so Spark can
    evict view-side state once ``view_ts + horizon`` passes the
    watermark and purchase-side state after the watermark alone —
    bounded state, append-mode output.  Without the time-range bound a
    stream-stream join buffers both streams forever."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts_raw"),
        )
        .withWatermark("view_ts_raw", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts_raw"),
            F.col("value"),
        )
        .withWatermark("purchase_ts_raw", watermark)
    )
    joined = views.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("purchase_ts_raw") >= F.col("view_ts_raw"))
        & (F.col("purchase_ts_raw") <= F.col("view_ts_raw") + F.expr(f"INTERVAL {horizon}")),
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        F.date_format("view_ts_raw", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("purchase_ts_raw", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("value").cast("decimal(18,2)").cast("double").alias("purchase_value"),
    )


def view_purchase_attribution_outer(
    events: DataFrame, horizon: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: every view emits — with
    its in-horizon purchases when they exist, or ONCE with NULL purchase
    columns after the watermark passes ``view_ts + horizon`` (Spark can
    only then prove no match will ever arrive; unmatched rows therefore
    trail the inner results by the watermark delay, and views near the
    end of a bounded input never flush — the cost of exactly-once NULL
    semantics on an unbounded stream). State eviction is identical to
    the inner variant: the time-range bound keeps both sides' buffers
    watermark-bounded."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts_raw"),
        )
        .withWatermark("view_ts_raw", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts_raw"),
            F.col("value"),
        )
        .withWatermark("purchase_ts_raw", watermark)
    )
    joined = views.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("purchase_ts_raw") >= F.col("view_ts_raw"))
        & (
            F.col("purchase_ts_raw")
            <= F.col("view_ts_raw") + F.expr(f"INTERVAL {horizon}")
        ),
        "leftOuter",
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        F.date_format("view_ts_raw", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("purchase_ts_raw", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("value").cast("decimal(18,2)").cast("double").alias("purchase_value"),
    )
