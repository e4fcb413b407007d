"""Streaming drift monitor: per-micro-batch PSI against a frozen
reference distribution, appended to a queryable status table.

The batch operator (``operators.drift.psi_bins``) answers "did the
corpus move" offline; a continuously-ingesting pipeline needs the same
signal per micro-batch, cheap enough to run on every trigger. This is
the engine analogue of the reference's failure-notification path
(``infra/step-function-definition.json:86-97`` routes stage failures to
SNS): instead of an external alarm, drift lands in a table the next
query can read — same pattern as ``plans.incremental``'s run-status
table.

Scale: each batch reduces to ``n_bins`` counts inside the cluster (one
map + one tiny aggregation); only those ``n_bins`` numbers cross the
driver boundary for the PSI fold — per-trigger cost is independent of
batch size. The reference histogram is a Python-side constant captured
in the closure (it is ``n_bins`` floats, not data).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ReferenceHistogram:
    """Frozen training-time distribution: interior bin edges (len B-1)
    and per-bin row counts (len B)."""

    edges: tuple[float, ...]
    counts: tuple[int, ...]


def reference_histogram(
    df: DataFrame, value_col: str, n_bins: int = 10
) -> ReferenceHistogram:
    """Build the frozen reference: exact interpolated quantile edges and
    the reference's own bin counts. One aggregation + one tiny groupBy;
    the result is ``2·n_bins`` scalars."""
    qs = [i / n_bins for i in range(1, n_bins)]
    v = F.col(value_col).cast("double")
    edges = df.agg(
        F.percentile(v, F.array(*[F.lit(q) for q in qs])).alias("e")
    ).collect()[0]["e"]
    counts = _bin_counts(df, value_col, edges)
    return ReferenceHistogram(tuple(float(e) for e in edges), tuple(counts))


def _bin_counts(df: DataFrame, value_col: str, edges) -> list[int]:
    counts, _n = _bin_counts_and_total(df, value_col, edges)
    return counts


def _bin_counts_and_total(
    df: DataFrame, value_col: str, edges
) -> tuple[list[int], int]:
    """Per-bin counts (NULL values excluded, same rule as
    ``operators.drift``) plus the TOTAL row count, in one aggregation —
    one driver-side action per micro-batch, not two. NULL values land in
    a sentinel bin that is counted toward the total only."""
    v = F.col(value_col).cast("double")
    binned = df.select(
        F.when(v.isNull(), F.lit(-1))
        .otherwise(
            F.aggregate(
                F.array(*[F.lit(float(e)) for e in edges]),
                F.lit(0),
                lambda acc, e: acc + F.when(v > e, 1).otherwise(0),
            )
        )
        .alias("bin")
    )
    got = {
        r["bin"]: r["n"]
        for r in binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    counts = [int(got.get(b, 0)) for b in range(len(edges) + 1)]
    return counts, int(sum(got.values()))


def psi_from_counts(ref_counts, cur_counts) -> float:
    """Laplace-smoothed PSI between two count vectors (same formula as
    ``operators.drift.psi_bins``)."""
    b = len(ref_counts)
    n_ref = sum(ref_counts) + b
    n_cur = sum(cur_counts) + b
    psi = 0.0
    for cr, cc in zip(ref_counts, cur_counts):
        p_ref = (cr + 1) / n_ref
        p_cur = (cc + 1) / n_cur
        psi += (p_cur - p_ref) * math.log(p_cur / p_ref)
    return psi


def psi_drift_monitor(
    stream: DataFrame,
    ref: ReferenceHistogram,
    value_col: str,
    status_path: str,
    checkpoint_path: str,
    alert_threshold: float = 0.2,
):
    """Attach a PSI monitor to a streaming DataFrame.

    Every micro-batch writes one row into its own ``batch_id=N``
    partition of the parquet status table at ``status_path`` —
    idempotent under foreachBatch's at-least-once replay. Read the
    table with ``spark.read.parquet(status_path)`` (the partition
    column comes back as ``batch_id``). Returns the started
    StreamingQuery (caller owns its lifecycle).
    """

    def _monitor(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counts, n = _bin_counts_and_total(batch_df, value_col, ref.edges)
        psi = psi_from_counts(ref.counts, counts)
        # foreachBatch is at-least-once: a replayed batch must overwrite
        # its own status partition, never append a duplicate row; the
        # batch id comes back as the inferred partition column on read
        row = [(int(n), float(psi), bool(psi > alert_threshold))]
        spark.createDataFrame(
            row, "n_rows long, psi double, drifted boolean"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{status_path}/batch_id={int(batch_id)}"
        )

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(_monitor)
        .start()
    )


def cusum_from_status(
    spark,
    status_path: str,
    k_q: int,
    h_q: int,
) -> DataFrame:
    """Page's CUSUM over the per-batch PSI series — the PERSISTENT-shift
    readout the per-batch ``drifted`` flag can't give (a threshold flag
    flickers on noisy batches; CUSUM accumulates evidence and stays up
    once a real shift lands).  The sequential-detector pair now serves
    streaming end-to-end: SPRT over the preference store
    (``sprt_monitor_from_stats``), CUSUM over the drift store (here).

    x_b = FLOOR(psi_b·2^20) − ``k_q`` (the quantized allowance — drift
    smaller than k_q/2^20 PSI per batch is absorbed);
    C_b = Σx − min(0, running-min Σx) (the ``events_cusum_hourly``
    cumsum−running-min identity); alarm when C_b ≥ ``h_q``.

    Reads O(batches) status rows; two windows over that bounded frame.
    Returns (batch_id, n_rows, psi, cusum_q, alarm) in batch order.
    """
    from pyspark.sql import Window as W

    raw = spark.read.parquet(status_path).select(
        F.col("batch_id").cast("bigint").alias("batch_id"),
        "n_rows",
        "psi",
        (
            F.floor(F.col("psi") * F.lit(1048576.0)).cast("bigint")
            - F.lit(int(k_q))
        ).alias("xq"),
    )
    w = W.orderBy("batch_id")
    cum = raw.withColumn("s", F.sum("xq").over(w).cast("bigint"))
    cc = cum.withColumn(
        "cusum_q",
        (
            F.col("s")
            - F.least(F.lit(0).cast("bigint"), F.min("s").over(w))
        ).cast("bigint"),
    )
    return cc.select(
        "batch_id",
        "n_rows",
        "psi",
        "cusum_q",
        (F.col("cusum_q") >= F.lit(int(h_q))).alias("alarm"),
    )
