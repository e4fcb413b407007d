"""Streaming preference-log maintenance.

An RLHF data pipeline collects pairwise judgments continuously; the
win-rate matrix and Bradley-Terry strengths must serve from the running
log without nightly full-log rescans.  The key fact making this cheap:
everything the preference family computes reads ONLY the per-pair
sufficient statistics (n comparisons, a-side wins), and counts are
associative — so

* each micro-batch reduces its OWN comparison rows to per-pair counts
  (the :func:`operators.preference.pairwise_winrates` reduce,
  O(|batch|) work);
* the counts land as a ``(_batch_id)`` dynamic-overwrite partition —
  an at-least-once replay rewrites exactly its own partition,
  idempotent by construction (the ledger guards the crash window);
* :func:`load_preference_stats` folds partitions with one SUM per pair
  — equal to the batch reduce over the full log, bit-for-bit, because
  integer sums have no order;
* :func:`operators.preference.bradley_terry_from_stats` serves
  strengths from the folded counts — test-pinned identical to the
  batch operator over the raw log.

Per-trigger cost tracks the batch; the store holds
O(batches · pairs-per-batch) tiny count rows, collapsed by any later
compaction of the same shape as the vector store's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.preference import pairwise_winrates
from ..plans.incremental import BatchLedger


def preference_stream(
    comp_stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    ledger: BatchLedger | None = None,
):
    """Maintain the per-pair preference statistics store from a stream
    of (sys_a, sys_b, winner) comparison rows."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        bid = f"pref-microbatch-{batch_id}"
        if ledger is not None and not ledger.try_start(bid):
            return
        if batch_df.isEmpty():
            if ledger is not None:
                ledger.mark_done(bid)
            return
        stats = pairwise_winrates(batch_df).select(
            "sys_a", "sys_b", "n_comparisons", "wins_a"
        )
        (
            stats.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(f"{state_path}/pair_stats")
        )
        if ledger is not None:
            ledger.mark_done(bid)

    return (
        comp_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_preference_stats(
    spark: SparkSession, state_path: str, ledger: BatchLedger | None = None
) -> dict:
    """Collapse the accumulated per-batch count partitions into ONE
    folded generation under the max folded batch id — counts are
    associative, so the compacted store IS the fold; later stream
    batches append on top and the next compaction folds again.  Same
    sibling-swap discipline as the vector store's ``compact_index``.

    Replay safety — where a SUM store differs from a latest-wins store:
    folding a batch whose ledger state is still ``running`` (the crash
    window) would DOUBLE its counts when the replay re-writes its
    partition onto the folded generation.  With ``ledger`` given, only
    batches marked ``done`` fold (done batches never re-run —
    ``try_start`` refuses them); running partitions are RETAINED as-is
    for their replay to overwrite.  Without a ledger every partition
    folds (callers without replay semantics).  Returns before/after
    parquet file counts."""
    import glob as _glob

    from .vector_index_stream import _read_store, _sibling_swap

    spath = f"{state_path}/pair_stats"
    raw = _read_store(spark, spath)
    skip: list[int] = []
    if ledger is not None:
        state = ledger._load()
        skip = [
            int(b.rsplit("-", 1)[-1])
            for b, s in state.items()
            if b.startswith("pref-microbatch-") and s != "done"
        ]
    foldable = raw.filter(~F.col("_batch_id").isin(skip)) if skip else raw
    retained = raw.filter(F.col("_batch_id").isin(skip)) if skip else None
    max_bid_row = foldable.agg(F.max("_batch_id").alias("m")).first()
    max_bid = int(max_bid_row["m"]) if max_bid_row["m"] is not None else 0
    folded = foldable.groupBy("sys_a", "sys_b").agg(
        F.sum("n_comparisons").cast("bigint").alias("n_comparisons"),
        F.sum("wins_a").cast("bigint").alias("wins_a"),
    ).withColumn("_batch_id", F.lit(max_bid))
    out = (
        folded.unionByName(retained.select(*folded.columns))
        if retained is not None
        else folded
    )
    tmp = f"{spath}__compacting"
    (
        out.coalesce(1)
        .write.mode("overwrite")
        .partitionBy("_batch_id")
        .parquet(tmp)
    )

    def _files(p: str) -> int:
        return len(_glob.glob(f"{p}/**/*.parquet", recursive=True))

    stats = {"files_before": _files(spath), "files_after": _files(tmp)}
    # reachable-at-every-instant swap (shared with the vector store) —
    # the old rmtree-then-rename here had a genuine no-store crash
    # window despite the docstring's claim (round-10 review find);
    # _recover_store at every read site heals a crash mid-swap
    _sibling_swap(spath, tmp)
    return stats


def load_preference_stats(spark: SparkSession, state_path: str) -> DataFrame:
    """Fold the per-batch count partitions into the running win-rate
    matrix (sys_a, sys_b, n_comparisons, wins_a, winrate_a) — one SUM
    per pair; integer sums are order-free, so the fold equals the batch
    reduce over the concatenated log exactly."""
    from .vector_index_stream import _read_store

    folded = (
        _read_store(spark, f"{state_path}/pair_stats")
        .groupBy("sys_a", "sys_b")
        .agg(
            F.sum("n_comparisons").cast("bigint").alias("n_comparisons"),
            F.sum("wins_a").cast("bigint").alias("wins_a"),
        )
    )
    return folded.withColumn(
        "winrate_a",
        F.col("wins_a").cast("double") / F.col("n_comparisons").cast("double"),
    )


def sprt_monitor_from_stats(
    spark: SparkSession,
    state_path: str,
    q1: int,
    q0: int,
    qa: int,
    qb: int,
) -> DataFrame:
    """Sequential win-rate monitor per system pair over the STREAMING
    counts — the "stop collecting, A wins" readout an RLHF log wants
    online, composed from the SPRT machinery and the preference store
    (round-7 verdict task): per (sys_a, sys_b), the cumulative
    quantized-integer log-likelihood ratio over batches in ``_batch_id``
    order and its first Wald-boundary crossing.

    Exactness: every comparison contributes one of the same two integer
    literals (``q1``/``q0``), so a batch's increment is EXACTLY
    ``wins_a·q1 + (n−wins_a)·q0`` — no per-event state needed, and the
    fold over per-batch sufficient statistics is bit-equal to the
    event-level SPRT evaluated at batch boundaries (decisions can only
    be DECLARED at a trigger anyway; the event-level audit form is
    :func:`operators.preference.sprt_pair_decisions`).

    Scale shape: reads O(batches·pairs) tiny count rows; the ordered
    window runs over that bounded frame, never the comparison log.
    Returns (sys_a, sys_b, n_comparisons, wins_a, decision,
    crossing_batch, crossing_cum_q); crossing_batch = −1 while the pair
    is still in 'continue'.
    """
    from .vector_index_stream import _read_store

    raw = _read_store(spark, f"{state_path}/pair_stats").select(
        "sys_a",
        "sys_b",
        "_batch_id",
        "n_comparisons",
        "wins_a",
        (
            F.col("wins_a") * F.lit(q1)
            + (F.col("n_comparisons") - F.col("wins_a")) * F.lit(q0)
        ).cast("bigint").alias("inc_q"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("sys_a", "sys_b").orderBy("_batch_id")
    cum = raw.select(
        "sys_a",
        "sys_b",
        "_batch_id",
        "n_comparisons",
        "wins_a",
        F.sum("inc_q").over(w).cast("bigint").alias("cum_q"),
    )
    crossing = (
        cum.filter((F.col("cum_q") >= qa) | (F.col("cum_q") <= qb))
        .groupBy("sys_a", "sys_b")
        .agg(F.min(F.struct("_batch_id", "cum_q")).alias("c"))
        .select(
            "sys_a",
            "sys_b",
            F.col("c._batch_id").alias("crossing_batch"),
            F.col("c.cum_q").alias("crossing_cum_q"),
        )
    )
    tot = cum.groupBy("sys_a", "sys_b").agg(
        F.sum("n_comparisons").cast("bigint").alias("n_comparisons"),
        F.sum("wins_a").cast("bigint").alias("wins_a"),
    )
    return tot.join(F.broadcast(crossing), ["sys_a", "sys_b"], "left").select(
        "sys_a",
        "sys_b",
        "n_comparisons",
        "wins_a",
        F.when(F.col("crossing_cum_q") >= qa, F.lit("accept_h1"))
        .when(F.col("crossing_cum_q") <= qb, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
        F.coalesce(F.col("crossing_batch"), F.lit(-1)).cast("bigint").alias(
            "crossing_batch"
        ),
        F.coalesce(F.col("crossing_cum_q"), F.lit(0)).cast("bigint").alias(
            "crossing_cum_q"
        ),
    )
