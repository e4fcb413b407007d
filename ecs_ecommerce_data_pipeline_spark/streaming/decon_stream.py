"""Streaming eval-set decontamination.

A training-data ingest pipeline screens NEW train documents against the
(static, benchmark-sized) eval set as they arrive — not in a nightly
full-corpus pass.  This face reuses the batch operator
(``operators.similarity.semantic_decontamination``) per micro-batch and
maintains a mergeable per-eval state store:

* the eval set is fixed up front (the standard setup: benchmarks are
  frozen; a CHANGED eval set is a rebuild, not a streaming concern);
* each micro-batch screens ONLY its own rows against the broadcast eval
  side — O(|batch|) with LSH-bucket blocking, never a corpus rescan;
* per-batch results land as ``(_batch_id)`` dynamic-overwrite
  partitions, so an at-least-once replay rewrites exactly its own
  partition — idempotent by construction;
* the loaded view folds batches with MAX / SUM.  Because a train
  vector's LSH bucket is row-local, the per-batch candidate sets
  PARTITION the full-corpus candidate set exactly — so the folded
  running max equals the batch operator over the whole corpus
  bit-for-bit (max and sum are distributive over any partition of the
  train side; the equivalence test pins it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import semantic_decontamination
from ..plans.incremental import BatchLedger


def decontamination_stream(
    train_stream: DataFrame,
    eval_df: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    ledger: BatchLedger | None = None,
    threshold: float = 0.3,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Screen a stream of train embedding rows against a static eval
    set; maintain the per-eval running-max-cosine store at
    ``state_path``.  ``eval_df`` carries the SAME (id, vector) schema
    as the stream."""
    ev = eval_df.select(
        F.col(id_col), F.col(vec_col), F.lit(True).alias("_is_eval")
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        bid = f"decon-microbatch-{batch_id}"
        if ledger is not None and not ledger.try_start(bid):
            return
        if batch_df.isEmpty():
            if ledger is not None:
                ledger.mark_done(bid)
            return
        # one combined frame so the batch operator's eval_pred applies:
        # eval rows flagged, batch rows are the train side.  Eval
        # members arriving IN the stream are dropped from the train
        # side (broadcast anti-join on the tiny eval id set) — the
        # batch operator's train side excludes them too, so the
        # stream-equals-batch equivalence holds exactly.
        both = (
            batch_df.join(
                F.broadcast(ev.select(id_col)), id_col, "left_anti"
            )
            .select(
                F.col(id_col), F.col(vec_col), F.lit(False).alias("_is_eval")
            )
            .unionByName(ev)
        )
        report = semantic_decontamination(
            both,
            eval_pred=F.col("_is_eval"),
            threshold=threshold,
            n_planes=n_planes,
            id_col=id_col,
            vec_col=vec_col,
        )
        (
            report.filter(F.col("n_candidates") > 0)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(state_path)
        )
        if ledger is not None:
            ledger.mark_done(bid)

    return (
        train_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def load_decon_state(
    spark: SparkSession,
    state_path: str,
    eval_df: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
) -> DataFrame:
    """Fold the per-batch partitions into the running verdict per eval
    vector: total candidates screened, running max cosine, nearest
    train id under the same (cosine, smallest-id) tie rule, and the
    contamination flag.  Eval vectors never matched by any batch report
    0 candidates / NULLs / false — identical to the batch operator's
    contract."""
    agg = (
        spark.read.parquet(state_path)
        .groupBy("eval_id")
        .agg(
            F.sum("n_candidates").cast("bigint").alias("n_candidates"),
            F.max("max_cosine").alias("max_cosine"),
            (-F.max(
                F.struct(
                    F.col("max_cosine"),
                    (-F.col("nearest_train_id")).alias("nid"),
                )
            ).getField("nid")).cast("bigint").alias("nearest_train_id"),
        )
    )
    evl = eval_df.select(F.col(id_col).alias("eval_id"))
    return evl.join(F.broadcast(agg), "eval_id", "left").select(
        "eval_id",
        F.coalesce("n_candidates", F.lit(0).cast("bigint")).alias(
            "n_candidates"
        ),
        "max_cosine",
        "nearest_train_id",
        F.coalesce(
            F.col("max_cosine") >= F.lit(threshold), F.lit(False)
        ).alias("contaminated"),
    )
