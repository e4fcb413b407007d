"""Streaming near-duplicate detection over a band store — image dHash
and text SimHash faces of ONE machine (``band_dedup_stream``).

An ingest pipeline screens NEW items for near-duplicates as they
arrive, not in a nightly full-corpus pass.  This is the
``decon_stream`` pattern applied to the fingerprint band store:

* each micro-batch fingerprints ONLY its own payloads (the map-only
  Arrow dHash kernel of ``operators.multimodal.image_dhash_bands``);
* candidates are band-blocked between the batch and the ACCUMULATED
  band store ∪ the batch itself — a new image is screened against
  everything seen up to and including its own batch;
* verified pairs land as ``(_batch_id)`` dynamic-overwrite partitions,
  the batch's bands are appended to the store as its own
  ``(_batch_id)`` partition — an at-least-once replay rewrites exactly
  its own partitions, idempotent by construction;
* the union of per-batch pair partitions EQUALS the batch operator
  (``image_neardup_pairs``) over the full corpus, bit-for-bit: every
  pair (a, b) with a arriving no later than b is emitted exactly once,
  in b's batch (when b arrives, a is in the store or in the same
  batch) — the per-batch pair sets PARTITION the full pair set, the
  same proof shape as the decontamination fold (there: bucket
  row-locality; here: band rows are row-local to each image).

Per-trigger cost: one store scan (the band join probes the accumulated
3-integer band rows with the BROADCAST batch blocks — no shuffle of the
store) plus batch-sized fingerprint work.  At scale the band store
would be bucketed by band_val so the probe prunes to matching buckets;
the screening shape is unchanged.
"""

from __future__ import annotations

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import fuse_bands, image_dhash_bands
from ..plans.incremental import BatchLedger


def band_dedup_stream(
    src_stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    bands_fn,
    ledger: BatchLedger | None = None,
    max_hamming: int = 10,
    band_bits: int = 16,
    tag: str = "imgdedup",
):
    """The generic band-store near-dup screen: any fingerprint that
    emits (doc_id, band_idx, band_val) rows — image dHash, text
    SimHash — rides the identical blocking/verify/store machinery, so
    every property proved for one face (batch-equals-union fold, replay
    idempotence, broadcast-probe store access) holds for all of them.
    ``bands_fn`` maps a micro-batch DataFrame to its band rows;
    ``tag`` namespaces the ledger entries per face."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        bid = f"{tag}-microbatch-{batch_id}"
        if ledger is not None and not ledger.try_start(bid):
            return
        if batch_df.isEmpty():
            if ledger is not None:
                ledger.mark_done(bid)
            return
        spark = batch_df.sparkSession
        from .vector_index_stream import _ensure_bid_format, _read_store

        _ensure_bid_format(state_path)
        # batch fingerprints feed the block join (both orientations),
        # the verify joins, and the store write — pin once, release at
        # the end (the image_neardup_pairs discipline); a lazy frame
        # would re-run the fingerprint kernel once per consumer
        bands_b = bands_fn(batch_df).localCheckpoint()
        bpath = f"{state_path}/bands"
        try:
            # distinct: band rows are deterministic per doc, so a batch
            # replayed AFTER a compaction folded its partition away
            # re-creates byte-identical rows — distinct collapses the
            # generations (the band store's latest-wins analogue)
            store = _mask_doc_tombstones(
                spark,
                state_path,
                _read_store(spark, bpath)
                .select("doc_id", "band_idx", "band_val")
                .distinct(),
                ["doc_id"],
            )
            # replay guard: a re-processed batch must not screen against
            # its own previously-written bands (every intra-batch pair
            # would verify at Hamming 0 against itself)
            store = store.join(
                F.broadcast(bands_b.select("doc_id").distinct()),
                "doc_id",
                "left_anti",
            )
            all_bands = store.unionByName(bands_b)
        except AnalysisException:
            all_bands = bands_b
        blocks_all = fuse_bands(all_bands, band_bits)
        blocks_b = fuse_bands(bands_b, band_bits)
        cand = (
            blocks_all.select(
                F.col("doc_id").alias("doc_l"), "band_idx", "band_val"
            )
            .join(
                F.broadcast(
                    blocks_b.select(
                        F.col("doc_id").alias("doc_r"), "band_idx", "band_val"
                    )
                ),
                ["band_idx", "band_val"],
            )
            .filter(F.col("doc_l") != F.col("doc_r"))
            .select(
                F.least("doc_l", "doc_r").alias("doc_a"),
                F.greatest("doc_l", "doc_r").alias("doc_b"),
            )
            .distinct()
        )
        ba = all_bands.select(
            F.col("doc_id").alias("doc_a"), "band_idx",
            F.col("band_val").alias("val_a"),
        )
        bb = all_bands.select(
            F.col("doc_id").alias("doc_b"), "band_idx",
            F.col("band_val").alias("val_b"),
        )
        pairs = (
            cand.join(ba, "doc_a")
            .join(bb, ["doc_b", "band_idx"])
            .groupBy("doc_a", "doc_b")
            .agg(
                F.sum(F.bit_count(F.col("val_a").bitwiseXOR(F.col("val_b"))))
                .cast("bigint")
                .alias("hamming")
            )
            .filter(F.col("hamming") <= max_hamming)
        )
        # stream triggers stamp shifted ids (trigger << 20); compaction
        # folds land on maintenance ids INSIDE the same trigger window
        # (the vector store's id-space contract, see _stream_bid) so a
        # replayed trigger's dynamic overwrite can never clobber a fold
        # that carries OTHER batches' rows — and no fold can outrank the
        # next trigger's rows
        from .vector_index_stream import _stream_bid

        (
            pairs.withColumn("_batch_id", F.lit(_stream_bid(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(f"{state_path}/pairs")
        )
        (
            bands_b.withColumn("_batch_id", F.lit(_stream_bid(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(bpath)
        )
        if ledger is not None:
            ledger.mark_done(bid)

    return (
        src_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def image_dedup_stream(
    payload_stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    ledger: BatchLedger | None = None,
    max_hamming: int = 10,
    band_bits: int = 16,
):
    """Maintain a streaming image near-dup screen from a stream of
    (doc_id, payload) rows.  Defaults to the scale-safe wide-band
    blocking (``band_bits=16`` — see ``image_neardup_pairs``); the
    verify always runs on the full 8-band 64-bit hash."""
    return band_dedup_stream(
        payload_stream,
        state_path,
        checkpoint_dir,
        bands_fn=lambda b: image_dhash_bands(b.select("doc_id", "payload")),
        ledger=ledger,
        max_hamming=max_hamming,
        band_bits=band_bits,
        tag="imgdedup",
    )


def simhash_dedup_stream(
    doc_stream: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    ledger: BatchLedger | None = None,
    max_hamming: int = 6,
    band_bits: int = 16,
):
    """Streaming TEXT near-dup screening by 64-bit weighted SimHash —
    the text face of the band-store machinery (round 8): new documents
    are fingerprinted once (``dedup.simhash_bands``) and screened
    against everything seen so far, with the identical
    blocking/verify/store/replay semantics the image face proved.
    The batch operator it folds to is ``dedup.simhash_neardup_pairs``."""
    from ..operators.dedup import simhash_bands

    return band_dedup_stream(
        doc_stream,
        state_path,
        checkpoint_dir,
        bands_fn=lambda b: simhash_bands(b.select("doc_id", "text")),
        ledger=ledger,
        max_hamming=max_hamming,
        band_bits=band_bits,
        tag="txtdedup",
    )


def load_image_dedup_pairs(spark: SparkSession, state_path: str) -> DataFrame:
    """Fold the per-batch pair partitions into the running near-dup
    verdict: (doc_a, doc_b, hamming).  Because the per-batch sets
    partition the full pair set (module docstring), the fold is a plain
    union-distinct — equal to the batch operator over the whole corpus,
    pinned by the equivalence test.  Tombstoned documents are masked on
    BOTH pair sides (a near-dup pair is derived data of both members —
    the erasure face, see :func:`delete_docs`)."""
    from .vector_index_stream import _read_store

    return _mask_doc_tombstones(
        spark,
        state_path,
        _read_store(spark, f"{state_path}/pairs")
        .select("doc_a", "doc_b", "hamming")
        .distinct(),
        ["doc_a", "doc_b"],
    )


def _mask_doc_tombstones(
    spark: SparkSession, state_path: str, df: DataFrame, cols: list[str]
) -> DataFrame:
    """Anti-join every id column in ``cols`` against the band store's
    tombstone table — a pair row dies if EITHER side is erased."""
    try:
        tomb = spark.read.parquet(f"{state_path}/tombstones").select(
            "doc_id"
        ).distinct()
    except AnalysisException:
        return df
    for c in cols:
        df = df.join(
            F.broadcast(tomb.withColumnRenamed("doc_id", c)), c, "left_anti"
        )
    return df


def delete_docs(spark: SparkSession, state_path: str, doc_ids: list[int]) -> None:
    """Erase documents from the band-dedup store (the GDPR face the
    vector store already has): append ids to the tombstone table —
    O(|doc_ids|), no store scan, no partition rewrite at delete time.
    Every load path masks: the doc's bands stop screening new arrivals,
    and every recorded pair INVOLVING the doc disappears (a near-dup
    pair is derived data of both members).  Physical removal happens at
    the next :func:`compact_band_store`; idempotent (the mask is a
    distinct anti-join)."""
    if not doc_ids:
        return
    spark.createDataFrame(
        [(int(d),) for d in doc_ids], "doc_id bigint"
    ).write.mode("append").parquet(f"{state_path}/tombstones")


def compact_band_store(spark: SparkSession, state_path: str) -> dict:
    """Collapse the accumulated per-batch band and pair partitions into
    ONE generation each, physically dropping tombstoned rows — the
    vector store's ``compact_index`` discipline (sibling-swap writes,
    max-seen ``_batch_id`` so later stream batches still layer on top).
    Returns before/after parquet file counts per store."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from .vector_index_stream import _ensure_bid_format, _recover_store

    _ensure_bid_format(state_path)
    stats: dict = {}
    for store, cols in (("bands", ["doc_id"]), ("pairs", ["doc_a", "doc_b"])):
        spath = f"{state_path}/{store}"
        _recover_store(spath)
        if not _os.path.isdir(spath):
            continue
        raw = spark.read.parquet(spath)
        # fold at the next MAINTENANCE id above the max (handles the
        # empty-store NULL too): later stream batches (next trigger
        # window, higher) still layer on top, while a replayed
        # pre-compaction trigger keeps a LOWER bid than the fold and can
        # no longer clobber other batches' rows
        from .vector_index_stream import _next_maintenance_bid

        max_bid = _next_maintenance_bid(raw)
        kept = _mask_doc_tombstones(
            spark, state_path, raw.drop("_batch_id").distinct(), cols
        )
        tmp = f"{spath}__compacting"
        (
            kept.withColumn("_batch_id", F.lit(max_bid))
            .write.mode("overwrite")
            .partitionBy("_batch_id")
            .parquet(tmp)
        )

        def _files(p: str) -> int:
            return len(_glob.glob(f"{p}/**/*.parquet", recursive=True))

        stats[f"{store}_files_before"] = _files(spath)
        stats[f"{store}_files_after"] = _files(tmp)
        # reachable-at-every-instant swap, shared with the vector store
        from .vector_index_stream import _sibling_swap

        _sibling_swap(spath, tmp)
    return stats


def band_store_erasure_audit(spark: SparkSession, state_path: str) -> DataFrame:
    """One audit row for the band store's erasure posture —
    (n_tombstones, n_physical_band_rows_remaining, n_visible_band_rows,
    n_visible_pair_rows): physical > 0 between delete and compaction by
    design; both visible counts must be 0 always (the test pins it).
    The band-store face of ``vector_store_erasure_audit``."""
    try:
        tomb = spark.read.parquet(f"{state_path}/tombstones").select(
            "doc_id"
        ).distinct()
    except AnalysisException:
        tomb = spark.createDataFrame([], "doc_id bigint")
    from .vector_index_stream import _read_store

    raw_bands = _read_store(spark, f"{state_path}/bands")
    physical = raw_bands.join(F.broadcast(tomb), "doc_id", "left_semi")
    vis_bands = _mask_doc_tombstones(
        spark, state_path, raw_bands, ["doc_id"]
    ).join(F.broadcast(tomb), "doc_id", "left_semi")
    vis_pairs_all = load_image_dedup_pairs(spark, state_path)
    vp = vis_pairs_all.join(
        F.broadcast(tomb.withColumnRenamed("doc_id", "doc_a")),
        "doc_a",
        "left_semi",
    ).unionByName(
        vis_pairs_all.join(
            F.broadcast(tomb.withColumnRenamed("doc_id", "doc_b")),
            "doc_b",
            "left_semi",
        )
    )
    return (
        tomb.agg(F.count(F.lit(1)).cast("bigint").alias("n_tombstones"))
        .crossJoin(
            physical.agg(
                F.count(F.lit(1)).cast("bigint").alias(
                    "n_physical_band_rows_remaining"
                )
            )
        )
        .crossJoin(
            vis_bands.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_visible_band_rows")
            )
        )
        .crossJoin(
            vp.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_visible_pair_rows")
            )
        )
    )
