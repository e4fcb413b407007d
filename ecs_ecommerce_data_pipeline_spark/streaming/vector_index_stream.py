"""Streaming maintenance of the persisted IVF vector index.

The batch operators (``operators.similarity.build_ivf_index`` /
``ivf_index_add_batch``) persist ``partitionBy(cell)`` inverted lists; a
stream of newly-embedded vectors maintains the SAME index shape
incrementally:

* the FIRST micro-batch trains the deterministic coarse quantizer
  (smallest-id subvector codebook rule) and freezes the centroid table —
  the standard production trade: the quantizer is trained once (or
  offline) and batches are assigned against it; re-training is an
  offline rebuild, not a streaming concern;
* every micro-batch assigns ONLY its own vectors against the frozen
  broadcast centroids — O(|batch| × n_centroids), never a corpus rescan
  (the vector-index analogue of ``kpi_stream.lsh_dedup_stream``'s
  signature store);
* each batch writes its own ``(_batch_id, cell)`` partitions as a
  dynamic overwrite, so an at-least-once replay rewrites exactly its own
  partitions — idempotent by construction, no append duplication;
* ``load_stream_index`` reads the accumulated lists back with
  latest-batch-wins per vector id (a re-embedded id supersedes its older
  assignment) and serves the same (centroids, assignments) pair the
  batch query path (``ivf_index_topk``) consumes.
"""

from __future__ import annotations

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    _pq_assign,
    _pq_codebook,
    as_double_array,
    ivf_index_add_batch,
    norm,
)
from ..plans.incremental import BatchLedger


_BID_SHIFT = 20  # 2^20 maintenance slots per trigger window

# Store format version for the ``_batch_id`` numbering (v3 = shifted id
# space below).  v1 (raw trigger ids, maintenance at max+1) and v2
# (even/odd split) wrote ids a v3 reader would mis-order, so stores
# carry a marker file and resume refuses without it.
_BID_FORMAT = 3
_BID_MARKER = "_bid_format"
# data subdirs whose presence means "this store has written rows" (both
# the vector store and the band-dedup store route ids through here)
_STORE_DATA_DIRS = ("assignments", "pq_codes", "bands", "pairs", "occupancy")


def _stream_bid(batch_id: int) -> int:
    """Stream triggers stamp ``trigger << 20``; maintenance appends
    (rebalance / retrain / compaction) stamp max+1 within the same
    trigger window (:func:`_next_maintenance_bid`) — up to 2^20
    allocations before the window exhausts (raised loudly, never
    silently reached).  The two id spaces are DISJOINT and maintenance
    ids can NEVER reach the next trigger's stream id.

    History: v1 stamped maintenance at max+1 = t+1 — exactly the NEXT
    trigger's id, so that trigger's dynamic overwrite clobbered the
    maintenance rows cell-by-cell.  v2 (round 9) split even/odd, which
    fixed the FIRST maintenance id after a trigger but not the second:
    a 2nd allocation between triggers returned 2t+3 >= 2(t+1), so a
    multi-split rebalance, a compact-after-rebalance, or two
    consecutive compactions produced ids ABOVE the next stream bid —
    any vid re-embedded in the next trigger was permanently superseded
    by the stale maintenance row under latest-wins, and the drift
    gate's already_folded guard wrongly skipped that trigger's
    occupancy/drift_log writes.  v3 (this) widens the window so every
    maintenance id after trigger t satisfies
    ``t<<20 < id < (t+1)<<20``: relative order is preserved, later
    stream rows still supersede, earlier replays still fold under."""
    return int(batch_id) << _BID_SHIFT


def _maintenance_bid_above(max_bid: int) -> int:
    """The next maintenance ``_batch_id`` strictly above ``max_bid``,
    guaranteed to stay BELOW the next trigger's stream id — raises if
    the 2^20-slot window is exhausted (a runaway-maintenance guard;
    unreachable in practice)."""
    nxt = int(max_bid) + 1
    if nxt % (1 << _BID_SHIFT) == 0:
        raise RuntimeError(
            "maintenance _batch_id window exhausted: "
            f"{nxt} would collide with the next stream trigger's id "
            f"(2^{_BID_SHIFT} maintenance ops ran inside one trigger "
            "window — compact the store and investigate)"
        )
    return nxt


def _next_maintenance_bid(raw: DataFrame) -> int:
    """Next maintenance ``_batch_id`` strictly above the store's max —
    see :func:`_stream_bid` for the id-space contract."""
    row = raw.agg(F.max("_batch_id").alias("m")).first()
    m = int(row["m"]) if row["m"] is not None else 0
    return _maintenance_bid_above(m)


def _ensure_bid_format(path: str) -> None:
    """Stamp a new store with the v3 id-space marker, or verify an
    existing one.  A store holding data but NO marker predates the v3
    shifted id space (its bids were written under the v1/v2 numbering,
    which a v3 reader would mis-order under latest-wins) — resume is
    refused rather than silently corrupting precedence.  Called on
    every WRITE path (stream trigger + admin ops); read-only loads stay
    permissive (a self-consistent old store reads fine in isolation)."""
    import os as _os

    marker = _os.path.join(path, _BID_MARKER)
    if _os.path.isfile(marker):
        with open(marker) as f:
            v = f.read().strip()
        if v != str(_BID_FORMAT):
            raise ValueError(
                f"store at {path} uses _batch_id format v{v}; this build "
                f"writes v{_BID_FORMAT} — rebuild the store (replay the "
                "source through a fresh checkpoint) before resuming"
            )
        return
    if any(
        _os.path.isdir(_os.path.join(path, d)) for d in _STORE_DATA_DIRS
    ):
        raise ValueError(
            f"store at {path} holds data but no {_BID_MARKER} marker — it "
            "predates the v3 shifted _batch_id space (even/odd or raw "
            "trigger ids), whose bids interleave arbitrarily with v3 ids "
            "and break latest-wins ordering.  Refusing to resume: rebuild "
            "the store from source, or migrate bids offline and stamp the "
            "marker"
        )
    _os.makedirs(path, exist_ok=True)
    with open(marker, "w") as f:
        f.write(str(_BID_FORMAT))


# tmp-sibling suffixes every swap site uses; _recover_store scans these
_TMP_SUFFIXES = ("__compacting", "__rebalancing", "__promoting", "__staging")
_INTENT_SUFFIX = "__intent"


def _recover_store(spath: str) -> None:
    """Repair a store path a crashed :func:`_sibling_swap` left without
    its canonical directory.

    The swap's crash window is between ``rename(spath → __old)`` and
    ``rename(tmp → spath)``: at that instant the fully-written tmp and
    the old generation both exist but ``spath`` does not.  Recovery
    rolls FORWARD when the crashed swap's tmp is complete (its
    ``_SUCCESS`` marker proves the write finished before the swap
    began), else rolls BACK by restoring ``__old``; a stale ``__old``
    next to a healthy store is swept.

    WHICH tmp to roll forward is decided by the swap's intent marker —
    :func:`_sibling_swap` records the tmp it is about to promote in
    ``spath__intent`` before touching any directory, so a crashed swap
    can never be confused with a STALE tmp an earlier op abandoned
    before ever starting its swap (round-10 advice: a crashed retrain
    promote next to a leftover ``__rebalancing`` sibling used to
    promote the stale generation, silently reverting the store).  For
    legacy crash states with no intent file, the NEWEST complete tmp by
    ``_SUCCESS`` mtime wins — same tie-break, derived instead of
    recorded.  Idempotent, no-op on healthy stores — called at every
    read/write site so neither serving nor the fill-up branch ever
    observes "no store" mid-swap (the fill-up branch rebuilding
    centroids over a recoverable store would orphan every row keyed to
    the lost cells)."""
    import os as _os
    import shutil as _shutil

    old = f"{spath}__old"
    intent = f"{spath}{_INTENT_SUFFIX}"
    if not _os.path.isdir(spath):
        candidates: list[str] = []
        intended: str | None = None
        if _os.path.isfile(intent):
            with open(intent) as f:
                name = f.read().strip()
            intended = _os.path.join(_os.path.dirname(spath) or ".", name)
        for suf in _TMP_SUFFIXES:
            tmp = f"{spath}{suf}"
            if _os.path.isdir(tmp) and _os.path.isfile(
                _os.path.join(tmp, "_SUCCESS")
            ):
                candidates.append(tmp)
        pick: str | None = None
        if intended is not None and intended in candidates:
            pick = intended
        elif intended is None and candidates:
            # legacy crash state (no intent recorded): newest completed
            # write is the one whose swap crashed
            pick = max(
                candidates,
                key=lambda t: _os.path.getmtime(_os.path.join(t, "_SUCCESS")),
            )
        if pick is not None:
            _os.rename(pick, spath)
        elif _os.path.isdir(old):
            # intended tmp missing/incomplete (crash before its write
            # finished — impossible after a real swap start, but cheap
            # to tolerate): roll back to the old generation
            _os.rename(old, spath)
        if _os.path.isfile(intent):
            _os.remove(intent)
    if _os.path.isdir(spath) and _os.path.isdir(old):
        _shutil.rmtree(old)


def _read_store(spark: SparkSession, spath: str) -> DataFrame:
    """Read a swap-managed store, recovering a crashed swap first (the
    plain ``spark.read.parquet`` would raise AnalysisException inside
    the crash window and callers would mistake a recoverable store for
    a missing one)."""
    _recover_store(spath)
    return spark.read.parquet(spath)


def _sibling_swap(spath: str, tmp: str) -> None:
    """Promote ``tmp`` over ``spath`` keeping the store recoverable at
    every instant: the swap's INTENT (which tmp is being promoted) is
    recorded first, then the old generation is renamed ASIDE (never
    deleted first), then the new one takes its name, then the sibling
    and the intent are dropped.  A crash leaves the old store live, or
    the new store live with a stale ``__old`` sibling, or — in the
    window between the two renames — no canonical dir but both siblings
    on disk plus the intent naming which one to roll forward; every
    read/write site repairs via :func:`_recover_store` before
    proceeding.  After a successful swap, any OTHER tmp sibling is
    stale garbage from an op that crashed before its own swap started
    (writers are sequential — a second writer only ever starts from
    whatever on-disk state the first left) and is swept here, so a
    stale generation can never accumulate to be mistaken for a crashed
    promote later.  The one crash-safety-critical sequence, shared by
    every compaction/rebalance/retrain site (it was copy-pasted six
    times before round 9's review pass)."""
    import os as _os
    import shutil as _shutil

    _recover_store(spath)  # heal any prior crashed swap first
    old = f"{spath}__old"
    intent = f"{spath}{_INTENT_SUFFIX}"
    with open(intent + ".tmp", "w") as f:
        f.write(_os.path.basename(tmp))
    _os.replace(intent + ".tmp", intent)
    _os.rename(spath, old)
    _os.rename(tmp, spath)
    _shutil.rmtree(old)
    _os.remove(intent)
    for suf in _TMP_SUFFIXES:
        stale = f"{spath}{suf}"
        if _os.path.isdir(stale):
            _shutil.rmtree(stale, ignore_errors=True)


def _centroids_with_pending(spark: SparkSession, index_path: str) -> DataFrame:
    """The served centroid table: the main generation UNION any pending
    ``centroids_next`` bridge a mid-retrain crash left behind.  During
    :func:`retrain_quantizer`'s window the re-assigned rows sit in the
    NEW cells while the main table still holds the OLD ones — serving
    the union keeps every latest-wins row rankable at every instant
    (cell ids are globally fresh per retrain, so the two tables are
    disjoint except for the final promote-then-delete window, where the
    duplicate rows are identical and the cell-dedup collapses them)."""
    main = _read_store(spark, f"{index_path}/centroids")
    try:
        nxt = _read_store(spark, f"{index_path}/centroids_next")
    except AnalysisException:
        return main
    return main.unionByName(nxt).dropDuplicates(["cell"])


def vector_index_stream(
    emb_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    ledger: BatchLedger | None = None,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pq_m: int | None = None,
    pq_k: int = 16,
    rebalance_factor: float | None = None,
    rebalance_max_splits: int = 8,
    retrain_psi_threshold: float | None = None,
):
    """Maintain a persisted IVF index from a stream of embedding rows.

    Exactly-once: the checkpoint dedups source offers; the ledger
    guards the crash window; batch-stamped dynamic overwrites make
    replays idempotent (see module docstring).

    With ``pq_m`` set, the stream ALSO maintains the composed IVF-PQ
    layout (``pq_codebook`` + per-batch ``pq_codes`` partitions): the
    PQ codebook freezes from the coarse quantizer's vectors the moment
    the quantizer fills (so ``pq_k`` must be ≤ ``n_centroids``), all
    rows assigned before that moment are back-filled once, and every
    later batch codes only its own vectors — O(|batch| · m · k)
    per trigger.  ``load_stream_ivfpq`` serves the result to
    ``ivfpq_topk``.

    With ``rebalance_factor`` set, every trigger ends with the
    :func:`rebalance_overful_cells` check — the round-7 gap where the
    admin op existed but the stream never invoked it, so a skewed
    append stream accumulated fat inverted lists until an operator
    intervened by hand.  The check reads only per-cell COUNTS (one hash
    aggregate); when no list exceeds ``factor`` × the mean it is a
    no-op, and each split is O(|cell|) with at most
    ``rebalance_max_splits`` per trigger.  Replay-safe INSIDE the
    ledger window by convergence rather than by idempotent rewrite: a
    crash between the split and ``mark_done`` re-runs the trigger,
    whose batch writes are idempotent dynamic overwrites and whose
    rebalance check re-measures the (already partially split) store —
    cells already within bound split no further, and an interrupted
    split completes through ``rebalance_store_cell``'s
    crash-safe-by-reachability write order.  The serving fold is
    unchanged: splits re-route rows through the store's own
    latest-wins rule, so ``load_stream_index`` still hash-equals the
    batch operator on content.

    With ``retrain_psi_threshold`` set, every trigger (once the
    quantizer is full) ends with the DRIFT check — the round-8 verdict's
    "close the drift loop" task: Laplace-smoothed PSI between the
    store's per-cell occupancy (reference = everything before this
    trigger) and this batch's occupancy (:func:`quantizer_drift_psi` —
    the ``sim_ivf_quantizer_drift`` smoothing/scale, restricted to
    occupied cells; see its variant note), appended to
    ``{index_path}/drift_log`` as an idempotent per-trigger dynamic
    overwrite.  When quantized PSI exceeds the threshold the trigger
    escalates to :func:`retrain_quantizer` — k-means|| re-seed +
    Lloyd re-train over the store's current vectors, every row
    re-assigned, codes re-routed — inside the ledger window: a crash
    before ``mark_done`` replays the trigger, whose batch write is
    idempotent, whose PSI recomputes against the (possibly already
    retrained) store, and whose retrain — if it fires again — derives
    identical centroids from the unchanged vector set (convergent, the
    rebalance discipline).  Rebalance is skipped on a retrain trigger
    (every row was just re-routed).
    """
    if pq_m is not None and pq_k > n_centroids:
        raise ValueError("pq_k must be <= n_centroids (codebook derives "
                         "from the frozen quantizer's vectors)")
    if rebalance_factor is not None and rebalance_factor <= 1.0:
        raise ValueError("rebalance_factor must be > 1.0")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        bid = f"vecidx-microbatch-{batch_id}"
        if ledger is not None and not ledger.try_start(bid):
            return
        if batch_df.isEmpty():
            if ledger is not None:
                ledger.mark_done(bid)
            return
        spark = batch_df.sparkSession
        _ensure_bid_format(index_path)
        cpath = f"{index_path}/centroids"
        try:
            centroids = _read_store(spark, cpath)
            n_cents = centroids.count()
        except AnalysisException:
            centroids = None
            n_cents = 0
        if n_cents < n_centroids:
            # Quantizer not yet full: top the table up with this batch's
            # smallest-id vectors.  EXISTING centroids are NEVER evicted
            # — rows already written to assignments (and pq_codes) are
            # keyed by those cells, and probes only come from the
            # centroid table, so dropping a cell would make its rows
            # unreachable at any nprobe.  The quantizer is therefore the
            # "first n_centroids distinct ids offered, smallest-id-first
            # within each batch" — append-only until full, then frozen
            # (the production trade: train once, assign forever;
            # re-training is an offline rebuild).  Replay-idempotent:
            # existing cells win the dedup, and a replayed batch offers
            # the same candidate ids in the same order.
            #
            # Caveat (documented contract): the frozen quantizer matches
            # a batch ``build_ivf_index`` over the same corpus only when
            # the stream's EARLY batches contain the corpus'
            # n_centroids smallest ids — otherwise recall characteristics
            # diverge from the batch-built index (cells are still valid
            # buckets; queries remain correct, recall differs).
            v = as_double_array(vec_col)
            cand = (
                batch_df.select(
                    F.col(id_col).cast("bigint").alias("cell"), v.alias("cvec")
                )
                .withColumn("cnrm", norm(F.col("cvec")))
                .orderBy("cell")
                .limit(2 * n_centroids)  # bounded: dedup headroom below
            )
            rows = cand.collect()
            existing_cells: set = set()
            if centroids is not None:
                existing = centroids.collect()
                existing_cells = {r["cell"] for r in existing}
                rows = existing + rows
            # existing-centroid rows first → a re-embedded id cannot
            # perturb an already-frozen centroid vector (determinism)
            by_cell: dict = {}
            for r in rows:
                by_cell.setdefault(r["cell"], r)
            # never evict a cell that may already key written rows:
            # existing cells are kept unconditionally, new candidates
            # (smallest-id-first) fill only the remaining slots
            new_cells = sorted(
                c for c in by_cell if c not in existing_cells
            )[: n_centroids - len(existing_cells)]
            kept = sorted(
                (by_cell[c] for c in existing_cells | set(new_cells)),
                key=lambda r: r["cell"],
            )
            new_c = spark.createDataFrame(
                [(r["cell"], list(r["cvec"]), r["cnrm"]) for r in kept],
                "cell bigint, cvec array<double>, cnrm double",
            )
            # write via a materialized driver-side frame — never
            # overwrite a parquet path from a plan that reads it
            new_c.write.mode("overwrite").parquet(cpath)
            centroids = spark.read.parquet(cpath)
            n_cents = len(kept)
        assigned = ivf_index_add_batch(
            centroids, batch_df, id_col=id_col, vec_col=vec_col
        )
        (
            assigned.withColumn("_batch_id", F.lit(_stream_bid(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id", "cell")
            .parquet(f"{index_path}/assignments")
        )
        if pq_m is not None:
            _maintain_pq_codes(
                spark, index_path, centroids, batch_id, pq_m, pq_k, n_centroids
            )
        # n_cents was read once at trigger start (and refreshed by the
        # fill-up branch) — the maintenance gates reuse it instead of
        # launching two more count jobs on the hot per-trigger path
        retrained = False
        if retrain_psi_threshold is not None and n_cents >= n_centroids:
            retrained = _drift_check_and_retrain(
                spark,
                index_path,
                assigned,
                batch_id,
                n_centroids,
                retrain_psi_threshold,
            )
        if (
            rebalance_factor is not None
            and not retrained
            and n_cents >= n_centroids
        ):
            # quantizer full → occupancy is meaningful; the check is one
            # per-cell count aggregate and a no-op when within bound
            # (skipped on a retrain trigger: the retrain just re-routed
            # every row — measure the NEW layout next trigger)
            rebalance_overful_cells(
                spark,
                index_path,
                factor=rebalance_factor,
                max_splits=rebalance_max_splits,
            )
        if ledger is not None:
            ledger.mark_done(bid)

    return (
        emb_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _maintain_pq_codes(
    spark: SparkSession,
    index_path: str,
    centroids: DataFrame,
    batch_id: int,
    m: int,
    k: int,
    n_centroids: int,
) -> None:
    """Per-batch PQ-code maintenance for the stream-built IVF-PQ index.

    Freeze-then-backfill: no codes exist until the coarse quantizer is
    full; at that moment the codebook is derived from the quantizer's
    own vectors (the ``k`` smallest-id vectors seen — identical to the
    batch build when the early batches carry the corpus' smallest ids,
    the same documented caveat as the quantizer itself) and every row
    assigned so far is coded once.  Afterwards each batch codes only
    its own rows, read back from the partition it just wrote (static
    ``_batch_id`` pruning — never a store rescan).  Codes are written
    as ``(_batch_id, cell)`` dynamic overwrites: an at-least-once
    replay rewrites exactly its own partitions, idempotent by
    construction.

    Crash-window contract: the ``pq_codebook`` file is the COMMIT
    marker for the freeze — the back-filled codes are written FIRST and
    the codebook LAST, so its existence proves every pre-freeze row is
    coded.  (The reverse order had a hole: a crash between the codebook
    write and the backfill made the ledger-replayed freeze batch see
    the codebook present, skip the backfill, and permanently drop every
    pre-freeze vector from ``pq_codes``.)  A crash after the codes but
    before the codebook just re-derives the deterministic codebook and
    rewrites the same partitions idempotently on replay."""
    from pyspark.sql import Window as W

    cbpath = f"{index_path}/pq_codebook"
    try:
        codebook = spark.read.parquet(cbpath)
        backfill = False
    except AnalysisException:
        if centroids.count() < n_centroids:
            return  # quantizer still filling: codes start at freeze time
        crow = centroids.orderBy("cell").first()
        sub = len(crow["cvec"]) // m
        base_c = centroids.select(
            F.col("cell").alias("vid"), F.col("cvec").alias("vec")
        )
        # lazy frame over the (frozen, already-persisted) centroids —
        # NOT written yet; the write happens after the backfill commits
        codebook = _pq_codebook(base_c, m, k, sub)
        backfill = True
    sub_row = codebook.select(F.size("cv").alias("s")).first()
    sub = int(sub_row["s"])
    store = _read_store(spark, f"{index_path}/assignments")
    if backfill:
        # one-time: code the latest row per vid across everything
        # written so far (bounded by pre-freeze volume, runs once)
        w = W.partitionBy("vid").orderBy(F.desc("_batch_id"))
        rows = (
            store.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vid", "vec", "cell", "_batch_id")
        )
    else:
        rows = store.filter(
            F.col("_batch_id") == _stream_bid(batch_id)
        ).select("vid", "vec", "cell", "_batch_id")
    coded = _pq_assign(rows.select("vid", "vec"), codebook, m, sub).select(
        "vid", "s", "code"
    )
    (
        coded.join(rows.select("vid", "cell", "_batch_id"), "vid")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id", "cell")
        .parquet(f"{index_path}/pq_codes")
    )
    if backfill:
        # codes committed — NOW write the codebook (the commit marker)
        codebook.write.mode("overwrite").parquet(cbpath)


def load_stream_ivfpq(
    spark: SparkSession, index_path: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Load the stream-maintained IVF-PQ index as the (centroids,
    assignments, pq_codebook, pq_codes) tuple ``ivfpq_topk`` consumes —
    latest-batch-wins per vector id on both the raw assignments and the
    code rows (a re-embedded id's newest codes supersede older ones)."""
    from pyspark.sql import Window as W

    centroids, assignments = load_stream_index(spark, index_path)
    codebook = spark.read.parquet(f"{index_path}/pq_codebook")
    raw = _mask_tombstones(
        spark, index_path, _read_store(spark, f"{index_path}/pq_codes")
    )
    w = W.partitionBy("vid", "s").orderBy(F.desc("_batch_id"))
    codes = (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vid", "s", "code", F.col("cell").cast("long").alias("cell"))
    )
    return centroids, assignments, codebook, codes


def load_stream_index(
    spark: SparkSession, index_path: str
) -> tuple[DataFrame, DataFrame]:
    """Load the stream-maintained index as the (centroids, assignments)
    pair ``ivf_index_topk`` consumes.  Latest-batch-wins per vector id:
    a re-embedded id's newest assignment supersedes older rows (the
    dedup is one window over the id — state-sized, not corpus-scan
    work, and only at read/compaction time).  Tombstoned ids
    (:func:`delete_vectors`) are masked out — a deleted vector never
    surfaces, even if a ledger replay physically re-writes its rows."""
    from pyspark.sql import Window as W

    centroids = _centroids_with_pending(spark, index_path)
    raw = _mask_tombstones(spark, index_path, _read_store(
        spark, f"{index_path}/assignments"
    ))
    w = W.partitionBy("vid").orderBy(F.desc("_batch_id"))
    assignments = (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vid", "vec", "nrm", F.col("cell").cast("long").alias("cell"))
    )
    return centroids, assignments


# --- lifecycle: deletes (tombstones) + compaction ---------------------------
#
# The store accumulates one (_batch_id, cell) partition set per trigger
# and has no in-place mutation (parquet files are immutable) — the same
# position every LSM / table-format store is in.  Lifecycle therefore
# follows the standard two layers:
#
# * DELETE = append the vid to a tombstone table (O(|erasure list|)) —
#   every load masks tombstones with a broadcast anti-join, so the
#   deleted vector is INVISIBLE immediately and STAYS invisible across
#   at-least-once replays (a replayed batch physically re-writes its
#   partition, but the mask re-applies).  This is the erasure-audit
#   contract: privacy_erasure_audit audits tables, this audits the
#   serving index (see vector_store_erasure_audit).
# * COMPACTION = rewrite each store as one generation (latest row per
#   vid, tombstones physically dropped), collapsing the accumulated
#   per-batch files.  Tombstones are RETAINED after compaction as the
#   replay mask — a ledger replay of a pre-compaction batch would
#   otherwise resurrect the deleted rows it re-writes.  They are ids
#   only (no vector content), so retention does not conflict with
#   content erasure.


def _mask_tombstones(
    spark: SparkSession, index_path: str, df: DataFrame
) -> DataFrame:
    try:
        tomb = spark.read.parquet(f"{index_path}/tombstones")
    except AnalysisException:
        return df
    return df.join(F.broadcast(tomb.select("vid").distinct()), "vid", "left_anti")


def delete_vectors(
    spark: SparkSession, index_path: str, vec_ids: list[int]
) -> None:
    """Erase vectors from the stream-maintained index: append the ids to
    the tombstone table.  O(|vec_ids|) — no store scan, no partition
    rewrite at delete time; physical removal happens at the next
    :func:`compact_index`.  Idempotent (re-deleting is a no-op at load:
    the mask is a distinct anti-join)."""
    if not vec_ids:
        return
    spark.createDataFrame(
        [(int(v),) for v in vec_ids], "vid bigint"
    ).write.mode("append").parquet(f"{index_path}/tombstones")


def compact_index(spark: SparkSession, index_path: str) -> dict:
    """Rewrite the accumulated per-batch store files as ONE generation:
    the latest surviving row per vid, tombstones physically dropped,
    ``partitionBy(cell)`` layout preserved under a single `_batch_id` —
    the next MAINTENANCE id above the max seen, NOT the max itself:
    later stream batches (next trigger window, strictly higher) still
    supersede by latest-wins, while a ledger REPLAY of the last
    pre-compaction trigger keeps a lower bid than the compacted
    generation, so its dynamic overwrite can no longer clobber the fold
    (compacting AT the max — a stream trigger bid — let exactly that
    replay rewrite (max_bid, cell) partitions holding the whole store's
    rows for its cells; round-9 review find).  Returns before/after
    parquet file counts per store — the collapse a serving index needs
    once accumulated trigger files dominate scan cost.

    Swap discipline: :func:`_sibling_swap` + :func:`_recover_store` —
    the store is recoverable at every instant."""
    import glob as _glob
    import os as _os
    import shutil as _shutil  # noqa: F401  (parity with other admin ops)

    from pyspark.sql import Window as W

    _ensure_bid_format(index_path)
    stats: dict = {}
    w = W.partitionBy("vid").orderBy(F.desc("_batch_id"))
    for store, keyed in (("assignments", False), ("pq_codes", True)):
        spath = f"{index_path}/{store}"
        _recover_store(spath)  # a crashed swap must be repaired, not skipped
        if not _os.path.isdir(spath):
            continue
        raw = _mask_tombstones(spark, index_path, spark.read.parquet(spath))
        fold_bid = _next_maintenance_bid(raw)
        if keyed:
            # pq_codes carries m rows per vid (one per subspace): the
            # latest batch wins per (vid, s)
            ws = W.partitionBy("vid", "s").orderBy(F.desc("_batch_id"))
            latest = (
                raw.withColumn("_rn", F.row_number().over(ws))
                .filter(F.col("_rn") == 1)
                .select("vid", "s", "code", "cell")
            )
        else:
            latest = (
                raw.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("vid", "vec", "nrm", "cell")
            )
        tmp = f"{spath}__compacting"
        (
            latest.withColumn("_batch_id", F.lit(fold_bid))
            .write.mode("overwrite")
            .partitionBy("_batch_id", "cell")
            .parquet(tmp)
        )

        def _files(p: str) -> int:
            return len(_glob.glob(f"{p}/**/*.parquet", recursive=True))

        stats[f"{store}_files_before"] = _files(spath)
        stats[f"{store}_files_after"] = _files(tmp)
        _sibling_swap(spath, tmp)

    # occupancy monitor state: fold each epoch's generations into ONE
    # per-cell-summed generation — at the next MAINTENANCE id above the
    # epoch's max, for the same replay-clobber reason as above (a
    # replayed trigger at the stream max must not dynamic-overwrite the
    # fold; it sees a LATER generation and skips via the already_folded
    # guard).  The reference SUM is associative, so the fold is
    # invisible to the drift gate and the store stays O(epochs × cells)
    # instead of O(triggers × cells).  Fold ids are computed driver-side
    # per epoch (epochs are few and bounded) through the SAME
    # window-exhaustion guard every other maintenance id goes through.
    opath = f"{index_path}/occupancy"
    _recover_store(opath)
    if _os.path.isdir(opath):
        occ = spark.read.parquet(opath)
        epoch_max = {
            int(r["epoch"]): int(r["m"])
            for r in occ.groupBy("epoch")
            .agg(F.max("_batch_id").alias("m"))
            .collect()
        }
        fold_df = spark.createDataFrame(
            [(e, _maintenance_bid_above(m)) for e, m in epoch_max.items()],
            "epoch bigint, _batch_id bigint",
        )
        folded = (
            occ.groupBy("epoch", "cell")
            .agg(F.sum("n").cast("bigint").alias("n"))
            .join(F.broadcast(fold_df), "epoch")
            .select("epoch", "cell", "n", "_batch_id")
            .localCheckpoint()
        )
        tmp = f"{opath}__compacting"
        folded.write.mode("overwrite").partitionBy("_batch_id").parquet(tmp)
        _sibling_swap(opath, tmp)
    return stats


def rebalance_store_cell(
    spark: SparkSession,
    index_path: str,
    cell: int,
    new_cell: int | None = None,
    iters: int = 1,
) -> dict:
    """Split one overful inverted list of the STREAM-MAINTAINED store —
    the lifecycle ladder's rebalance rung, on disk (the batch-frame
    form is :func:`operators.similarity.split_ivf_cell`).

    The move is LOGICAL, through the store's own latest-wins rule: the
    split's re-routed rows are appended under a fresh ``_batch_id``
    (no existing partition rewritten — replay-safe exactly like a
    stream trigger), and the next :func:`compact_index` folds the move
    physically.  Raw-vector PQ codes do not depend on the centroid, so
    re-routing updates only their ``cell`` — codes are copied, never
    re-encoded.  O(|cell|): the local 2-means scans only the target
    cell's (pruned) partitions; everything else is untouched bytes.

    Write order is crash-safe by reachability: the centroid table goes
    FIRST (atomic sibling-swap), so there is never a moment when a row
    lives in a cell no probe can rank — a crash between the centroid
    swap and the row append leaves all rows in the old cell (still a
    valid probe target under sub-centroid 0) and an empty-but-rankable
    new cell; re-running with the SAME ``new_cell`` completes the move.

    Returns {cell, new_cell, n_members, n_kept, n_moved, batch_id}.
    """
    import os as _os

    from ..operators.similarity import split_ivf_cell

    _ensure_bid_format(index_path)
    centroids, assignments = load_stream_index(spark, index_path)
    if new_cell is None:
        new_cell = int(centroids.agg(F.max("cell")).first()[0]) + 1
    c2, a2 = split_ivf_cell(
        centroids, assignments, cell, new_cell=new_cell, iters=iters,
        materialize=True,
    )
    # materialize=True already lineage-cut the re-routed rows, so this
    # filter just selects the checkpointed branch of the union — safe
    # against the store writes below
    moved = a2.filter(F.col("cell").isin([cell, new_cell])).localCheckpoint()
    n_kept = moved.filter(F.col("cell") == cell).count()
    n_moved = moved.filter(F.col("cell") == new_cell).count()

    # 1. centroid table, atomic sibling swap (bounded quantizer
    #    metadata: n_centroids + 1 rows through the driver)
    cent_rows = c2.collect()
    cpath = f"{index_path}/centroids"
    tmp = f"{cpath}__rebalancing"
    spark.createDataFrame(cent_rows, c2.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    # old table aside first — the centroid table must exist at every
    # instant (probes resolve against it)
    _sibling_swap(cpath, tmp)

    # 2. re-routed assignment rows under a fresh batch id (latest-wins
    #    supersedes the fat cell's old rows; replay of any earlier batch
    #    cannot resurrect them)
    raw = _read_store(spark, f"{index_path}/assignments")
    next_bid = _next_maintenance_bid(raw)
    (
        moved.withColumn("_batch_id", F.lit(next_bid))
        .write.mode("append")
        .partitionBy("_batch_id", "cell")
        .parquet(f"{index_path}/assignments")
    )

    # 3. PQ code rows follow their vectors (cell re-route only)
    _recover_store(f"{index_path}/pq_codes")
    if _os.path.isdir(f"{index_path}/pq_codes"):
        from pyspark.sql import Window as W

        # pruned to the split cell's partitions: a moved vid's GLOBAL
        # latest code rows live in that cell by construction (any vid
        # whose latest rows sit elsewhere is not in `moved`, and the
        # join drops the stale in-cell rows such a vid may have left)
        raw_codes = _mask_tombstones(
            spark,
            index_path,
            spark.read.parquet(f"{index_path}/pq_codes").filter(
                F.col("cell") == cell
            ),
        )
        ws = W.partitionBy("vid", "s").orderBy(F.desc("_batch_id"))
        latest = (
            raw_codes.withColumn("_rn", F.row_number().over(ws))
            .filter(F.col("_rn") == 1)
            .select("vid", "s", "code")
        )
        routed = latest.join(
            F.broadcast(moved.select("vid", "cell")), "vid"
        ).localCheckpoint()
        (
            routed.withColumn("_batch_id", F.lit(next_bid))
            .write.mode("append")
            .partitionBy("_batch_id", "cell")
            .parquet(f"{index_path}/pq_codes")
        )

    return {
        "cell": int(cell),
        "new_cell": int(new_cell),
        "n_members": int(n_kept + n_moved),
        "n_kept": int(n_kept),
        "n_moved": int(n_moved),
        "batch_id": next_bid,
    }


def rebalance_overful_cells(
    spark: SparkSession,
    index_path: str,
    factor: float = 2.0,
    max_splits: int = 8,
    iters: int = 1,
) -> list[dict]:
    """The trigger and the repair in one admin op: split the fattest
    inverted list while any list holds more than ``factor`` × the mean
    occupancy, up to ``max_splits`` splits.  Each round re-reads ONLY
    per-cell counts (one hash aggregate over the store — the
    ``sim_ivf_cell_sizes`` readout) and runs one
    :func:`rebalance_store_cell`; the mean shrinks as cells are added,
    so the loop terminates either at the skew bound or at the split
    budget.  Returns the per-split stats, in order.

    ``factor`` ≤ 1.0 would chase the mean forever; values are validated.
    Greedy fattest-first is the right order: each split halves the
    worst straggler, and under latest-wins appends every split stays
    O(|cell|) regardless of how many ran before."""
    if factor <= 1.0:
        raise ValueError("factor must be > 1.0")
    out: list[dict] = []
    for _ in range(max_splits):
        _, assignments = load_stream_index(spark, index_path)
        sizes = (
            assignments.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        if not sizes:
            break
        mean = sum(r["n"] for r in sizes) / len(sizes)
        fat = sorted(
            ((r["n"], r["cell"]) for r in sizes if r["n"] > factor * mean),
            key=lambda t: (-t[0], t[1]),
        )
        if not fat:
            break
        out.append(rebalance_store_cell(
            spark, index_path, int(fat[0][1]), iters=iters
        ))
    return out


def vector_store_erasure_audit(
    spark: SparkSession, index_path: str
) -> DataFrame:
    """One audit row for the serving index's erasure posture —
    (n_tombstones, n_physical_rows_remaining, n_visible): how many ids
    are tombstoned, how many of their physical assignment rows still
    exist on disk (> 0 between delete and compaction — by design), and
    how many are VISIBLE through the load path (must be 0 always; the
    test pins it).  The vector-store face of
    ``privacy_erasure_audit``."""
    try:
        tomb = spark.read.parquet(f"{index_path}/tombstones").select(
            "vid"
        ).distinct()
    except AnalysisException:
        tomb = spark.createDataFrame([], "vid bigint")
    raw = _read_store(spark, f"{index_path}/assignments")
    _, visible = load_stream_index(spark, index_path)
    physical = raw.join(F.broadcast(tomb), "vid", "left_semi")
    seen = visible.join(F.broadcast(tomb), "vid", "left_semi")
    return (
        tomb.agg(F.count(F.lit(1)).cast("bigint").alias("n_tombstones"))
        .crossJoin(
            physical.agg(
                F.count(F.lit(1)).cast("bigint").alias(
                    "n_physical_rows_remaining"
                )
            )
        )
        .crossJoin(
            seen.agg(F.count(F.lit(1)).cast("bigint").alias("n_visible"))
        )
    )


def quantizer_drift_psi(
    store_occ: DataFrame,
    batch_occ: DataFrame,
    n_centroids: int,
) -> tuple[int, DataFrame]:
    """Laplace-smoothed PSI between the store's per-cell occupancy
    (reference) and one batch's occupancy (current), quantized
    FLOOR(term·2^40) with the same smoothing and scale as
    ``sim_ivf_quantizer_drift`` — the RETRAIN alarm for a frozen coarse
    quantizer, computed from counts only (two hash aggregates; no
    vectors move).  Inputs are (cell, n) frames; cells absent from
    either side smooth to +1.  Returns (psi_total_q, per_cell_terms).

    Variant note (deliberate, documented divergence): the term sum here
    runs over cells OCCUPIED in ref ∪ cur only, while the batch
    detector ``sim_ivf_quantizer_drift`` (similarity_q.py) enumerates
    ALL centroid cells, so cells empty on both sides still contribute a
    (tiny) nonzero smoothed term there.  This stream gate therefore
    reads slightly LOWER than the batch query whenever some cells are
    empty on both sides (common right after a retrain) — a threshold
    calibrated on one does not transfer exactly to the other.  The
    ``stream_retrain_*`` oracles mirror THIS occupied-cells variant, so
    cross-engine hashes agree."""
    from ..operators.drift import PSI_SCALE

    cells = store_occ.select("cell").unionByName(
        batch_occ.select("cell")
    ).distinct()
    j = (
        cells.join(store_occ.withColumnRenamed("n", "c_ref"), "cell", "left")
        .join(batch_occ.withColumnRenamed("n", "c_cur"), "cell", "left")
        .select(
            "cell",
            F.coalesce("c_ref", F.lit(0)).cast("bigint").alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).cast("bigint").alias("c_cur"),
        )
    )
    tot = j.agg(
        F.sum("c_ref").cast("bigint").alias("n_ref"),
        F.sum("c_cur").cast("bigint").alias("n_cur"),
    )
    p_ref = (F.col("c_ref") + 1).cast("double") / (
        F.col("n_ref").cast("double") + F.lit(float(n_centroids))
    )
    p_cur = (F.col("c_cur") + 1).cast("double") / (
        F.col("n_cur").cast("double") + F.lit(float(n_centroids))
    )
    terms = (
        j.crossJoin(F.broadcast(tot))
        .withColumn("p_ref", p_ref)
        .withColumn("p_cur", p_cur)
        .withColumn(
            "psi_term_q",
            F.floor(
                (F.col("p_cur") - F.col("p_ref"))
                * F.log(F.col("p_cur") / F.col("p_ref"))
                * F.lit(PSI_SCALE)
            ).cast("bigint"),
        )
    )
    row = terms.agg(F.sum("psi_term_q").alias("s")).first()
    return (int(row["s"]) if row["s"] is not None else 0), terms


def retrain_quantizer(
    spark: SparkSession,
    index_path: str,
    coarse_iters: int = 1,
    rounds: int = 3,
) -> dict:
    """Full coarse-quantizer RETRAIN of the stream-maintained store —
    the escalation rung above :func:`rebalance_overful_cells` (which
    repairs LOCAL skew but cannot fix a globally drifted quantizer):
    k-means|| oversampling over the store's CURRENT latest-wins vectors
    (l = 2k, ``rounds`` scans — cost independent of k, the only seeding
    a production-size retrain can afford) → max-min reduction over the
    bounded candidates → ``coarse_iters`` Lloyd iterations + final
    recompute — exactly the ``build_ivfpq_index(coarse_seed=
    "kmeans_par", coarse_iters=…)`` batch chain, so the streaming
    retrain equals an offline rebuild on the same vector set
    (test-pinned fold-equals-batch).

    Write order (crash-safe by reachability, the rebalance discipline —
    but unlike a cell split, a retrain replaces EVERY cell, so the new
    cells get globally FRESH ids and a BRIDGE table keeps both
    generations rankable through the window):

    1. the retrained centroids — under fresh cell ids strictly above
       every id either table has ever served — are committed to
       ``centroids_next`` (a sibling-swapped bridge; every load path
       serves main ∪ next via :func:`_centroids_with_pending`);
    2. ALL current rows re-assigned into the NEW cells under a fresh
       odd ``_batch_id`` (latest-wins supersedes every older row;
       mid-crash, old-cell rows rank via the main table and new-cell
       rows via the bridge — no row is ever unreachable.  The first
       version appended re-assignments under recycled ids 0..k−1
       BEFORE any centroid write, which served EMPTY results for the
       whole window whenever the frozen quantizer's cell ids were not
       exactly 0..k−1 — the review-pass find this order fixes);
    3. PQ code rows re-routed (cell only — the stream's codebook is
       raw-vector, independent of cells; codes are copied, never
       re-encoded);
    4. the new-only table promoted over ``centroids``, the bridge
       dropped, and a fresh drift-monitoring epoch baseline written.

    Replay-safe by CONVERGENCE: the vector SET is invariant under
    re-assignment, so a ledger-replayed trigger that retrains again
    derives the same clustering under even-fresher ids and folds to
    the same served content.
    Returns {n_vectors, n_cells, base_cell, batch_id}."""
    import os as _os
    import shutil as _shutil

    from ..operators.similarity import (
        farthest_point_seeds,
        kmeans_parallel_oversample,
        kmeans_refine,
        norm,
        recompute_centroids,
    )

    _ensure_bid_format(index_path)
    # k comes from the MAIN table only — during a crashed retrain's
    # window the union view holds old + pending cells, which must not
    # double the retrain size on replay
    main_c = _read_store(spark, f"{index_path}/centroids")
    n_centroids = main_c.count()
    served = _centroids_with_pending(spark, index_path)
    base_row = served.agg(F.max("cell").alias("m")).first()
    base_cell = int(base_row["m"]) + 1 if base_row["m"] is not None else 0

    _, assignments = load_stream_index(spark, index_path)
    vecs = assignments.select("vid", "vec").localCheckpoint()
    cands, _ = kmeans_parallel_oversample(
        vecs, l=2 * n_centroids, rounds=rounds, id_col="vid", vec_col="vec"
    )
    init = farthest_point_seeds(
        cands, k=n_centroids, id_col="vid", vec_col="vec"
    ).select("cluster_id", "centroid")
    assignment = kmeans_refine(
        vecs, k=n_centroids, iters=coarse_iters,
        id_col="vid", vec_col="vec", init_centroids=init,
    )
    new_c = (
        recompute_centroids(vecs, assignment, "vid", "vec")
        .select(
            (F.col("cluster_id") + F.lit(base_cell)).cast("bigint")
            .alias("cell"),
            F.col("centroid").alias("cvec"),
        )
        .withColumn("cnrm", norm(F.col("cvec")))
    )
    cent_rows = new_c.collect()  # bounded: k rows of quantizer metadata
    new_cdf = spark.createDataFrame(cent_rows, new_c.schema).localCheckpoint()

    # 1. commit the BRIDGE: new cells rankable before any row moves
    cpath = f"{index_path}/centroids"
    npath = f"{index_path}/centroids_next"
    tmp = f"{npath}__staging"
    new_cdf.coalesce(1).write.mode("overwrite").parquet(tmp)
    if _os.path.isdir(npath):
        _sibling_swap(npath, tmp)
    else:
        _os.rename(tmp, npath)

    # 2. re-assign every current row against the retrained centroids
    reassigned = ivf_index_add_batch(
        new_cdf, vecs, id_col="vid", vec_col="vec"
    ).localCheckpoint()
    raw = _read_store(spark, f"{index_path}/assignments")
    next_bid = _next_maintenance_bid(raw)
    (
        reassigned.withColumn("_batch_id", F.lit(next_bid))
        .write.mode("append")
        .partitionBy("_batch_id", "cell")
        .parquet(f"{index_path}/assignments")
    )

    # 3. PQ codes follow their vectors (cell re-route, codes untouched)
    _recover_store(f"{index_path}/pq_codes")
    if _os.path.isdir(f"{index_path}/pq_codes"):
        from pyspark.sql import Window as W

        raw_codes = _mask_tombstones(
            spark, index_path, spark.read.parquet(f"{index_path}/pq_codes")
        )
        ws = W.partitionBy("vid", "s").orderBy(F.desc("_batch_id"))
        latest = (
            raw_codes.withColumn("_rn", F.row_number().over(ws))
            .filter(F.col("_rn") == 1)
            .select("vid", "s", "code")
        )
        routed = latest.join(
            reassigned.select("vid", "cell"), "vid"
        ).localCheckpoint()
        (
            routed.withColumn("_batch_id", F.lit(next_bid))
            .write.mode("append")
            .partitionBy("_batch_id", "cell")
            .parquet(f"{index_path}/pq_codes")
        )

    # 4. promote the new-only table and drop the bridge (a crash
    #    between the two leaves main = next = the same rows; the
    #    cell-dedup in _centroids_with_pending collapses them)
    tmp2 = f"{cpath}__promoting"
    new_cdf.coalesce(1).write.mode("overwrite").parquet(tmp2)
    _sibling_swap(cpath, tmp2)
    _shutil.rmtree(npath)

    # 5. open a new drift-monitoring EPOCH: the baseline generation is
    #    the full re-assignment's per-cell occupancy (already in hand —
    #    O(cells) rows), so the monitor compares future batches against
    #    the RETRAINED layout instead of the drifted history
    _write_occupancy(
        spark,
        index_path,
        reassigned.groupBy("cell").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        ),
        _current_epoch(spark, index_path) + 1,
        next_bid,
    )

    return {
        "n_vectors": int(reassigned.count()),
        "n_cells": int(n_centroids),
        "base_cell": int(base_cell),
        "batch_id": next_bid,
    }


def _write_occupancy(
    spark: SparkSession,
    index_path: str,
    occ: DataFrame,
    epoch: int,
    bid: int,
) -> None:
    """One (epoch, _batch_id, cell, n) occupancy generation — dynamic
    per-``_batch_id`` overwrite, so replays rewrite exactly their own
    rows."""
    _recover_store(f"{index_path}/occupancy")
    (
        occ.select(
            F.lit(int(epoch)).cast("bigint").alias("epoch"),
            "cell",
            "n",
        )
        .withColumn("_batch_id", F.lit(int(bid)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id")
        .parquet(f"{index_path}/occupancy")
    )


def _current_epoch(spark: SparkSession, index_path: str) -> int:
    try:
        row = (
            _read_store(spark, f"{index_path}/occupancy")
            .agg(F.max("epoch").alias("m"))
            .first()
        )
        return int(row["m"]) if row["m"] is not None else 0
    except AnalysisException:
        return 0


def _drift_check_and_retrain(
    spark: SparkSession,
    index_path: str,
    assigned: DataFrame,
    batch_id: int,
    n_centroids: int,
    psi_threshold: float,
) -> bool:
    """The per-trigger drift gate: PSI(store-before-this-trigger vs
    this batch) → one ``drift_log`` row (idempotent per-trigger dynamic
    overwrite) → :func:`retrain_quantizer` when the quantized PSI
    crosses ``psi_threshold``.  Returns whether a retrain ran.

    The reference occupancy is INCREMENTAL state, never a store rescan:
    every trigger appends its own batch's per-cell counts to the
    ``occupancy`` store (O(cells) rows — the counts were just computed
    for the write anyway), and the reference is the SUM of the current
    EPOCH's earlier generations — O(cells × triggers-per-epoch) rows
    read per trigger, where the first version of this gate re-derived
    latest-wins occupancy from the FULL assignments store every trigger
    (O(store) — the rescan this module exists to avoid).  A retrain
    opens a new epoch with a fresh baseline generation (written from
    the re-assignment it already computed), so the monitor compares
    against the RETRAINED layout afterwards, not the drifted history.
    Documented approximation: a re-embedded vid keeps counting at its
    old cell (and a rebalance's moves are not folded) until the next
    retrain resets the baseline — occupancy monitoring tolerates this;
    serving reads never use these counts.

    Replay contract: the reference takes epoch generations with
    ``_batch_id`` strictly below this trigger's, and this trigger's own
    occupancy/log rows are per-``_batch_id`` dynamic overwrites — a
    ledger replay measures the same reference a clean run did (or the
    post-retrain epoch's, which converges)."""
    from ..operators.drift import PSI_SCALE

    sbid = _stream_bid(batch_id)
    epoch = _current_epoch(spark, index_path)
    cur_occ = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint()
    n_cur_row = cur_occ.agg(F.sum("n").alias("t")).first()
    n_cur = int(n_cur_row["t"]) if n_cur_row["t"] is not None else 0
    try:
        ref_occ = (
            _read_store(spark, f"{index_path}/occupancy")
            .filter(
                (F.col("epoch") == epoch) & (F.col("_batch_id") < sbid)
            )
            .groupBy("cell")
            .agg(F.sum("n").cast("bigint").alias("n"))
        )
        n_ref_row = ref_occ.agg(F.sum("n").alias("t")).first()
        n_ref = int(n_ref_row["t"]) if n_ref_row["t"] is not None else 0
    except AnalysisException:
        ref_occ = None
        n_ref = 0
    alarm = False
    psi_q = 0
    if n_ref > 0:
        psi_q, _terms = quantizer_drift_psi(ref_occ, cur_occ, n_centroids)
        alarm = psi_q > int(psi_threshold * PSI_SCALE)
    # replay-after-retrain guard: if the current epoch already holds a
    # LATER generation (the retrain baseline, whose odd maintenance bid
    # exceeds this trigger's), this trigger's mass is already inside
    # that baseline — writing it again would double-count the batch in
    # every later reference
    already_folded = False
    try:
        later = (
            _read_store(spark, f"{index_path}/occupancy")
            .filter((F.col("epoch") == epoch) & (F.col("_batch_id") > sbid))
            .limit(1)
            .count()
        )
        already_folded = later > 0
    except AnalysisException:
        pass
    if not already_folded:
        _write_occupancy(spark, index_path, cur_occ, epoch, sbid)
        # the log row is written BEFORE the retrain, and NOT rewritten
        # on a replay-after-retrain (already_folded): a replayed alarm
        # trigger recomputes psi against the fresh post-retrain epoch
        # (empty reference → 0) and would otherwise dynamic-overwrite
        # the only record of why the epoch changed with alarm=false.
        # ``retrained`` therefore means "retrain TRIGGERED here" — its
        # completion is the ledger's business (replay finishes it).
        (
            spark.createDataFrame(
                [(sbid, n_ref, n_cur, psi_q, alarm, alarm)],
                "_batch_id bigint, n_ref bigint, n_cur bigint, "
                "psi_total_q bigint, alarm boolean, retrained boolean",
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(f"{index_path}/drift_log")
        )
    retrained = False
    if alarm:
        retrain_quantizer(spark, index_path)
        retrained = True
    return retrained
