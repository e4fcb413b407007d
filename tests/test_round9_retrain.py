"""Round-9 streaming tests: the drift loop closed — alarm → re-seed →
re-train (verdict task 2).

Round 8 had the detector (``sim_ivf_quantizer_drift`` PSI) and the
repair machinery (k-means|| seeding, Lloyd refine) as separate verified
pieces; ``vector_index_stream(retrain_psi_threshold=…)`` now composes
them: every trigger ends with a PSI check of this batch's cell
occupancy against the store's, logged to ``drift_log``, and a crossing
escalates to :func:`retrain_quantizer` inside the ledger window.
Pinned here:

* a drift-adversarial append stream (mid-stream distribution shift:
  96 vectors concentrated at one point) fires the alarm and ends with a
  RETRAINED quantizer, no admin call;
* fold-equals-batch: the stream-retrained centroids are bit-identical
  to the offline k-means|| chain (oversample → max-min reduce → Lloyd)
  run on the same vector set;
* content preservation: every vid visible exactly once after retrain,
  vectors byte-equal, PQ code rows riding the NEW cells;
* the drifted region is served sanely again: the drift mass gets
  dedicated inverted lists (no longer crowding a frozen cell alongside
  uniform rows) and probed recall for drift-region queries is exact at
  small nprobe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
_NC = 8
_PSI_T = 0.25


def _corpus(spark):
    """Batches: (uniform vids 0..47) → (uniform vids 48..95) → (96
    near-copies of vid 0's vector — the shifted distribution)."""
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    b0 = emb.filter(F.col("vec_id") < 48)
    b1 = emb.filter((F.col("vec_id") >= 48) & (F.col("vec_id") < 96))
    v0 = emb.filter(F.col("vec_id") == 0).select("embedding")
    drift = (
        spark.range(1000, 1096)
        .select(F.col("id").alias("vec_id"))
        .crossJoin(F.broadcast(v0))
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, (x, i) -> CAST(x * (1.0D + "
                "CAST((vec_id * 31 + i) % 13 AS DOUBLE) / 100.0D) AS FLOAT))"
            ).alias("embedding"),
        )
    )
    return b0, b1, drift


def _run(spark, tmp_path, schema, ckpt, index_path, lpath):
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        vector_index_stream,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "drop"))
    )
    q = vector_index_stream(
        stream, index_path, str(tmp_path / ckpt), BatchLedger(lpath),
        n_centroids=_NC, pq_m=8, pq_k=8,
        retrain_psi_threshold=_PSI_T,
    )
    q.awaitTermination(240)


def _drift_log(spark, index_path):
    return {
        r["_batch_id"]: r.asDict()
        for r in spark.read.parquet(f"{index_path}/drift_log").collect()
    }


def test_drift_stream_retrains_and_restores(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        farthest_point_seeds,
        ivf_topk_with_centroids,
        kmeans_parallel_oversample,
        kmeans_refine,
        norm,
        recompute_centroids,
    )
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        load_stream_ivfpq,
        load_stream_index,
    )

    b0, b1, drift = _corpus(spark)
    drop = str(tmp_path / "drop")
    b0.coalesce(1).write.parquet(drop)
    b1.coalesce(1).write.mode("append").parquet(drop)
    drift.coalesce(1).write.mode("append").parquet(drop)
    index_path = str(tmp_path / "idx")
    lpath = str(tmp_path / "ledger.json")
    _run(spark, tmp_path, b0.schema, "ckpt", index_path, lpath)

    # 1. alarm fired exactly at the drift trigger, retrain ran, and the
    #    stationary trigger stayed quiet — no admin call anywhere
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        _stream_bid,
    )

    s0, s1, s2 = _stream_bid(0), _stream_bid(1), _stream_bid(2)
    log = _drift_log(spark, index_path)
    assert set(log) == {s0, s1, s2}  # shifted stream bids
    assert log[s0]["n_ref"] == 0 and not log[s0]["alarm"]
    assert not log[s1]["alarm"], log[s1]
    assert log[s2]["alarm"] and log[s2]["retrained"], log[s2]
    assert log[s1]["psi_total_q"] < log[s2]["psi_total_q"]

    # 1b. the drift monitor's reference is INCREMENTAL state, and the
    #     retrain opened a fresh epoch whose baseline is the full
    #     re-assignment (epoch 0: one generation per pre-retrain
    #     trigger; epoch 1: the 192-row baseline)
    occ = spark.read.parquet(f"{index_path}/occupancy")
    by_epoch = {
        r["epoch"]: r["t"]
        for r in occ.groupBy("epoch").agg(F.sum("n").alias("t")).collect()
    }
    assert set(by_epoch) == {0, 1}
    assert by_epoch[1] == 48 + 48 + 96  # baseline = whole store
    bids0 = {
        r["_batch_id"]
        for r in occ.filter(F.col("epoch") == 0)
        .select("_batch_id").distinct().collect()
    }
    assert bids0 == {s0, s1, s2}  # one generation per trigger, stream bids

    # 2. serving fold: content preserved exactly once, codes on new cells
    cents, assigns = load_stream_index(spark, index_path)
    rows = assigns.select("vid", "cell").collect()
    assert len(rows) == 48 + 48 + 96
    got_cells = {r["vid"]: r["cell"] for r in rows}
    _, _, _cb, codes = load_stream_ivfpq(spark, index_path)
    code_cells = {
        (r["vid"], r["cell"])
        for r in codes.select("vid", "cell").distinct().collect()
    }
    assert code_cells == {(v, c) for v, c in got_cells.items()}

    # 3. fold-equals-batch: stream-retrained centroids == the offline
    #    k-means|| chain on the same latest-wins vector set
    vecs = assigns.select("vid", "vec")
    cands, _ = kmeans_parallel_oversample(
        vecs, l=2 * _NC, rounds=3, id_col="vid", vec_col="vec"
    )
    init = farthest_point_seeds(
        cands, k=_NC, id_col="vid", vec_col="vec"
    ).select("cluster_id", "centroid")
    offline = (
        recompute_centroids(
            vecs,
            kmeans_refine(
                vecs, k=_NC, iters=1, id_col="vid", vec_col="vec",
                init_centroids=init,
            ),
            "vid", "vec",
        )
        .select(
            F.col("cluster_id").alias("cell"),
            F.col("centroid").alias("cvec"),
        )
        .withColumn("cnrm", norm(F.col("cvec")))
    )
    # the stream's retrained cells carry globally FRESH ids (base =
    # 1 + max frozen cell = 8 here — the reachability fix), so the
    # offline chain's 0..k-1 ids map up by that base
    want = {
        r["cell"] + _NC: [round(x, 9) for x in r["cvec"]]
        for r in offline.collect()
    }
    got = {
        r["cell"]: [round(x, 9) for x in r["cvec"]]
        for r in cents.collect()
    }
    assert got == want

    # 4. the drift region now owns DEDICATED cell(s): under the frozen
    #    quantizer all 96 drift rows crowded into vid 0's cell alongside
    #    its uniform neighbors; after retrain the drift cells hold (at
    #    most) vid 0's own family and essentially no uniform rows.
    #    (The drift cluster is nearly collinear — scaled copies of one
    #    vector — so ONE cell for it is the CORRECT clustering, not
    #    residual skew.)
    drift_cells = {
        r["cell"]
        for r in assigns.filter(F.col("vid") >= 1000)
        .select("cell").distinct().collect()
    }
    in_cells = assigns.filter(F.col("cell").isin(list(drift_cells))).count()
    # ≥85% of the drift cells' occupancy is the drift family (a few
    # uniform rows legitimately sit closest to the new centroid)
    assert 96 / in_cells >= 0.85, (drift_cells, in_cells)
    # ...and probed search over the retrained store is exact for
    # drift-region queries at small nprobe
    all_vecs = assigns.select(
        F.col("vid").alias("vec_id"), F.col("vec").alias("embedding")
    )
    qids = [1000, 1001, 1002]
    truth = {
        (r["query_id"], r["corpus_id"])
        for r in brute_force_topk(all_vecs, qids, k=10).collect()
    }
    served = {
        (r["query_id"], r["corpus_id"])
        for r in ivf_topk_with_centroids(
            all_vecs,
            cents.select(
                F.col("cell").alias("cluster_id"),
                F.col("cvec").alias("centroid"),
            ),
            qids, k=10, nprobe=2,
        ).collect()
    }
    assert truth == served


def test_retrain_is_replay_safe_by_convergence(spark, tmp_path):
    import json

    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        load_stream_index,
    )

    b0, b1, drift = _corpus(spark)
    drop = str(tmp_path / "drop")
    b0.coalesce(1).write.parquet(drop)
    b1.coalesce(1).write.mode("append").parquet(drop)
    drift.coalesce(1).write.mode("append").parquet(drop)
    index_path = str(tmp_path / "idx")
    lpath = str(tmp_path / "ledger.json")
    _run(spark, tmp_path, b0.schema, "ckpt", index_path, lpath)
    cents1, assigns1 = load_stream_index(spark, index_path)
    want = {r["vid"]: r["cell"] for r in assigns1.select("vid", "cell").collect()}
    cwant = {r["cell"]: [round(x, 9) for x in r["cvec"]] for r in cents1.collect()}

    # replay the DRIFT trigger (the one that retrained): the batch write
    # is an idempotent dynamic overwrite, the PSI recomputes against the
    # retrained store, and any second retrain must fold to the same
    # content — convergence, not idempotence
    state = json.load(open(lpath))
    drift_bid = [b for b in state if b.endswith("-2")][0]
    state[drift_bid] = "running"
    json.dump(state, open(lpath, "w"))
    _run(spark, tmp_path, b0.schema, "ckpt2", index_path, lpath)

    cents2, assigns2 = load_stream_index(spark, index_path)
    got = {r["vid"]: r["cell"] for r in assigns2.select("vid", "cell").collect()}
    cgot = {r["cell"]: [round(x, 9) for x in r["cvec"]] for r in cents2.collect()}
    assert cgot == cwant
    assert got == want


def test_occupancy_compaction_preserves_reference_sums(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        compact_index,
    )

    b0, b1, drift = _corpus(spark)
    drop = str(tmp_path / "drop")
    b0.coalesce(1).write.parquet(drop)
    b1.coalesce(1).write.mode("append").parquet(drop)
    drift.coalesce(1).write.mode("append").parquet(drop)
    index_path = str(tmp_path / "idx")
    _run(spark, tmp_path, b0.schema, "ckpt", index_path,
         str(tmp_path / "ledger.json"))

    occ = spark.read.parquet(f"{index_path}/occupancy")
    want = {
        (r["epoch"], r["cell"]): r["t"]
        for r in occ.groupBy("epoch", "cell")
        .agg(F.sum("n").alias("t")).collect()
    }
    compact_index(spark, index_path)
    occ2 = spark.read.parquet(f"{index_path}/occupancy")
    got = {
        (r["epoch"], r["cell"]): r["t"]
        for r in occ2.groupBy("epoch", "cell")
        .agg(F.sum("n").alias("t")).collect()
    }
    assert got == want  # the associative fold is invisible to the gate
    # one generation per epoch remains
    gens = occ2.select("epoch", "_batch_id").distinct().count()
    epochs = occ2.select("epoch").distinct().count()
    assert gens == epochs


def test_maintenance_rows_survive_the_next_trigger(spark, tmp_path):
    """Round-9 regression (id scheme now v3-shifted, see _stream_bid):
    maintenance appends stamp ids strictly inside their trigger window so
    the NEXT trigger's dynamic overwrite can no longer clobber them.
    Before the fix, a rebalance after trigger t wrote max+1 = t+1 —
    exactly trigger t+1's id — and any cell that trigger touched threw
    away the re-routed rows (they bounced back to the fat cell by
    latest-wins).  Here: trigger 1 is skew-adversarial (rebalance
    splits), trigger 2 appends MORE rows into the same region; the
    bound must still hold afterwards."""
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        load_stream_index,
        vector_index_stream,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 60)
    v0 = emb.filter(F.col("vec_id") == 0).select("embedding")

    def _skew(lo, hi):
        return (
            spark.range(lo, hi)
            .select(F.col("id").alias("vec_id"))
            .crossJoin(F.broadcast(v0))
            .select(
                "vec_id",
                F.expr(
                    "transform(embedding, (x, i) -> CAST(x * (1.0D + "
                    "CAST((vec_id * 31 + i) % 13 AS DOUBLE) / 100.0D)"
                    " AS FLOAT))"
                ).alias("embedding"),
            )
        )

    drop = str(tmp_path / "drop")
    base.coalesce(1).write.parquet(drop)
    _skew(1000, 1120).coalesce(1).write.mode("append").parquet(drop)
    _skew(2000, 2040).coalesce(1).write.mode("append").parquet(drop)
    index_path = str(tmp_path / "idx")
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    q = vector_index_stream(
        stream, index_path, str(tmp_path / "ckpt"),
        BatchLedger(str(tmp_path / "ledger.json")),
        n_centroids=16, rebalance_factor=2.0, rebalance_max_splits=16,
    )
    q.awaitTermination(240)

    _, assigns = load_stream_index(spark, index_path)
    sizes = {
        r["cell"]: r["n"]
        for r in assigns.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(sizes.values()) == 60 + 120 + 40
    mean = sum(sizes.values()) / len(sizes)
    assert max(sizes.values()) <= 2.0 * mean, sizes
    # stream ids at trigger<<20, maintenance ids inside the window —
    # both present, and no maintenance id reaches the next stream bid
    bids = {
        r["_batch_id"]
        for r in spark.read.parquet(f"{index_path}/assignments")
        .select("_batch_id").distinct().collect()
    }
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        _BID_SHIFT,
        _stream_bid,
    )

    assert {_stream_bid(0), _stream_bid(1), _stream_bid(2)} <= bids
    # maintenance ids live strictly INSIDE their trigger window
    maint = [b for b in bids if b % (1 << _BID_SHIFT) != 0]
    assert maint, bids
    assert all(b < _stream_bid((b >> _BID_SHIFT) + 1) for b in maint), bids


def test_retrain_reachable_when_ids_do_not_start_at_zero(spark, tmp_path):
    """Round-9 review regression: retrain used to append re-assignments
    under recycled cell ids 0..k−1 BEFORE any centroid write — with a
    quantizer whose frozen cells are NOT 0..k−1 (any corpus whose
    smallest ids aren't 0..k−1), every row was unreachable for the whole
    window and a crash served an empty index.  Now the new cells get
    globally fresh ids committed via the centroids_next bridge first.
    Here the corpus ids start at 5000: the retrained store must serve
    every row, with assignment cells ⊆ the served centroid table."""
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        load_stream_index,
        vector_index_stream,
    )

    emb = load_table(spark, SF, "embeddings").select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding"
    )
    b0 = emb.filter(F.col("vec_id") < 5048)
    b1 = emb.filter((F.col("vec_id") >= 5048) & (F.col("vec_id") < 5096))
    v0 = emb.filter(F.col("vec_id") == 5000).select("embedding")
    drift = (
        spark.range(9000, 9096)
        .select(F.col("id").alias("vec_id"))
        .crossJoin(F.broadcast(v0))
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, (x, i) -> CAST(x * (1.0D + "
                "CAST((vec_id * 31 + i) % 13 AS DOUBLE) / 100.0D) AS FLOAT))"
            ).alias("embedding"),
        )
    )
    drop = str(tmp_path / "drop")
    b0.coalesce(1).write.parquet(drop)
    b1.coalesce(1).write.mode("append").parquet(drop)
    drift.coalesce(1).write.mode("append").parquet(drop)
    index_path = str(tmp_path / "idx")
    stream = (
        spark.readStream.schema(b0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    q = vector_index_stream(
        stream, index_path, str(tmp_path / "ckpt"),
        BatchLedger(str(tmp_path / "ledger.json")),
        n_centroids=_NC, retrain_psi_threshold=_PSI_T,
    )
    q.awaitTermination(240)

    log = _drift_log(spark, index_path)
    assert any(r["retrained"] for r in log.values())
    cents, assigns = load_stream_index(spark, index_path)
    cent_cells = {r["cell"] for r in cents.select("cell").collect()}
    asg_cells = {
        r["cell"] for r in assigns.select("cell").distinct().collect()
    }
    assert asg_cells <= cent_cells, (asg_cells, cent_cells)
    # fresh ids sit ABOVE the frozen quantizer's id range
    assert min(cent_cells) > 5007
    assert assigns.count() == 48 + 48 + 96
    # no bridge left behind after a clean retrain
    import os

    assert not os.path.isdir(f"{index_path}/centroids_next")
