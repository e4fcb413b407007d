"""Round-7 regression tests for the round-6 advisory findings:

* ``vector_index_stream`` quantizer top-up must NEVER evict a cell
  that already keys written assignment rows (an early batch with large
  ids followed by smaller-id batches used to drop the large-id cells
  from sorted(...)[:n], making their rows unreachable at any nprobe);
* the IVF-PQ freeze batch must write the back-filled codes BEFORE the
  codebook (the codebook is the commit marker) — a crash between the
  two used to permanently drop every pre-freeze vector from pq_codes
  on ledger replay;
* ``ivfpq_rerank_topk`` must score a residual-built (IVFADC) index in
  residual mode (the raw-mode LUT joined against residual codes was a
  silent semantics error), with the encoding mode persisted in pq_meta;
* ``ivf_topk_with_centroids`` must not re-execute the corpus scoring
  scan for the probe side (2-consumer lazy fan-out) — probes now come
  from a bounded query-only re-score.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _drive_stream(spark, tmp_path, emb, ckpt_name, index_path, lpath,
                  n_centroids=8, pq_m=None, pq_k=8):
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        vector_index_stream,
    )

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "drop"))
    )
    q = vector_index_stream(
        stream, index_path, str(tmp_path / ckpt_name), BatchLedger(lpath),
        n_centroids=n_centroids, pq_m=pq_m, pq_k=pq_k,
    )
    q.awaitTermination(240)


def test_quantizer_topup_never_evicts_used_cell(spark, tmp_path):
    """Batch 0 carries LARGE ids (the quantizer starts from them),
    batch 1 carries smaller ids while the quantizer is still filling.
    The old sorted(...)[:n] top-up evicted the large-id cells — rows
    already assigned under them became unreachable.  Now: every cell
    present in the assignment store must exist in the centroid table."""
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        load_stream_index,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    drop = str(tmp_path / "drop")
    # batch 0: 5 large ids (quantizer needs 8 -> keeps filling)
    emb.filter(F.col("vec_id").between(100, 104)).coalesce(1).write.parquet(drop)
    # batch 1: small ids — the old code would sort-and-keep [0..7],
    # evicting cells 100-104 that already key batch-0 assignment rows
    emb.filter(F.col("vec_id") < 20).coalesce(1).write.mode("append").parquet(drop)

    index_path = str(tmp_path / "idx")
    _drive_stream(spark, tmp_path, emb, "ckpt", index_path,
                  str(tmp_path / "ledger.json"), n_centroids=8)

    centroids, assignments = load_stream_index(spark, index_path)
    cent_cells = {r["cell"] for r in centroids.select("cell").collect()}
    used_cells = {r["cell"] for r in assignments.select("cell").distinct().collect()}
    assert used_cells <= cent_cells, (
        f"assignment cells {used_cells - cent_cells} missing from the "
        f"centroid table — unreachable at any nprobe"
    )
    # the original large-id cells survived the top-up
    assert {100, 101, 102, 103, 104} <= cent_cells
    # and the quantizer still filled to capacity
    assert len(cent_cells) == 8


def test_pq_freeze_crash_window_backfills_on_replay(spark, tmp_path):
    """Crash AFTER the back-filled codes, BEFORE the codebook (the only
    remaining freeze-crash window now that the codebook is written
    last): the ledger-replayed freeze batch must re-derive the
    deterministic codebook, rewrite the same code partitions, and end
    with every stored vector coded."""
    from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
        _pq_assign,
        as_double_array,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        load_stream_ivfpq,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    drop = str(tmp_path / "drop")
    # batch 0 under-fills the quantizer (freeze happens at batch 1)
    emb.filter(F.col("vec_id") < 4).coalesce(1).write.parquet(drop)
    emb.filter(F.col("vec_id").between(4, 49)).coalesce(1).write.mode(
        "append"
    ).parquet(drop)
    emb.filter(F.col("vec_id").between(50, 99)).coalesce(1).write.mode(
        "append"
    ).parquet(drop)

    index_path = str(tmp_path / "idx")
    lpath = str(tmp_path / "ledger.json")
    _drive_stream(spark, tmp_path, emb, "ckpt", index_path, lpath,
                  n_centroids=8, pq_m=8, pq_k=8)

    n_rows = emb.filter(F.col("vec_id") < 100).count()

    # simulate the crash window: codebook gone (written last -> the
    # crash happened just before it), freeze batch flipped to 'running'
    import shutil

    shutil.rmtree(f"{index_path}/pq_codebook")
    state = json.load(open(lpath))
    freeze_bid = "vecidx-microbatch-1"  # quantizer fills during batch 1
    assert state.get(freeze_bid) == "done"
    state[freeze_bid] = "running"
    json.dump(state, open(lpath, "w"))

    _drive_stream(spark, tmp_path, emb, "ckpt2", index_path, lpath,
                  n_centroids=8, pq_m=8, pq_k=8)

    cents, assigns, cb, codes = load_stream_ivfpq(spark, index_path)
    coded_vids = {r["vid"] for r in codes.select("vid").distinct().collect()}
    stored_vids = {r["vid"] for r in assigns.select("vid").collect()}
    assert coded_vids == stored_vids and len(stored_vids) == n_rows

    # and the codes hash-equal a batch assignment against the stream's
    # own codebook (replay produced the same deterministic result)
    base = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("vid"), as_double_array("embedding").alias("vec")
    )
    sub = len(cb.select("cv").first()["cv"])
    expect = {
        (r["vid"], r["s"], r["code"])
        for r in _pq_assign(base, cb, 8, sub).collect()
    }
    assert {(r["vid"], r["s"], r["code"]) for r in codes.collect()} == expect


def test_rerank_residual_mode_matches_index_encoding(spark, tmp_path):
    """On a residual-built (IVFADC) index, rerank in residual mode must
    recover at least as many brute-force neighbors as the (formerly
    silent) raw-mode scoring of the same codes, and pq_meta must record
    the encoding so consumers can pick the mode from the index itself."""
    from ecs_ecommerce_data_pipeline_spark.operators import similarity
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "ividx")
    cents, assigns, cb, codes = similarity.build_ivfpq_index(
        emb, n_centroids=16, m=8, pq_k=16, path=path, residual=True
    )
    meta = similarity.load_ivfpq_meta(spark, path)
    assert meta["residual"] is True and meta["m"] == 8

    qids = [0, 1, 2, 3, 4]
    truth = {
        (r["query_id"], r["corpus_id"])
        for r in similarity.brute_force_topk(emb, qids, k=10).collect()
    }

    def hits(residual_flag: bool) -> int:
        got = similarity.ivfpq_rerank_topk(
            cents, assigns, cb, codes, qids, k=10, shortlist=50,
            nprobe=16, residual=residual_flag,
        )
        return len(
            truth & {(r["query_id"], r["corpus_id"]) for r in got.collect()}
        )

    right, wrong = hits(True), hits(False)
    assert right >= wrong, (right, wrong)
    # all cells probed + exact re-rank: correct-mode recall is real
    assert right > 0


def test_ivf_topk_with_centroids_matches_internal_quantizer(spark):
    """Feeding the smallest-id centroid table reproduces ivf_topk's
    output exactly (the fan-out restructure is results-preserving), and
    the probe side's query re-score pushes a vec_id IN-filter into its
    scan instead of re-running the corpus scoring."""
    from ecs_ecommerce_data_pipeline_spark.operators import similarity
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    cents = (
        emb.orderBy("vec_id")
        .limit(16)
        .select(
            F.col("vec_id").cast("bigint").alias("cluster_id"),
            similarity.as_double_array("embedding").alias("centroid"),
        )
    )
    qids = [0, 1, 2, 3, 4]
    got = similarity.ivf_topk_with_centroids(emb, cents, qids, k=10, nprobe=4)
    ref = similarity.ivf_topk(emb, qids, k=10, n_centroids=16, nprobe=4)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "In(vec_id" in plan, "query-side re-score lost its id pushdown"
