"""Round-7 lifecycle + streaming-image-dedup tests (verdict tasks 3-4):

* vector-index deletes: a tombstoned vid never surfaces through the
  load path or ``ivfpq_topk`` — including after a ledger replay
  physically re-writes its rows;
* compaction: parquet file count drops, the loaded index is
  content-equal, deleted rows are physically gone, and the store still
  serves;
* the erasure audit reports visible=0 always, physical>0 between
  delete and compaction, physical=0 after;
* streaming image dedup: the union of per-batch pair partitions equals
  the batch operator over the full corpus, and replay changes nothing.
"""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _run_vec_stream(spark, tmp_path, emb, ckpt, index_path, lpath):
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
        stream, index_path, str(tmp_path / ckpt), BatchLedger(lpath),
        n_centroids=16, pq_m=8, pq_k=16,
    )
    q.awaitTermination(240)


def test_deleted_vid_never_surfaces_even_across_replay(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.operators import similarity
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        delete_vectors,
        load_stream_ivfpq,
        vector_store_erasure_audit,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    drop = str(tmp_path / "drop")
    emb.filter(F.col("vec_id") < 60).coalesce(1).write.parquet(drop)
    emb.filter(F.col("vec_id").between(60, 119)).coalesce(1).write.mode(
        "append"
    ).parquet(drop)
    index_path = str(tmp_path / "idx")
    lpath = str(tmp_path / "ledger.json")
    _run_vec_stream(spark, tmp_path, emb, "ckpt", index_path, lpath)

    victims = [7, 8, 61]
    delete_vectors(spark, index_path, victims)

    def visible_vids():
        _, assigns, _, codes = load_stream_ivfpq(spark, index_path)
        av = {r["vid"] for r in assigns.select("vid").collect()}
        cv = {r["vid"] for r in codes.select("vid").distinct().collect()}
        return av | cv

    assert not (set(victims) & visible_vids())
    cents, assigns, cb, codes = load_stream_ivfpq(spark, index_path)
    topk = similarity.ivfpq_topk(
        cents, assigns, cb, codes, [0, 1, 2], k=20, nprobe=16, m=8
    )
    assert not (set(victims) & {r["corpus_id"] for r in topk.collect()})

    audit = vector_store_erasure_audit(spark, index_path).first()
    assert audit["n_visible"] == 0
    assert audit["n_tombstones"] == 3
    assert audit["n_physical_rows_remaining"] == 3  # pre-compaction

    # ledger replay of the batch that carried vid 7: the physical rows
    # come back, the mask must still hide them
    state = json.load(open(lpath))
    state["vecidx-microbatch-0"] = "running"
    json.dump(state, open(lpath, "w"))
    _run_vec_stream(spark, tmp_path, emb, "ckpt2", index_path, lpath)
    assert not (set(victims) & visible_vids())
    audit2 = vector_store_erasure_audit(spark, index_path).first()
    assert audit2["n_visible"] == 0


def test_compaction_drops_files_and_preserves_index(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.operators import similarity
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        compact_index,
        delete_vectors,
        load_stream_ivfpq,
        vector_store_erasure_audit,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    drop = str(tmp_path / "drop")
    for lo, hi in ((0, 39), (40, 79), (80, 119), (120, 159)):
        emb.filter(F.col("vec_id").between(lo, hi)).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
    index_path = str(tmp_path / "idx")
    _run_vec_stream(
        spark, tmp_path, emb, "ckpt", index_path, str(tmp_path / "ledger.json")
    )
    delete_vectors(spark, index_path, [100, 101])

    def snapshot():
        _, assigns, _, codes = load_stream_ivfpq(spark, index_path)
        return (
            {(r["vid"], r["cell"]) for r in assigns.select("vid", "cell").collect()},
            {(r["vid"], r["s"], r["code"]) for r in codes.collect()},
        )

    before = snapshot()
    stats = compact_index(spark, index_path)
    after = snapshot()
    assert after == before
    assert stats["assignments_files_after"] < stats["assignments_files_before"]
    assert stats["pq_codes_files_after"] < stats["pq_codes_files_before"]
    # deleted rows are physically gone, tombstones retained as the mask
    audit = vector_store_erasure_audit(spark, index_path).first()
    assert audit["n_physical_rows_remaining"] == 0
    assert audit["n_tombstones"] == 2
    assert audit["n_visible"] == 0
    # the compacted store still serves the composed search
    cents, assigns, cb, codes = load_stream_ivfpq(spark, index_path)
    topk = similarity.ivfpq_topk(cents, assigns, cb, codes, [0, 1], k=5, m=8)
    assert {r["query_id"] for r in topk.collect()} == {0, 1}


def test_image_dedup_stream_union_equals_batch(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        image_dhash_bands,
        image_neardup_pairs,
        synth_png_images,
    )
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.image_dedup_stream import (
        image_dedup_stream,
        load_image_dedup_pairs,
    )

    doc = load_table(spark, SF, "documents").select("doc_id")
    payloads = synth_png_images(doc, base_mod=max(1, doc.count() // 5))
    drop = str(tmp_path / "drop")
    payloads.filter(F.col("doc_id") % 3 == 0).coalesce(1).write.parquet(drop)
    payloads.filter(F.col("doc_id") % 3 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(drop)
    payloads.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(drop)

    state = str(tmp_path / "state")
    lpath = str(tmp_path / "ledger.json")

    def run(ckpt):
        stream = (
            spark.readStream.schema(payloads.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop)
        )
        q = image_dedup_stream(
            stream, state, str(tmp_path / ckpt), BatchLedger(lpath),
            max_hamming=10, band_bits=16,
        )
        q.awaitTermination(240)

    run("ckpt")
    expect = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in image_neardup_pairs(
            image_dhash_bands(payloads), 10, band_bits=16
        ).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in load_image_dedup_pairs(spark, state).collect()
    }
    assert got == expect and len(expect) > 0

    # replay the middle batch from a fresh checkpoint: unchanged
    state_j = json.load(open(lpath))
    state_j["imgdedup-microbatch-1"] = "running"
    json.dump(state_j, open(lpath, "w"))
    run("ckpt2")
    again = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in load_image_dedup_pairs(spark, state).collect()
    }
    assert again == expect


def test_stream_appends_after_compaction_still_supersede(spark, tmp_path):
    """Compaction rewrites rows under _batch_id = max-seen; a LATER
    stream batch must still supersede compacted rows by latest-wins —
    and the quantizer/codebook must survive the compaction untouched."""
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        compact_index,
        load_stream_ivfpq,
        vector_index_stream,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    drop = str(tmp_path / "drop")
    emb.filter(F.col("vec_id") < 40).coalesce(1).write.parquet(drop)
    emb.filter(F.col("vec_id").between(40, 79)).coalesce(1).write.mode(
        "append"
    ).parquet(drop)
    index_path = str(tmp_path / "idx")
    lpath = str(tmp_path / "ledger.json")
    _run_vec_stream(spark, tmp_path, emb, "ckpt", index_path, lpath)
    compact_index(spark, index_path)

    # a new batch arrives AFTER compaction: re-embeds vid 5 with vid
    # 200's vector (simulated re-embedding) plus fresh vids
    re5 = (
        emb.filter(F.col("vec_id") == 200)
        .select(F.lit(5).cast("long").alias("vec_id"), "embedding")
    )
    emb.filter(F.col("vec_id").between(80, 99)).unionByName(re5).coalesce(
        1
    ).write.mode("append").parquet(drop)
    _run_vec_stream(spark, tmp_path, emb, "ckpt2", index_path, lpath)

    cents, assigns, cb, codes = load_stream_ivfpq(spark, index_path)
    rows = {r["vid"] for r in assigns.select("vid").collect()}
    assert {80, 81, 99, 5} <= rows
    # vid 5 now carries vid 200's vector (the re-embedding won)
    v5 = assigns.filter(F.col("vid") == 5).first()["vec"]
    v200 = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 200).first()["embedding"]
    ]
    assert list(v5) == v200
    # exactly one surviving assignment row per vid
    assert assigns.count() == len(rows)


def test_rebalance_store_cell_moves_rows_and_preserves_search(spark, tmp_path):
    """Rebalance rung on the persisted store: split the fattest
    inverted list; membership partitions exactly, PQ code rows follow
    their vectors without re-encoding, full-probe search is identical,
    and a later compaction folds the move physically."""
    from ecs_ecommerce_data_pipeline_spark.operators import similarity
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        compact_index,
        load_stream_index,
        load_stream_ivfpq,
        rebalance_store_cell,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    drop = str(tmp_path / "drop")
    emb.filter(F.col("vec_id") < 60).coalesce(1).write.parquet(drop)
    emb.filter(F.col("vec_id").between(60, 119)).coalesce(1).write.mode(
        "append"
    ).parquet(drop)
    index_path = str(tmp_path / "idx")
    _run_vec_stream(
        spark, tmp_path, emb, "ckpt", index_path, str(tmp_path / "ledger.json")
    )

    _, assigns0 = load_stream_index(spark, index_path)
    top = (
        assigns0.groupBy("cell").count()
        .orderBy(F.desc("count"), F.asc("cell")).first()
    )
    cell = int(top["cell"])
    before = {
        (r["vid"], r["cell"]) for r in assigns0.select("vid", "cell").collect()
    }
    orig_members = {v for v, c in before if c == cell}
    cents_b, a_b, cb_b, codes_b = load_stream_ivfpq(spark, index_path)
    full_b = {
        (r["query_id"], r["corpus_id"], r["rnk"])
        for r in similarity.ivf_index_topk(
            cents_b, a_b, [0, 1, 2], k=10, nprobe=16
        ).collect()
    }
    codes_before = {
        (r["vid"], r["s"], r["code"]) for r in codes_b.collect()
    }

    stats = rebalance_store_cell(spark, index_path, cell)
    assert stats["n_kept"] > 0 and stats["n_moved"] > 0
    assert stats["n_members"] == len(orig_members)

    cents, assigns, cb, codes = load_stream_ivfpq(spark, index_path)
    after = {
        (r["vid"], r["cell"]) for r in assigns.select("vid", "cell").collect()
    }
    sub = {v for v, c in after if c in (cell, stats["new_cell"])}
    assert sub == orig_members
    # untouched rows identical
    assert {p for p in after if p[1] not in (cell, stats["new_cell"])} == {
        p for p in before if p[1] != cell
    }
    # code CONTENT unchanged (re-route, never re-encode), routing follows
    assert {(r["vid"], r["s"], r["code"]) for r in codes.collect()} == (
        codes_before
    )
    assert codes.select("vid", "cell").distinct().exceptAll(
        assigns.select("vid", "cell")
    ).count() == 0
    # full-probe search identical (one extra cell to probe)
    full_a = {
        (r["query_id"], r["corpus_id"], r["rnk"])
        for r in similarity.ivf_index_topk(
            cents, assigns, [0, 1, 2], k=10, nprobe=17
        ).collect()
    }
    assert full_a == full_b

    # compaction folds the logical move and the store still serves
    # (count pinned BEFORE compaction: the lazy `codes` plan reads the
    # pre-compaction directory, which compaction replaces)
    n_codes_visible = codes.count()
    compact_index(spark, index_path)
    cents2, assigns2, _, codes2 = load_stream_ivfpq(spark, index_path)
    assert {
        (r["vid"], r["cell"]) for r in assigns2.select("vid", "cell").collect()
    } == after
    assert codes2.count() == n_codes_visible


def test_rebalance_overful_cells_bounds_skew(spark, tmp_path):
    """The trigger+repair loop: after rebalance_overful_cells the store
    either has no cell above factor x mean or spent its split budget;
    total membership is conserved and full-probe search is unchanged."""
    from ecs_ecommerce_data_pipeline_spark.operators import similarity
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        load_stream_index,
        rebalance_overful_cells,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    drop = str(tmp_path / "drop")
    emb.filter(F.col("vec_id") < 60).coalesce(1).write.parquet(drop)
    emb.filter(F.col("vec_id").between(60, 119)).coalesce(1).write.mode(
        "append"
    ).parquet(drop)
    index_path = str(tmp_path / "idx")
    _run_vec_stream(
        spark, tmp_path, emb, "ckpt", index_path, str(tmp_path / "ledger.json")
    )

    cents0, a0 = load_stream_index(spark, index_path)
    vids_before = {r["vid"] for r in a0.select("vid").collect()}
    full_b = {
        (r["query_id"], r["corpus_id"], r["rnk"])
        for r in similarity.ivf_index_topk(
            cents0, a0, [0, 1, 2], k=10, nprobe=64
        ).collect()
    }

    stats = rebalance_overful_cells(
        spark, index_path, factor=1.5, max_splits=3
    )
    assert stats, "fixture store starts skewed; at least one split runs"

    cents, assigns = load_stream_index(spark, index_path)
    sizes = {r["cell"]: r["n"] for r in assigns.groupBy("cell")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    mean = sum(sizes.values()) / len(sizes)
    assert max(sizes.values()) <= 1.5 * mean or len(stats) == 3
    assert {r["vid"] for r in assigns.select("vid").collect()} == vids_before
    assert cents.count() == 16 + len(stats)
    full_a = {
        (r["query_id"], r["corpus_id"], r["rnk"])
        for r in similarity.ivf_index_topk(
            cents, assigns, [0, 1, 2], k=10, nprobe=64
        ).collect()
    }
    assert full_a == full_b


def test_rebalance_overful_cells_rejects_bad_factor(spark, tmp_path):
    import pytest as _pytest

    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        rebalance_overful_cells,
    )

    with _pytest.raises(ValueError, match="factor"):
        rebalance_overful_cells(spark, str(tmp_path), factor=1.0)
