"""Band-dedup store erasure lifecycle (round 8): delete → mask →
compact → audit, mirroring the vector store's ladder on the text
(SimHash) face of band_dedup_stream.

Pinned: a tombstoned doc disappears from every load path (pairs on
BOTH sides, bands) immediately; it stops screening new arrivals in
later triggers; compaction physically drops its rows and collapses
generation files while the surviving content is unchanged; a replayed
batch after compaction cannot resurrect it or duplicate band rows.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _run(spark, tmp_path, doc, ckpt, state, lpath):
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.streaming.image_dedup_stream import (
        simhash_dedup_stream,
    )

    stream = (
        spark.readStream.schema(doc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "drop"))
    )
    q = simhash_dedup_stream(
        stream, state, str(tmp_path / ckpt), BatchLedger(lpath),
        max_hamming=6, band_bits=16,
    )
    q.awaitTermination(240)


def test_band_store_erasure_lifecycle(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.operators import dedup
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.image_dedup_stream import (
        band_store_erasure_audit,
        compact_band_store,
        delete_docs,
        load_image_dedup_pairs,
    )

    doc = load_table(spark, SF, "documents").select("doc_id", "text")
    drop = str(tmp_path / "drop")
    for k in range(3):
        doc.filter(F.col("doc_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(drop)
    state = str(tmp_path / "state")
    lpath = str(tmp_path / "ledger.json")
    _run(spark, tmp_path, doc, "ckpt", state, lpath)

    pairs0 = load_image_dedup_pairs(spark, state)
    assert pairs0.count() > 0
    # pick a doc that participates in at least one pair
    victim = int(pairs0.select(F.col("doc_a").alias("d")).first()["d"])
    n_victim_pairs = pairs0.filter(
        (F.col("doc_a") == victim) | (F.col("doc_b") == victim)
    ).count()
    assert n_victim_pairs > 0
    survivors = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in pairs0.filter(
            (F.col("doc_a") != victim) & (F.col("doc_b") != victim)
        ).collect()
    }

    delete_docs(spark, state, [victim])

    # masked immediately: no pair on either side, no band row
    pairs1 = load_image_dedup_pairs(spark, state)
    assert pairs1.filter(
        (F.col("doc_a") == victim) | (F.col("doc_b") == victim)
    ).count() == 0
    assert {
        (r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs1.collect()
    } == survivors
    a = band_store_erasure_audit(spark, state).first()
    assert a["n_tombstones"] == 1
    assert a["n_physical_band_rows_remaining"] == 8  # pre-compaction
    assert a["n_visible_band_rows"] == 0
    assert a["n_visible_pair_rows"] == 0

    # the deleted doc stops screening NEW arrivals: append a byte-equal
    # copy of the victim's text under a fresh id — without the mask the
    # store's bands would pair it at Hamming 0
    twin_id = 900000
    twin = doc.filter(F.col("doc_id") == victim).select(
        F.lit(twin_id).cast("bigint").alias("doc_id"), "text"
    )
    twin.coalesce(1).write.mode("append").parquet(drop)
    _run(spark, tmp_path, doc, "ckpt", state, lpath)
    pairs2 = load_image_dedup_pairs(spark, state)
    assert pairs2.filter(
        (F.col("doc_a") == victim) | (F.col("doc_b") == victim)
    ).count() == 0

    # compaction: physical rows gone, files collapsed, content equal
    before = load_image_dedup_pairs(spark, state).collect()
    stats = compact_band_store(spark, state)
    assert stats["bands_files_after"] <= stats["bands_files_before"]
    a2 = band_store_erasure_audit(spark, state).first()
    assert a2["n_physical_band_rows_remaining"] == 0
    after = load_image_dedup_pairs(spark, state).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))

    # replay the victim's batch after compaction: the mask must hold and
    # band rows must not duplicate (distinct-fold generation rule)
    st = json.load(open(lpath))
    first_bid = sorted(b for b in st if b.startswith("txtdedup-"))[0]
    st[first_bid] = "running"
    json.dump(st, open(lpath, "w"))
    _run(spark, tmp_path, doc, "ckpt2", state, lpath)
    a3 = band_store_erasure_audit(spark, state).first()
    assert a3["n_visible_band_rows"] == 0
    assert a3["n_visible_pair_rows"] == 0
    bands = spark.read.parquet(f"{state}/bands").select(
        "doc_id", "band_idx", "band_val"
    )
    from ecs_ecommerce_data_pipeline_spark.streaming.image_dedup_stream import (
        _mask_doc_tombstones,
    )

    vis = _mask_doc_tombstones(spark, state, bands, ["doc_id"]).distinct()
    n_docs = vis.select("doc_id").distinct().count()
    assert vis.count() == 8 * n_docs
