"""SimHash near-dup rung (round 8): signature bit-packing pinned by a
hand-recomputed fingerprint, and the banding invariants the image
family established (wide ⊆ narrow containment, exact-Hamming verify).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _py_simhash_bands(text: str) -> dict[int, int]:
    """Reference implementation: weighted 64-bit Charikar simhash,
    8 little-endian 8-bit bands — mirrors operators.dedup.simhash_bands
    bit for bit."""
    toks = text.strip().lower().split()
    sums = [0] * 64
    for t in toks:
        hx = hashlib.md5(t.encode()).hexdigest()
        h1 = int(hx[:15], 16)
        h2 = int(hx[15], 16)
        for i in range(60):
            sums[i] += 1 if (h1 >> i) & 1 else -1
        for i in range(60, 64):
            sums[i] += 1 if (h2 >> (i - 60)) & 1 else -1
    out = {}
    for b in range(8):
        v = 0
        for j in range(8):
            if sums[8 * b + j] > 0:
                v |= 1 << j
        out[b] = v
    return out


def test_signature_matches_hand_computation(spark):
    from ecs_ecommerce_data_pipeline_spark.operators import dedup

    text = "the quick brown fox the quick dog"
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = {
        r["band_idx"]: r["band_val"]
        for r in dedup.simhash_bands(df).collect()
    }
    assert got == _py_simhash_bands(text)


def test_weighting_is_term_frequency(spark):
    """Repeating a token must shift the signature exactly as the
    count-weighted sum prescribes — presence-only hashing (the 32-bit
    ``simhash``'s rule) would give these two docs identical bands."""
    from ecs_ecommerce_data_pipeline_spark.operators import dedup

    a = "alpha beta beta beta beta beta beta beta gamma"
    b = "alpha beta gamma"
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id bigint, text string"
    )
    rows = dedup.simhash_bands(df).collect()
    g1 = {r["band_idx"]: r["band_val"] for r in rows if r["doc_id"] == 1}
    g2 = {r["band_idx"]: r["band_val"] for r in rows if r["doc_id"] == 2}
    assert g1 == _py_simhash_bands(a)
    assert g2 == _py_simhash_bands(b)
    assert g1 != g2


def test_wide_pairs_subset_of_narrow_and_hamming_exact(spark):
    from ecs_ecommerce_data_pipeline_spark.operators import dedup
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF, "documents")
    wide = dedup.simhash_neardup_pairs(doc, max_hamming=6, band_bits=16)
    narrow = dedup.simhash_neardup_pairs(doc, max_hamming=6, band_bits=8)
    w = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in wide.collect()}
    n = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in narrow.collect()}
    # a shared fused 16-bit block implies both constituent 8-bit bands
    # shared — wide candidates (hence verified pairs) are a subset
    assert w <= n
    # 8 bands, max_hamming 6 < 8 ⇒ narrow blocking is pigeonhole-exact:
    # verify against brute-force Hamming over the full signatures
    bands = dedup.simhash_bands(doc)
    ba = bands.select(
        F.col("doc_id").alias("da"), "band_idx", F.col("band_val").alias("va")
    )
    bb = bands.select(
        F.col("doc_id").alias("db"), "band_idx", F.col("band_val").alias("vb")
    )
    brute = {
        (r["da"], r["db"], r["ham"])
        for r in (
            ba.join(bb, "band_idx")
            .filter(F.col("da") < F.col("db"))
            .groupBy("da", "db")
            .agg(
                F.sum(
                    F.bit_count(F.col("va").bitwiseXOR(F.col("vb")))
                ).cast("bigint").alias("ham")
            )
            .filter(F.col("ham") <= 6)
            .collect()
        )
    }
    assert n == brute


def test_simhash_dedup_stream_union_equals_batch(spark, tmp_path):
    """The text face of the band-store stream: the per-batch pair
    partitions fold to exactly the batch operator's pairs, and a
    ledger replay changes nothing — the image-face proof transferred
    through the shared band_dedup_stream machinery."""
    import json

    from ecs_ecommerce_data_pipeline_spark.operators import dedup
    from ecs_ecommerce_data_pipeline_spark.plans.incremental import BatchLedger
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.image_dedup_stream import (
        load_image_dedup_pairs,
        simhash_dedup_stream,
    )

    doc = load_table(spark, SF, "documents").select("doc_id", "text")
    drop = str(tmp_path / "drop")
    for k in range(3):
        doc.filter(F.col("doc_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(drop)

    state = str(tmp_path / "state")
    lpath = str(tmp_path / "ledger.json")

    def run(ckpt):
        stream = (
            spark.readStream.schema(doc.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drop)
        )
        q = simhash_dedup_stream(
            stream, state, str(tmp_path / ckpt), BatchLedger(lpath),
            max_hamming=6, band_bits=16,
        )
        q.awaitTermination(240)

    run("ckpt")
    expect = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_neardup_pairs(
            doc, max_hamming=6, band_bits=16
        ).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in load_image_dedup_pairs(spark, state).collect()
    }
    assert got == expect and len(expect) > 0

    st = json.load(open(lpath))
    st["txtdedup-microbatch-1"] = "running"
    json.dump(st, open(lpath, "w"))
    run("ckpt2")
    again = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in load_image_dedup_pairs(spark, state).collect()
    }
    assert again == expect
