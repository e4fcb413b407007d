"""Round-6 regression tests for the round-5 advisory findings:

* ``connected_components`` must converge for NON-numeric node id types
  (the old convergence probe hard-cast the carried label to long, so a
  string-id graph with diameter > 2 silently stopped after one round);
* ``bloom_probe`` must never false-negative a key that appears more
  than once in the probe frame (hit-count == k broke on duplicates);
* ``pack_token_budget`` must accept non-string part columns and
  non-bigint id columns (the kernel output schema is fixed, so the
  inputs are now cast to it);
* ``vector_index_stream`` must keep training the coarse quantizer
  across batches until it holds ``n_centroids`` rows (a small first
  micro-batch used to freeze an under-provisioned quantizer forever).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_connected_components_string_ids(spark):
    """Chain a-b-c-d-e (diameter 4, forces >1 propagation round) with
    STRING node ids: every node must reach the lexicographic min."""
    from ecs_ecommerce_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "doc_a string, doc_b string",
    )
    got = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a", "e": "a", "x": "x", "y": "x",
    }


def test_bloom_probe_duplicate_keys_not_false_negative(spark):
    """A key probed twice must still report member=true — membership is
    'no probed position missed', not an exact hit count."""
    from ecs_ecommerce_data_pipeline_spark.operators.sketch import (
        bloom_bits,
        bloom_probe,
    )

    keys = spark.createDataFrame([(i,) for i in range(50)], "key long")
    bits = bloom_bits(keys, "key", k=4, m=512)
    probes = spark.createDataFrame(
        [(7,), (7,), (7,), (11,), (11,)], "key long"
    )
    got = {r["key"]: r["bloom_member"] for r in bloom_probe(
        bits, probes, "key", k=4, m=512
    ).collect()}
    assert got == {7: True, 11: True}


def test_bloom_probe_null_key_reports_false(spark):
    """NULL probe keys have no membership identity — reported false,
    never an error."""
    from ecs_ecommerce_data_pipeline_spark.operators.sketch import (
        bloom_bits,
        bloom_probe,
    )

    keys = spark.createDataFrame([(i,) for i in range(20)], "key long")
    bits = bloom_bits(keys, "key", k=4, m=512)
    probes = spark.createDataFrame([(None,), (3,)], "key long")
    got = {
        r["key"]: r["bloom_member"]
        for r in bloom_probe(bits, probes, "key", k=4, m=512).collect()
    }
    assert got[3] is True
    assert got[None] is False


def test_pack_token_budget_generic_column_types(spark):
    """An INT part column and an INT id column must pack identically to
    their string/bigint twins — the declared Arrow schema is satisfied
    by casting, not by crashing."""
    from ecs_ecommerce_data_pipeline_spark.operators.sampling import (
        pack_token_budget,
    )

    rows = [(1, 10, 60), (1, 11, 50), (1, 12, 40), (2, 20, 90), (2, 21, 30)]
    ints = spark.createDataFrame(rows, "grp int, doc int, toks int")
    strs = ints.select(
        F.col("grp").cast("string").alias("grp"),
        F.col("doc").cast("bigint").alias("doc"),
        F.col("toks").alias("toks"),
    )
    got_i = {
        (r["grp"], r["doc"]): r["bin_id"]
        for r in pack_token_budget(ints, "grp", "toks", "doc", 100).collect()
    }
    got_s = {
        (r["grp"], r["doc"]): r["bin_id"]
        for r in pack_token_budget(strs, "grp", "toks", "doc", 100).collect()
    }
    # int-typed inputs come back as the kernel's declared types
    assert {(str(g), int(d)): b for (g, d), b in got_i.items()} == {
        (g, d): b for (g, d), b in got_s.items()
    }
    assert len(got_i) == 5


def test_vector_index_stream_small_first_batch_tops_up(spark, tmp_path):
    """First micro-batch carries FEWER rows than n_centroids: the
    quantizer must keep absorbing later batches until full (16 cells),
    instead of freezing at the first batch's size forever."""
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table
    from ecs_ecommerce_data_pipeline_spark.streaming.vector_index_stream import (
        load_stream_index,
        vector_index_stream,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    drop_dir = str(tmp_path / "drop")
    # file 0: 4 rows (< 16 centroids); file 1: the rest
    emb.filter(F.col("vec_id") < 4).coalesce(1).write.parquet(drop_dir)
    emb.filter(F.col("vec_id") >= 4).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    q = vector_index_stream(
        stream, str(tmp_path / "idx"), str(tmp_path / "ckpt"), n_centroids=16
    )
    q.awaitTermination(240)
    centroids, assignments = load_stream_index(spark, str(tmp_path / "idx"))
    assert centroids.count() == 16
    assert assignments.count() == emb.count()


def test_prefix_filter_join_releases_its_cache(spark):
    """prefix_filter_join pins the hashed-shingle frame during its five
    internal consumers but must UNPERSIST it before returning — only the
    (pair-sized) checkpointed result may remain in block storage, never
    the corpus-sized shingle cache."""
    from ecs_ecommerce_data_pipeline_spark.operators.dedup import (
        prefix_filter_join,
        shingle_docs,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(80)
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    res = prefix_filter_join(shingle_docs(docs), threshold=0.5)
    res.count()
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    # at most the localCheckpointed result itself — the shingle pin is gone
    assert after - before <= 1


def test_semantic_decontamination_flags_injected_leak(spark):
    """A planted eval vector that is a near-copy of a train vector MUST
    be flagged (identical directions share every LSH bucket, so blocking
    cannot miss it); an orthogonal eval vector must not be."""
    from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
        semantic_decontamination,
    )

    dims = 8
    train = [1.0, 2.0, -1.0, 0.5, 3.0, -2.0, 1.5, 0.25]
    leaked = [x * 1.01 for x in train]          # eval id 100: same direction
    ortho = [0.0] * dims                         # eval id 200: orthogonal
    ortho[1] = 1e-6                              # not zero-norm
    ortho_t = [-2.0, 0.001, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rows = [
        (1, train), (2, ortho_t), (100, leaked), (200, ortho),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        r["eval_id"]: r
        for r in semantic_decontamination(
            emb, eval_pred=(F.col("vec_id") >= 100), threshold=0.9
        ).collect()
    }
    assert set(got) == {100, 200}
    assert got[100]["contaminated"] is True
    assert got[100]["nearest_train_id"] == 1
    assert got[100]["max_cosine"] > 0.999
    assert got[200]["contaminated"] is False


def test_dedup_aware_split_never_straddles_clusters(spark):
    """The leakage-safety law: every near-dup cluster lands in exactly
    one split (membership is a pure function of the cluster id), and
    every document is assigned exactly once."""
    from ecs_ecommerce_data_pipeline_spark.operators import dedup
    from ecs_ecommerce_data_pipeline_spark.operators.sampling import (
        assign_split,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, "/root/testdata/sf0.001", "documents")
    sigs = dedup.minhash_signatures(dedup.shingle_docs(doc, k=3))
    cands = dedup.lsh_candidate_pairs(sigs)
    labels = dedup.connected_components(cands)
    comp = (
        doc.select("doc_id")
        .join(labels, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
        )
    )
    split = assign_split(comp, key="component")
    rows = split.collect()
    assert len(rows) == doc.count()
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values())
    # and a multi-member cluster exists, so the law is non-vacuous
    from collections import Counter

    comp_sizes = Counter(r["component"] for r in rows)
    assert max(comp_sizes.values()) >= 2
