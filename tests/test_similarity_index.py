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
