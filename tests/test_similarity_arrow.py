"""Arrow-vectorized brute-force top-k must be row-identical to the JVM
fold path (the float-exactness contract cumsum provides), batch- and
partition-layout-independent."""

from __future__ import annotations

from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_arrow,
)
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

QIDS = [0, 1, 2, 3, 4]


def test_arrow_topk_equals_fold_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    fold = brute_force_topk(emb, QIDS, k=10).orderBy("query_id", "rnk").collect()
    arrow = (
        brute_force_topk_arrow(emb, QIDS, k=10).orderBy("query_id", "rnk").collect()
    )
    assert len(fold) == len(arrow) > 0
    for a, b in zip(fold, arrow):
        assert a["query_id"] == b["query_id"]
        assert a["corpus_id"] == b["corpus_id"]
        assert a["rnk"] == b["rnk"]
        # bit-identical, not approximately equal
        assert a["cosine_sim"] == b["cosine_sim"]


def test_arrow_topk_partitioning_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    one = (
        brute_force_topk_arrow(emb.coalesce(1), QIDS, k=5)
        .orderBy("query_id", "rnk")
        .collect()
    )
    many = (
        brute_force_topk_arrow(emb.repartition(17), QIDS, k=5)
        .orderBy("query_id", "rnk")
        .collect()
    )
    assert one == many


def test_arrow_topk_k_larger_than_corpus(spark):
    rows = [(i, [float(i + 1), 1.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = brute_force_topk_arrow(df, [0], k=100).collect()
    # all corpus rows except the query itself
    assert {r["corpus_id"] for r in out} == {1, 2, 3}
    assert [r["rnk"] for r in sorted(out, key=lambda r: r["rnk"])] == [1, 2, 3]
