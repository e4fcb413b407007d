"""k-means|| oversampling (round 8): operator invariants the oracle
hash doesn't state directly — weight partition, no-resample property,
and the cost collapse the oversampling exists for.
"""

from __future__ import annotations

from ecs_ecommerce_data_pipeline_spark.operators import similarity
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _fx(spark):
    return similarity.synth_clustered_embeddings(
        load_table(spark, SF, "embeddings").select("vec_id"),
        dims=16, k_true=8,
    )


def test_oversample_invariants(spark):
    fx = _fx(spark)
    n = fx.count()
    cands, stats = similarity.kmeans_parallel_oversample(fx, l=32, rounds=3)
    rows = cands.collect()
    vids = [r["vid"] for r in rows]
    # candidates are distinct (sampled rows drop to cost 0, so no round
    # can resample an existing center)
    assert len(vids) == len(set(vids))
    # attraction weights partition the corpus exactly
    assert sum(r["weight"] for r in rows) == n
    # round accounting matches the returned frame (+1 for the init seed)
    assert len(rows) == 1 + sum(s["n_sampled"] for s in stats)
    # the cost collapse: after round 1 the total quantized cost must
    # drop by a large factor — the property cost-proportional
    # oversampling exists to produce
    assert stats[0]["psi_q"] > 5 * stats[1]["psi_q"]
    # each round sampled within the oversampling budget's ballpark
    # (expected ~l per round; allow generous slack, it's a Bernoulli sum)
    for s in stats:
        assert s["n_sampled"] <= 4 * 32


def test_seed_reduction_covers_clusters(spark):
    """FPS over the candidate set at k = n_cells must produce seeds
    whose one-Lloyd purity is perfect on the fixture — the quality bar
    the corpus-wide FPS chain set, now at R scans instead of k."""
    from pyspark.sql import functions as F

    fx = _fx(spark)
    cands, _ = similarity.kmeans_parallel_oversample(fx, l=32, rounds=3)
    seeds = similarity.farthest_point_seeds(
        cands, k=16, id_col="vid", vec_col="vec"
    )
    assert seeds.count() == 16
    assignment = similarity.kmeans_refine(
        fx, k=16, iters=1, init_centroids=seeds
    )
    joined = assignment.join(fx.select("vec_id", "cluster_true"), "vec_id")
    purity = (
        joined.groupBy("cluster_id", "cluster_true")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("cluster_id")
        .agg((F.max("n") / F.sum("n")).alias("p"))
        .collect()
    )
    assert all(r["p"] == 1.0 for r in purity)
