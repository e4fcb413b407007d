"""Round-9 re-registration of the label-noise audit: banded blocking
(`multiband_bucket_rows`, 4×16-bit OR-amplified bands) must reproduce
the EXACT all-pairs audit's verdicts on a clustered fixture — where
true neighbors are genuinely close and band recall is ~1 — while
generating far fewer candidate pairs (the scale property the round-8
verdict asked for: the single-bucket n²/256 self-join is gone)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators.curation import (
    knn_label_noise_audit,
)
from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
    multiband_bucket_rows,
    synth_clustered_embeddings,
)

_N = 240
_K_TRUE = 4
_PLANTED = [7, 33, 101, 180]


def _fixture(spark):
    """Tight clustered corpus (eps=0.05 → intra-cluster angles ~3°)
    with labels = true cluster except 4 planted mislabels."""
    ids = spark.range(_N).select(F.col("id").alias("vec_id"))
    fx = synth_clustered_embeddings(ids, dims=16, k_true=_K_TRUE, eps=0.05)
    return fx.select(
        "vec_id",
        "embedding",
        F.when(
            F.col("vec_id").isin(_PLANTED),
            (F.col("cluster_true") + 1) % _K_TRUE,
        )
        .otherwise(F.col("cluster_true"))
        .cast("bigint")
        .alias("label"),
    )


def test_banded_flags_equal_exact_flags(spark):
    emb = _fixture(spark).localCheckpoint()
    banded = {
        r["vec_id"]: (r["flagged"], r["majority_label"])
        for r in knn_label_noise_audit(emb).collect()
    }
    exact = {
        r["vec_id"]: (r["flagged"], r["majority_label"])
        for r in knn_label_noise_audit(emb, exact=True).collect()
    }
    # every point audited by the exact pass is audited by the banded
    # pass with the same verdict and the same majority label
    assert set(banded) == set(exact)
    assert banded == exact
    flagged = {v for v, (fl, _ml) in banded.items() if fl}
    assert flagged == set(_PLANTED)


def test_banded_candidate_volume_beats_allpairs(spark):
    emb = _fixture(spark).localCheckpoint()
    bnd = multiband_bucket_rows(emb)
    cand = (
        bnd.select(F.col("vec_id").alias("aid"), "band_idx", "bucket")
        .join(
            bnd.select(F.col("vec_id").alias("bid"), "band_idx", "bucket"),
            ["band_idx", "bucket"],
        )
        .filter(F.col("aid") != F.col("bid"))
        .select("aid", "bid")
        .distinct()
        .count()
    )
    allpairs = _N * (_N - 1)
    # clusters are ~n/4 each, so near-perfect blocking keeps ~n²/4
    # directed pairs; anything under half of all-pairs proves the
    # blocking is doing real work, and the clustered bound pins it
    assert cand < allpairs / 2
    # ...and every point still sees enough candidates to be audited
    per_point = _N  # audit requires >= 5 neighbors
    assert cand >= per_point * 5


def test_multiband_rows_shape(spark):
    emb = _fixture(spark)
    rows = multiband_bucket_rows(emb, n_bands=4, band_bits=16)
    assert rows.columns == ["vec_id", "band_idx", "bucket"]
    per = rows.groupBy("vec_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per] == [4]
    # 16-bit buckets stay inside [0, 2^16)
    mm = rows.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi")).first()
    assert mm["lo"] >= 0 and mm["hi"] < (1 << 16)
