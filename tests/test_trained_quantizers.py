"""Round-7 trained-quantizer invariants (the round-6 verdict's #1 task):

* the clustered fixture is bit-identical to its Python md5 twin;
* one deterministic Lloyd iteration on coarse quantizer + residual
  codebook lifts composed IVF-PQ recall MEASURABLY above the
  training-free build on clustered data;
* the trained build's nprobe curve is monotone non-decreasing (the
  training-free curve on the uniform corpus was measurably non-monotone
  — quantization noise displaced true neighbors);
* Lloyd training never shrinks the codebook (empty codewords keep their
  previous vector).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_NC, _M, _PQK = 16, 8, 16
_QIDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def fixture_df(spark):
    from ecs_ecommerce_data_pipeline_spark.operators import similarity
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    return similarity.synth_clustered_embeddings(
        load_table(spark, SF, "embeddings").select("vec_id")
    )


@pytest.fixture(scope="module")
def indexes(spark, fixture_df, tmp_path_factory):
    from ecs_ecommerce_data_pipeline_spark.operators import similarity

    out = {}
    for trained in (False, True):
        path = str(tmp_path_factory.mktemp(f"cl{int(trained)}"))
        out[trained] = similarity.build_ivfpq_index(
            fixture_df, n_centroids=_NC, m=_M, pq_k=_PQK, path=path,
            residual=True,
            train_iters=1 if trained else 0,
            coarse_iters=1 if trained else 0,
        )
    return out


def test_fixture_matches_python_twin(fixture_df):
    def u(s: str) -> float:
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        return float(h) / 1152921504606846976.0 * 2.0 - 1.0

    def cl(i: int) -> int:
        return int(hashlib.md5(f"cl:{i}".encode()).hexdigest()[:4], 16) % 8

    for r in fixture_df.orderBy("vec_id").limit(5).collect():
        i = r["vec_id"]
        assert r["cluster_true"] == cl(i)
        expect = [u(f"ctr:{cl(i)}:{d}") + 0.25 * u(f"cn:{i}:{d}")
                  for d in range(16)]
        assert list(r["embedding"]) == expect


def _recall_at(spark, fixture_df, idx, nprobe) -> float:
    from ecs_ecommerce_data_pipeline_spark.operators import similarity

    cents, assigns, cb, codes = idx
    truth = {
        (r["query_id"], r["corpus_id"])
        for r in similarity.brute_force_topk(fixture_df, _QIDS, k=10).collect()
    }
    got = {
        (r["query_id"], r["corpus_id"])
        for r in similarity.ivfpq_topk(
            cents, assigns, cb, codes, _QIDS,
            k=10, nprobe=nprobe, m=_M, residual=True,
        ).collect()
    }
    return len(truth & got) / len(truth)


def test_trained_recall_beats_training_free(spark, fixture_df, indexes):
    fixed = _recall_at(spark, fixture_df, indexes[False], 4)
    trained = _recall_at(spark, fixture_df, indexes[True], 4)
    # measured: 0.34 fixed vs 0.70 trained; the gate leaves slack but
    # requires a REAL gap, not noise
    assert trained >= fixed + 0.2, (fixed, trained)
    assert trained >= 0.5


def test_trained_nprobe_curve_monotone(spark, fixture_df, indexes):
    curve = [
        _recall_at(spark, fixture_df, indexes[True], n) for n in (1, 2, 4, 8)
    ]
    assert all(b >= a for a, b in zip(curve, curve[1:])), curve


def test_lloyd_training_keeps_codebook_size(spark, fixture_df):
    from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
        _pq_codebook_trained,
        as_double_array,
    )

    base = fixture_df.select(
        F.col("vec_id").alias("vid"), as_double_array("embedding").alias("vec")
    )
    cb = _pq_codebook_trained(base, _M, _PQK, 16 // _M, iters=2)
    assert cb.count() == _M * _PQK
    # every (s, cw) pair present exactly once
    assert cb.select("s", "cw").distinct().count() == _M * _PQK


def test_fps_seeds_match_numpy_twin(spark, fixture_df):
    """The engine-side max-min pick chain equals a driver-side numpy
    recomputation (sequential adds mirror the zip_with/aggregate fold
    order, so cosines are bit-identical)."""
    import numpy as np

    from ecs_ecommerce_data_pipeline_spark.operators import similarity

    rows = fixture_df.orderBy("vec_id").collect()
    vids = [r["vec_id"] for r in rows]
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in rows}

    def dot(a, b):
        # strict sequential IEEE adds (the fold order), never np.dot
        return float(np.cumsum(a * b)[-1])

    def cos(a, b):
        import math

        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    expect = [min(vids)]
    for _ in range(1, 8):
        best = None
        for v in vids:
            if v in expect:
                continue
            mx = max(cos(vecs[v], vecs[s]) for s in expect)
            if best is None or (mx, v) < best:
                best = (mx, v)
        expect.append(best[1])

    got = [
        (r["cluster_id"], r["seed_vid"])
        for r in similarity.farthest_point_seeds(fixture_df, k=8)
        .orderBy("cluster_id")
        .collect()
    ]
    assert got == list(enumerate(expect))


def test_fps_seeds_cover_all_true_clusters(spark, fixture_df):
    """The property smallest-id seeding measurably lacks: with k = the
    number of true clusters, max-min seeding lands exactly one seed in
    each (a near-duplicate of an existing seed has max-cos ~ 1 and
    sorts last)."""
    from ecs_ecommerce_data_pipeline_spark.operators import similarity

    seeds = similarity.farthest_point_seeds(fixture_df, k=8)
    covered = (
        seeds.join(
            fixture_df.select(
                F.col("vec_id").alias("seed_vid"), "cluster_true"
            ),
            "seed_vid",
        )
        .select("cluster_true")
        .distinct()
        .count()
    )
    assert covered == 8

    # smallest-id seeding does NOT cover all 8 on this fixture — the
    # failure mode fps exists to fix; if the fixture ever changes so
    # that it does, the fps entries lose their point and should be
    # re-examined
    smallest = (
        fixture_df.orderBy("vec_id")
        .limit(8)
        .select("cluster_true")
        .distinct()
        .count()
    )
    assert smallest < 8


def test_fps_seeded_build_is_valid_index(spark, fixture_df, tmp_path):
    """build_ivfpq_index(coarse_seed='fps') yields a structurally sound
    index: n_centroids cells, assignments partition the corpus, codes
    cover every vector in every subspace."""
    from ecs_ecommerce_data_pipeline_spark.operators import similarity

    n = fixture_df.count()
    cents, assigns, cb, codes = similarity.build_ivfpq_index(
        fixture_df, n_centroids=_NC, m=_M, pq_k=_PQK,
        path=str(tmp_path / "fps"), residual=True,
        train_iters=1, coarse_iters=1, coarse_seed="fps",
    )
    assert cents.count() == _NC
    assert assigns.count() == n
    assert assigns.select("vid").distinct().count() == n
    assert codes.count() == n * _M


def test_build_rejects_unknown_coarse_seed(spark, fixture_df):
    from ecs_ecommerce_data_pipeline_spark.operators import similarity

    with pytest.raises(ValueError, match="coarse_seed"):
        similarity.build_ivfpq_index(
            fixture_df, n_centroids=_NC, m=_M, pq_k=_PQK,
            coarse_seed="random",
        )
