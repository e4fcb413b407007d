"""Round-11 optimization pin: the one-pass nprobe sweep
(`ivfpq_nprobe_sweep_topk`, scored once at max nprobe with the probe
rank carried) must reproduce every rung of the per-rung `ivfpq_topk`
exactly — same candidates, same ADC scores, same top-k."""

from __future__ import annotations

import pytest

from ecs_ecommerce_data_pipeline_spark.operators import similarity

SF = "/root/testdata/sf0.001"
QIDS = [3, 7, 11]


@pytest.fixture(scope="module")
def index(spark):
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings")
    return similarity.build_ivfpq_index(emb, n_centroids=8, m=4, pq_k=16)


@pytest.mark.parametrize("residual", [False, True])
def test_sweep_matches_per_rung_topk(spark, index, residual):
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, SF, "embeddings")
    cents, assigns, cb, codes = (
        similarity.build_ivfpq_index(
            emb, n_centroids=8, m=4, pq_k=16, residual=True
        )
        if residual
        else index
    )
    nprobes = [1, 2, 4]
    swept = similarity.ivfpq_nprobe_sweep_topk(
        cents, assigns, cb, codes, QIDS, nprobes=nprobes, k=5, m=4,
        residual=residual,
    )
    got = {
        (r.nprobe, r.query_id, r.corpus_id): r.adc_q for r in swept.collect()
    }
    expect = {}
    for p in nprobes:
        topk = similarity.ivfpq_topk(
            cents, assigns, cb, codes, QIDS, k=5, nprobe=p, m=4,
            residual=residual,
        )
        for r in topk.collect():
            expect[(p, r.query_id, r.corpus_id)] = r.adc_q
    assert got == expect
