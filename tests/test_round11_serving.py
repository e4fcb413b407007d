"""Round-11 serving-default tests (round-10 verdict task 3).

The k=64 production serving stack registers ``auto_nprobe`` as its
probe policy — ``sim_ivfpq_kpar64_trained_rerank_recall`` /
``sim_ivfpq_kpar64_filtered_recall`` /
``sim_ivfpq_kpar64_filtered_rerank_recall`` probe the per-query
estimate instead of a fixed constant, and pin the probe count in the
``nprobe`` output column.  Pinned here: the verdict's done-criterion —
per-query recall ≥ 0.95 on the rerank rungs at the registered
defaults — plus estimator sanity (probe counts in (0, n_centroids],
varying per query rather than collapsing to a constant).
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"
_N_CENTROIDS = 64


def _rows(spark, name):
    from ecs_ecommerce_data_pipeline_spark import catalog

    return catalog.queries()[name](spark, SF).collect()


def test_rerank_rungs_hold_recall_at_auto_nprobe(spark):
    for name in (
        "sim_ivfpq_kpar64_trained_rerank_recall",
        "sim_ivfpq_kpar64_filtered_rerank_recall",
    ):
        rows = _rows(spark, name)
        assert rows, name
        assert min(r["recall"] for r in rows) >= 0.95, name


def test_adc_rung_and_probe_counts_sane(spark):
    rows = _rows(spark, "sim_ivfpq_kpar64_filtered_recall")
    assert rows
    # ADC-only rung: quantization (not probing) is the ceiling — well
    # below the rerank rungs but far above the probe-starved floor
    assert min(r["recall"] for r in rows) >= 0.6
    nps = [r["nprobe"] for r in rows]
    assert all(0 < n <= _N_CENTROIDS for n in nps)
    # the estimator adapts per query; a constant would mean the
    # occupancy/margin weights degenerated
    assert len(set(nps)) > 1
