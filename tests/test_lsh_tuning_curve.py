"""Banding tuning-curve invariants.

The (n_bands, rows_per_band) factorizations of one signature set form a
refinement chain: a bucket match on an r-row band key implies matches on
both (r/2)-row halves, so candidate sets are NESTED
(1,8) ⊆ (2,4) ⊆ (4,2) ⊆ (8,1).  The curve must therefore be monotone in
both columns as bands widen, and caught can never exceed truth.
"""

from __future__ import annotations

from ecs_ecommerce_data_pipeline_spark import catalog

SF = "/root/testdata/sf0.001"


def test_tuning_curve_monotone_and_bounded(spark):
    rows = {
        (r.n_bands, r.rows_per_band): r
        for r in catalog.queries()["dedup_lsh_tuning_curve"](spark, SF).collect()
    }
    chain = [(1, 8), (2, 4), (4, 2), (8, 1)]  # coarsest -> finest bands
    assert set(rows) == set(chain)
    n_true = {rows[c].n_true_pairs for c in chain}
    assert len(n_true) == 1  # truth is config-independent
    for prev, nxt in zip(chain, chain[1:]):
        assert rows[nxt].n_candidates >= rows[prev].n_candidates
        assert rows[nxt].n_caught >= rows[prev].n_caught
    for c in chain:
        assert 0 <= rows[c].n_caught <= rows[c].n_true_pairs
        assert rows[c].n_caught <= rows[c].n_candidates or rows[c].n_caught == 0
