"""Round-10 auto-nprobe estimator (verdict task 4: close the serving
loop on recall).

BASELINE recorded the k=64 filtered+rerank residual misses as PROBE
misses with nprobe fixed at 8 (0.86 mean recall).  ``auto_nprobe``
estimates a per-query probe count from cell occupancy and
centroid-distance margins (coverage ≥ 95/100 over integer-quantized
weights); the production stack then runs at that depth.  Pinned here:

* measured recall ≥ the 0.95 coverage target PER QUERY on the
  clustered fixture — the verdict's done-bar;
* the probe counts actually adapt (spread across queries, deeper than
  the fixed 8 where the filter pushed true neighbors out of the home
  cluster) and stay within [1, n_cells];
* the estimator is deterministic across invocations;
* the per-query-nprobe plumbing in the search core probes exactly the
  first ``nprobe_q`` cells of the same ranking the fixed path uses
  (nprobe_df == lit(p) ⇒ identical results to nprobe=p).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"
_TARGET = 0.95


def _setup(spark):
    from ecs_ecommerce_data_pipeline_spark.queries import similarity_q as sq

    qids = sq._QUERY_IDS
    cents, assigns, cb, codes = sq._clustered_index64_cached(spark, SF)
    return sq, qids, cents, assigns, cb, codes


def test_autoprobe_recall_meets_target(spark):
    from ecs_ecommerce_data_pipeline_spark import catalog

    rows = catalog.queries()["sim_ivfpq_kpar64_autoprobe_recall"](
        spark, SF
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["recall"] >= _TARGET, (r["query_id"], r["recall"])
        assert 1 <= r["nprobe"] <= 64
    # the estimator ADAPTS: not one constant, and deeper than the fixed
    # nprobe=8 for at least one query (the probe-miss recovery)
    nps = {r["nprobe"] for r in rows}
    assert len(nps) > 1, nps
    assert max(nps) > 8, nps


def test_auto_nprobe_deterministic(spark):
    from ecs_ecommerce_data_pipeline_spark.operators import similarity

    sq, qids, cents, assigns, cb, codes = _setup(spark)
    a = {
        r["query_id"]: r["nprobe"]
        for r in similarity.auto_nprobe(cents, assigns, qids).collect()
    }
    b = {
        r["query_id"]: r["nprobe"]
        for r in similarity.auto_nprobe(cents, assigns, qids).collect()
    }
    assert a == b
    assert set(a) == set(qids)


def test_per_query_nprobe_frame_equals_fixed_scalar(spark):
    """nprobe passed as a (query_id, nprobe) frame with every value p
    must reproduce the fixed nprobe=p search bit-for-bit — the frame
    path reuses the same ranking and cutoff semantics."""
    from ecs_ecommerce_data_pipeline_spark.operators import similarity

    sq, qids, cents, assigns, cb, codes = _setup(spark)
    p = 8
    np_df = spark.createDataFrame(
        [(q, p) for q in qids], "query_id bigint, nprobe bigint"
    )
    fixed = similarity.ivfpq_topk(
        cents, assigns, cb, codes, qids, k=10, nprobe=p, m=sq._CL_M,
        residual=True,
    ).select("query_id", "corpus_id", "rnk")
    framed = similarity.ivfpq_topk(
        cents, assigns, cb, codes, qids, k=10, nprobe=np_df, m=sq._CL_M,
        residual=True,
    ).select("query_id", "corpus_id", "rnk")
    got_f = {tuple(r) for r in fixed.collect()}
    got_d = {tuple(r) for r in framed.collect()}
    assert got_f == got_d
