"""Filtered search through the COMPRESSED serving path (round 8).

The round-7 verdict's missing face: ``ivfpq_topk`` had no predicate
form, so filtered queries had to fall back to the raw-vector index.
``build_ivfpq_index(keep_cols=…)`` now stores filterable payload WITH
the codes and ``ivfpq_filtered_topk`` masks the pruned codes scan
(FAISS IDSelector over inverted lists).  These tests pin:

* semantics — the mask commutes with ADC scoring (filter-then-rank ==
  rank-of-filtered), every hit satisfies the predicate, and an
  always-true predicate reproduces the unfiltered search bit-for-bit;
* plan shape — the filtered search still reads ONLY pruned code
  partitions, pushes the payload predicate into the codes scan, and
  never joins the corpus back in (no embeddings.parquet anywhere).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators import similarity
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
_QIDS = [0, 1, 2, 3, 4]
_LBL = 3


@pytest.fixture(scope="module")
def fivfpq(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fivfpq"))
    emb = load_table(spark, SF, "embeddings")
    cents, assigns, cb, codes = similarity.build_ivfpq_index(
        emb, n_centroids=16, m=8, pq_k=16, path=path, keep_cols=["label"]
    )
    return path, cents, assigns, cb, codes


def test_codes_store_carries_payload(fivfpq):
    _, _, _, _, codes = fivfpq
    assert "label" in codes.columns


def test_always_true_pred_equals_unfiltered(spark, fivfpq):
    """pred ≡ true must reproduce ivfpq_topk exactly — the predicate
    face adds a mask, never a different scoring path."""
    _, cents, assigns, cb, codes = fivfpq
    filt = similarity.ivfpq_filtered_topk(
        cents, assigns, cb, codes, _QIDS,
        pred=(F.col("label") >= 0), k=10, nprobe=4, m=8,
    )
    plain = similarity.ivfpq_topk(
        cents, assigns, cb, codes, _QIDS, k=10, nprobe=4, m=8
    )
    cols = ["query_id", "corpus_id", "adc_q", "rnk"]
    assert sorted(map(tuple, filt.select(cols).collect())) == sorted(
        map(tuple, plain.select(cols).collect())
    )


def test_every_hit_satisfies_pred(spark, fivfpq):
    _, cents, assigns, cb, codes = fivfpq
    res = similarity.ivfpq_filtered_topk(
        cents, assigns, cb, codes, _QIDS,
        pred=(F.col("label") == _LBL), k=10, nprobe=4, m=8,
    )
    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("corpus_id"), "label"
    )
    bad = res.join(emb, "corpus_id").filter(F.col("label") != _LBL).count()
    assert bad == 0
    # ranks are dense 1..n per query over the QUALIFYING set
    ranks = {
        (r["query_id"], r["rnk"]) for r in res.select("query_id", "rnk").collect()
    }
    per_q: dict = {}
    for q, rk in ranks:
        per_q.setdefault(q, []).append(rk)
    for q, rks in per_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_filter_commutes_with_adc_scoring(spark, fivfpq):
    """Masking the codes scan then ranking == ranking the unfiltered
    ADC scores restricted to qualifying rows — the semantics the oracle
    pins cross-engine, re-checked engine-side at full probe so cell
    probing can't hide a discrepancy."""
    _, cents, assigns, cb, codes = fivfpq
    filt = similarity.ivfpq_filtered_topk(
        cents, assigns, cb, codes, _QIDS,
        pred=(F.col("label") == _LBL), k=10, nprobe=16, m=8,
    ).select("query_id", "corpus_id", "adc_q", "rnk")
    unf, _ = similarity._ivfpq_adc_scored(
        cents, assigns, cb, codes, _QIDS, nprobe=16, m=8
    )
    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("corpus_id"), "label"
    )
    rows = (
        unf.join(emb, "corpus_id")
        .filter(F.col("label") == _LBL)
        .select("query_id", "corpus_id", "adc_q")
        .collect()
    )
    expect = set()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["adc_q"], r["corpus_id"]))
    for q, lst in by_q.items():
        for i, (adc, cid) in enumerate(sorted(lst)[:10], start=1):
            expect.add((q, cid, adc, i))
    got = {
        (r["query_id"], r["corpus_id"], r["adc_q"], r["rnk"])
        for r in filt.collect()
    }
    assert got == expect


def test_filtered_plan_prunes_cells_and_pushes_label(fivfpq):
    """Plan gate: the filtered search reads the codes store with the
    cell partition filter intact AND the label predicate pushed into
    the same scan; no second corpus-sized relation (the raw embeddings
    table) appears anywhere in the plan."""
    path, cents, assigns, cb, codes = fivfpq
    plan = similarity.ivfpq_filtered_topk(
        cents, assigns, cb, codes, _QIDS,
        pred=(F.col("label") == _LBL), k=10, nprobe=4, m=8,
    )._jdf.queryExecution().executedPlan().toString()
    assert f"{path}/pq_codes" in plan
    assert "embeddings.parquet" not in plan
    seg = plan[plan.find("pq_codes"):]
    assert "PartitionFilters:" in seg
    assert "cell" in seg.split("PartitionFilters:", 1)[1][:200]
    pushed = seg.split("PushedFilters:", 1)[1][:200]
    assert "label" in pushed


def test_filtered_rerank_composes(spark, fivfpq):
    """filter → ADC shortlist → exact rerank: every hit satisfies the
    predicate, and with an always-true predicate the stack reproduces
    the unfiltered rerank bit-for-bit."""
    _, cents, assigns, cb, codes = fivfpq
    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("corpus_id"), "label"
    )
    fr = similarity.ivfpq_rerank_topk(
        cents, assigns, cb, codes, _QIDS,
        k=10, shortlist=50, nprobe=4, m=8,
        codes_pred=(F.col("label") == _LBL),
    )
    bad = fr.join(emb, "corpus_id").filter(F.col("label") != _LBL).count()
    assert bad == 0
    cols = ["query_id", "corpus_id", "cosine_sim", "rnk"]
    always = similarity.ivfpq_rerank_topk(
        cents, assigns, cb, codes, _QIDS,
        k=10, shortlist=50, nprobe=4, m=8,
        codes_pred=(F.col("label") >= 0),
    )
    plain = similarity.ivfpq_rerank_topk(
        cents, assigns, cb, codes, _QIDS,
        k=10, shortlist=50, nprobe=4, m=8,
    )
    assert sorted(map(tuple, always.select(cols).collect())) == sorted(
        map(tuple, plain.select(cols).collect())
    )
