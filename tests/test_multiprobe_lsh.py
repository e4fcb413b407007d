"""Multi-probe LSH invariants (Lv et al., VLDB 2007).

The operator's correctness claims, each pinned:

* with ``n_extra=0`` the result is EXACTLY single-probe ``lsh_topk``
  (the probe sequence degenerates to the home bucket);
* every query probes exactly ``n_extra + 1`` DISTINCT buckets, each at
  Hamming distance <= 1 from the home bucket;
* recall dominance is exact: per query, multi-probe hits against the
  brute-force truth >= single-probe hits (superset candidate pool +
  consistent tie ordering — a displacing candidate must itself be a
  true top-k member).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators import similarity
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
QIDS = [0, 1, 2, 3, 4]


def _pairs(df):
    return {(r.query_id, r.corpus_id, r.rnk) for r in df.collect()}


def test_zero_extra_probes_equals_single_probe(spark):
    emb = load_table(spark, SF, "embeddings")
    single = similarity.lsh_topk(emb, QIDS, k=10, n_planes=8)
    multi0 = similarity.lsh_multiprobe_topk(emb, QIDS, k=10, n_planes=8, n_extra=0)
    assert _pairs(single) == _pairs(multi0)


def test_probe_buckets_distinct_and_hamming_1(spark):
    emb = load_table(spark, SF, "embeddings")
    n_planes, n_extra = 8, 3
    home = {
        r.vec_id: r.bucket
        for r in similarity.lsh_bucket_assignments(emb, n_planes=n_planes)
        .filter(F.col("vec_id").isin(QIDS))
        .collect()
    }
    # reach into the probe explosion: rebuild the query side exactly as
    # the operator does and check the exploded bucket set per query
    qside = similarity._with_buckets(
        emb.filter(F.col("vec_id").isin(QIDS)), n_planes, "vec_id", "embedding"
    )
    dims = similarity._vector_dims(emb, "embedding")
    projs = ", ".join(
        similarity._proj_sql_expr("embedding", p, dims) for p in range(n_planes)
    )
    probes_sql = (
        f"concat(array(bucket), transform("
        f"slice(array_sort(transform(array({projs}),"
        f" (pr, p) -> struct(abs(pr) AS ap, p AS p))), 1, {n_extra}),"
        f" s -> bucket ^ shiftleft(CAST(1 AS BIGINT), s.p)))"
    )
    rows = qside.select("vec_id", F.expr(probes_sql).alias("probes")).collect()
    assert rows
    for r in rows:
        probes = list(r.probes)
        assert len(probes) == n_extra + 1
        assert len(set(probes)) == n_extra + 1  # all distinct
        assert probes[0] == home[r.vec_id]
        for b in probes[1:]:
            assert bin(b ^ home[r.vec_id]).count("1") == 1  # one flipped bit


def test_multiprobe_recall_dominates_single_probe(spark):
    emb = load_table(spark, SF, "embeddings")
    truth = {
        (r.query_id, r.corpus_id)
        for r in similarity.brute_force_topk(emb, QIDS, k=10).collect()
    }
    single = {
        (r.query_id, r.corpus_id)
        for r in similarity.lsh_topk(emb, QIDS, k=10, n_planes=8).collect()
    }
    multi = {
        (r.query_id, r.corpus_id)
        for r in similarity.lsh_multiprobe_topk(
            emb, QIDS, k=10, n_planes=8, n_extra=2
        ).collect()
    }
    for q in QIDS:
        t = {c for qq, c in truth if qq == q}
        hs = len(t & {c for qq, c in single if qq == q})
        hm = len(t & {c for qq, c in multi if qq == q})
        assert hm >= hs, f"query {q}: multiprobe {hm} < single {hs}"
