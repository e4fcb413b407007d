"""Round-9 unit tests: feature-hashed dense retrieval edge cases and
the multiband blocking guard.

Token constants below are md5-derived facts (verified in-test via the
operator's own `_feature_hash_py`): under dims=32, "w8" and "w9" hash
to the SAME bucket (8) with OPPOSITE signs, so they cancel exactly;
"hash"/"join"/"vector" (the catalog's query set) occupy three distinct
buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators.retrieval import (
    _feature_hash_py,
    hashed_dense_scores,
)
from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
    multiband_bucket_rows,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_fully_cancelling_query_returns_empty_with_schema(spark):
    b8, s8 = _feature_hash_py("w8", 32)
    b9, s9 = _feature_hash_py("w9", 32)
    assert b8 == b9 and s8 == -s9  # the cancellation precondition
    docs = _docs(spark, [(1, "w8 alpha"), (2, "beta w9")])
    out = hashed_dense_scores(docs, ["w8", "w9"], dims=32)
    assert out.columns == ["doc_id", "score", "rnk"]
    assert out.count() == 0


def test_zero_norm_docs_excluded_from_ranking(spark):
    # doc 1's ONLY content is the cancelling pair -> its whole hashed
    # vector is zero (no direction to rank); doc 2 genuinely matches
    docs = _docs(spark, [(1, "w8 w9"), (2, "hash things"), (3, "hash stuff")])
    out = hashed_dense_scores(docs, ["hash"], dims=32).collect()
    ids = {r["doc_id"] for r in out}
    assert 1 not in ids
    assert {2, 3} <= ids


def test_rank_ties_break_by_doc_id(spark):
    # identical documents -> identical cosine -> rnk follows doc_id
    docs = _docs(spark, [(5, "hash join"), (3, "hash join"), (9, "hash join")])
    out = hashed_dense_scores(docs, ["hash", "join"], dims=32).orderBy("rnk")
    got = [(r["doc_id"], r["rnk"]) for r in out.collect()]
    assert got == [(3, 1), (5, 2), (9, 3)]


def test_candidates_are_inverted_probe_not_corpus_scan(spark):
    # a doc sharing NO bucket with the query never appears, even though
    # its cosine to the query is well-defined (0) — candidates come from
    # the bucket probe, not a scan-and-rank
    q = "hash"
    qb, _ = _feature_hash_py(q, 32)
    # find a token in a different bucket
    other = next(
        w for w in (f"x{i}" for i in range(200))
        if _feature_hash_py(w, 32)[0] != qb
    )
    docs = _docs(spark, [(1, f"{q} one"), (2, f"{other} {other}")])
    out = hashed_dense_scores(docs, [q], dims=32).collect()
    ids = {r["doc_id"] for r in out}
    assert 2 not in ids or any(
        _feature_hash_py(t, 32)[0] == qb for t in (other, "one")
    )


def test_multiband_raises_loudly_on_ragged_vectors(spark):
    emb = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 7)],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(Exception, match="embedding length"):
        multiband_bucket_rows(emb, n_bands=2, band_bits=4).collect()


def test_multiband_matches_driver_side_hash_formula(spark):
    """Bucket bit b·16+j of vector v is sign(Σ_d floor(v[d]·w(plane,d)
    ·2^40)) with w from the md5 formula — recompute one row in Python
    and pin the engine's bucket bit-for-bit."""
    import math

    from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
        _hyperplane_weights_py,
    )

    vec = [math.sin(i + 1) for i in range(8)]
    emb = spark.createDataFrame(
        [(7, vec)], "vec_id bigint, embedding array<double>"
    )
    rows = {
        r["band_idx"]: r["bucket"]
        for r in multiband_bucket_rows(emb, n_bands=2, band_bits=4).collect()
    }
    for band in (0, 1):
        want = 0
        for j in range(4):
            w = _hyperplane_weights_py(band * 4 + j, 8)
            proj = sum(
                int(math.floor((x * wd) * 1099511627776.0))
                for x, wd in zip(vec, w)
            )
            if proj > 0:
                want |= 1 << j
        assert rows[band] == want
