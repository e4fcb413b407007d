"""Shuffle-VOLUME gates: measured bytes over the wire, not just plan
shape. Each test pins a scale claim from an operator's docstring to an
actual byte budget at sf0.001 — if a refactor starts shuffling payloads
it was designed to avoid, these trip even when the plan shape looks
similar.
"""

from __future__ import annotations

import pytest

from ecs_ecommerce_data_pipeline_spark.functions.introspect import (
    job_shuffle_write_bytes,
)
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _measure(spark, df) -> int:
    # noop sink: materializes every row with NO action-side aggregation
    # (count() adds its own tiny final-agg exchange, which would mask a
    # zero-shuffle claim)
    action = lambda: df.write.format("noop").mode("overwrite").save()  # noqa: E731
    n = job_shuffle_write_bytes(spark, action)
    if n < 0:
        pytest.skip("Spark UI REST API unavailable")
    return n


def test_exact_dedup_never_shuffles_text(spark):
    """Claim (operators/dedup.py): exact dedup shuffles 16-byte md5 +
    ids, never the documents. Raw text at sf0.001 is ~60 KB; the hash
    shuffle must stay far under it."""
    from ecs_ecommerce_data_pipeline_spark.operators.dedup import exact_duplicates

    doc = load_table(spark, SF, "documents")
    text_bytes = doc.selectExpr("sum(octet_length(text))").first()[0]
    shuffled = _measure(spark, exact_duplicates(doc))
    assert shuffled < text_bytes / 2, (shuffled, text_bytes)


def test_split_assignment_shuffles_zero_bytes(spark):
    """Claim (operators/sampling.py): split assignment is map-only —
    literally zero shuffle bytes."""
    from ecs_ecommerce_data_pipeline_spark.operators.sampling import assign_split

    doc = load_table(spark, SF, "documents")
    assert _measure(spark, assign_split(doc, "doc_id")) == 0


def test_lsh_bucket_assignment_shuffles_zero_bytes(spark):
    """Claim (operators/similarity.py): literal-weight bucketing is a
    pure scan — zero shuffle bytes."""
    from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
        lsh_bucket_assignments,
    )

    emb = load_table(spark, SF, "embeddings")
    assert _measure(spark, lsh_bucket_assignments(emb, n_planes=8)) == 0


def test_cms_sketch_shuffle_bounded_by_sketch_size(spark):
    """Claim (operators/sketch.py): the sketch shuffle carries at most
    depth×width partial counts per map partition, never raw keys. At
    sf0.001 lineitem is ~6k rows; the shuffle must be bounded by the
    sketch dimensions, not the row count."""
    from ecs_ecommerce_data_pipeline_spark.operators.sketch import cms_sketch

    li = load_table(spark, SF, "lineitem")
    shuffled = _measure(spark, cms_sketch(li, "l_partkey", depth=4, width=64))
    # 4×64 = 256 buckets; generous 100 bytes/bucket/partition over ≤64
    # map partitions ≈ 1.6 MB worst case — raw keyed rows would be more;
    # in practice this lands ≈ tens of KB
    assert 0 < shuffled < 1_600_000, shuffled
