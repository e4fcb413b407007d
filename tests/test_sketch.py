"""Count-min sketch operator semantics (operators.sketch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators.sketch import (
    cms_estimate,
    cms_join_size,
    cms_sketch,
)


def test_cms_estimate_upper_bounds_exact_counts(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    sketch = cms_sketch(df, "k", depth=4, width=64)
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    est = {r["k"]: r["cms_est"] for r in cms_estimate(sketch, keys, "k", 4, 64).collect()}
    assert est["a"] >= 5 and est["b"] >= 3 and est["c"] >= 1


def test_cms_estimate_unseen_key_is_zero_or_collision(spark):
    """A never-seen key must still appear in the output; with a wide
    sketch and few keys its estimate is 0 (empty buckets count as 0 —
    the inner-join shape silently dropped such keys)."""
    df = spark.createDataFrame([("a",)] * 4, "k string")
    sketch = cms_sketch(df, "k", depth=4, width=2048)
    keys = spark.createDataFrame([("zzz-never-seen",)], "k string")
    rows = cms_estimate(sketch, keys, "k", 4, 2048).collect()
    assert len(rows) == 1  # key not dropped
    assert 0 <= rows[0]["cms_est"] <= 4  # 0 unless all 4 depths collide


def test_cms_sketch_bounded_and_null_keys_excluded(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",), (None,)], "k string")
    sketch = cms_sketch(df, "k", depth=4, width=64).collect()
    assert len(sketch) <= 4 * 64
    # 2 non-null rows × 4 depths = 8 total mass; nulls excluded
    assert sum(r["c"] for r in sketch) == 8


def test_cms_join_size_upper_bounds_true_size(spark):
    a = spark.createDataFrame([(i % 10,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i % 10,) for i in range(40)], "k long")
    true_size = a.join(b, "k").count()
    sa = cms_sketch(a, "k", depth=4, width=256)
    sb = cms_sketch(b, "k", depth=4, width=256)
    est = cms_join_size(sa, sb).first()["est_join_size"]
    assert est >= true_size


# --- Bloom filter -----------------------------------------------------------


def test_bloom_never_false_negative(spark):
    """The load-bearing Bloom invariant: every inserted key probes as a
    member — for any key set and even a deliberately tiny (collision-
    heavy) filter."""
    from ecs_ecommerce_data_pipeline_spark.operators.sketch import (
        bloom_bits,
        bloom_probe,
    )

    keys = spark.createDataFrame([(i,) for i in range(200)], "key long")
    bits = bloom_bits(keys, "key", k=4, m=64)  # m=64: heavy collisions
    probed = bloom_probe(bits, keys, "key", k=4, m=64).collect()
    assert len(probed) == 200
    assert all(r["bloom_member"] for r in probed)


def test_bloom_bits_bounded_and_mergeable(spark):
    """State ≤ m rows regardless of cardinality, and the filter of a
    union equals the union of the filters (mergeability — the property
    that lets per-partition / per-day filters OR together)."""
    from ecs_ecommerce_data_pipeline_spark.operators.sketch import bloom_bits

    a = spark.createDataFrame([(i,) for i in range(500)], "key long")
    b = spark.createDataFrame([(i,) for i in range(400, 900)], "key long")
    m = 128
    bits_union = {
        r["pos"] for r in bloom_bits(a.unionAll(b), "key", k=4, m=m).collect()
    }
    merged = {r["pos"] for r in bloom_bits(a, "key", k=4, m=m).collect()} | {
        r["pos"] for r in bloom_bits(b, "key", k=4, m=m).collect()
    }
    assert bits_union == merged
    assert len(bits_union) <= m


def test_bloom_absent_key_mostly_rejected(spark):
    """With a roomy filter, keys far outside the inserted set probe as
    non-members (sanity that the probe isn't vacuously true)."""
    from ecs_ecommerce_data_pipeline_spark.operators.sketch import (
        bloom_bits,
        bloom_probe,
    )

    keys = spark.createDataFrame([(i,) for i in range(50)], "key long")
    bits = bloom_bits(keys, "key", k=4, m=65536)
    probes = spark.createDataFrame(
        [(i,) for i in range(1_000_000, 1_000_050)], "key long"
    )
    rows = bloom_probe(bits, probes, "key", k=4, m=65536).collect()
    # expected FPR at this fill is ~(50*4/65536)^4 ≈ 1e-10 — all rejected
    assert not any(r["bloom_member"] for r in rows)
