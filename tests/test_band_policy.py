"""Round-10 scale-adaptive banding policy (verdict task 3).

SCALING's own note recorded banded candidate volume growing ~n² with
corpus density because band widths were registered as CONSTANTS
(``label_noise_decomposition``: 502 → 230k candidates at 10× rows).
``band_policy`` picks the width from corpus size and a per-point
random-collision budget — w = ceil(log2(n_bands·n/target)) — so the
random candidate volume stays ~n·target (linear).  The 64-bit dHash
family moves along the (8×8) → (4×16) → (2×32) ladder instead
(``dhash_band_policy``), which required ``fuse_bands`` to learn the
32-bit rung.  Pinned here:

* the closed-form floor bound holds at the returned width (when not
  clamped), widths are monotone in n and clamp at both ends;
* the ladder picks the narrowest width that fits the budget (recall is
  paid for only when n demands it);
* 32-bit fusion is bit-exact little-endian composition, 16-bit fusion
  is byte-identical to the pre-round-10 formula, and identical hashes
  collide at every width (the recall invariant banding relies on);
* the end-to-end near-dup operator at band_bits=32 still finds every
  pair within the pigeonhole-exact radius (n_bands − 1 = 1).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_band_policy_floor_bound_and_monotonicity():
    from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
        band_policy,
    )

    target = 8.0
    prev = 0
    for n in (1, 100, 2_000, 20_000, 10**6, 10**9):
        w = band_policy(n, n_bands=4, target_candidates_per_point=target)
        assert w >= prev  # monotone in n
        prev = w
        if 8 <= w < 30:  # not clamped: the bound must hold exactly
            assert 4 * n / float(1 << w) <= target, (n, w)
            # and w-1 would NOT fit (no gratuitous width = no
            # gratuitous recall loss)
            if w > 8:
                assert 4 * n / float(1 << (w - 1)) > target, (n, w)


def test_band_policy_clamps_and_validates():
    from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
        band_policy,
    )

    assert band_policy(1) == 8  # floor clamp
    assert band_policy(10**15) == 30  # ceiling clamp
    assert band_policy(10**6, min_band_bits=4, max_band_bits=12) == 12
    with pytest.raises(ValueError):
        band_policy(100, n_bands=0)
    with pytest.raises(ValueError):
        band_policy(100, target_candidates_per_point=0)


def test_dhash_ladder_picks_narrowest_fitting_width():
    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        dhash_band_policy,
    )

    target = 8.0
    for n in (1, 100, 2_000, 5_000, 50_000, 10**7, 10**12):
        w = dhash_band_policy(n, target)
        assert w in (8, 16, 32)
        n_bands = 64 // w
        if w < 32:
            assert n_bands * n / float(1 << w) <= target
        # every NARROWER rung must violate the budget
        for wn in (8, 16):
            if wn < w:
                assert (64 // wn) * n / float(1 << wn) > target, (n, w, wn)
    # saturates instead of going to a useless single 64-bit band
    assert dhash_band_policy(10**15) == 32


def _bands_df(spark, hashes: dict[int, int]):
    """(doc_id, band_idx, band_val) rows from 64-bit ints, little-endian
    8-bit bands — the image_dhash_bands layout."""
    rows = [
        (d, i, (h >> (8 * i)) & 0xFF)
        for d, h in hashes.items()
        for i in range(8)
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, band_idx int, band_val bigint"
    )


def test_fuse_bands_32_is_bit_exact(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        fuse_bands,
    )

    h = 0xDEADBEEF_12345678
    df = _bands_df(spark, {1: h})
    got = {
        r["band_idx"]: r["band_val"]
        for r in fuse_bands(df, 32).collect()
    }
    assert got == {0: h & 0xFFFFFFFF, 1: h >> 32}
    # 16-bit fusion unchanged from the pre-round-10 formula
    got16 = {
        r["band_idx"]: r["band_val"]
        for r in fuse_bands(df, 16).collect()
    }
    assert got16 == {i: (h >> (16 * i)) & 0xFFFF for i in range(4)}
    with pytest.raises(ValueError):
        fuse_bands(df, 24)


def test_identical_hashes_collide_at_every_width(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        fuse_bands,
    )

    h = 0x0123456789ABCDEF
    df = _bands_df(spark, {1: h, 2: h})
    for w in (8, 16, 32):
        fused = fuse_bands(df, w)
        a = fused.filter(F.col("doc_id") == 1).select(
            "band_idx", "band_val"
        )
        b = fused.filter(F.col("doc_id") == 2).select(
            "band_idx", "band_val"
        )
        assert a.join(b, ["band_idx", "band_val"]).count() == 64 // w


def test_neardup_pairs_exact_within_pigeonhole_radius_at_32(spark):
    """2×32 banding is pigeonhole-exact to Hamming 1: a pair differing
    in exactly one bit shares the other intact 32-bit band and MUST be
    found, with the exact distance computed on the full 64-bit hash.  A
    pair differing in one bit of EACH half (docs 2 vs 3 below) has no
    intact band and is legitimately missed — recall above the radius,
    not correctness."""
    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        image_neardup_pairs,
    )

    h = 0x0123456789ABCDEF
    df = _bands_df(
        spark,
        {
            1: h,
            2: h ^ 1,          # 1 bit, low half
            3: h ^ (1 << 40),  # 1 bit, high half
        },
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in image_neardup_pairs(df, max_hamming=10, band_bits=32)
        .collect()
    }
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 1
    assert (2, 3) not in pairs  # no intact band: outside the guarantee
