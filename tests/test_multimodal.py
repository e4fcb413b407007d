"""Multimodal binary-column plumbing tests: schema contract, Arrow batch
iteration, determinism of the (stubbed) decode stage."""

from __future__ import annotations

import hashlib

from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
    decode_features,
    with_binary_payload,
)
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_payload_schema(spark):
    doc = load_table(spark, SF, "documents")
    wrapped = with_binary_payload(doc)
    assert wrapped.schema["payload"].dataType.typeName() == "binary"
    meta_type = wrapped.schema["media_meta"].dataType
    assert [f.name for f in meta_type.fields] == ["n_bytes", "mime"]


def test_decode_features_deterministic(spark):
    doc = load_table(spark, SF, "documents").limit(20)
    out = decode_features(with_binary_payload(doc))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 20
    # checksum is the md5 of the payload bytes; spot-check one doc
    src = {r["doc_id"]: r["text"] for r in doc.collect()}
    for doc_id, r in rows.items():
        want = hashlib.md5(src[doc_id].encode()).hexdigest()
        assert r["checksum"] == want
        assert r["n_bytes"] == len(src[doc_id].encode())
        assert 1 <= r["width"] <= 2048 and 1 <= r["n_channels"] <= 4


def test_decode_kernel_flag_is_stub_for_opaque_payloads(spark):
    """Non-image mimes route through the deterministic stub kernel and
    say so in the output — a stubbed decode can't masquerade as real."""
    doc = load_table(spark, SF, "documents").limit(5)
    out = decode_features(with_binary_payload(doc))
    assert "kernel" in out.columns
    assert {r["kernel"] for r in out.collect()} == {"stub"}


def test_decode_image_mime_without_codec_is_loud(spark):
    """A non-PNG ``image/*`` payload on a worker without PIL must raise,
    not fall back to fake dimensions. (If PIL ever lands in the container
    the pil kernel path takes over; this test then needs a real image
    byte payload instead.)"""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        import pytest

        pytest.skip("PIL present: loud-failure path not reachable")

    import pytest
    from pyspark.sql import functions as F

    doc = load_table(spark, SF, "documents").limit(3)
    wrapped = with_binary_payload(doc).withColumn(
        "media_meta",
        F.struct(
            F.col("media_meta.n_bytes").alias("n_bytes"),
            F.lit("image/jpeg").alias("mime"),
        ),
    )
    with pytest.raises(Exception) as exc_info:
        decode_features(wrapped).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def _make_png(width: int, height: int, channels: int = 3) -> bytes:
    """Build a valid PNG with pure stdlib (the test's independent second
    implementation of the format — no shared code with the kernel)."""
    import struct
    import zlib

    color_type = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x * channels + c) % 256 for x in range(width) for c in range(channels))
        for _ in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_real_png_payload_uses_real_kernel(spark):
    """An ``image/png`` payload must go through a REAL decode — PIL when
    present, the stdlib PNG parser otherwise — and report the true
    geometry from the file bytes, never stub dimensions."""
    import hashlib

    from pyspark.sql import functions as F

    cases = [(1, 5, 3, 1), (2, 3, 2, 3), (3, 7, 4, 4)]  # id, w, h, channels
    rows = [(i, bytearray(_make_png(w, h, c))) for i, w, h, c in cases]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").select(
        "doc_id",
        "payload",
        F.struct(
            F.octet_length("payload").alias("n_bytes"),
            F.lit("image/png").alias("mime"),
        ).alias("media_meta"),
    )
    got = {r["doc_id"]: r for r in decode_features(df).collect()}
    for i, w, h, c in cases:
        r = got[i]
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, c)
        assert r["kernel"] in ("pil", "pypng")
        assert r["checksum"] == hashlib.md5(_make_png(w, h, c)).hexdigest()
        assert r["n_bytes"] == len(_make_png(w, h, c))


def test_decode_corrupt_png_is_loud(spark):
    """A truncated/garbage PNG must raise during decode, not emit fake
    dimensions."""
    import pytest
    from pyspark.sql import functions as F

    good = _make_png(4, 4, 3)
    corrupt = bytearray(good[: len(good) // 2])  # truncated mid-IDAT
    df = spark.createDataFrame(
        [(1, corrupt)], "doc_id long, payload binary"
    ).select(
        "doc_id",
        "payload",
        F.struct(
            F.octet_length("payload").alias("n_bytes"),
            F.lit("image/png").alias("mime"),
        ).alias("media_meta"),
    )
    with pytest.raises(Exception):
        decode_features(df).collect()


def test_resize_preserves_aspect_and_bounds(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        resize_features,
    )

    doc = load_table(spark, SF, "documents").limit(50)
    out = resize_features(decode_features(with_binary_payload(doc)), max_dim=256)
    for r in out.collect():
        assert 1 <= r["new_width"] <= 256 and 1 <= r["new_height"] <= 256
        if max(r["width"], r["height"]) <= 256:
            assert (r["new_width"], r["new_height"]) == (r["width"], r["height"])
        else:
            # floor division can only shrink; aspect drift bounded by 1px
            longest = max(r["width"], r["height"])
            assert r["new_width"] == max(1, r["width"] * 256 // longest)
            assert r["new_height"] == max(1, r["height"] * 256 // longest)


def test_frame_sample_expands_rows(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    doc = load_table(spark, SF, "documents").limit(30)
    out = sample_frames(with_binary_payload(doc), max_frames=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert len(by_doc) == 30
    for doc_id, idxs in by_doc.items():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous 0..n-1
        assert 1 <= len(idxs) <= 4


def test_lsh_bucket_empty_and_ragged_inputs(spark):
    """Regression guards for the literal-weight bucketing rewrite: empty
    input yields an empty (not erroring) result with a stable schema, and
    a ragged vector fails LOUDLY instead of silently zeroing sign bits."""
    import pytest

    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
        lsh_bucket_assignments,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = lsh_bucket_assignments(empty, n_planes=4)
    assert out.columns == ["vec_id", "bucket"]
    assert out.count() == 0

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0])],  # row 2 shorter
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception) as exc_info:
        lsh_bucket_assignments(ragged, n_planes=4).collect()
    assert "dims" in str(exc_info.value)


def test_decode_png_uses_pil_kernel_when_installed(spark):
    """With the ``pil`` extra installed (``pip install .[pil]``) the PNG
    decode MUST route through PIL — this pins the branch at
    operators/multimodal.py that the sandbox's stdlib-parser tests can't
    reach. Skipped (never deleted) where PIL is absent."""
    import pytest

    try:
        import PIL  # noqa: F401
    except ImportError:
        pytest.skip("PIL not installed: install the 'pil' extra to run")
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, bytearray(_make_png(6, 4, 3)))], "doc_id long, payload binary"
    ).select(
        "doc_id",
        "payload",
        F.struct(
            F.octet_length("payload").alias("n_bytes"),
            F.lit("image/png").alias("mime"),
        ).alias("media_meta"),
    )
    r = decode_features(df).collect()[0]
    assert r["kernel"] == "pil"
    assert (r["width"], r["height"], r["n_channels"]) == (6, 4, 3)


# --- image near-dup (dHash) --------------------------------------------------


def test_image_neardup_clusters_replicas_not_strangers(spark):
    """Replica images (same base, independent few-pixel noise) must pair
    at small Hamming distance; images of DIFFERENT bases are ~random
    64-bit hashes apart and must never pair. Recall over replica pairs
    stays high (banding is exact to Hamming 7, LSH-recall above)."""
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        image_dhash_bands,
        image_neardup_pairs,
        synth_png_images,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id"
    )
    n_docs = doc.count()
    base_mod = 10  # 5 replicas per base over the 50-doc slice
    bands = image_dhash_bands(synth_png_images(doc, base_mod=base_mod))
    pairs = image_neardup_pairs(bands, max_hamming=10).collect()
    assert pairs, "replica corpus must produce near-dup pairs"
    for r in pairs:
        assert r["doc_a"] % base_mod == r["doc_b"] % base_mod, (
            f"cross-base pair {r['doc_a']}–{r['doc_b']} at "
            f"hamming {r['hamming']}"
        )
    # recall over the true replica pairs
    per_base = n_docs // base_mod
    true_pairs = base_mod * per_base * (per_base - 1) // 2
    assert len(pairs) >= 0.8 * true_pairs


def test_image_dhash_loud_on_corrupt_bytes(spark):
    """Garbage payloads must raise in the decode kernel, never emit a
    fingerprint."""
    import pytest
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        image_dhash_bands,
    )

    bad = spark.createDataFrame(
        [(1, bytearray(b"not a png at all"))], "doc_id bigint, payload binary"
    )
    with pytest.raises(Exception, match="bad signature|PythonException"):
        image_dhash_bands(bad).collect()


def test_image_dhash_bit_semantics(spark):
    """One hand-computed fingerprint: decode the synthesized PNG for a
    single doc and check band bits against the md5 pixel formula
    directly (kernel-independent recomputation)."""
    import hashlib

    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        image_dhash_bands,
        synth_png_images,
    )

    doc = spark.createDataFrame([(7,)], "doc_id bigint")
    got = {
        (r["band_idx"], r["band_val"])
        for r in image_dhash_bands(synth_png_images(doc, base_mod=100)).collect()
    }

    def byte(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:2], 16)

    def px(r, c):
        if byte(f"noise:7:{r}:{c}") < 8:
            return byte(f"pert:7:{r}:{c}")
        return byte(f"img:7:{r}:{c}")

    expect = set()
    for r in range(8):
        val = 0
        for c in range(8):
            if px(r, c) > px(r, c + 1):
                val |= 1 << c
        expect.add((r, val))
    assert got == expect


def test_image_neardup_wide_bands_subset_and_recall(spark):
    """16-bit blocking candidates are a subset of 8-bit blocking
    candidates (an intact 16-bit band implies both its 8-bit halves are
    intact), verified pairs carry identical Hamming values, and replica
    recall stays usable at the default noise level."""
    from ecs_ecommerce_data_pipeline_spark.operators.multimodal import (
        image_dhash_bands,
        image_neardup_pairs,
        synth_png_images,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id"
    )
    bands = image_dhash_bands(synth_png_images(doc, base_mod=10))
    narrow = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in image_neardup_pairs(bands, 10, band_bits=8).collect()
    }
    wide = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in image_neardup_pairs(bands, 10, band_bits=16).collect()
    }
    assert set(wide) <= set(narrow)
    for k, v in wide.items():
        assert narrow[k] == v
    assert len(wide) >= 0.6 * len(narrow)  # usable recall on replicas
