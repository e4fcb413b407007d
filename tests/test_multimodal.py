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
