"""T5 span-corruption prep (round 10).

``span_corruption_stats`` emits the denoising-objective example
geometry per document with an RNG-free md5-analytic mask.  Pinned:
length identities, hand-computed spans on a crafted doc, masking rate
in a sane band at corpus size, and determinism."""

from __future__ import annotations

import hashlib

SF = "/root/testdata/sf0.001"


def _masked(doc_id: int, t: int, pct: int = 15) -> bool:
    h = int(hashlib.md5(f"{doc_id}:{t}".encode()).hexdigest()[:15], 16)
    return h % 100 < pct


def test_span_geometry_hand_case(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.text import (
        span_corruption_stats,
    )

    n_tok = 40
    text = " ".join(f"w{t}" for t in range(n_tok))
    doc = spark.createDataFrame([(7, text)], "doc_id bigint, text string")
    got = span_corruption_stats(doc).collect()[0]

    flags = [_masked(7, t) for t in range(n_tok)]
    n_masked = sum(flags)
    spans = []
    run = 0
    for f in flags:
        if f:
            run += 1
        elif run:
            spans.append(run)
            run = 0
    if run:
        spans.append(run)

    assert got["n_tokens"] == n_tok
    assert got["n_masked"] == n_masked
    assert got["n_spans"] == len(spans)
    assert got["max_span_tokens"] == (max(spans) if spans else 0)
    assert (
        got["input_len_tokens"]
        == n_tok - n_masked + len(spans)
    )
    assert got["target_len_tokens"] == n_masked + len(spans) + 1


def test_corpus_rate_and_identities(spark):
    from ecs_ecommerce_data_pipeline_spark import catalog

    rows = catalog.queries()["text_span_corruption"](spark, SF).collect()
    assert rows
    tot = sum(r["n_tokens"] for r in rows)
    msk = sum(r["n_masked"] for r in rows)
    assert 0.12 < msk / tot < 0.18  # ~15% by construction
    for r in rows:
        # identities hold per document
        assert (
            r["input_len_tokens"]
            == r["n_tokens"] - r["n_masked"] + r["n_spans"]
        )
        assert r["target_len_tokens"] == r["n_masked"] + r["n_spans"] + 1
        assert r["n_spans"] <= r["n_masked"]
        assert r["max_span_tokens"] <= r["n_masked"]


def test_span_corruption_deterministic(spark):
    from ecs_ecommerce_data_pipeline_spark import catalog

    q = catalog.queries()["text_span_corruption"]
    a = sorted(tuple(r) for r in q(spark, SF).collect())
    b = sorted(tuple(r) for r in q(spark, SF).collect())
    assert a == b
