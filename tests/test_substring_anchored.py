"""Anchored first-pass substring dedup (round 10).

``exact_substring_anchored`` is the production first pass the
every-position operator's cost note promises: content-defined anchors
(ascii of the gram's first char % mod == 0 — a property of the TEXT,
so a shared substring selects the SAME anchors in both copies at ANY
offset), md5 + join only at anchors.  Pinned here:

* the alignment guarantee: a long shared block is found with a tight
  span estimate whether the copies start at the same offset or not
  (the property a fixed-stride ``pos % s`` sample does NOT have — also
  demonstrated);
* agreement with the exact every-position pass on the pairs it flags;
* the recall trade is exactly the documented one: a shared span with
  fewer than ``min_anchors`` anchors is missed.
"""

from __future__ import annotations


def _mk_block(n: int, seed: int = 7) -> str:
    """Deterministic pseudo-text with a healthy anchor density (letters
    spread across ascii codes so ~1/4 satisfy % 4 == 0)."""
    out = []
    x = seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (2**31)
        out.append(chr(97 + (x % 26)) if x % 5 else " ")
    return "".join(out)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_anchored_finds_shared_block_at_any_offset(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.dedup import (
        exact_substring_anchored,
        exact_substring_spans,
    )

    block = _mk_block(300)
    pad_a = _mk_block(80, seed=11)
    pad_b = _mk_block(133, seed=23)  # DIFFERENT offset in doc 2
    docs = _docs(
        spark,
        [
            (1, pad_a + block + _mk_block(60, seed=31)),
            (2, pad_b + block + _mk_block(40, seed=41)),
            (3, _mk_block(400, seed=97)),  # unrelated
        ],
    )
    got = {
        (r["doc_a"], r["doc_b"]): r.asDict()
        for r in exact_substring_anchored(docs).collect()
    }
    assert (1, 2) in got
    est = got[(1, 2)]["est_max_span"]
    assert 150 <= est <= 320, est  # tight estimate of the 300-char block
    assert all(3 not in k for k in got)

    # the exact pass agrees on the pair and pins the true span
    exact = {
        (r["doc_a"], r["doc_b"]): r["max_span_chars"]
        for r in exact_substring_spans(docs).collect()
    }
    assert exact[(1, 2)] == 300


def test_fixed_stride_would_misalign_but_anchors_do_not(spark):
    """The design point: anchors are content-defined.  Shift one copy
    by ONE character — a pos%s stride sample would select different
    gram starts in the two copies (k=20 grams at misaligned starts
    differ), while the content anchors still align and the pair is
    found."""
    from ecs_ecommerce_data_pipeline_spark.operators.dedup import (
        exact_substring_anchored,
    )

    block = _mk_block(260)
    docs = _docs(
        spark,
        [
            (1, "x" + block),   # offset 1
            (2, block),         # offset 0 — every stride class shifts
        ],
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["est_max_span"]
        for r in exact_substring_anchored(docs).collect()
    }
    assert (1, 2) in got
    assert got[(1, 2)] >= 150


def test_span_with_too_few_anchors_is_the_documented_miss(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.dedup import (
        exact_substring_anchored,
    )

    # a shared block with NO qualifying anchor char: all chars chosen
    # with ascii % 4 != 0 ('a'=97, 'b'=98, 'c'=99 — % 4 in {1,2,3})
    block = ("abc" * 40)[:100]
    docs = _docs(
        spark,
        [
            (1, _mk_block(50, seed=5) + block),
            (2, _mk_block(70, seed=9) + block),
        ],
    )
    got = exact_substring_anchored(docs).collect()
    shared = [r for r in got if (r["doc_a"], r["doc_b"]) == (1, 2)]
    # the 100-char anchor-free block alone can never be reported
    # (any reported run must ride >= 2 anchors, which this block lacks)
    for r in shared:
        assert r["n_anchors"] >= 2
