"""Python user-defined table functions (Spark 4 ``@udtf``).

API-surface completeness: the engine's production chunker is the pure-
Catalyst ``operators.curation.chunk_documents`` (JVM-side, codegen, no
Python boundary) — a UDTF runs row-at-a-time Python and belongs only
where per-row logic genuinely cannot be expressed as Column algebra.
This module keeps one canonical example wired and tested so the
extension point is proven: the same overlapping-chunk expansion,
asserted row-identical to the Catalyst operator in
``tests/test_udtf.py``.

Scale note: a UDTF is the SLOW path (one Python call per input row,
pickled rows both ways unless ``useArrow=True``). Registering it via
``spark.udtf.register`` also makes it callable from SQL as a
lateral table function: ``SELECT d.doc_id, c.* FROM documents d,
LATERAL chunk_udtf(d.doc_id, d.text)``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf

CHUNK = 200
STRIDE = 150


@udtf(returnType="chunk_id bigint, chunk_start bigint, chunk_len bigint, chunk_md5 string")
class ChunkUDTF:
    """Overlapping fixed-window chunks of one document — same contract
    as ``chunk_documents`` (chunk=200, stride=150, md5 of the piece)."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if text is None:
            return
        n = len(text)
        start = 0
        while True:  # every doc (even empty) yields its first chunk
            piece = text[start : start + CHUNK]
            yield (
                start // STRIDE,
                start,
                len(piece),
                hashlib.md5(piece.encode()).hexdigest(),
            )
            start += STRIDE
            if start >= n:
                break


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``LATERAL chunk_udtf(...)``)."""
    spark.udtf.register("chunk_udtf", ChunkUDTF)
