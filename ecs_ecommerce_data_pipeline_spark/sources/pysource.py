"""Custom Python Data Source (Spark 4 DataSource API): deterministic
synthetic document corpus.

The reference ingests only CSV-from-S3; this engine's source surface
additionally demonstrates Spark 4's pure-Python DataSource extension
point — the sanctioned way to plug a bespoke format/feed into the scan
planner (partitions, schema, per-partition readers) without JVM code.

``synthetic_docs`` generates an md5-deterministic document corpus:
content is a pure function of (seed, doc_id), so any row is reproducible
on any executor, any partitioning, any retry — the same determinism
contract the engine's samplers use. Use it to scale-test text operators
to arbitrary row counts without writing test fixtures to disk:

    spark.dataSource.register(SyntheticDocsDataSource)
    df = spark.read.format("synthetic_docs").option("rows", 1_000_000).load()

Scale posture: ``partitions()`` splits the id range into ~``rows_per_
partition`` chunks, so a 10^9-row corpus fans out across the cluster;
generation is CPU-only per partition (no driver data path, no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_SCHEMA_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_WORDS = (
    "data table row scan filter join hash value key column agg window "
    "spark batch stream merge sort part order line customer query fast "
    "slow small the a"
).split()
_LANGS = ("en", "es", "fr", "de", "zh")


def _doc(seed: int, doc_id: int) -> tuple[int, str, str, str, int]:
    """One synthetic document — a pure function of (seed, doc_id).

    Defined at module top level but used only via the reader class;
    the DataSource API pickles the whole reader object, carrying this
    function with it.
    """
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_words = 20 + h[0] % 80
    words = []
    x = int.from_bytes(h[:8], "big")
    for i in range(n_words):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        words.append(_WORDS[x % len(_WORDS)])
    text = " ".join(words)
    lang = _LANGS[h[1] % len(_LANGS)]
    source = f"src{h[2] % 20}"
    return (doc_id, text, lang, source, len(text))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 42))
        self.rows_per_partition = int(options.get("rows_per_partition", 10_000))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, self.rows_per_partition)
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _doc(self.seed, doc_id)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` — options: ``rows``,
    ``seed``, ``rows_per_partition``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> StructType | str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticDocsReader(self.options)
