"""Columnar-format round-trip helpers: parquet is the engine's native
format; ORC is supported as an interchange format (native Spark reader,
same predicate-pushdown and column-pruning machinery).

The reference ingests only CSV (``ecs/validation/validate_task.py``);
the engine's format surface is CSV + JSONL (typed scan + quarantine
contract), parquet (native), ORC (this module), and the pure-Python
DataSource extension point (``sources/pysource.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    """ORC with zstd — the interchange default (snappy for legacy
    readers)."""
    df.write.mode("overwrite").option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Native ORC scan — filters and column selection push down exactly
    as with parquet (asserted in ``tests/test_formats.py``)."""
    return spark.read.orc(path)
