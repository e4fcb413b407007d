"""Typed JSONL (newline-delimited JSON) ingestion with row-level
quarantine.

JSONL is the lingua franca of LLM training corpora (one document object
per line); the engine ingests it with the same contract as the CSV edge
(``csv_source``):

* **explicit StructType** → typed columns at the scan;
* **PERMISSIVE + corrupt-record capture** → lines that fail to parse
  (or fail the schema's types) become quarantine rows carrying the raw
  line, never a failed job;
* **optional-field synthesis** → shares ``csv_source.with_optional_columns``
  (JSON objects with absent keys parse to typed nulls natively);
* **multi-path / glob reads** → a sharded corpus
  (``corpus/part-*.jsonl``) is one scan.

Implemented as a text scan + ``from_json`` (JVM-side parse into a
struct) for the same reason ``read_csv`` uses ``from_csv``: the corrupt
record is then a first-class derived column — no cached double-scan,
no QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction. Parsing parallelizes
per file-split; quarantine is a filter, not a pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .csv_source import CORRUPT_COL, split_quarantine, with_optional_columns


def read_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
) -> DataFrame:
    """Typed multi-path JSONL scan in PERMISSIVE mode with corrupt-line
    capture. Returned frame still contains quarantined rows — split them
    off with ``csv_source.split_quarantine`` (shared contract).

    Blank lines are dropped (trailing newlines in sharded corpora);
    everything else either parses into the schema or lands in
    ``_corrupt_record``.
    """
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    if isinstance(paths, str):
        paths = [paths]
    return (
        spark.read.text(paths)
        .filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.from_json(
                "value",
                read_schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("r"),
            F.col("value").alias("_raw"),
        )
        # from_json yields NULL struct (not a populated corrupt column)
        # for lines that are not JSON at all — normalize both failure
        # shapes into the shared corrupt-column contract.
        .select(
            *[
                F.col(f"r.{f.name}").alias(f.name)
                for f in schema.fields
            ],
            F.when(F.col("r").isNull(), F.col("_raw"))
            .otherwise(F.col(f"r.{CORRUPT_COL}"))
            .alias(CORRUPT_COL),
        )
    )


def read_jsonl_table(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
    optional: dict[str, T.DataType] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full JSONL ingestion edge: typed scan → quarantine split →
    optional-field synthesis. Returns (clean, quarantine)."""
    clean, quarantine = split_quarantine(read_jsonl(spark, paths, schema))
    if optional:
        clean = with_optional_columns(clean, optional)
    return clean, quarantine
