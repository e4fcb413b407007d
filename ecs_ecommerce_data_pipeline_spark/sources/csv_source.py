"""Typed CSV ingestion with row-level quarantine.

The reference's native input format is header-CSV read with NO schema —
pandas inference in validation (``ecs/validation/validate_task.py:131-133``)
and all-StringType in Spark (``ecs/transformation/transform_task.py:131``),
with malformed *files* rejected wholesale via exit codes and S3 moves.

The engine ingests CSV the Spark-native way:

* **explicit StructType** (``schemas.py``) → typed columns at the scan,
  predicate/column pushdown, no post-hoc casting;
* **PERMISSIVE + corrupt-record capture** → malformed rows become data
  (a ``_corrupt_record`` column) instead of failing the file; quarantine
  is a row-level filter, not an object-store move (reference S7,
  ``validate_task.py:64-120``);
* **optional-column synthesis** → absent optional columns materialize as
  typed nulls (reference P8, ``transform_task.py:177-186``);
* **multi-path reads** → the reference's per-part file lists
  (``transform_task.py:131``, U1/U2) are a native multi-path scan.

Scale: CSV parsing parallelizes per file-split; quarantine adds one
column and a filter — no extra pass, no shuffle. (Parquet remains the
engine's preferred storage; CSV is the ingestion edge.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
) -> DataFrame:
    """Typed, header-aware, multi-path CSV scan in PERMISSIVE mode with
    corrupt-row capture. The returned frame still contains quarantined
    rows — split them off with :func:`split_quarantine`.

    Implemented as a text scan + ``from_csv`` (JVM-side parse into a
    struct) rather than ``spark.read.csv``: Spark disallows queries that
    reference only the raw CSV scan's internal corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which would
    force caching the scan to count quarantined rows. As a derived
    column the corrupt record is a first-class value — no cache, no
    second pass. Column order must match the schema (Spark's own
    ``enforceSchema`` default behaves the same way).
    """
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    if isinstance(paths, str):
        paths = [paths]
    header = ",".join(f.name for f in schema.fields)
    return (
        spark.read.text(paths)
        .filter((F.col("value") != header) & (F.length("value") > 0))
        .select(
            F.from_csv(
                "value",
                read_schema.simpleString(),
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("r")
        )
        .select("r.*")
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): rows whose raw text failed the schema land in
    the quarantine frame with the original line preserved in a ``reason``
    struct — the reference's ``_reason.json`` sidecar
    (``validate_task.py:101-110``) as data."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    # PERMISSIVE-mode caveat: the corrupt column materializes only when the
    # parsed row is also in the frame — cache-free double-scan is avoided by
    # filtering on the one column.
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.struct(
            F.lit("malformed_row").alias("error"),
            F.col(CORRUPT_COL).alias("raw"),
        ).alias("reason"),
        *[c for c in df.columns if c != CORRUPT_COL],
    )
    return clean, quarantine


def with_optional_columns(
    df: DataFrame, optional: dict[str, T.DataType]
) -> DataFrame:
    """Synthesize absent optional columns as typed nulls (reference P8,
    ``transform_task.py:177-186``) — schema evolution at the read edge."""
    for name, dtype in optional.items():
        if name not in df.columns:
            df = df.withColumn(name, F.lit(None).cast(dtype))
    return df


def read_table(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
    optional: dict[str, T.DataType] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The full ingestion edge for one table: typed scan → quarantine
    split → optional-column synthesis. Returns (clean, quarantine)."""
    clean, quarantine = split_quarantine(read_csv(spark, paths, schema))
    if optional:
        clean = with_optional_columns(clean, optional)
    return clean, quarantine
