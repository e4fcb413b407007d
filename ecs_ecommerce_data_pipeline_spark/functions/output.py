"""Output-boundary canonicalization.

Date/timestamp values survive engine→pandas→hash round-trips differently
(Spark DATE → ``datetime.date``; DuckDB DATE → ``datetime64[ns]``), which
makes value-hash comparison fragile even when the logical values are
identical. Catalog queries therefore emit temporal columns as ISO strings
— mirroring the reference sink, which stringifies ``date_key`` before the
DynamoDB write (reference ``ecs/transformation/transform_task.py:299,333``).

Oracle-SQL equivalents: ``strftime(d, '%Y-%m-%d')`` for dates,
``strftime(ts, '%Y-%m-%d %H:%M:%S')`` for second-resolution timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def iso_temporal(df: DataFrame) -> DataFrame:
    """Cast every DATE column to 'yyyy-MM-dd' and every TIMESTAMP column to
    'yyyy-MM-dd HH:mm:ss' strings (second resolution)."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, T.DateType):
            out = out.withColumn(f.name, F.date_format(F.col(f.name), "yyyy-MM-dd"))
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            out = out.withColumn(
                f.name, F.date_format(F.col(f.name), "yyyy-MM-dd HH:mm:ss")
            )
    return out
