"""Loaders for the driver-provided testdata and the e-commerce mapping views.

The driver generates deterministic parquet at ``/root/testdata/sf*/``
(TPC-H-ish star schema + ``events``/``documents``/``embeddings``). The
reference engine's native tables (products / orders / order_items) are
derived from them with the FIXTURES.md §B column mapping, so the KPI
operators defined over the reference schemas run unchanged on testdata.

Mapping (FIXTURES.md §B):

* ``orders``      ← orders(o_orderkey→order_id, o_custkey→user_id,
                    o_orderdate→created_at, returned_at derived from
                    ``o_orderstatus = 'F'``)
* ``order_items`` ← lineitem(l_orderkey→order_id, l_partkey→product_id,
                    l_extendedprice→sale_price, l_shipdate→created_at,
                    returned_at derived from ``l_returnflag = 'R'``)
* ``products``    ← part(p_partkey→id, p_name→sku, p_type→category,
                    p_retailprice→retail_price, cost derived)

The return-signal derivations are deterministic row-local expressions so
the DuckDB oracle SQL can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES


def cached_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Row count of a testdata table, read fresh from the parquet footers
    on EVERY invocation — the band/probe POLICY queries need the corpus
    count at plan-build time, and a full Spark count job prices ~0.1-0.3 s
    of scheduler overhead per call for a number the file metadata already
    holds.  Summing ``num_rows`` from the footers is the local stand-in
    for reading table statistics in production; it is a recomputation
    from the inputs each call (no memo), so a changed directory is always
    seen.  Falls back to a Spark count for non-parquet layouts."""
    import os as _os

    root = _os.path.join(str(sf_dir), f"{name}.parquet")
    try:
        import pyarrow.parquet as _pq

        if _os.path.isdir(root):
            files = [
                _os.path.join(dirpath, fn)
                for dirpath, _dirs, fns in _os.walk(root)
                for fn in fns
                if fn.endswith(".parquet")
            ]
        else:
            files = [root]
        return sum(_pq.ParquetFile(f).metadata.num_rows for f in files)
    except (ImportError, OSError):
        return load_table(spark, sf_dir, name).count()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table. Columnar scan with pushdown."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_nanos_ts(df, "ts")
    return df


def _normalize_nanos_ts(df: DataFrame, col: str) -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (instant) — the ONE
    shared helper both the batch loader and ``streaming.pipeline
    .stream_events`` apply, so batch and stream plans stay exact twins at
    the type level (a union/join of their outputs must not mismatch).

    Two source shapes are handled:

    * parquet TIMESTAMP(NANOS), which Spark's reader rejects; with
      ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a long of
      epoch-nanoseconds. Convert via integer division (``div`` keeps
      long arithmetic — a double roundtrip at 1e18 magnitude would lose
      sub-microsecond precision and diverge from the DuckDB oracle's
      truncation).
    * parquet TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false), which
      Spark 4 reads as TIMESTAMP_NTZ. Watermarks (and any batch/stream
      union) require TIMESTAMP; the session timezone is pinned to UTC,
      so the cast preserves wall-clock values.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    dtype = df.schema[col].dataType
    if isinstance(dtype, LongType):
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif isinstance(dtype, TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql``."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def ecommerce_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Project the testdata star schema into the reference's e-commerce
    shapes (products / orders / order_items).

    These are plain column projections + row-local CASE expressions —
    Catalyst collapses them into the parquet scan (column pruning +
    pushdown), so there is no materialization cost.
    """
    orders_raw = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    orders = orders_raw.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("created_at"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_orderdate"))
        .otherwise(F.lit(None))
        .alias("returned_at"),
    )

    order_items = lineitem.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_extendedprice").alias("sale_price"),
        F.col("l_shipdate").alias("created_at"),
        F.when(F.col("l_returnflag") == "R", F.col("l_shipdate"))
        .otherwise(F.lit(None))
        .alias("returned_at"),
    )

    products = part.select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("sku"),
        (F.col("p_retailprice") * F.lit(0.6)).alias("cost"),
        F.col("p_type").alias("category"),
        F.col("p_retailprice").alias("retail_price"),
    )

    return {"orders": orders, "order_items": order_items, "products": products}
