"""Advanced relational breadth: explicit window frames, ordered-set /
arg-extrema aggregates, and array-column functions.

Fills the SURVEY §7.2 M6 corners not covered by ``relational.py``:

* window *frames* (ROWS BETWEEN moving windows, unbounded first/last,
  distribution functions percent_rank / cume_dist);
* ``min_by``/``max_by`` (arg-extrema), ``median``, ``bool_and`` /
  ``bool_or``, ``count_if``;
* array functions over the ``embeddings.embedding`` column
  (slice / transform / aggregate / size) — the column-level toolkit the
  similarity operators build on, verified standalone.

Determinism: window orderings are total (unique tie-break key); frame
sums route through DECIMAL; arg-extrema order by a *unique* string key so
ties cannot occur; array math integer-izes (floor(x·1000)) before
summing so the fold order cannot matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.numeric import MONEY
from ..sources.testdata import load_table

# ---------------------------------------------------------------------------
# Window frames
# ---------------------------------------------------------------------------

_FRAMES_SQL = """
SELECT CAST(o_orderkey AS BIGINT) AS order_key,
       o_orderpriority AS priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w3 AS DOUBLE) AS moving_sum_3,
       CAST(FIRST_VALUE(o_orderkey) OVER wall AS BIGINT) AS first_key,
       CAST(LAST_VALUE(o_orderkey) OVER wall AS BIGINT) AS last_key,
       PERCENT_RANK() OVER wp AS pct_rank,
       CUME_DIST() OVER wp AS cume,
       CAST(ROW_NUMBER() OVER wp AS BIGINT) AS rn
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-02-01'
WINDOW
  w3 AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
  wall AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
  wp AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
"""


@register("window_frames", _FRAMES_SQL)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit frame specifications: a 3-row moving sum, whole-partition
    first/last value, and the distribution functions. All orderings carry
    the unique o_orderkey tie-break so frames are total orders."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-02-01")
    )
    w3 = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    wall = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    wp = W.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return orders.select(
        F.col("o_orderkey").cast("bigint").alias("order_key"),
        F.col("o_orderpriority").alias("priority"),
        F.sum(F.col("o_totalprice").cast(MONEY)).over(w3).cast("double").alias("moving_sum_3"),
        F.first("o_orderkey").over(wall).cast("bigint").alias("first_key"),
        F.last("o_orderkey").over(wall).cast("bigint").alias("last_key"),
        F.percent_rank().over(wp).alias("pct_rank"),
        F.cume_dist().over(wp).alias("cume"),
        F.row_number().over(wp).cast("bigint").alias("rn"),
    )


# ---------------------------------------------------------------------------
# Arg-extrema / ordered-set / boolean aggregates
# ---------------------------------------------------------------------------

_AGG_EXT_SQL = """
SELECT o_orderpriority AS priority,
       CAST(ARG_MIN(o_orderkey, strftime(o_orderdate, '%Y-%m-%d') || '-' ||
                    lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS BIGINT)
         AS earliest_order,
       CAST(ARG_MAX(o_orderkey, strftime(o_orderdate, '%Y-%m-%d') || '-' ||
                    lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS BIGINT)
         AS latest_order,
       MEDIAN(o_totalprice) AS median_price,
       BOOL_AND(o_totalprice > 0) AS all_positive,
       BOOL_OR(o_orderstatus = 'F') AS any_fulfilled,
       CAST(COUNT_IF(o_orderstatus = 'O') AS BIGINT) AS n_open
FROM orders
GROUP BY 1
"""


@register("agg_extended", _AGG_EXT_SQL)
def q_agg_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by ordered by a *unique* date+key string (ties are
    impossible, so arg-extrema are well-defined across engines), plus
    median, bool_and/bool_or, count_if."""
    orders = load_table(spark, sf_dir, "orders")
    ord_key = F.concat(
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.lit("-"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    return orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.min_by("o_orderkey", ord_key).cast("bigint").alias("earliest_order"),
        F.max_by("o_orderkey", ord_key).cast("bigint").alias("latest_order"),
        F.median("o_totalprice").alias("median_price"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_fulfilled"),
        F.count_if(F.col("o_orderstatus") == "O").cast("bigint").alias("n_open"),
    )


# ---------------------------------------------------------------------------
# Array functions over embeddings
# ---------------------------------------------------------------------------

_ARRAY_SQL = """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       CAST(len(embedding) AS BIGINT) AS dims,
       CAST(list_sum(list_transform(embedding[1:8],
              x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT)
         AS head_millis_sum,
       CAST(list_max(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))) AS DOUBLE)
         AS head_max,
       CAST(list_count(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
FROM embeddings
"""


@register("scalar_array_funcs", _ARRAY_SQL)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array slice / transform / aggregate / filter over the embedding
    column — all JVM-side higher-order functions, no UDF. Float math is
    integer-ized (floor(x·1000)) before summation so fold order cannot
    produce ulp drift against the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    head = F.slice("embedding", 1, 8)
    return emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.size("embedding").cast("bigint").alias("dims"),
        F.aggregate(
            head,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.floor(x.cast("double") * 1000).cast("bigint"),
        ).alias("head_millis_sum"),
        F.array_max(F.transform(head, lambda x: x.cast("double"))).alias("head_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )
