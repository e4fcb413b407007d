"""Weight-driven analytics: time-decayed scoring and quality-weighted
Poisson sampling.

Determinism notes (the reason these hash-match a foreign engine):

* decay weights are exact powers of two (``1 / (1 << weeks)``) — every
  per-row product is one IEEE double multiply on identical inputs;
* per-row scores are scaled by 2^20 and FLOORed to BIGINT before the
  distributed sum (associative integer arithmetic — partitioning-
  independent, and immune to the double-vs-decimal rounding divergence
  between engines);
* sampling draws come from the md5 u01 idiom shared with
  ``operators.sampling``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.sampling import weighted_sample
from ..sources.testdata import load_table

# Weekly half-life, capped at 40 weeks (2^-40 ≈ 1e-12 — below money
# resolution; the cap also keeps the shift in BIGINT range).
_DECAY_SQL = """
WITH s AS (
    SELECT o_custkey,
           FLOOR((o_totalprice * (1.0 / (CAST(1 AS BIGINT) <<
               CAST(LEAST(FLOOR(GREATEST(0,
                   date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')) / 7.0),
                   40) AS INT))))
               * 1048576.0)::BIGINT AS scaled
    FROM orders
)
SELECT o_custkey,
       CAST(CAST(SUM(scaled) AS BIGINT) AS DOUBLE) / 1048576.0 AS decayed_revenue
FROM s
GROUP BY o_custkey
ORDER BY decayed_revenue DESC, o_custkey
LIMIT 100
"""


@register("customer_decay_score", _DECAY_SQL)
def q_customer_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 customers by exponentially time-decayed revenue (weekly
    half-life anchored at 1998-12-31) — the recency-weighted customer
    value score behind churn/LTV models, computed map-side + one agg."""
    orders = load_table(spark, sf_dir, "orders")
    days = F.greatest(
        F.lit(0),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ),
    )
    weeks = F.least(F.floor(days / F.lit(7.0)), F.lit(40)).cast("int")
    scored = (
        orders.withColumn("_weeks", weeks)
        .withColumn("_wgt", F.expr("1.0 / shiftleft(CAST(1 AS BIGINT), _weeks)"))
        .withColumn(
            "_scaled",
            F.floor(
                (F.col("o_totalprice") * F.col("_wgt")) * F.lit(1048576.0)
            ).cast("bigint"),
        )
    )
    return (
        scored.groupBy("o_custkey")
        .agg(
            (F.sum("_scaled").cast("double") / F.lit(1048576.0)).alias(
                "decayed_revenue"
            )
        )
        .orderBy(F.desc("decayed_revenue"), "o_custkey")
        .limit(100)
    )


_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE ('0x' || substr(md5('wsamp' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
      < LEAST(GREATEST(n_chars / 256.0, 0.0), 1.0) * 1000000
"""


@register("weighted_sample_quality", _WEIGHTED_SAMPLE_SQL)
def q_weighted_sample_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional Poisson sample of the documents corpus:
    inclusion probability = min(n_chars/256, 1). Map-only, seedless,
    layout-stable — the deterministic form of quality-weighted corpus
    downsampling."""
    docs = load_table(spark, sf_dir, "documents")
    wgt = F.col("n_chars") / F.lit(256.0)
    return weighted_sample(docs, "doc_id", wgt, salt="wsamp").select(
        "doc_id", "lang", "source", "n_chars"
    )
