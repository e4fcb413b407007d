"""Count-min-sketch queries (fixed-memory frequency estimation).

The md5 bucket hashing makes the whole sketch engine-portable: the
oracle rebuilds bucket counts AND estimates exactly, so the comparison
hash-checks the sketch itself — overcounts included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.sketch import cms_estimate, cms_sketch
from ..sources.testdata import load_table

_DEPTH = 4
_WIDTH = 1024
_TOP = 20

_B = "('0x' || substr(md5(j || ':' || k), 1, 15))::BIGINT % {w}"

_CMS_SQL = f"""
WITH keyed AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
d AS (SELECT unnest(range(0, {_DEPTH})) AS j),
sketch AS (
    SELECT j, {_B.format(w=_WIDTH)} AS bucket, COUNT(*) AS c
    FROM keyed CROSS JOIN d
    GROUP BY 1, 2
),
exact AS (SELECT k, COUNT(*) AS c FROM keyed GROUP BY 1),
top AS (
    SELECT k, c FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY c DESC, k) AS rn FROM exact
    ) WHERE rn <= {_TOP}
),
est AS (
    SELECT t.k, MIN(s.c) AS cms_est
    FROM top t CROSS JOIN d
    JOIN sketch s
      ON s.j = d.j
     AND s.bucket = ('0x' || substr(md5(d.j || ':' || t.k), 1, 15))::BIGINT
                    % {_WIDTH}
    GROUP BY t.k
)
SELECT CAST(t.k AS BIGINT) AS part_key,
       CAST(t.c AS BIGINT) AS exact_cnt,
       CAST(e.cms_est AS BIGINT) AS cms_est,
       CAST(e.cms_est - t.c AS BIGINT) AS overcount
FROM top t JOIN est e USING (k)
"""


@register("cms_heavy_hitters", _CMS_SQL)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters through a count-min sketch: exact top-20 keys (the
    verification anchor) joined with their sketch estimates — the
    overcount column IS the sketch's collision error, hash-checked. At
    scale only the sketch pass runs; the exact side here exists to gate
    the estimates."""
    li = load_table(spark, sf_dir, "lineitem")
    sketch = cms_sketch(li, "l_partkey", depth=_DEPTH, width=_WIDTH)
    exact = (
        li.select(F.col("l_partkey").cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("k")).limit(_TOP)
    est = cms_estimate(
        sketch, top.select("k"), "k", depth=_DEPTH, width=_WIDTH
    )
    return (
        top.join(est, "k")
        .select(
            F.col("k").cast("bigint").alias("part_key"),
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") - F.col("exact_cnt")).cast("bigint")
            .alias("overcount"),
        )
    )


_JOIN_SIZE_SQL = f"""
WITH d AS (SELECT unnest(range(0, {_DEPTH})) AS j),
ka AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
kb AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders),
sa AS (
    SELECT j, ('0x' || substr(md5(j || ':' || k), 1, 15))::BIGINT % {_WIDTH}
               AS bucket, COUNT(*) AS c
    FROM ka CROSS JOIN d GROUP BY 1, 2
),
sb AS (
    SELECT j, ('0x' || substr(md5(j || ':' || k), 1, 15))::BIGINT % {_WIDTH}
               AS bucket, COUNT(*) AS c
    FROM kb CROSS JOIN d GROUP BY 1, 2
),
dots AS (
    SELECT sa.j, SUM(sa.c * sb.c) AS dot
    FROM sa JOIN sb ON sa.j = sb.j AND sa.bucket = sb.bucket
    GROUP BY sa.j
),
actual AS (
    SELECT COUNT(*) AS true_join_size
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT CAST(MIN(d2.dot) AS BIGINT) AS est_join_size,
       CAST(a.true_join_size AS BIGINT) AS true_join_size,
       MIN(d2.dot) >= a.true_join_size AS is_upper_bound
FROM dots d2 CROSS JOIN actual a
GROUP BY a.true_join_size
"""


@register("cms_join_size_estimate", _JOIN_SIZE_SQL)
def q_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from two key sketches (the optimizer
    use case: size |lineitem ⨝ orders| from depth×width integers without
    touching either table). CMS dot products only over-count, so the
    estimate is a certified upper bound — asserted in the output and
    hash-checked against the oracle's identical sketch."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    from ..operators.sketch import cms_join_size

    sa = cms_sketch(li, "l_orderkey", depth=_DEPTH, width=_WIDTH)
    sb = cms_sketch(o, "o_orderkey", depth=_DEPTH, width=_WIDTH)
    est = cms_join_size(sa, sb)
    actual = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .agg(F.count(F.lit(1)).alias("true_join_size"))
    )
    return (
        est.crossJoin(F.broadcast(actual))
        .select(
            F.col("est_join_size").cast("bigint").alias("est_join_size"),
            F.col("true_join_size").cast("bigint").alias("true_join_size"),
            (F.col("est_join_size") >= F.col("true_join_size"))
            .alias("is_upper_bound"),
        )
    )
