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


# --- Bloom filter membership audit -----------------------------------------

_BF_K = 4
_BF_M = 65536

_BLOOM_SQL = f"""
WITH members AS (SELECT DISTINCT o_custkey AS key FROM orders),
mx AS (SELECT MAX(key) AS maxk FROM members),
probes AS (
    SELECT c_custkey AS key FROM customer
    UNION ALL
    SELECT c_custkey + (SELECT maxk FROM mx) + 1 AS key FROM customer
),
hashes AS (SELECT unnest(range(0, {_BF_K})) AS i),
bits AS (
    SELECT DISTINCT
        ('0x' || substr(md5('bf' || CAST(i AS VARCHAR) || ':'
                             || CAST(key AS VARCHAR)), 1, 15))::BIGINT
            % {_BF_M} AS pos
    FROM members CROSS JOIN hashes
),
ppos AS (
    SELECT key,
        ('0x' || substr(md5('bf' || CAST(i AS VARCHAR) || ':'
                             || CAST(key AS VARCHAR)), 1, 15))::BIGINT
            % {_BF_M} AS pos
    FROM probes CROSS JOIN hashes
),
hits AS (
    SELECT p.key, COUNT(b.pos) = {_BF_K} AS predicted
    FROM ppos p LEFT JOIN bits b ON b.pos = p.pos
    GROUP BY p.key
),
labeled AS (
    SELECT h.key, h.predicted, m.key IS NOT NULL AS is_member
    FROM hits h LEFT JOIN members m ON m.key = h.key
)
SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM members) AS n_members,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
    CAST(COUNT(*) AS BIGINT) AS n_probes,
    CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
        AS n_true_members,
    CAST(SUM(CASE WHEN predicted THEN 1 ELSE 0 END) AS BIGINT)
        AS n_pred_positive,
    CAST(SUM(CASE WHEN predicted AND NOT is_member THEN 1 ELSE 0 END)
        AS BIGINT) AS n_false_positive,
    CAST(SUM(CASE WHEN is_member AND NOT predicted THEN 1 ELSE 0 END)
        AS BIGINT) AS n_false_negative,
    CAST(FLOOR(1000000.0 * SUM(CASE WHEN predicted AND NOT is_member
                                    THEN 1 ELSE 0 END)
               / GREATEST(1, COUNT(*) - SUM(CASE WHEN is_member
                                                 THEN 1 ELSE 0 END)))
        AS BIGINT) AS fpr_ppm
FROM labeled
"""


@register("bloom_membership", _BLOOM_SQL)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audit: build a 65536-bit / k=4 filter over
    the custkeys that placed orders, probe it with a half-member /
    half-guaranteed-non-member key set (customer keys, plus the same
    keys shifted past the max member key), and report the confusion
    counts + measured false-positive rate.

    The load-bearing invariant — a Bloom filter NEVER false-negatives —
    is an output column (``n_false_negative``, pinned 0 by test and by
    the oracle hash); the FPR quantifies what m bits of state buy at
    this fill ratio, the same audit-the-approximation pattern as the
    LSH/IVF recall gates.

    Scale shape: filter state is ≤ m rows whatever the member
    cardinality (the sketch property); the bit table and the 1-row
    bounds broadcast; probe keys explode ×k and aggregate on their own
    key, map-side combinable. The exact-membership join used to LABEL
    probes is the audit harness, not the operator — production callers
    keep only the bit table.
    """
    from ..operators.sketch import bloom_bits, bloom_probe

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    members = orders.select(F.col("o_custkey").alias("key")).distinct()
    mx = members.agg(F.max("key").alias("maxk"))
    ckeys = cust.select(F.col("c_custkey").alias("key"))
    shifted = ckeys.crossJoin(F.broadcast(mx)).select(
        (F.col("key") + F.col("maxk") + 1).alias("key")
    )
    probes = ckeys.unionAll(shifted)

    bits = bloom_bits(members, "key", k=_BF_K, m=_BF_M)
    pred = bloom_probe(bits, probes, "key", k=_BF_K, m=_BF_M)
    labeled = pred.join(
        F.broadcast(members.withColumn("_m", F.lit(1))), "key", "left"
    ).select(
        "key",
        F.col("bloom_member").alias("predicted_"),
        F.col("_m").isNotNull().alias("is_member"),
    )

    n_members = members.agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    n_bits = bits.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    fp = F.sum(
        F.when(F.col("predicted_") & ~F.col("is_member"), 1).otherwise(0)
    ).cast("bigint")
    neg = F.count(F.lit(1)) - F.sum(
        F.when(F.col("is_member"), 1).otherwise(0)
    )
    summary = labeled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true_members"),
        F.sum(F.when(F.col("predicted_"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pred_positive"),
        fp.alias("n_false_positive"),
        F.sum(
            F.when(F.col("is_member") & ~F.col("predicted_"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_false_negative"),
        F.floor(
            1000000.0 * fp / F.greatest(F.lit(1).cast("bigint"), neg)
        )
        .cast("bigint")
        .alias("fpr_ppm"),
    )
    return (
        summary.crossJoin(F.broadcast(n_members))
        .crossJoin(F.broadcast(n_bits))
        .select(
            "n_members", "n_bits_set", "n_probes", "n_true_members",
            "n_pred_positive", "n_false_positive", "n_false_negative",
            "fpr_ppm",
        )
    )


# --- CMS week-over-week trend shift ----------------------------------------

_TREND_SPLIT = 15  # day boundary between the two comparison windows
_TREND_TOP = 20

_TREND_SQL = f"""
WITH d AS (SELECT unnest(range(0, {_DEPTH})) AS j),
ka AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events
       WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
             < {_TREND_SPLIT}),
kb AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events
       WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
             >= {_TREND_SPLIT}),
sa AS (
    SELECT j, {_B.format(w=_WIDTH)} AS bucket, COUNT(*) AS c
    FROM ka CROSS JOIN d GROUP BY 1, 2
),
sb AS (
    SELECT j, {_B.format(w=_WIDTH)} AS bucket, COUNT(*) AS c
    FROM kb CROSS JOIN d GROUP BY 1, 2
),
probe AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events),
ea AS (
    SELECT p.k, MIN(COALESCE(sa.c, 0)) AS est
    FROM probe p CROSS JOIN d
    LEFT JOIN sa ON sa.j = d.j
       AND sa.bucket = ('0x' || substr(md5(d.j || ':' || p.k), 1, 15))::BIGINT
                       % {_WIDTH}
    GROUP BY p.k
),
eb AS (
    SELECT p.k, MIN(COALESCE(sb.c, 0)) AS est
    FROM probe p CROSS JOIN d
    LEFT JOIN sb ON sb.j = d.j
       AND sb.bucket = ('0x' || substr(md5(d.j || ':' || p.k), 1, 15))::BIGINT
                       % {_WIDTH}
    GROUP BY p.k
)
SELECT CAST(ea.k AS BIGINT) AS user_id,
       CAST(ea.est AS BIGINT) AS est_first,
       CAST(eb.est AS BIGINT) AS est_second,
       CAST(eb.est - ea.est AS BIGINT) AS delta
FROM ea JOIN eb ON ea.k = eb.k
ORDER BY delta DESC, user_id
LIMIT {_TREND_TOP}
"""


@register("cms_trend_shift", _TREND_SQL)
def q_cms_trend_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week trend detection from two count-min sketches: one
    sketch per comparison window (first 15 days vs the rest), top
    risers by estimated frequency delta — the "what's suddenly hot"
    monitor that never shuffles raw keys: each window's state is
    depth×width integers however large the stream, the two sketches
    subtract bucket-wise, and at 100 TB yesterday's sketch is read back
    from storage instead of recomputed (they're mergeable across time —
    ``cms_join_size``'s note).

    The probe set here is every distinct key (bounded: users), so the
    estimate join is hash-checked for ALL keys; a production monitor
    probes only current-window heavy hitters."""
    e = load_table(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
    first = e.filter(day < _TREND_SPLIT)
    second = e.filter(day >= _TREND_SPLIT)
    sa = cms_sketch(first, "user_id", depth=_DEPTH, width=_WIDTH)
    sb = cms_sketch(second, "user_id", depth=_DEPTH, width=_WIDTH)
    probe = e.select(F.col("user_id").cast("string").alias("k")).distinct()
    ea = cms_estimate(sa, probe, "k", depth=_DEPTH, width=_WIDTH).select(
        "k", F.col("cms_est").alias("est_first")
    )
    eb = cms_estimate(sb, probe, "k", depth=_DEPTH, width=_WIDTH).select(
        "k", F.col("cms_est").alias("est_second")
    )
    return (
        ea.join(eb, "k")
        .select(
            F.col("k").cast("bigint").alias("user_id"),
            F.col("est_first").cast("bigint").alias("est_first"),
            F.col("est_second").cast("bigint").alias("est_second"),
            (F.col("est_second") - F.col("est_first"))
            .cast("bigint")
            .alias("delta"),
        )
        .orderBy(F.desc("delta"), "user_id")
        .limit(_TREND_TOP)
    )
