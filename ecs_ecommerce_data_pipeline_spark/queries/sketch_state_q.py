"""Mergeable HLL sketch state — the approximate counterpart of
``incremental_agg.distinct_member_state``.

Exact countDistinct state grows with the membership; a DataSketches HLL
sketch is FIXED-SIZE per group and still mergeable (``hll_union_agg``),
so at 100 TB the per-day unique-customer state is KBs instead of the
distinct user set. Batches build sketches independently; merging is an
associative union — same O(state + batch) maintenance as the exact
path, with the published ±rsd error.

Gate: like the ``approx_*`` sketch queries, the engine emits the exact
count (to anchor the oracle) plus a boolean asserting the merged
estimate lies within 3σ of it — DuckDB's oracle reproduces the exact
count and expects TRUE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.output import iso_temporal
from ..sources.testdata import load_table

# lgConfigK=12 → rsd ≈ 1.04/√4096 ≈ 1.63%; 3σ bound below.
_LG_K = 12
_BOUND = 3.0 * 1.04 / 64.0

_HLL_MERGE_SQL = """
SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS date_key,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       TRUE AS within_bounds
FROM orders
GROUP BY 1
"""


@register("hll_distinct_merge", _HLL_MERGE_SQL)
def q_hll_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day unique customers via 3-batch HLL sketch states merged
    with ``hll_union_agg`` — estimate must stay within 3σ of exact."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "date_key", F.to_date("o_orderdate")
    )
    states = [
        orders.filter(F.col("o_orderkey") % 3 == b)
        .groupBy("date_key")
        .agg(F.hll_sketch_agg("o_custkey", F.lit(_LG_K)).alias("sk"))
        for b in range(3)
    ]
    merged = (
        states[0]
        .unionByName(states[1])
        .unionByName(states[2])
        .groupBy("date_key")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    exact = orders.groupBy("date_key").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    out = exact.join(merged, "date_key").select(
        "date_key",
        "exact_customers",
        (
            F.abs(F.col("est") - F.col("exact_customers"))
            <= F.greatest(
                F.lit(_BOUND) * F.col("exact_customers"), F.lit(1.0)
            )
        ).alias("within_bounds"),
    )
    return iso_temporal(out)


# --- mergeable binned-quantile state ---------------------------------------

_QB_QS = [0.25, 0.5, 0.75, 0.9]
_QB_BINS = 64

_QB_SQL = f"""
WITH vals AS (
    SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
    WHERE o_totalprice IS NOT NULL
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY v),
cdf AS (
    SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM c
),
qs AS (SELECT unnest([{", ".join(repr(q) for q in _QB_QS)}]) AS q)
SELECT q.q AS q, MIN(cdf.v) AS exact_value, TRUE AS within_bounds
FROM qs q, n, cdf
WHERE cdf.cum >= CAST(CEIL(q.q * n.n) AS BIGINT)
GROUP BY q.q
"""


@register("quantile_bins_merge", _QB_SQL)
def q_quantile_bins_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental percentile maintenance: three batches each reduce to
    a ≤64-row equal-width bin-count state, states merge by count sum
    (associative — any batch grouping lands the same histogram), and
    quantiles interpolate from the merged bins. The gate emits the
    EXACT discrete percentile (order statistic at rank ceil(q·N),
    oracle-anchored) plus a boolean asserting the merged-state estimate
    sits within one bin width of it.

    Scale shape: per-batch state is O(n_bins) BIGINTs regardless of
    batch size; the exact anchor runs the same two-phase prefix sum the
    KS statistic uses (no corpus-sized ordered window anywhere)."""
    from ..functions.prefix import two_phase_cumsum
    from ..operators.sketch import quantile_from_bins, quantile_value_stats

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("v")
    )
    # round 11 (guide §1.2/§2.4): the (vmin, vmax) frame feeds the batch
    # states, the bin interpolation AND the bound — checkpoint it once
    # instead of re-aggregating the corpus per consumer
    stats = quantile_value_stats(orders, "v").localCheckpoint(eager=False)
    # the three per-batch states are built in ONE corpus pass keyed by
    # batch id (was: three separate filtered scans) — each (b, bin, c)
    # group IS the independent batch state ``quantile_bin_state`` built,
    # and the merge below is the same associative count sum
    vq = F.col("v").cast("double")
    width = (F.col("_qvmax") - F.col("_qvmin")) / F.lit(float(_QB_BINS))
    bin_id = F.when(F.col("_qvmax") == F.col("_qvmin"), F.lit(0)).otherwise(
        F.least(
            F.lit(_QB_BINS - 1),
            F.floor((vq - F.col("_qvmin")) / width).cast("int"),
        )
    )
    states = (
        orders.filter(vq.isNotNull())
        .crossJoin(F.broadcast(stats))
        .select((F.col("o_orderkey") % 3).alias("b"), bin_id.alias("bin"))
        .groupBy("b", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    merged = (
        states.groupBy("bin")
        .agg(F.sum("c").cast("bigint").alias("c"))
        # feeds both the cumulative walk and the total inside
        # quantile_from_bins — cut the (≤ n_bins)-row frame once
        .localCheckpoint(eager=False)
    )
    est = quantile_from_bins(merged, stats, _QB_QS, _QB_BINS)

    counts = (
        orders.filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        # feeds the exact-anchor total AND the two-phase prefix sum
        .localCheckpoint(eager=False)
    )
    totals = counts.agg(F.sum("c").cast("bigint").alias("_qn"))
    cdf = two_phase_cumsum(counts, "v", {"cum": "c"}).withColumn(
        "cum", F.col("cum").cast("bigint")
    )
    qdf = spark.createDataFrame([(q,) for q in _QB_QS], "q double")
    exact = (
        cdf.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(qdf))
        .filter(
            F.col("cum")
            >= F.ceil(F.col("q") * F.col("_qn")).cast("bigint")
        )
        .groupBy("q")
        .agg(F.min("v").alias("exact_value"))
    )
    bound = (
        (F.col("_qvmax") - F.col("_qvmin")) / F.lit(float(_QB_BINS))
    ) * F.lit(1.0 + 1e-9)
    return (
        exact.join(est, "q")
        .crossJoin(F.broadcast(stats))
        .select(
            "q",
            "exact_value",
            (F.abs(F.col("est") - F.col("exact_value")) <= bound).alias(
                "within_bounds"
            ),
        )
    )


# --- per-group mergeable quantile state ------------------------------------

_QBG_Q = 0.5

_QBG_SQL = f"""
WITH vals AS (
    SELECT o_orderpriority AS grp, CAST(o_totalprice AS DOUBLE) AS v
    FROM orders WHERE o_totalprice IS NOT NULL
),
n AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n FROM vals GROUP BY grp),
c AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY grp, v),
cdf AS (
    SELECT grp, v,
           CAST(SUM(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum
    FROM c
)
SELECT d.grp AS grp, MIN(d.v) AS exact_median, TRUE AS within_bounds
FROM cdf d JOIN n USING (grp)
WHERE d.cum >= CAST(CEIL({_QBG_Q!r} * n.n) AS BIGINT)
GROUP BY d.grp
"""


@register("quantile_bins_merge_by_group", _QBG_SQL)
def q_quantile_bins_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP incremental percentile maintenance: the keyed variant
    of ``quantile_bins_merge`` — each order-priority group keeps its own
    ≤64-row bin-count state (shared global (vmin, vmax) frame, so merge
    stays a blind count sum on (grp, bin)), batches merge associatively,
    and the per-group median estimate is gated within one bin width of
    each group's exact order statistic.

    Scale shape: state is O(groups × n_bins) regardless of batch size;
    the per-group CDF walk on the estimate side runs over ≤n_bins rows
    per group (bounded window); the exact anchor's ordered window is
    PARTITIONED by group — no single-task global sort."""
    from pyspark.sql import Window

    from ..operators.sketch import quantile_value_stats

    n_bins = 64
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("v"),
    ).filter(F.col("v").isNotNull())
    stats = quantile_value_stats(orders, "v")

    width = (F.col("_qvmax") - F.col("_qvmin")) / F.lit(float(n_bins))
    bin_id = F.when(F.col("_qvmax") == F.col("_qvmin"), F.lit(0)).otherwise(
        F.least(F.lit(n_bins - 1), F.floor((F.col("v") - F.col("_qvmin")) / width).cast("int"))
    )
    # three batch states, merged by blind count sum on (grp, bin)
    states = [
        orders.filter(F.col("k") % 3 == b)
        .crossJoin(F.broadcast(stats))
        .select(F.col("grp"), bin_id.alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        for b in range(3)
    ]
    merged = (
        states[0].unionByName(states[1]).unionByName(states[2])
        .groupBy("grp", "bin")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    wg = Window.partitionBy("grp").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    totals = merged.groupBy("grp").agg(F.sum("c").cast("bigint").alias("_qn"))
    cum = (
        merged.withColumn("cum", F.sum("c").over(wg))
        .withColumn("cum_prev", F.col("cum") - F.col("c"))
        .join(totals, "grp")
        .crossJoin(F.broadcast(stats))
    )
    target = F.ceil(F.lit(_QBG_Q) * F.col("_qn")).cast("bigint")
    est = cum.filter((F.col("cum") >= target) & (F.col("cum_prev") < target)).select(
        "grp",
        (
            F.col("_qvmin")
            + width
            * (
                F.col("bin").cast("double")
                + (target - F.col("cum_prev")).cast("double")
                / F.col("c").cast("double")
            )
        ).alias("est"),
    )
    # exact per-group order statistic: group-partitioned ordered window
    counts = orders.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wv = Window.partitionBy("grp").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    gn = counts.groupBy("grp").agg(F.sum("c").cast("bigint").alias("_gn"))
    cdf = counts.withColumn("cum", F.sum("c").over(wv)).join(gn, "grp")
    exact = (
        cdf.filter(
            F.col("cum") >= F.ceil(F.lit(_QBG_Q) * F.col("_gn")).cast("bigint")
        )
        .groupBy("grp")
        .agg(F.min("v").alias("exact_median"))
    )
    bound = (
        (F.col("_qvmax") - F.col("_qvmin")) / F.lit(float(n_bins))
    ) * F.lit(1.0 + 1e-9)
    return (
        exact.join(est, "grp")
        .crossJoin(F.broadcast(stats))
        .select(
            "grp",
            "exact_median",
            (F.abs(F.col("est") - F.col("exact_median")) <= bound).alias(
                "within_bounds"
            ),
        )
    )


# --- HLL set algebra: audience overlap via inclusion-exclusion -------------

# overlap tolerance: inclusion-exclusion compounds three +-1.63%-rsd
# estimates, each scaled by its own set size; 5 sigma on the UNION size
# is a comfortably loose but still meaningful gate
_OVL_BOUND = 5.0 * 1.04 / 64.0

_HLL_OVERLAP_SQL = """
WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
u AS (SELECT user_id FROM v UNION SELECT user_id FROM p),
i AS (SELECT user_id FROM v INTERSECT SELECT user_id FROM p)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS exact_view,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS exact_purchase,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS exact_union,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM i) AS exact_overlap,
       TRUE AS within_bounds
"""


@register("hll_overlap_event_types", _HLL_OVERLAP_SQL)
def q_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation by HLL set algebra: |view ∩ purchase|
    ≈ |A| + |B| − |A ∪ B| with all three terms from mergeable sketches
    (the union via ``hll_union_agg`` of the two per-type sketches —
    never a re-scan of raw ids).  The 100 TB story: cross-segment
    overlap matrices from KB-sized pre-aggregated sketch states instead
    of distinct-id joins.  Engine emits the exact counts (anchoring the
    oracle) plus a gate that the estimate lands within 5σ of exact."""
    e = load_table(spark, sf_dir, "events")
    sk = (
        e.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(_LG_K)).alias("sk"))
    )
    ests = sk.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est"), "sk"
    )
    union_est = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union")
    )
    wide = (
        ests.groupBy()
        .pivot("event_type", ["view", "purchase"])
        .agg(F.first("est"))
        .crossJoin(F.broadcast(union_est))
        .select(
            F.col("view").alias("est_view"),
            F.col("purchase").alias("est_purchase"),
            "est_union",
            (F.col("view") + F.col("purchase") - F.col("est_union")).alias(
                "est_overlap"
            ),
        )
    )
    v = e.filter(F.col("event_type") == "view").select("user_id").distinct()
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    exact = (
        v.agg(F.count(F.lit(1)).cast("bigint").alias("exact_view"))
        .crossJoin(
            p.agg(F.count(F.lit(1)).cast("bigint").alias("exact_purchase"))
        )
        .crossJoin(
            v.unionByName(p)
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("exact_union"))
        )
        .crossJoin(
            v.intersect(p).agg(
                F.count(F.lit(1)).cast("bigint").alias("exact_overlap")
            )
        )
    )
    return F.broadcast(exact).crossJoin(F.broadcast(wide)).select(
        "exact_view",
        "exact_purchase",
        "exact_union",
        "exact_overlap",
        (
            F.abs(F.col("est_overlap") - F.col("exact_overlap"))
            <= F.greatest(
                F.lit(_OVL_BOUND) * F.col("exact_union"), F.lit(2.0)
            )
        ).alias("within_bounds"),
    )
