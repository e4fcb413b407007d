"""Distribution-drift detection between two corpus slices.

A training-data pipeline that refreshes continuously needs to know when
a new batch's distribution has moved: two-sample Kolmogorov–Smirnov for
"did it move at all" and Population Stability Index for "which bins
moved". Both are computed from exact integer counts so the DuckDB
oracle hash-matches:

* KS — every per-value CDF is a single integer division (IEEE exact);
  the statistic is a max over those, fully deterministic.
* PSI — each bin term needs ``ln``; terms are quantized to
  ``floor(term · 2^40)`` BIGINTs before summing, the same
  fixed-point idiom the PageRank/BM25 oracles use, so cross-engine
  summation order cannot change the result.

Reference scope note: the reference has no drift stage — this belongs
to the training-data surface layered on top of its KPI semantics.

Scale design: both operators aggregate down to (distinct values ×
2 samples) or (bins × 2) rows before any window/join — the shuffles
carry counts, never rows. KS's ordered-CDF window runs over distinct
values of the metric (bounded by its cardinality, not corpus size);
for a truly continuous metric, pre-bucket to fixed-width bins first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PSI_SCALE = float(2**40)


def ks_two_sample(
    df: DataFrame, value_col: str, sample_col: str, a: str, b: str
) -> DataFrame:
    """Two-sample KS statistic over ``value_col`` between rows where
    ``sample_col`` = ``a`` vs ``b``.

    One row out: (n_a, n_b, ks_stat, ks_at_value) where ``ks_at_value``
    is the smallest value achieving the sup (deterministic tie-break).
    If either sample is empty (label absent from ``sample_col``), the
    statistic does not exist: ``ks_stat``/``ks_at_value`` are NULL (with
    the true n_a/n_b counts); zero rows come back only when BOTH samples
    are empty. Drift gates must treat NULL as "not comparable", never as
    zero drift.
    """
    counts = (
        df.filter(F.col(sample_col).isin([a, b]))
        # missing values carry no distribution information, and engines
        # disagree on NULL sort position (Spark: first; DuckDB: last) —
        # drop them so the CDF walk is well-defined everywhere
        .filter(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(
            F.sum(F.when(F.col(sample_col) == a, 1).otherwise(0))
            .cast("bigint")
            .alias("c_a"),
            F.sum(F.when(F.col(sample_col) == b, 1).otherwise(0))
            .cast("bigint")
            .alias("c_b"),
        )
    )
    totals = counts.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"),
    )
    # two-phase prefix sums over the distinct-value histogram: at corpus
    # scale the distinct-value count can be huge, and a global ordered
    # window would funnel it through ONE task (same fix as the
    # equi-depth histogram — see functions.prefix)
    from ..functions.prefix import two_phase_cumsum

    cdf = (
        two_phase_cumsum(counts, value_col, {"cum_a": "c_a", "cum_b": "c_b"})
        .withColumn("cum_a", F.col("cum_a").cast("bigint"))
        .withColumn("cum_b", F.col("cum_b").cast("bigint"))
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "diff",
            # An empty a- or b-sample has no CDF, so no KS statistic
            # exists: keep diff (→ ks_stat) explicitly NULL rather than
            # letting a /0 produce NaN/Infinity that downstream drift
            # gating would read as a huge-drift signal. Callers must
            # treat a NULL ks_stat as "not comparable".
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.abs(
                    F.col("cum_a").cast("double") / F.col("n_a").cast("double")
                    - F.col("cum_b").cast("double") / F.col("n_b").cast("double")
                ),
            ),
        )
    )
    return (
        cdf.orderBy(F.desc_nulls_last("diff"), F.asc(value_col))
        .limit(1)
        .select(
            "n_a",
            "n_b",
            F.col("diff").alias("ks_stat"),
            F.when(
                F.col("diff").isNotNull(), F.col(value_col).cast("double")
            ).alias("ks_at_value"),
        )
    )


def psi_bins(
    df: DataFrame,
    value_col: str,
    sample_col: str,
    ref: str,
    cur: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index per decile bin.

    Bin edges are exact interpolated quantiles of the REFERENCE sample
    (the convention: score the current batch against the reference's
    binning). Laplace-smoothed shares ``(c+1)/(n+n_bins)`` keep empty
    bins finite. Output: one row per bin with exact counts, shares, the
    quantized PSI term, and the (identical on every row) quantized PSI
    total — sums of BIGINTs, immune to float summation order.
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    v = F.col(value_col).cast("double")
    s = (
        df.filter(F.col(sample_col).isin([ref, cur]))
        .filter(v.isNotNull())  # same NULL rule as ks_two_sample
        .select(v.alias("_v"), F.col(sample_col).alias("_s"))
    )
    edges = s.filter(F.col("_s") == ref).agg(
        F.percentile("_v", F.array(*[F.lit(q) for q in qs])).alias("edges")
    )
    binned = (
        s.crossJoin(F.broadcast(edges))
        # bin = number of edges strictly below the value
        .withColumn(
            "bin",
            F.aggregate(
                "edges",
                F.lit(0),
                lambda acc, e: acc + F.when(F.col("_v") > e, 1).otherwise(0),
            ).cast("bigint"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("_s") == ref, 1).otherwise(0))
            .cast("bigint")
            .alias("c_ref"),
            F.sum(F.when(F.col("_s") == cur, 1).otherwise(0))
            .cast("bigint")
            .alias("c_cur"),
        )
    )
    totals = binned.agg(
        F.sum("c_ref").cast("bigint").alias("n_ref"),
        F.sum("c_cur").cast("bigint").alias("n_cur"),
    )
    k = F.lit(float(n_bins))
    p_ref = (F.col("c_ref") + 1).cast("double") / (F.col("n_ref").cast("double") + k)
    p_cur = (F.col("c_cur") + 1).cast("double") / (F.col("n_cur").cast("double") + k)
    term_q = F.floor((p_cur - p_ref) * F.log(p_cur / p_ref) * F.lit(PSI_SCALE)).cast(
        "bigint"
    )
    per_bin = (
        binned.crossJoin(F.broadcast(totals))
        .withColumn("p_ref", p_ref)
        .withColumn("p_cur", p_cur)
        .withColumn("psi_term_q", term_q)
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per_bin.select(
        "bin",
        "c_ref",
        "c_cur",
        "p_ref",
        "p_cur",
        "psi_term_q",
        F.sum("psi_term_q").over(w_all).cast("bigint").alias("psi_total_q"),
    )


def mix_weights(
    df: DataFrame, domain_col: str, target: dict[str, float] | None = None
) -> DataFrame:
    """Domain-mixture reweighting: per-domain sampling multiplier that
    moves the corpus toward a target mix (uniform by default).

    weight = target_share / observed_share — exact integer counts, two
    IEEE divisions. Feed the result to ``sampling.weighted_sample`` to
    materialize the re-mixed corpus. Map-reduce: one tiny aggregation.
    """
    counts = df.groupBy(domain_col).agg(F.count("*").cast("bigint").alias("n_docs"))
    total = counts.agg(
        F.sum("n_docs").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("n_domains"),
    )
    out = counts.crossJoin(F.broadcast(total)).withColumn(
        "share", F.col("n_docs").cast("double") / F.col("n_total").cast("double")
    )
    if target is None:
        tgt = F.lit(1.0) / F.col("n_domains").cast("double")
    else:
        expr = None
        for name, share in target.items():
            expr = (
                F.when(F.col(domain_col) == name, F.lit(share))
                if expr is None
                else expr.when(F.col(domain_col) == name, F.lit(share))
            )
        tgt = expr.otherwise(F.lit(0.0))
    return out.select(
        domain_col,
        "n_docs",
        "share",
        tgt.alias("target_share"),
        (tgt / F.col("share")).alias("weight"),
    )
