"""Statistical-moment aggregates with cross-engine determinism.

Native ``stddev``/``corr`` stream doubles through Welford-style updates,
so Spark and DuckDB (and two different partitionings of the same Spark
job!) disagree in the last ulps. Here every sufficient statistic
(Σx, Σx², Σxy) is an EXACT decimal sum — associative, partitioning-
independent — and the moment formulas are evaluated once, in double, from
those exact inputs: bit-identical everywhere.

At 100 TB this is also the right shape: the decimal sums are one
map-side-combinable aggregation; no second pass, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources.testdata import load_table

_D = "decimal(18,4)"


def _moments(df: DataFrame, group: str, x: str, y: str) -> DataFrame:
    xd = F.col(x).cast(_D)
    yd = F.col(y).cast(_D)
    agg = df.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd).alias("sy"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_x = (sxx - sx * sx / n) / (n - F.lit(1.0))
    var_y = (syy - sy * sy / n) / (n - F.lit(1.0))
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        group,
        F.col("n").cast("bigint").alias("n"),
        (sx / n).alias("mean_x"),
        var_x.alias("var_x"),
        F.sqrt(var_x).alias("stddev_x"),
        (sy / n).alias("mean_y"),
        var_y.alias("var_y"),
        corr.alias("corr_xy"),
    )


_MOMENTS_SQL = """
WITH s AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
           SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(20,4))) AS sxx,
           SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
           SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_extendedprice AS DECIMAL(20,4))) AS syy,
           SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_extendedprice AS DECIMAL(20,4))) AS sxy
    FROM lineitem
    GROUP BY l_returnflag
)
-- NOTE: decimal→double goes through VARCHAR: DuckDB's direct cast rounds
-- twice (int128→double, then ÷10^scale) and can be off by one ulp from
-- Java BigDecimal's correctly-rounded conversion; strtod is correctly
-- rounded and matches Spark exactly.
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
       (CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0) AS var_x,
       sqrt((CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0)) AS stddev_x,
       CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
       (CAST(CAST(syy AS VARCHAR) AS DOUBLE) - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) - 1.0) AS var_y,
       (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE) - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
           AS corr_xy
FROM s
"""


@register("stats_moments", _MOMENTS_SQL)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / variance / stddev / correlation of (l_quantity,
    l_extendedprice) per return flag — exact-decimal sufficient
    statistics, single aggregation pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return _moments(li, "l_returnflag", "l_quantity", "l_extendedprice")


_QUANTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25_quantity,
       quantile_cont(l_quantity, 0.5)  AS median_quantity,
       quantile_cont(l_quantity, 0.75) AS q75_quantity,
       quantile_cont(l_extendedprice, 0.9) AS p90_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("stats_quantiles_exact", _QUANTILES_SQL)
def q_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per return flag.

    Bit-identical across engines: both Spark ``percentile`` and DuckDB
    ``quantile_cont`` compute lo + (hi−lo)·frac at rank (n−1)·q, and for
    q ∈ {.25, .5, .75, .9} every intermediate is exactly representable
    ⇒ identical doubles.

    Scale note: exact percentile materializes each group's values (one
    shuffle, per-group sort buffer) — correct but memory-bound per group.
    The 100 TB path is ``approx_percentile`` (t-digest sketch, map-side
    combinable, bounded memory) — registered as ``approx_quantiles_price``
    with the driver's weaker rows-only check, since sketch internals are
    engine-specific by design. This pair documents the exact/approx
    trade-off explicitly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile(F.col("l_quantity"), F.lit(0.25)).alias("q25_quantity"),
        F.percentile(F.col("l_quantity"), F.lit(0.5)).alias("median_quantity"),
        F.percentile(F.col("l_quantity"), F.lit(0.75)).alias("q75_quantity"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.9)).alias("p90_price"),
    )


_OUTLIERS_SQL = """
WITH s AS (
    SELECT event_type,
           COUNT(*) AS n,
           SUM(CAST(value AS DECIMAL(18,4))) AS sx,
           SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(20,4))) AS sxx
    FROM events
    GROUP BY event_type
),
m AS (
    SELECT event_type,
           CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v,
           sqrt((CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                 - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                   * CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
                / (CAST(n AS DOUBLE) - 1.0)) AS sd_v
    FROM s
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - m.mean_v) / m.sd_v AS z_score,
       abs((e.value - m.mean_v) / m.sd_v) > 3.0 AS is_outlier
FROM events e JOIN m USING (event_type)
"""


@register("stats_outliers", _OUTLIERS_SQL)
def q_stats_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly detection: group moments from exact
    decimal sufficient statistics (one combinable agg, broadcast back),
    then a map-only score per row — the scan never shuffles."""
    e = load_table(spark, sf_dir, "events")
    d = F.col("value").cast(_D)
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d).alias("sx"),
        F.sum(d * d).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    m = stats.select(
        "event_type",
        (sx / n).alias("mean_v"),
        F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0))).alias("sd_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("sd_v")
    return e.join(F.broadcast(m), "event_type").select(
        "event_id",
        "event_type",
        "value",
        z.alias("z_score"),
        (F.abs(z) > F.lit(3.0)).alias("is_outlier"),
    )


_V = "CAST(CAST({c} AS VARCHAR) AS DOUBLE)"


def _lin_terms() -> dict[str, str]:
    nd = "CAST(n AS DOUBLE)"
    sx, sy, sxx, syy, sxy = (
        _V.format(c=c) for c in ("sx", "sy", "sxx", "syy", "sxy")
    )
    cov = f"({nd} * {sxy} - {sx} * {sy})"
    vx = f"({nd} * {sxx} - {sx} * {sx})"
    vy = f"({nd} * {syy} - {sy} * {sy})"
    return {
        "slope": f"{cov} / {vx}",
        "intercept": f"({sy} - {cov} / {vx} * {sx}) / {nd}",
        "r2": f"({cov} * {cov}) / ({vx} * {vy})",
    }


# --- full pairwise correlation matrix in one scan --------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_SHORT = {"l_quantity": "quantity", "l_extendedprice": "extendedprice",
               "l_discount": "discount", "l_tax": "tax"}


def _corr_pairs() -> list[tuple[str, str]]:
    return [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1:]
    ]


def _corr_matrix_sql() -> str:
    sums = ",\n           ".join(
        f"SUM(CAST({c} AS DECIMAL(18,4))) AS s_{_CORR_SHORT[c]}"
        for c in _CORR_COLS
    )
    prods = ",\n           ".join(
        f"SUM(CAST({a} AS DECIMAL(18,4)) * CAST({b} AS DECIMAL(20,4)))"
        f" AS s_{_CORR_SHORT[a]}_{_CORR_SHORT[b]}"
        for a in _CORR_COLS
        for b in _CORR_COLS
        if _CORR_COLS.index(a) <= _CORR_COLS.index(b)
    )
    rows = []
    for a, b in _corr_pairs():
        sa, sb = _CORR_SHORT[a], _CORR_SHORT[b]
        nd = "CAST(n AS DOUBLE)"
        x, y = _V.format(c=f"s_{sa}"), _V.format(c=f"s_{sb}")
        xx = _V.format(c=f"s_{sa}_{sa}")
        yy = _V.format(c=f"s_{sb}_{sb}")
        xy = _V.format(c=f"s_{sa}_{sb}")
        corr = (
            f"({nd} * {xy} - {x} * {y})"
            f" / sqrt(({nd} * {xx} - {x} * {x})"
            f" * ({nd} * {yy} - {y} * {y}))"
        )
        rows.append(
            f"SELECT '{sa}' AS col_x, '{sb}' AS col_y,"
            f" CAST(n AS BIGINT) AS n, {corr} AS corr FROM s"
        )
    body = "\nUNION ALL\n".join(rows)
    return f"""
WITH s AS (
    SELECT COUNT(*) AS n,
           {sums},
           {prods}
    FROM lineitem
)
{body}
"""


@register("stats_correlation_matrix", _corr_matrix_sql())
def q_stats_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six pairwise Pearson correlations of (quantity, extendedprice,
    discount, tax) from ONE scan of lineitem: every sufficient statistic
    (4 sums, 4 squares, 6 cross-products, n) lands in a single map-side-
    combinable aggregate to one row, then the 6 (col_x, col_y, corr)
    rows unfold driver-free from that row. The feature-profiling shape:
    a p-column correlation matrix costs one pass and p(p+1)/2 + p + 1
    accumulators, never p² scans. Exact-decimal sums + fixed double-op
    formulas = bit-identical engines (same contract as
    ``stats_moments``)."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(F.col(c).cast(_D)).alias(f"s_{_CORR_SHORT[c]}"))
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            aggs.append(
                F.sum(F.col(a).cast(_D) * F.col(b).cast(_D)).alias(
                    f"s_{_CORR_SHORT[a]}_{_CORR_SHORT[b]}"
                )
            )
    one = li.agg(*aggs)
    n = F.col("n").cast("double")
    pair_rows = []
    for a, b in _corr_pairs():
        sa, sb = _CORR_SHORT[a], _CORR_SHORT[b]
        x = F.col(f"s_{sa}").cast("double")
        y = F.col(f"s_{sb}").cast("double")
        xx = F.col(f"s_{sa}_{sa}").cast("double")
        yy = F.col(f"s_{sb}_{sb}").cast("double")
        xy = F.col(f"s_{sa}_{sb}").cast("double")
        corr = (n * xy - x * y) / F.sqrt(
            (n * xx - x * x) * (n * yy - y * y)
        )
        pair_rows.append(
            F.struct(
                F.lit(sa).alias("col_x"),
                F.lit(sb).alias("col_y"),
                corr.alias("corr"),
            )
        )
    return one.select(
        F.explode(F.array(*pair_rows)).alias("p"),
        F.col("n").cast("bigint").alias("n"),
    ).select("p.col_x", "p.col_y", "n", "p.corr")


_LINREG_SQL = f"""
WITH s AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
           SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(20,4))) AS sxx,
           SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
           SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_extendedprice AS DECIMAL(20,4))) AS syy,
           SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_extendedprice AS DECIMAL(20,4))) AS sxy
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       {_lin_terms()["slope"]} AS slope,
       {_lin_terms()["intercept"]} AS intercept,
       {_lin_terms()["r2"]} AS r2
FROM s
"""


@register("stats_linreg_flag", _LINREG_SQL)
def q_stats_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS: l_extendedprice regressed on
    l_quantity per return flag. Same exact-decimal sufficient statistics
    as ``stats_moments`` (one map-side-combinable pass); slope /
    intercept / r² evaluated once in double with a fixed operation
    order, so both engines produce bit-identical coefficients. The
    per-group-model pattern: a million independent regressions cost one
    aggregation, not a million fits."""
    li = load_table(spark, sf_dir, "lineitem")
    xd = F.col("l_quantity").cast(_D)
    yd = F.col("l_extendedprice").cast(_D)
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd).alias("sy"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return agg.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        (cov / vx).alias("slope"),
        ((sy - cov / vx * sx) / n).alias("intercept"),
        ((cov * cov) / (vx * vy)).alias("r2"),
    )


# --- categorical association (Cramér's V) ----------------------------------

_CRAMER_SQL = """
WITH cell AS (
    SELECT o_orderstatus AS a, o_orderpriority AS b,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1, 2
),
marg AS (
    SELECT a, b, n,
           CAST(SUM(n) OVER (PARTITION BY a) AS BIGINT) AS na,
           CAST(SUM(n) OVER (PARTITION BY b) AS BIGINT) AS nb,
           CAST(SUM(n) OVER () AS BIGINT) AS nt
    FROM cell
),
chi AS (
    SELECT CAST(MAX(nt) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
           CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b,
           SUM(
             (CAST(n AS DOUBLE)
                - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                  / CAST(nt AS DOUBLE))
             * (CAST(n AS DOUBLE)
                - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                  / CAST(nt AS DOUBLE))
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                  / CAST(nt AS DOUBLE))
             ORDER BY a, b
           ) AS chi2
    FROM marg
)
SELECT n_rows, n_a, n_b, chi2,
       sqrt(chi2 / (CAST(n_rows AS DOUBLE)
            * CAST(least(n_a - 1, n_b - 1) AS DOUBLE))) AS cramers_v
FROM chi
"""


@register("stats_cramers_v", _CRAMER_SQL)
def q_stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between order status and order priority —
    the categorical companion to ``stats_correlation_matrix`` (Pearson
    says nothing about nominal columns; V = sqrt(χ² / (n·min(r−1,c−1)))
    does). The feature-screening shape: the contingency table is ONE
    hash agg to r·c rows, marginals are windows over that tiny table,
    and χ² folds those few rows — the scan is touched once and nothing
    data-sized shuffles.

    Determinism: cells and marginals are exact BIGINT counts; the χ²
    fold is a sum over ≤ r·c cells of a fixed double-op term, summed in
    a deterministic (a, b) order on both engines (DuckDB ORDER BY
    inside SUM; Spark folds a sorted cell array), because float
    addition does not commute across engine-dependent orders."""
    orders = load_table(spark, sf_dir, "orders")
    cell = orders.groupBy(
        F.col("o_orderstatus").alias("a"), F.col("o_orderpriority").alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    from pyspark.sql import Window

    marg = cell.select(
        "a",
        "b",
        "n",
        F.sum("n").over(Window.partitionBy("a")).cast("bigint").alias("na"),
        F.sum("n").over(Window.partitionBy("b")).cast("bigint").alias("nb"),
        F.sum("n").over(Window.partitionBy()).cast("bigint").alias("nt"),
    )
    # fold the χ² terms in (a, b) order via a sorted array of structs —
    # a plain SUM would add in partition order, which need not match
    # DuckDB's ORDER BY-qualified sum
    term = (
        "aggregate("
        "  array_sort(collect_list(struct(a, b, "
        "    (CAST(n AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
        "       / CAST(nt AS DOUBLE))"
        "    * (CAST(n AS DOUBLE) - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
        "       / CAST(nt AS DOUBLE))"
        "    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)"
        "       / CAST(nt AS DOUBLE)) AS t))),"
        "  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.t)"
    )
    chi = marg.agg(
        F.max("nt").cast("bigint").alias("n_rows"),
        F.countDistinct("a").cast("bigint").alias("n_a"),
        F.countDistinct("b").cast("bigint").alias("n_b"),
        F.expr(term).alias("chi2"),
    )
    return chi.select(
        "n_rows",
        "n_a",
        "n_b",
        "chi2",
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n_rows").cast("double")
                * F.least(F.col("n_a") - 1, F.col("n_b") - 1).cast("double")
            )
        ).alias("cramers_v"),
    )
