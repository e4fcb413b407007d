"""Per-group OLS and embedding covariance: known-answer fits and the
matrix invariants (symmetric storage, non-negative diagonal),
partitioning-independent by construction (fixed-point sums)."""

from __future__ import annotations

import math

from ecs_ecommerce_data_pipeline_spark.catalog import queries

SF = "/root/testdata/sf0.001"


def test_linreg_perfect_line(spark):
    rows = [("g", float(x), 3.0 * x + 2.0) for x in range(1, 20)]
    df = spark.createDataFrame(rows, "g string, x double, y double")

    from pyspark.sql import functions as F

    # reuse the catalog query's arithmetic by rebuilding it inline
    _D = "decimal(18,4)"
    xd, yd = F.col("x").cast(_D), F.col("y").cast(_D)
    agg = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd).alias("sy"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    sy, syy = F.col("sy").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    r = agg.select(
        (cov / vx).alias("slope"),
        ((sy - cov / vx * sx) / n).alias("intercept"),
        ((cov * cov) / (vx * vy)).alias("r2"),
    ).collect()[0]
    assert math.isclose(r["slope"], 3.0, rel_tol=1e-12)
    assert math.isclose(r["intercept"], 2.0, rel_tol=1e-9)
    assert math.isclose(r["r2"], 1.0, rel_tol=1e-12)


def test_linreg_catalog_runs_and_r2_bounded(spark):
    out = queries()["stats_linreg_flag"](spark, SF).collect()
    assert len(out) >= 3
    for r in out:
        assert 0.0 <= r["r2"] <= 1.0
        assert math.isfinite(r["slope"]) and math.isfinite(r["intercept"])


def test_embedding_covariance_invariants(spark):
    rows = queries()["embedding_covariance"](spark, SF).collect()
    dims = 64
    assert len(rows) == dims * (dims + 1) // 2  # upper triangle incl diag
    by_ij = {(r["i"], r["j"]): r["cov"] for r in rows}
    assert all(i <= j for i, j in by_ij)
    for d in range(dims):
        assert by_ij[(d, d)] >= 0.0  # variances
    # Cauchy-Schwarz on a few off-diagonal entries
    for i, j in [(0, 1), (5, 40), (20, 63)]:
        assert by_ij[(i, j)] ** 2 <= by_ij[(i, i)] * by_ij[(j, j)] + 1e-12
