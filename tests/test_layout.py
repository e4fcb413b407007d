"""Sort-clustered layout writer: the parquet footers must carry
pairwise-disjoint per-file ranges on the cluster column (the data-skipping
precondition), compaction must hit the target file count without changing
the data, and a cluster-column predicate must still push to the scan of
the clustered copy.
"""

from __future__ import annotations

import os

import pytest

from ecs_ecommerce_data_pipeline_spark.sources.layout import (
    compact,
    file_ranges,
    write_clustered,
)
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def clustered_orders(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "orders_by_date")
    write_clustered(
        load_table(spark, SF_SMOKE, "orders"), path, ["o_orderdate"], files=6
    )
    return path


def test_files_have_disjoint_cluster_ranges(clustered_orders):
    ranges = file_ranges(clustered_orders, "o_orderdate")
    assert len(ranges) > 1
    for (_, hi), (lo, _) in zip(sorted(ranges), sorted(ranges)[1:]):
        assert hi <= lo, f"overlapping file ranges: {hi} > {lo}"


def test_point_predicate_skips_most_files(spark, clustered_orders):
    """A one-year predicate must overlap a strict subset of the files —
    the row count Spark reads after footer-level skipping is bounded by
    the rows of just those files."""
    import datetime as dt

    y96, y97 = dt.datetime(1996, 1, 1), dt.datetime(1997, 1, 1)
    ranges = file_ranges(clustered_orders, "o_orderdate")
    overlapping = [(lo, hi) for lo, hi in ranges if not (hi < y96 or lo >= y97)]
    assert 0 < len(overlapping) < len(ranges)


def test_clustered_data_roundtrips(spark, clustered_orders):
    orig = load_table(spark, SF_SMOKE, "orders")
    back = spark.read.parquet(clustered_orders)
    assert back.count() == orig.count()
    assert (
        back.select("o_orderkey").exceptAll(orig.select("o_orderkey")).count() == 0
    )


def test_compact_reduces_file_count_preserving_rows(spark, clustered_orders):
    before = spark.read.parquet(clustered_orders).count()
    compact(spark, clustered_orders, files=2, cluster_cols=["o_orderdate"])
    names = [n for n in os.listdir(clustered_orders) if n.endswith(".parquet")]
    assert len(names) == 2
    assert spark.read.parquet(clustered_orders).count() == before
    ranges = file_ranges(clustered_orders, "o_orderdate")
    for (_, hi), (lo, _) in zip(sorted(ranges), sorted(ranges)[1:]):
        assert hi <= lo


def test_predicate_pushdown_on_clustered_copy(spark, clustered_orders):
    df = spark.read.parquet(clustered_orders).filter("o_orderdate >= '1997-01-01'")
    fmt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    pushed = [l for l in fmt.splitlines() if "PushedFilters" in l]
    assert any("o_orderdate" in l for l in pushed)


def _avg_norm_width(path: str, column: str) -> float:
    ranges = file_ranges(path, column)
    glo_lo = min(lo for lo, _ in ranges)
    glo_hi = max(hi for _, hi in ranges)
    span = float(glo_hi - glo_lo)
    return sum((hi - lo) / span for lo, hi in ranges) / len(ranges)


def test_zorder_tightens_every_cluster_column(spark, tmp_path):
    """Z-order must keep per-file footer ranges tight on BOTH cluster
    columns (each file covers a small hyper-rectangle), where
    lexicographic clustering on the major column leaves the minor
    column's per-file range at ~the full global span. Measured
    empirically from the parquet footers the scan's skipping consults."""
    from ecs_ecommerce_data_pipeline_spark.sources.layout import write_zordered

    orders = load_table(spark, SF_SMOKE, "orders")
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zordered(orders, zpath, ["o_custkey", "o_totalprice"], files=16)
    write_clustered(orders, rpath, ["o_custkey"], files=16)

    for col in ("o_custkey", "o_totalprice"):
        assert _avg_norm_width(zpath, col) < 0.6, col
    # the contrast: single-column clustering abandons the minor column
    assert _avg_norm_width(rpath, "o_totalprice") > 0.9
    assert _avg_norm_width(rpath, "o_custkey") < 0.2

    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()


def test_zorder_expr_is_morton_interleaving(spark):
    """Bit-level spot check: rank pair (x, y) with 2 columns maps to
    sum over bits of x's bit b at position 2b and y's bit b at 2b+1."""
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.sources.layout import zorder_expr

    df = spark.range(1).select(
        zorder_expr([F.lit(0b101), F.lit(0b011)], bits=3).alias("z")
    )
    # x=5 (101), y=3 (011): interleaved z = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1
    assert df.collect()[0]["z"] == 0b011011
