"""CSV ingestion edge: typed scan, row-level quarantine, optional-column
synthesis, multi-path union — the reference's native input format
(S1/S2/U1/U2/P8/S7) on the engine's terms."""

from __future__ import annotations

from pyspark.sql import types as T

from ecs_ecommerce_data_pipeline_spark import schemas
from ecs_ecommerce_data_pipeline_spark.sources.csv_source import (
    read_csv,
    read_table,
    split_quarantine,
    with_optional_columns,
)

ORDERS_CSV = """order_id,user_id,created_at,returned_at
1,10,2024-01-01T08:00:00,
2,11,2024-01-01T09:30:00,2024-01-05T00:00:00
not_a_number,12,2024-01-02T10:00:00,
4,13,bad-timestamp,
5,14,2024-01-03T11:00:00,
"""

ITEMS_NO_OPTIONAL_CSV = """order_id,product_id,sale_price,created_at
1,100,9.99,2024-01-01T08:00:00
2,101,19.50,2024-01-01T09:30:00
"""


def test_typed_read_quarantines_malformed_rows(spark, tmp_path):
    p = tmp_path / "orders.csv"
    p.write_text(ORDERS_CSV)

    clean, quarantine = split_quarantine(
        read_csv(spark, str(p), schemas.ORDERS)
    )
    assert [f.name for f in clean.schema] == [
        "order_id", "user_id", "created_at", "returned_at",
    ]
    assert clean.schema["order_id"].dataType == T.LongType()

    ids = sorted(r["order_id"] for r in clean.collect())
    # rows 3 (non-numeric order_id) and 4 (unparseable timestamp) are
    # quarantined: PERMISSIVE flags the whole row on ANY cell failure
    assert ids == [1, 2, 5]

    bad = quarantine.collect()
    assert len(bad) == 2
    raws = "|".join(r["reason"]["raw"] for r in bad)
    assert "not_a_number" in raws and "bad-timestamp" in raws
    # parseable cells of a quarantined row are preserved for triage
    r4 = [r for r in bad if r["order_id"] == 4][0]
    assert r4["user_id"] == 13 and r4["created_at"] is None


def test_optional_column_synthesis(spark, tmp_path):
    p = tmp_path / "items.csv"
    p.write_text(ITEMS_NO_OPTIONAL_CSV)

    base = T.StructType([f for f in schemas.ORDER_ITEMS if f.name != "returned_at"])
    clean, quarantine = read_table(
        spark, str(p), base, optional=schemas.OPTIONAL_COLUMNS["order_items"]
    )
    assert quarantine.count() == 0
    assert clean.schema["returned_at"].dataType == T.TimestampType()
    assert all(r["returned_at"] is None for r in clean.collect())


def test_multi_path_read_unions_parts(spark, tmp_path):
    part1 = tmp_path / "part1.csv"
    part2 = tmp_path / "part2.csv"
    part1.write_text("order_id,user_id,created_at,returned_at\n1,10,2024-01-01T08:00:00,\n")
    part2.write_text("order_id,user_id,created_at,returned_at\n2,11,2024-01-02T08:00:00,\n")

    clean, _ = split_quarantine(
        read_csv(spark, [str(part1), str(part2)], schemas.ORDERS)
    )
    assert sorted(r["order_id"] for r in clean.collect()) == [1, 2]


def test_idempotent_synthesis_keeps_existing_column(spark, tmp_path):
    p = tmp_path / "orders.csv"
    p.write_text(ORDERS_CSV)
    clean, _ = split_quarantine(read_csv(spark, str(p), schemas.ORDERS))
    before = clean.schema["returned_at"]
    out = with_optional_columns(clean, schemas.OPTIONAL_COLUMNS["orders"])
    assert out.schema["returned_at"] == before
    # order 2 has a real return timestamp — synthesis must not clobber it
    r2 = [r for r in out.collect() if r["order_id"] == 2][0]
    assert r2["returned_at"] is not None
