"""Explicit schemas for every table the engine reads or writes.

The reference reads CSV with no schema — every column lands as StringType
and gets spot-cast later (reference ``ecs/transformation/transform_task.py:131,170,173``).
The engine declares StructTypes up front (SURVEY §1.2): typed scans, schema
validation at the boundary, and parquet predicate/column pushdown all depend
on it.

Two schema families:

* **Reference-native e-commerce tables** (``products`` / ``orders`` /
  ``order_items``) — the shapes the validation + KPI operators are defined
  over (reference ``ecs/validation/validate_task.py:14-18``, FIXTURES.md §A).
* **Driver testdata tables** (TPC-H-ish star schema + ``events`` /
  ``documents`` / ``embeddings``) at ``/root/testdata/sf*/`` — what
  correctness and bench runs read.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-native e-commerce schemas (FIXTURES.md §A)
# ---------------------------------------------------------------------------

PRODUCTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("sku", T.StringType(), False),
        T.StructField("cost", T.DoubleType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("retail_price", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("order_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        # optional in the reference (synthesized when absent,
        # transform_task.py:177-180); nullable here
        T.StructField("returned_at", T.TimestampType(), True),
    ]
)

ORDER_ITEMS = T.StructType(
    [
        T.StructField("order_id", T.LongType(), False),
        T.StructField("product_id", T.LongType(), False),
        T.StructField("sale_price", T.DoubleType(), False),
        # used but unvalidated in the reference (transform_task.py:254,
        # SURVEY §2.8 Q2) — promoted to required in the engine
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("returned_at", T.TimestampType(), True),
    ]
)

# Required (critical, NOT NULL) columns per validate_task.py:14-18.
REQUIRED_COLUMNS: dict[str, list[str]] = {
    "products": ["id", "sku", "cost", "category", "retail_price"],
    "orders": ["order_id", "user_id", "created_at"],
    "order_items": ["order_id", "product_id", "sale_price", "created_at"],
}

# Optional columns synthesized as typed nulls when absent
# (transform_task.py:177-186).
OPTIONAL_COLUMNS: dict[str, dict[str, T.DataType]] = {
    "orders": {"returned_at": T.TimestampType()},
    "order_items": {"returned_at": T.TimestampType()},
}

# KPI output schemas (DynamoDB_table_schema/*.json, README.md:148-175).
DAILY_KPIS = T.StructType(
    [
        T.StructField("date_key", T.DateType(), False),
        T.StructField("total_orders", T.LongType(), False),
        T.StructField("total_revenue", T.DoubleType(), False),
        T.StructField("total_items_sold", T.LongType(), False),
        T.StructField("return_rate", T.DoubleType(), False),
        T.StructField("unique_customers", T.LongType(), False),
    ]
)

CATEGORY_KPIS = T.StructType(
    [
        T.StructField("category", T.StringType(), True),
        T.StructField("order_date", T.DateType(), True),
        T.StructField("daily_revenue", T.DoubleType(), False),
        T.StructField("avg_order_value", T.DoubleType(), False),
        T.StructField("avg_return_rate", T.DoubleType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata schemas (TESTDATA.md / FIXTURES.md §B)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
