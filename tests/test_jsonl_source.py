"""JSONL ingestion edge: typed parse, corrupt-line quarantine, absent
optional keys, multi-path scans."""

from __future__ import annotations

import pyspark.sql.types as T

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

GOOD = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "hola", "lang": "es"}',
    '{"doc_id": 3, "text": "no lang key"}',
]
BAD = [
    "not json at all",
    '{"doc_id": "xyz", "text": "type mismatch"}',
    '{"truncated": ',
]


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n\n")
    return str(p)


def test_clean_and_quarantine_split(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.sources.jsonl_source import (
        read_jsonl_table,
    )

    path = _write(tmp_path, "docs.jsonl", GOOD + BAD)
    clean, quarantine = read_jsonl_table(spark, path, SCHEMA)
    rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["text"] == "hello world"
    assert rows[3]["lang"] is None  # absent key -> typed null
    q = quarantine.collect()
    assert len(q) == 3
    raws = {r["reason"]["raw"] for r in q}
    assert "not json at all" in raws


def test_multi_path_and_optional_synthesis(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.sources.jsonl_source import (
        read_jsonl_table,
    )

    p1 = _write(tmp_path, "part-0.jsonl", GOOD[:2])
    p2 = _write(tmp_path, "part-1.jsonl", GOOD[2:])
    clean, quarantine = read_jsonl_table(
        spark, [p1, p2], SCHEMA, optional={"quality": T.DoubleType()}
    )
    assert quarantine.count() == 0
    assert clean.count() == 3
    assert dict(clean.dtypes)["quality"] == "double"
    assert clean.filter("quality IS NULL").count() == 3


def test_typed_columns_pushdown_ready(spark, tmp_path):
    from ecs_ecommerce_data_pipeline_spark.sources.jsonl_source import read_jsonl

    path = _write(tmp_path, "docs.jsonl", GOOD)
    df = read_jsonl(spark, path, SCHEMA)
    assert dict(df.dtypes)["doc_id"] == "bigint"
    assert df.filter("doc_id >= 2").count() == 2
