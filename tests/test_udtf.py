"""UDTF extension point: the Python chunker must be row-identical to
the production Catalyst chunker, from both the DataFrame API and a SQL
LATERAL call."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.functions.udtfs import (
    ChunkUDTF,
    register_udtfs,
)
from ecs_ecommerce_data_pipeline_spark.operators.curation import chunk_documents
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _norm(rows):
    return sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_start"], r["chunk_len"], r["chunk_md5"])
        for r in rows
    )


def test_udtf_matches_catalyst_chunker(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text", "n_chars")
    want = _norm(chunk_documents(docs).collect())

    got = _norm(
        docs.lateralJoin(
            ChunkUDTF(F.col("doc_id").outer(), F.col("text").outer())
        )
        .select("doc_id", "chunk_id", "chunk_start", "chunk_len", "chunk_md5")
        .collect()
    )
    assert got == want


def test_udtf_callable_from_sql(spark):
    register_udtfs(spark)
    docs = load_table(spark, SF, "documents")
    docs.createOrReplaceTempView("docs_for_udtf")
    got = spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.chunk_start, c.chunk_len, c.chunk_md5 "
        "FROM docs_for_udtf d, LATERAL chunk_udtf(d.doc_id, d.text) c"
    ).collect()
    want = _norm(chunk_documents(docs.select("doc_id", "text", "n_chars")).collect())
    assert _norm(got) == want


def test_udtf_edge_cases(spark):
    rows = [(1, ""), (2, "x" * 150), (3, "y" * 151), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.lateralJoin(
        ChunkUDTF(F.col("doc_id").outer(), F.col("text").outer())
    ).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc.get(1, [])) == 1      # empty text -> one empty chunk
    assert len(by_doc.get(2, [])) == 1      # exactly one stride
    assert len(by_doc.get(3, [])) == 2      # one char past the stride
    assert 4 not in by_doc                  # null text -> no rows
