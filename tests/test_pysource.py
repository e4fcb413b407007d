"""Spark 4 Python DataSource: the synthetic corpus source must be
deterministic (pure function of seed+id), correctly partitioned, and
usable by the text operators end-to-end."""

from __future__ import annotations

import pytest

from ecs_ecommerce_data_pipeline_spark.sources.pysource import (
    SyntheticDocsDataSource,
    _doc,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SyntheticDocsDataSource)
    return spark


def test_row_count_and_schema(registered):
    df = registered.read.format("synthetic_docs").option("rows", 2500).load()
    assert df.count() == 2500
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]


def test_partition_fanout(registered):
    df = (
        registered.read.format("synthetic_docs")
        .option("rows", 2500)
        .option("rows_per_partition", 300)
        .load()
    )
    assert df.rdd.getNumPartitions() == 9  # ceil(2500/300)
    assert df.count() == 2500


def test_deterministic_across_reads_and_layouts(registered):
    def load(rpp):
        return (
            registered.read.format("synthetic_docs")
            .option("rows", 400)
            .option("rows_per_partition", rpp)
            .load()
            .orderBy("doc_id")
            .collect()
        )

    assert load(100) == load(37)


def test_seed_changes_content(registered):
    a = (
        registered.read.format("synthetic_docs")
        .option("rows", 10)
        .option("seed", 1)
        .load()
        .orderBy("doc_id")
        .collect()
    )
    b = (
        registered.read.format("synthetic_docs")
        .option("rows", 10)
        .option("seed", 2)
        .load()
        .orderBy("doc_id")
        .collect()
    )
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert [r["text"] for r in a] != [r["text"] for r in b]


def test_n_chars_consistent_and_text_ops_compose(registered):
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.operators.lmscore import (
        bigram_lm_scores,
    )

    df = registered.read.format("synthetic_docs").option("rows", 500).load()
    bad = df.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0
    scored = bigram_lm_scores(df)
    assert scored.count() == 500  # every doc has >= 20 words
    assert scored.filter("avg_bigram_bits <= 0").count() == 0


def test_python_twin_matches_spark_rows(registered):
    rows = (
        registered.read.format("synthetic_docs")
        .option("rows", 5)
        .load()
        .orderBy("doc_id")
        .collect()
    )
    for r in rows:
        assert tuple(r) == _doc(42, r["doc_id"])
