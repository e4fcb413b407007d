"""Invariants of the deterministic sampling / split / packing operators:
membership must be a pure function of the key (layout-independent),
stratified counts exact, shard packing within the greedy budget bound.
Oracle parity for the registered queries is covered by
``test_oracle_parity.py`` like every other catalog entry.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators.sampling import (
    assign_split,
    hash_sample,
    pack_shards,
    stratified_sample,
)
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

from .conftest import SF_SMOKE

BUDGET = 20_000


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


def test_split_covers_everything_and_is_layout_stable(docs):
    a = assign_split(docs, "doc_id").select("doc_id", "split")
    assert a.filter(F.col("split").isNull()).count() == 0
    # identical assignment under a different physical layout — the split
    # is a pure function of doc_id, not of partitioning
    b = assign_split(docs.repartition(13), "doc_id").select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_split_proportions_near_declared(docs):
    n = docs.count()
    got = {
        row["split"]: row["count"]
        for row in assign_split(docs, "doc_id").groupBy("split").count().collect()
    }
    assert set(got) == {"train", "val", "test"}
    assert abs(got["train"] / n - 0.90) < 0.05
    assert abs(got["val"] / n - 0.05) < 0.03
    assert abs(got["test"] / n - 0.05) < 0.03


def test_hash_sample_nested_and_deterministic(docs):
    small = {r.doc_id for r in hash_sample(docs, "doc_id", 0.05).collect()}
    big = {r.doc_id for r in hash_sample(docs, "doc_id", 0.20).collect()}
    assert small <= big  # cutoff growth only adds rows, never swaps them
    again = {r.doc_id for r in hash_sample(docs, "doc_id", 0.05).collect()}
    assert small == again


def test_stratified_sample_exact_per_stratum(docs):
    frac = 0.25
    want = {
        row["lang"]: math.ceil(row["count"] * frac)
        for row in docs.groupBy("lang").count().collect()
    }
    got = {
        row["lang"]: row["count"]
        for row in stratified_sample(docs, "lang", "doc_id", frac)
        .groupBy("lang")
        .count()
        .collect()
    }
    assert got == want


def test_pack_shards_budget_bound_and_contiguous(docs):
    packed = pack_shards(docs, "source", "doc_id", "n_chars", budget=BUDGET)
    per_shard = (
        packed.groupBy("source", "shard_id")
        .agg(
            F.sum("n_chars").alias("chars"),
            F.max("n_chars").alias("biggest"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for row in per_shard:
        # greedy-streaming bound: a shard exceeds the budget only by its
        # final (spilling) row
        assert row["chars"] - row["biggest"] < BUDGET
    shard_ids = {
        row["source"]: row["ids"]
        for row in packed.groupBy("source")
        .agg(F.sort_array(F.collect_set("shard_id")).alias("ids"))
        .collect()
    }
    for ids in shard_ids.values():
        assert ids == list(range(len(ids)))  # 0..k-1, no gaps
