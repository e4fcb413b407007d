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


def test_weighted_exact_k_pins_size_and_prefers_heavy(spark):
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.operators.sampling import (
        weighted_sample_exact_k,
    )

    rows = [(i, "s", 1000.0 if i < 5 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")

    out = weighted_sample_exact_k(df, "id", "w", k=10, stratum="grp")
    got = out.collect()
    assert len(got) == 10  # exact size, unlike the Poisson sampler
    assert len({r["id"] for r in got}) == 10  # without replacement

    # heavy rows (1000x weight) should dominate the sample across salts
    heavy_hits = 0
    for salt in map(str, range(8)):
        s = weighted_sample_exact_k(df, "id", "w", k=5, stratum="grp", salt=salt)
        heavy_hits += s.filter(F.col("id") < 5).count()
    # 5 heavy rows vs 95 light: with w-ratio 1000, heavies nearly always
    # fill most of k=5; require a strong majority over 8 salts (40 slots)
    assert heavy_hits >= 24, heavy_hits

    # zero/negative weights are excluded
    dfz = spark.createDataFrame(
        [(1, "s", 0.0), (2, "s", -3.0), (3, "s", 2.0)], "id long, grp string, w double"
    )
    outz = weighted_sample_exact_k(dfz, "id", "w", k=5, stratum="grp").collect()
    assert {r["id"] for r in outz} == {3}


# --- token-budget packing (next-fit-decreasing) -----------------------------


def _pack_reference(rows: list[tuple[str, int, int]], budget: int):
    """Per-row reference recurrence: fill+t > budget → new bin."""
    out = {}
    by_part: dict[str, list[tuple[int, int]]] = {}
    for part, did, tok in rows:
        by_part.setdefault(part, []).append((tok, did))
    for part, docs in by_part.items():
        docs.sort(key=lambda x: (-x[0], x[1]))
        fill, b = None, 0
        for tok, did in docs:
            if fill is None:
                fill = tok
            elif fill + tok > budget:
                b += 1
                fill = tok
            else:
                fill += tok
            out[(part, did)] = b
    return out


def _run_pack(spark, rows, budget, batch_size=None):
    from ecs_ecommerce_data_pipeline_spark.operators.sampling import (
        pack_token_budget,
    )

    df = spark.createDataFrame(rows, "part string, doc_id long, tok long")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        if batch_size is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
            )
        packed = pack_token_budget(df, "part", "tok", "doc_id", budget)
        return {(r["part"], r["doc_id"]): r["bin_id"] for r in packed.collect()}
    finally:
        if batch_size is not None and old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_pack_token_budget_matches_reference_and_bounds(spark):
    import random

    rng = random.Random(7)
    rows = [
        (f"s{i % 3}", i, rng.choice([3, 10, 40, 100, 480, 512, 600, 1500]))
        for i in range(200)
    ]
    budget = 512
    got = _run_pack(spark, rows, budget)
    assert got == _pack_reference(rows, budget)
    # every doc packed exactly once
    assert len(got) == len(rows)
    # no bin over budget except single-doc oversized bins
    fills: dict[tuple[str, int], list[int]] = {}
    toks = {(p, d): t for p, d, t in rows}
    for (part, did), b in got.items():
        fills.setdefault((part, b), []).append(toks[(part, did)])
    for (part, b), members in fills.items():
        if sum(members) > budget:
            assert len(members) == 1 and members[0] > budget, (part, b, members)
    # bins contiguous from 0 per part
    per_part: dict[str, set[int]] = {}
    for (part, b) in fills:
        per_part.setdefault(part, set()).add(b)
    for part, bins in per_part.items():
        assert bins == set(range(len(bins))), (part, bins)


def test_pack_token_budget_carry_across_arrow_batches(spark):
    """Tiny Arrow batches force the mapInPandas carry path: results must
    be identical to single-batch execution."""
    import random

    rng = random.Random(11)
    rows = [(f"s{i % 2}", i, rng.randint(1, 700)) for i in range(97)]
    budget = 256
    whole = _run_pack(spark, rows, budget)
    tiny = _run_pack(spark, rows, budget, batch_size=5)
    assert whole == tiny == _pack_reference(rows, budget)
