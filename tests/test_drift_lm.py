"""Unit tests for operators.drift and operators.lmscore beyond the
oracle-parity gate: known-answer checks on tiny hand-built frames, and
the invariants the statistics must satisfy (KS bounds, PSI of identical
distributions, weight normalization, LM-score frequency monotonicity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators.drift import (
    ks_two_sample,
    mix_weights,
    psi_bins,
)
from ecs_ecommerce_data_pipeline_spark.operators.lmscore import bigram_lm_scores


def test_ks_identical_samples_is_zero(spark):
    rows = [(v, s) for v in range(1, 21) for s in ("a", "b")]
    df = spark.createDataFrame(rows, "v int, smp string")
    out = ks_two_sample(df, "v", "smp", "a", "b").collect()[0]
    assert out["n_a"] == out["n_b"] == 20
    assert out["ks_stat"] == 0.0
    # smallest value achieving the (degenerate) sup
    assert out["ks_at_value"] == 1.0


def test_ks_disjoint_samples_is_one(spark):
    rows = [(v, "a") for v in range(10)] + [(v + 100, "b") for v in range(10)]
    df = spark.createDataFrame(rows, "v int, smp string")
    out = ks_two_sample(df, "v", "smp", "a", "b").collect()[0]
    assert out["ks_stat"] == 1.0
    assert out["ks_at_value"] == 9.0  # sup first reached at a's max


def test_ks_empty_sample_yields_null_not_nan(spark):
    """If a label is absent, the KS statistic does not exist: the row
    must carry NULL ks_stat/ks_at_value (true counts preserved), never a
    /0 NaN or Infinity that a drift gate would read as huge drift."""
    df = spark.createDataFrame([(v, "a") for v in range(5)], "v int, smp string")
    out = ks_two_sample(df, "v", "smp", "a", "b").collect()
    assert len(out) == 1
    assert out[0]["n_a"] == 5 and out[0]["n_b"] == 0
    assert out[0]["ks_stat"] is None
    assert out[0]["ks_at_value"] is None
    # both samples empty -> zero rows, not a garbage row
    both = spark.createDataFrame([(1, "z")], "v int, smp string")
    assert ks_two_sample(both, "v", "smp", "a", "b").count() == 0


def test_ks_known_value(spark):
    # a = {1,2,3,4}, b = {3,4,5,6}: sup |CDF_a - CDF_b| = 1/2 at v=2
    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "a"),
            (3, "b"), (4, "b"), (5, "b"), (6, "b")]
    df = spark.createDataFrame(rows, "v int, smp string")
    out = ks_two_sample(df, "v", "smp", "a", "b").collect()[0]
    assert out["ks_stat"] == 0.5
    assert out["ks_at_value"] == 2.0


def test_psi_identical_halves_near_zero(spark):
    # same distribution in both samples -> every term is only
    # Laplace-smoothing noise; quantized total must be ~0 (|psi| < 1e-6)
    rows = [(v % 50, s) for v in range(500) for s in ("r", "c")]
    df = spark.createDataFrame(rows, "v int, smp string")
    out = psi_bins(df, "v", "smp", "r", "c").collect()
    total = out[0]["psi_total_q"] / float(2**40)
    assert abs(total) < 1e-6
    assert all(r["psi_total_q"] == out[0]["psi_total_q"] for r in out)
    # counts conserved across bins
    assert sum(r["c_ref"] for r in out) == 500
    assert sum(r["c_cur"] for r in out) == 500


def test_psi_shifted_distribution_positive(spark):
    rows = [(v, "r") for v in range(1000)] + [(v + 500, "c") for v in range(1000)]
    df = spark.createDataFrame(rows, "v int, smp string")
    out = psi_bins(df, "v", "smp", "r", "c").collect()
    total = out[0]["psi_total_q"] / float(2**40)
    assert total > 0.25  # a half-range shift is far over the 0.2 alarm bar


def test_mix_weights_uniform_target(spark):
    rows = [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10
    df = spark.createDataFrame(rows, "src string")
    out = {r["src"]: r for r in mix_weights(df, "src").collect()}
    assert math.isclose(out["a"]["weight"], (1 / 3) / 0.6)
    assert math.isclose(out["c"]["weight"], (1 / 3) / 0.1)
    # expected post-sampling share is uniform: share * weight == target
    for r in out.values():
        assert math.isclose(r["share"] * r["weight"], 1 / 3)


def test_mix_weights_explicit_target(spark):
    rows = [("a",)] * 50 + [("b",)] * 50
    df = spark.createDataFrame(rows, "src string")
    out = {
        r["src"]: r
        for r in mix_weights(df, "src", {"a": 0.9, "b": 0.1}).collect()
    }
    assert math.isclose(out["a"]["weight"], 0.9 / 0.5)
    assert math.isclose(out["b"]["weight"], 0.1 / 0.5)


def test_lm_score_known_corpus(spark):
    # doc 1: "x y x y"  -> bigrams [x y, y x, x y]
    # doc 2: "x y z"    -> bigrams [x y, y z]
    # corpus freq: "x y": 3, "y x": 1, "y z": 1  (bitlens: 2, 1, 1)
    rows = [(1, "x y x y"), (2, "x y z")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert out[1]["n_bigrams"] == 3
    assert out[1]["sum_bits"] == 2 + 1 + 2  # x y(2) + y x(1) + x y(2)
    assert out[1]["rare_bigrams"] == 1
    assert out[2]["n_bigrams"] == 2
    assert out[2]["sum_bits"] == 2 + 1
    assert math.isclose(out[2]["rare_ratio"], 0.5)


def test_lm_score_short_docs_drop(spark):
    rows = [(1, "solo"), (2, ""), (3, "a b")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = bigram_lm_scores(df).collect()
    assert {r["doc_id"] for r in out} == {3}


def test_lm_score_repartition_invariant(spark, sf_dir):
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = bigram_lm_scores(docs).orderBy("doc_id").collect()
    b = bigram_lm_scores(docs.repartition(13)).orderBy("doc_id").collect()
    assert a == b


def test_clean_text_injected_dirt(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.text import (
        clean_stats,
        clean_text,
    )

    rows = [
        (1, "plain text"),
        (2, "a <b>bold</b>   move\x07\x07"),
        (3, "  <div class='x'>hi</div>\tthere  "),
    ]
    doc = spark.createDataFrame(rows, "doc_id int, text string")
    cleaned = {
        r["doc_id"]: r["c"]
        for r in doc.select("doc_id", clean_text("text").alias("c")).collect()
    }
    assert cleaned[1] == "plain text"
    assert cleaned[2] == "a bold move"
    assert cleaned[3] == "hi there"

    stats = {r["doc_id"]: r for r in clean_stats(doc).collect()}
    assert stats[2]["tag_matches"] == 2
    assert stats[2]["ctrl_chars"] == 2
    assert stats[3]["tag_matches"] == 2
    assert stats[1]["n_chars_raw"] == stats[1]["n_chars_clean"]


def test_asof_tolerance_nulls_stale_matches(spark):
    import datetime as dt

    from ecs_ecommerce_data_pipeline_spark.operators.asof import (
        asof_join_tolerance,
    )

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(days=10), "a"), (2, t0 + dt.timedelta(days=10), "b")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(days=9), 100), (2, t0, 200)],
        "k long, rts timestamp, val long",
    )
    out = {
        r["k"]: r["asof_val"]
        for r in asof_join_tolerance(
            left, right, "k", "ts", "rts", "val", tolerance_s=2 * 86400
        ).collect()
    }
    assert out[1] == 100      # 1 day old: fresh
    assert out[2] is None     # 10 days old: stale -> NULL


def test_dataset_build_manifest_invariants(spark, sf_dir):
    from ecs_ecommerce_data_pipeline_spark.catalog import queries

    rows = queries()["dataset_build_pipeline"](spark, sf_dir).collect()
    assert rows
    by_split: dict = {}
    for r in rows:
        by_split.setdefault(r["split"], []).append(r)
    assert set(by_split) <= {"train", "val", "test"}
    assert "train" in by_split
    for split, shards in by_split.items():
        ids = sorted(s["shard_id"] for s in shards)
        assert ids == list(range(len(ids)))  # contiguous shards from 0
        for s in shards:
            assert s["min_doc_id"] <= s["max_doc_id"]
            assert s["n_docs"] > 0
            # greedy bound: a shard overshoots by at most one doc's cost
            if s["shard_id"] < max(ids):
                assert s["shard_chars"] >= 1  # non-degenerate


def test_drift_ops_ignore_null_values(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.drift import (
        ks_two_sample,
        psi_bins,
    )

    rows = [(v, s) for v in range(1, 21) for s in ("a", "b")]
    clean = spark.createDataFrame(rows, "v int, smp string")
    dirty = clean.unionByName(
        spark.createDataFrame([(None, "a"), (None, "b"), (None, "b")], "v int, smp string")
    )
    assert (
        ks_two_sample(clean, "v", "smp", "a", "b").collect()
        == ks_two_sample(dirty, "v", "smp", "a", "b").collect()
    )
    k = lambda rows_: sorted((r["bin"], r["c_ref"], r["c_cur"]) for r in rows_)
    assert k(psi_bins(clean, "v", "smp", "a", "b").collect()) == k(
        psi_bins(dirty, "v", "smp", "a", "b").collect()
    )


def test_geo_grid_partitions_customers(spark, sf_dir):
    """Grid cells tile the unit square: every customer lands in exactly
    one cell, cell ids stay in range, and the layout is deterministic
    under repartitioning."""
    from ecs_ecommerce_data_pipeline_spark.catalog import queries
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    out = queries()["geo_grid_buckets"](spark, sf_dir).collect()
    n_customers = load_table(spark, sf_dir, "customer").count()
    assert sum(r["n_customers"] for r in out) == n_customers
    for r in out:
        assert 0 <= r["cell_x"] < 10 and 0 <= r["cell_y"] < 10


def test_mom_growth_known_answer(spark):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [("2024-01-05", 100.0), ("2024-01-20", 100.0),
            ("2024-02-10", 300.0), ("2024-03-01", 150.0)]
    df = spark.createDataFrame(rows, "o_orderdate string, o_totalprice double")
    monthly = df.groupBy(
        F.date_format(F.date_trunc("month", F.to_date("o_orderdate")), "yyyy-MM-dd")
        .alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = W.orderBy("month")
    prev = F.lag("rev").over(w)
    got = {
        r["month"]: r["g"]
        for r in monthly.select(
            "month",
            ((F.col("rev").cast("double") - prev.cast("double"))
             / prev.cast("double")).alias("g"),
        ).collect()
    }
    assert got["2024-01-01"] is None
    assert got["2024-02-01"] == 0.5      # 200 -> 300
    assert got["2024-03-01"] == -0.5     # 300 -> 150
