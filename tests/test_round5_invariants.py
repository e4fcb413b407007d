"""Cross-query and mathematical invariants for the late-round-5
operators.

The oracle-parity gate proves each query matches its DuckDB twin; these
tests prove the MATH is right in ways a matching-but-both-wrong pair
could not fake: conservation laws between related queries (precision
gate vs the verify query, waterfall kills vs rule fails), brute-force
equivalence on bounded slices (radius join), closed-form cross-checks
(bot-detection CV vs numpy), and order/range laws (Kaplan-Meier
monotonicity, Gini bounds).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark import catalog
from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

from .conftest import SF_SMOKE


def _q(name, spark):
    return catalog.queries()[name](spark, SF_SMOKE)


def test_km_survival_is_monotone_and_bounded(spark):
    rows = sorted(
        _q("events_survival_km", spark).collect(), key=lambda r: r["day"]
    )
    assert rows, "empty KM curve"
    prev_s, prev_r = 1.0, None
    for r in rows:
        # S hits exactly 0 when every user still at risk converts on the
        # last event day (no censored users remain) — legitimate KM
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev_s + 1e-15, "survival must not increase"
        if prev_r is not None:
            assert r["n_risk"] <= prev_r, "risk set must shrink over time"
        assert r["n_events"] <= r["n_risk"]
        prev_s, prev_r = r["survival"], r["n_risk"]


def test_km_product_matches_direct_recurrence(spark):
    rows = sorted(
        _q("events_survival_km", spark).collect(), key=lambda r: r["day"]
    )
    s = 1.0
    for r in rows:
        s = s * (1.0 - float(r["n_events"]) / float(r["n_risk"]))
        assert s == r["survival"], "fold must be the exact ordered product"


def test_waterfall_kills_sum_to_total_failures(spark):
    rows = _q("curation_filter_waterfall", spark).collect()
    assert len(rows) == 5
    from ecs_ecommerce_data_pipeline_spark.operators.text import gopher_rules

    g = gopher_rules(load_table(spark, SF_SMOKE, "documents"))
    base = g.count()
    survivors = rows[0]["n_survivors"]
    assert all(r["n_survivors"] == survivors for r in rows)
    total_killed = sum(r["n_killed_at_stage"] for r in rows)
    assert total_killed == base - survivors, (
        "waterfall stages must partition the kills"
    )
    for r in rows:
        assert r["n_only"] <= r["n_fail"]
        assert r["n_killed_at_stage"] <= r["n_fail"]


def test_precision_gate_agrees_with_verify_query(spark):
    """n_true must equal the row count of dedup_ngram_jaccard — the
    standalone verify query with the same threshold over the same
    candidates."""
    gate = _q("dedup_lsh_precision_gate", spark).collect()[0]
    verified = _q("dedup_ngram_jaccard", spark).count()
    cands = _q("dedup_minhash_candidates", spark).count()
    assert gate["n_true"] == verified
    assert gate["n_candidates"] == cands
    assert 0.0 <= gate["precision"] <= 1.0


def test_radius_join_matches_bruteforce_on_slice(spark):
    """Grid blocking must not lose pairs: brute-force the full distance
    filter for a bounded customer slice and compare counts."""
    from ecs_ecommerce_data_pipeline_spark.queries.geo_q import (
        _GRID,
        _R2,
        _coord,
    )

    res = (
        _q("geo_radius_join", spark)
        .filter(F.col("c_custkey") < 300)
        .collect()
    )
    c = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_custkey") < 300)
        .select(
            "c_custkey",
            _coord(F.col("c_custkey"), "x").alias("x"),
            _coord(F.col("c_custkey"), "y").alias("y"),
        )
    )
    s = load_table(spark, SF_SMOKE, "supplier").select(
        "s_suppkey",
        _coord(F.col("s_suppkey"), "sx").alias("sx_"),
        _coord(F.col("s_suppkey"), "sy").alias("sy_"),
    )
    d2 = (F.col("x") - F.col("sx_")) * (F.col("x") - F.col("sx_")) + (
        F.col("y") - F.col("sy_")
    ) * (F.col("y") - F.col("sy_"))
    brute = {
        (r["c_custkey"]): (r["n"], r["m"])
        for r in c.crossJoin(s)
        .filter(d2 <= F.lit(_R2))
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"), F.min(d2).alias("m"))
        .collect()
    }
    got = {r["c_custkey"]: (r["n_suppliers_within"], r["min_d2"]) for r in res}
    assert got == brute, "grid blocking lost or invented pairs"
    assert _R2 <= (1.0 / _GRID) ** 2, "radius must fit one cell"


def test_bot_detection_cv_matches_numpy(spark):
    import numpy as np

    sample = (
        _q("events_bot_detection", spark)
        .filter(F.col("gap_cv").isNotNull())
        .orderBy("user_id")
        .limit(5)
        .collect()
    )
    assert sample, "expected users with defined CV"
    e = load_table(spark, SF_SMOKE, "events")
    for r in sample:
        ts = sorted(
            (x["ts"], x["event_id"])
            for x in e.filter(F.col("user_id") == r["user_id"])
            .select("ts", "event_id")
            .collect()
        )
        gaps = np.array(
            [
                int(b[0].timestamp()) - int(a[0].timestamp())
                for a, b in zip(ts, ts[1:])
            ],
            dtype=np.float64,
        )
        mean = gaps.sum() / len(gaps)
        var = (np.square(gaps).sum() - gaps.sum() ** 2 / len(gaps)) / (
            len(gaps) - 1
        )
        cv = math.sqrt(var) / mean
        assert abs(cv - r["gap_cv"]) < 1e-9, r["user_id"]


def test_gini_bounds_and_total_conservation(spark):
    rows = _q("revenue_gini_by_nation", spark).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0, r
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    expect = (
        orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            ).alias("cents")
        )
        .collect()[0]["cents"]
    )
    got = round(sum(r["total_revenue"] for r in rows) * 100)
    assert got == expect, "per-nation revenue must conserve the total"


def test_srm_counts_conserve_distinct_users(spark):
    rows = _q("events_srm_check", spark).collect()
    assert {r["period"] for r in rows} == {0, 1}
    for r in rows:
        assert r["chi2"] >= 0.0
        assert r["n_control"] > 0 and r["n_treat"] > 0


def test_calibration_bins_partition_the_joined_docs(spark):
    rows = _q("model_calibration_bins", spark).collect()
    assert all(0 <= r["bin"] <= 9 for r in rows)
    for r in rows:
        assert 0.0 <= r["pass_rate"] <= 1.0
        assert r["n_pass"] <= r["n_docs"]
    from ecs_ecommerce_data_pipeline_spark.operators.lmscore import (
        bigram_lm_scores,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    n_joined = bigram_lm_scores(docs).count()
    assert sum(r["n_docs"] for r in rows) == n_joined


def test_correlation_matrix_is_bounded_and_complete(spark):
    rows = _q("stats_correlation_matrix", spark).collect()
    pairs = {(r["col_x"], r["col_y"]) for r in rows}
    assert len(pairs) == 6
    for r in rows:
        assert -1.0 - 1e-12 <= r["corr"] <= 1.0 + 1e-12
        assert r["col_x"] != r["col_y"]


def test_prefix_filter_join_is_exact(spark):
    """The prefix-filter join must equal the BRUTE-FORCE all-pairs
    Jaccard ≥ t set (no false negatives — the property LSH gives up),
    and therefore be a superset of the LSH-verified pairs."""
    from ecs_ecommerce_data_pipeline_spark.operators import dedup

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _q("dedup_prefix_filter_join", spark).collect()
    }
    # brute force: all pairs of docs sharing >= 1 shingle, exact Jaccard
    doc = load_table(spark, SF_SMOKE, "documents")
    sh = dedup.shingle_docs(doc, k=3)
    from ecs_ecommerce_data_pipeline_spark.functions.textfn import md5_bigint

    shh = sh.select("doc_id", md5_bigint(F.col("shingle")).alias("h"))
    sizes = {
        r["doc_id"]: r["n"]
        for r in shh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    inter = (
        shh.alias("a")
        .join(
            shh.select(
                F.col("doc_id").alias("doc_b"), F.col("h").alias("h2")
            ),
            (F.col("h") == F.col("h2")) & (F.col("doc_id") < F.col("doc_b")),
        )
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .collect()
    )
    brute = {}
    for r in inter:
        j = r["n_common"] / (
            sizes[r["doc_a"]] + sizes[r["doc_b"]] - r["n_common"]
        )
        if j >= 0.5:
            brute[(r["doc_a"], r["doc_b"])] = j
    assert set(got) == set(brute), (
        f"missing={set(brute) - set(got)} extra={set(got) - set(brute)}"
    )
    for k, v in brute.items():
        assert got[k] == v
    lsh_verified = {
        (r["doc_a"], r["doc_b"])
        for r in _q("dedup_ngram_jaccard", spark).collect()
    }
    assert lsh_verified <= set(got), "exact join must cover LSH-verified"


def test_rank_metrics_laws(spark):
    """NDCG ∈ (0, 1] with DCG ≤ IDCG by construction; MRR is 0 or a
    unit fraction 1/r with r ≤ k; precision@k consistent with
    n_relevant."""
    rows = _q("retrieval_rank_metrics", spark).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["ndcg"] <= 1.0 + 1e-12, r
        assert r["dcg"] > 0.0
        if r["mrr"] > 0:
            inv = 1.0 / r["mrr"]
            assert abs(inv - round(inv)) < 1e-9 and 1 <= round(inv) <= 10
        assert r["precision_at_k"] * 10 == r["n_relevant"]
        assert r["n_retrieved"] <= 10


def test_cohort_ltv_laws(spark):
    """Cohort size equals offset-0 active users; active users never
    exceed the cohort; cumulative LTV is non-decreasing within a
    cohort."""
    rows = _q("events_cohort_ltv", spark).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for cw, rs in by_cohort.items():
        rs.sort(key=lambda r: r["week_offset"])
        assert rs[0]["week_offset"] == 0, "every cohort is active at 0"
        assert rs[0]["n_active_users"] == rs[0]["n_cohort"]
        prev = -1.0
        for r in rs:
            assert r["n_active_users"] <= r["n_cohort"]
            assert r["cum_ltv_per_user"] >= prev - 1e-12
            prev = r["cum_ltv_per_user"]


def test_distinctive_terms_lift_law(spark):
    """Lift is positive, per-source ranks are 1..5 without gaps, and a
    term's in-source tf never exceeds its corpus tf (sanity of the
    window marginals)."""
    rows = _q("text_distinctive_terms", spark).collect()
    by_src = {}
    for r in rows:
        assert r["lift"] > 0.0
        by_src.setdefault(r["source"], []).append(r["rank"])
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src
