"""Physical-plan quality gates: the 100 TB posture, asserted.

Correctness tests prove WHAT is computed; these prove HOW. Each
assertion encodes a plan property that must survive refactors because at
scale it is the difference between a scan and a full-table shuffle:

* selective predicates reach the parquet reader (PushedFilters);
* small dimensions broadcast instead of shuffling the fact table;
* the KPI pipeline stays inside whole-stage codegen (no Python row
  boundary in the hot path);
* salted-join output carries no salt column (physical rewrite only).
"""

from __future__ import annotations

from ecs_ecommerce_data_pipeline_spark import catalog

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_filters_pushed_to_scan(spark):
    """All four Q6 predicates are scan-column comparisons and must appear
    as PushedFilters on the parquet scan node."""
    df = catalog.queries()["tpch_q6_revenue_forecast"](spark, SF_SMOKE)
    plan = _formatted(df)
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q5_broadcasts_nation_dim(spark):
    """region->nation is explicitly broadcast; the fact side must join it
    via BroadcastHashJoin, never an Exchange of lineitem for nation."""
    df = catalog.queries()["tpch_q5_local_supplier_volume"](spark, SF_SMOKE)
    assert "BroadcastHashJoin" in _plan(df)


def test_q10_broadcasts_nation_dim(spark):
    df = catalog.queries()["tpch_q10_returned_items"](spark, SF_SMOKE)
    assert "BroadcastHashJoin" in _plan(df)


def test_daily_kpis_no_python_udf_in_plan(spark):
    """The reference-parity KPI core must stay JVM-side: no BatchEvalPython
    / ArrowEvalPython nodes (SURVEY §2.7 — the reference is UDF-free and
    so are we, keeping whole-stage codegen unbroken)."""
    for name in ("daily_kpis", "category_kpis", "prepared_items"):
        plan = _plan(catalog.queries()[name](spark, SF_SMOKE))
        assert "EvalPython" not in plan, name


def test_kpi_core_uses_wholestage_codegen(spark):
    df = catalog.queries()["daily_kpis"](spark, SF_SMOKE)
    # collect() (not count(), which builds a separate Dataset) finalizes
    # THIS DataFrame's adaptive plan so codegen stages become visible
    df.collect()
    assert "codegen id" in _formatted(df)


def test_salted_join_output_hides_salt(spark):
    df = catalog.queries()["join_salted_orders_customer"](spark, SF_SMOKE)
    assert "__salt" not in df.columns


def test_q19_partial_pushdown_of_disjunction(spark):
    """Catalyst must extract per-table approximations of the 3-branch
    disjunction: brand bounds onto the part scan, quantity bounds onto
    the lineitem scan — neither input may be scanned unfiltered."""
    df = catalog.queries()["tpch_q19_discounted_revenue"](spark, SF_SMOKE)
    plan = _formatted(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("p_brand" in l for l in pushed), "brand bounds not pushed to part scan"
    assert any("l_quantity" in l for l in pushed), "quantity bounds not pushed to lineitem scan"


def test_q4_semi_join_not_inner(spark):
    """The EXISTS must compile to a LeftSemi join (one output row per
    order), never an inner join + dedup."""
    df = catalog.queries()["tpch_q4_order_priority"](spark, SF_SMOKE)
    assert "LeftSemi" in _plan(df)


def test_q18_having_filter_before_enrich_join(spark):
    """IN (GROUP BY ... HAVING) must become agg -> filter -> semi join:
    the qualifying-orders aggregate appears below the customer join, and
    the semi join keeps orders single-emission."""
    plan = _plan(catalog.queries()["tpch_q18_large_volume"](spark, SF_SMOKE))
    assert "LeftSemi" in plan


def test_q22_anti_join_and_no_collect(spark):
    """NOT EXISTS compiles to LeftAnti; the scalar AVG subquery is a
    broadcast (BroadcastNestedLoopJoin of a 1-row aggregate), not a
    driver-side collect baked into the plan as a literal."""
    plan = _plan(catalog.queries()["tpch_q22_dormant_customers"](spark, SF_SMOKE))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_q7_both_nation_roles_broadcast(spark):
    """The dual-aliased nation dimension must broadcast on BOTH sides —
    the fact pipeline is never exchanged for a 25-row table."""
    plan = _plan(catalog.queries()["tpch_q7_volume_shipping"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2


def test_minhash_candidates_single_aggregation_shape(spark):
    """The LSH candidate generator must not self-join the signature
    subtree: exactly one scan of documents in the physical plan."""
    plan = _plan(catalog.queries()["dedup_minhash_candidates"](spark, SF_SMOKE))
    assert plan.count("documents.parquet") <= 1, "signature subtree duplicated"


def test_q2_single_supply_aggregation_reused(spark):
    """The correlated MIN subquery is decorrelated into a per-part MIN
    over the SAME supply aggregate — the plan may scan lineitem at most
    twice (supply + min side), never once per part."""
    df = catalog.queries()["tpch_q2_min_cost_supplier"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("lineitem.parquet") <= 2
    assert "BroadcastHashJoin" in plan


def test_q11_scalar_threshold_is_broadcast_not_collect(spark):
    """The HAVING-threshold scalar must enter the plan as a broadcast of
    a 1-row aggregate (BroadcastNestedLoopJoin), not a driver collect
    folded to a literal."""
    df = catalog.queries()["tpch_q11_important_values"](spark, SF_SMOKE)
    assert "BroadcastNestedLoopJoin" in _plan(df)


def test_q12_year_predicate_pushed_to_lineitem_scan(spark):
    df = catalog.queries()["tpch_q12_shipping_tiers"](spark, SF_SMOKE)
    plan = _formatted(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_shipdate" in l for l in pushed), "year bounds not pushed"


def test_q16_exclusion_is_anti_join(spark):
    """NOT IN over never-null keys must compile to LeftAnti against the
    broadcast excluded-supplier set."""
    plan = _plan(catalog.queries()["tpch_q16_supplier_counts"](spark, SF_SMOKE))
    assert "LeftAnti" in plan


def test_q20_semi_join_and_part_filter_pushed(spark):
    """Each IN level is one semi-join; the p_type predicate reaches the
    part scan."""
    df = catalog.queries()["tpch_q20_dominant_suppliers"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "LeftSemi" in plan
    fmt = _formatted(df)
    pushed = [l for l in fmt.splitlines() if "PushedFilters" in l]
    assert any("p_type" in l for l in pushed), "p_type not pushed to part scan"


def test_split_assignment_is_map_only(spark):
    """Split membership is a row-local md5 of the key: the assignment
    plan must contain NO Exchange — at 100 TB the split is free, a scan
    decoration, never a shuffle."""
    from ecs_ecommerce_data_pipeline_spark.operators.sampling import assign_split
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(assign_split(doc, "doc_id"))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # pure Column exprs, no UDF


def test_hash_sample_is_map_only(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.sampling import hash_sample
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    assert "Exchange" not in _plan(hash_sample(doc, "doc_id", 0.1))


def test_stratified_sample_single_shuffle_on_stratum(spark):
    """One hash exchange on the stratum key feeds both window functions
    (rank + per-stratum count) — the partitioning is reused, not
    re-shuffled per window."""
    from ecs_ecommerce_data_pipeline_spark.operators.sampling import (
        stratified_sample,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(stratified_sample(doc, "lang", "doc_id", 0.25))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pack_shards_single_shuffle_on_part_col(spark):
    from ecs_ecommerce_data_pipeline_spark.operators.sampling import pack_shards
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(pack_shards(doc, "source", "doc_id", "n_chars", 20_000))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_lsh_bucket_assignment_is_map_only(spark):
    """Bucket assignment embeds the hyperplane matrix as literals and
    folds per row: the plan must contain NO Exchange and NO Generate
    (explode) — at 100 TB this stage is a pure scan that pipelines into
    the downstream bucket join. (Round-1 shape posexploded dims × planes
    rows per vector through two shuffles.)"""
    from ecs_ecommerce_data_pipeline_spark.operators.similarity import (
        lsh_bucket_assignments,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = _plan(lsh_bucket_assignments(emb, n_planes=8))
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan


def test_bm25_topk_is_distributed_take_ordered(spark):
    """The BM25 final top-k must be TakeOrderedAndProject (per-partition
    heads + one merge), never a global row_number window over every
    matching doc — at 100 TB 'docs containing a query term' is a huge
    set. The term filter must also precede the tf aggregation."""
    from ecs_ecommerce_data_pipeline_spark.operators.retrieval import bm25_scores
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(bm25_scores(doc, ["hash", "join"], k=5))
    assert "TakeOrderedAndProject" in plan, plan


def test_catalog_tuner_sizes_shuffle_from_input(spark):
    """Catalog queries size spark.sql.shuffle.partitions from the actual
    input volume (tiny test dirs → 8) instead of inheriting whatever
    static default the calling session carries — the defense against a
    harness session configured with Spark's 200 default."""
    from ecs_ecommerce_data_pipeline_spark import catalog

    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        catalog.queries()["daily_kpis"](spark, SF_SMOKE)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
    finally:
        spark.conf.unset("spark.sql.shuffle.partitions")


def test_repetition_stats_is_map_only(spark):
    """Per-doc repetition metrics are pure array expressions — the plan
    must contain NO Exchange and NO Generate (the explode+groupBy form
    shuffled the entire gram stream)."""
    from ecs_ecommerce_data_pipeline_spark.operators.retrieval import (
        repetition_stats,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(repetition_stats(doc, k=3))
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan


def test_chunk_documents_no_shuffle(spark):
    """Chunking is sequence+explode per row: a Generate node is the
    point, an Exchange would mean the corpus shuffles before chunking —
    at 100 TB the op must stay a scan decoration."""
    from ecs_ecommerce_data_pipeline_spark.operators.curation import (
        chunk_documents,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(chunk_documents(doc))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_quantize_embeddings_map_only(spark):
    """Int8 quantization is higher-order-function folds: no Exchange,
    no Generate (a posexplode shape would blow up dims× rows), no UDF."""
    from ecs_ecommerce_data_pipeline_spark.operators.curation import (
        quantize_embeddings,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = _plan(quantize_embeddings(emb))
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_quota_cap_single_shuffle(spark):
    """The per-stratum cap is one row_number window: exactly one hash
    exchange on the stratum key."""
    from ecs_ecommerce_data_pipeline_spark.operators.curation import quota_cap
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(quota_cap(doc, "source", "doc_id", 20))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_redaction_stats_single_aggregation(spark):
    """Regexp passes are row-local; the only shuffle is the final
    per-language rollup (partial aggregation upstream)."""
    from ecs_ecommerce_data_pipeline_spark.operators.curation import (
        redaction_stats,
    )
    from ecs_ecommerce_data_pipeline_spark.queries.curation_q import (
        _EMAIL_PAT,
        _TERM_PAT,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(redaction_stats(doc, _EMAIL_PAT, _TERM_PAT))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EvalPython" not in plan, plan


def test_lsh_topk_no_self_join_for_buckets(spark):
    """The bucket is an inline column, so the only join in the top-k
    plan is the broadcast of the tiny query set — a second (self) join
    to recover buckets would shuffle the full vector payload at scale."""
    from ecs_ecommerce_data_pipeline_spark.operators.similarity import lsh_topk
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = _plan(lsh_topk(emb, [0, 1, 2, 3, 4], k=10, n_planes=8))
    assert plan.count("BroadcastNestedLoopJoin") + plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_weighted_sample_is_map_only(spark):
    """Weight-proportional Poisson sampling is a row-local predicate:
    no Exchange, no Python boundary — free at any scale."""
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.operators.sampling import (
        weighted_sample,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(weighted_sample(doc, "doc_id", F.col("n_chars") / F.lit(256.0)))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_cdc_diff_one_shuffle_per_side(spark):
    """snapshot_diff is ONE full-outer join: exactly one hash exchange
    per snapshot side (co-partitioned storage would remove both), and the
    change classification runs inside the join stage — no extra shuffle,
    no Python."""
    plan = _plan(catalog.queries()["cdc_orders_diff"](spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "EvalPython" not in plan


def test_expectations_single_scan_single_agg(spark):
    """N declarative rules cost ONE scan and ONE aggregation: every rule
    compiles into the same agg, and the tidy explode happens on the
    1-row result."""
    plan = _plan(catalog.queries()["dq_expectations"](spark, SF_SMOKE))
    assert plan.count("Scan parquet") == 1, plan
    assert "EvalPython" not in plan


def test_decay_score_take_ordered_not_global_sort(spark):
    """Top-100 decayed customers must use distributed TakeOrdered, never
    a rangepartitioning global sort of all customers."""
    plan = _plan(catalog.queries()["customer_decay_score"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def _assert_no_global_window_sort(plan: str) -> None:
    """No Sort whose input is an Exchange SinglePartition anywhere in
    the plan — a global ordered window would funnel every row through
    ONE task at corpus scale. The only SinglePartition exchanges allowed
    are scalar-aggregate finals over already-reduced inputs."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Sort [" in ln:
            follow = " ".join(lines[i + 1 : i + 3])
            assert "Exchange SinglePartition" not in follow, plan


def test_equidepth_scalable_has_no_global_window_sort(spark):
    """Cumulative positions must be the two-phase per-bucket prefix sum
    (functions.prefix), never a global ordered window."""
    plan = _plan(catalog.queries()["histogram_equidepth_scalable"](spark, SF_SMOKE))
    _assert_no_global_window_sort(plan)
    # the local prefix-sum window must be partitioned (by bucket id)
    assert "Window [" in plan and "pid" in plan, plan


def test_rfm_percent_ranks_are_two_phase(spark):
    """The three RFM percent-ranks run as two-phase bucketed ranks —
    a bare PERCENT_RANK() OVER (ORDER BY …) would single-task 10^8
    customers."""
    plan = _plan(catalog.queries()["rfm_segmentation"](spark, SF_SMOKE))
    _assert_no_global_window_sort(plan)


def test_ks_cdf_is_two_phase(spark):
    """The KS CDF walk over the distinct-value histogram must be the
    two-phase prefix sum, not a global ordered window."""
    plan = _plan(catalog.queries()["drift_ks_doc_lengths"](spark, SF_SMOKE))
    _assert_no_global_window_sort(plan)


def test_capped_balance_is_pure_window_no_python(spark):
    """The clip-identity rewrite must keep the whole fold JVM-side: no
    Arrow/Python eval nodes, exactly one Window node (the three window
    expressions share one spec), one hash-partitioning exchange for it."""
    plan = _plan(catalog.queries()["capped_running_balance"](spark, SF_SMOKE))
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, plan
    # three chained Window nodes (sum -> max -> lag depend on each other)
    # but ONE exchange + ONE sort; the final per-customer agg reuses the
    # same hash partitioning, so no second shuffle either
    assert plan.count("Window [") == 3, plan
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort [") == 1, plan


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """At 100 TB, a selective dimension filter should reach the fact scan
    as a runtime bloom filter (Spark injects it when the application side
    exceeds its scan-size threshold — locally we lower the threshold to
    prove the engine's plans are bloom-eligible: equi-join on a scannable
    column with a filtered creation side)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F

        from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

        cust = load_table(spark, SF_SMOKE, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        orders = load_table(spark, SF_SMOKE, "orders")
        j = orders.join(cust, orders.o_custkey == cust.c_custkey)
        assert "might_contain" in _plan(j), "bloom filter not injected"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's skew-join handling is the engine's runtime answer to hot
    keys the static salting rewrite doesn't cover. With the skew
    thresholds lowered to test scale, a join against a deliberately
    hot-keyed table must show skew-split shuffle reads in the final
    adaptive plan."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ path
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # ~95% of rows on ONE key (data-dependent expression — a literal
        # key would constant-fold into a cartesian product) vs a flat side
        hot = spark.range(50_000).select(
            F.when(F.col("id") % 100 < 95, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("a"),
        )
        flat = spark.range(50_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("b")
        )
        joined = hot.join(flat, "k")
        # execute THIS DataFrame's queryExecution (a write/count plans a
        # clone, leaving this plan isFinalPlan=false)
        qe = joined._jdf.queryExecution()
        qe.toRdd().count()
        final = qe.executedPlan().toString()
        # AQE marks the rewritten join/reads with isSkew/skewed markers
        assert "skew" in final.lower(), final[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_shuffled_hash_join_hint_respected(spark):
    """Large-large joins where one side comfortably fits per-partition
    memory should be SHUFFLE_HASH, skipping both sort phases of SMJ. The
    hint must survive planning (Spark honors it over its SMJ default)."""
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    joined = li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
    plan = _plan(joined)
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-partitioned layout: a filter on the partition column must
    prune at PLANNING time (PartitionFilters on the scan, non-matching
    directories never listed into the scan) — the reason the KPI sink
    partitions by date_key."""
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts").cast("string")
    )
    path = str(tmp_path / "events_by_date")
    ev.write.partitionBy("event_date").parquet(path)

    dates = sorted(r["event_date"] for r in ev.select("event_date").distinct().collect())
    assert len(dates) >= 2
    target = dates[0]

    df = spark.read.parquet(path).filter(F.col("event_date") == target)
    plan = _formatted(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "event_date" in pf[0], plan[:1500]
    # and the row count matches the single partition
    want = ev.filter(F.col("event_date") == target).count()
    assert df.count() == want


def test_topk_window_uses_group_limit(spark):
    """rank <= k over a window must trigger Spark's WindowGroupLimit
    pushdown: each partition keeps only k candidates BEFORE the sort-
    heavy window evaluation — the difference between shuffling k rows
    per group and shuffling every row at 100 TB."""
    df = catalog.queries()["window_topk_per_category"](spark, SF_SMOKE)
    assert "WindowGroupLimit" in _plan(df)


def test_analyzed_table_feeds_cbo_statistics(spark, tmp_path):
    """Warehouse posture: ANALYZE TABLE column statistics must reach the
    optimizer (rowCount in plan stats) so CBO join-reorder and broadcast
    decisions run from measured sizes, not file-size guesses."""
    loc = str(tmp_path / "cbo_orders")
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.sql(
        f"CREATE TABLE cbo_orders USING parquet LOCATION '{loc}' AS "
        f"SELECT * FROM parquet.`{SF_SMOKE}/orders.parquet`"
    )
    try:
        spark.sql(
            "ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_custkey"
        )
        stats = {
            r[0]: r[1]
            for r in spark.sql("DESCRIBE EXTENDED cbo_orders o_custkey").collect()
        }
        assert stats["min"] is not None and stats["distinct_count"] is not None
        old = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            plan_stats = (
                spark.table("cbo_orders")
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .toString()
            )
            assert "rowCount" in plan_stats
        finally:
            spark.conf.set("spark.sql.cbo.enabled", old)
    finally:
        spark.sql("DROP TABLE cbo_orders")


def test_gopher_rules_is_map_only(spark):
    """The Gopher gate is logically a per-row function and must plan as
    one: NO shuffle (Exchange), no Window, no aggregation, no Python —
    every signal is an array fold over the row's own token list."""
    df = catalog.queries()["text_gopher_rules"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "HashAggregate" not in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_bpe_encode_topn_is_take_ordered(spark):
    """The encode vocabulary top-N must be a distributed TakeOrdered,
    never a global sort of the whole token table."""
    df = catalog.queries()["bpe_encode_corpus"](spark, SF_SMOKE)
    assert "TakeOrderedAndProject" in _plan(df)


def test_erasure_audit_all_probes_broadcast(spark):
    """Every fact-table probe in the erasure audit joins against the
    (tiny) erased-key set map-side: only broadcast joins, no
    SortMergeJoin — the fact tables must never shuffle."""
    df = catalog.queries()["privacy_erasure_audit"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quantile_bins_state_is_bounded(spark):
    """The mergeable quantile state must aggregate to bin granularity
    before any window: the only Window in the plan runs over the merged
    ≤n_bins rows (bounded input — acceptable single partition), and the
    corpus-sized exact anchor uses the two-phase prefix sum, never a
    Sort over a single-partition Exchange of the value table."""
    df = catalog.queries()["quantile_bins_merge"](spark, SF_SMOKE)
    plan = _plan(df)
    # the bounded-window idiom: any SinglePartition exchange feeding a
    # Sort must sit ABOVE a HashAggregate that reduced to bins (i.e. the
    # plan still contains the bin aggregate); corpus rows never reach it
    assert "HashAggregate" in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_price_asof_enrich_is_broadcast_equi_join(spark):
    """The versioned-dimension enrichment must plan as a BROADCAST
    HASH join on the part key (interval predicate as residual), never a
    nested-loop or a fact-side shuffle."""
    df = catalog.queries()["lineitem_price_asof_enrich"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_anomaly_window_is_group_partitioned(spark):
    """The trailing z-score window must be partitioned by event_type —
    a global ordered window here would funnel every (type, hour) row
    through one task."""
    df = catalog.queries()["events_hourly_anomaly"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_pareto_rank_has_no_global_window(spark):
    """Customer ranks must come from the two-phase prefix sum — no Sort
    over a single-partition Exchange (the classic global-rank trap)."""
    df = catalog.queries()["revenue_pareto_deciles"](spark, SF_SMOKE)
    plan = _plan(df)
    import re

    # no Sort node may sit directly above an Exchange SinglePartition
    assert not re.search(
        r"Sort[^\n]*\n[^\n]*Exchange SinglePartition", plan
    ), "global single-partition sort found"


def test_skyline_has_no_global_window_sort(spark):
    """The skyline sweep must be the two-phase exclusive running max —
    per-bucket windows + broadcast bucket offsets — never a Sort fed by
    an Exchange SinglePartition over the distinct-price relation."""
    plan = _plan(catalog.queries()["parts_skyline_price_size"](spark, SF_SMOKE))
    _assert_no_global_window_sort(plan)


def test_ivm_join_delta_broadcasts_dimension(spark):
    """The delta path's whole point is O(batch) work: the customer→nation
    dimension must reach both fact sides as a broadcast join, never a
    SortMergeJoin shuffling the facts on the join key."""
    plan = _plan(catalog.queries()["ivm_join_delta_nation"](spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bloom_probe_joins_broadcast_bits(spark):
    """The Bloom bit table (≤ m rows) must broadcast into the probe
    join — a sort-merge exchange of the probe stream on bit position
    would shuffle data-sized rows for a ≤65536-row dimension."""
    df = catalog.queries()["bloom_membership"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dsir_lambda_join_is_broadcast(spark):
    """DSIR's per-bucket λ table is 4096 rows — the (doc, bucket) count
    stream must pick it up via BroadcastHashJoin, and the corpus must
    never feed a Python boundary (pure Catalyst n-gram explode)."""
    df = catalog.queries()["dsir_importance_weights"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ewma_kernel_is_single_window_pass(spark):
    """All 50 EWMA lag terms share one window spec — the plan must
    contain exactly ONE Window operator (per-type partitioned), not a
    chain of 25."""
    df = catalog.queries()["events_ewma_hourly"](spark, SF_SMOKE)
    plan = _plan(df)
    n_windows = sum(
        1
        for line in plan.splitlines()
        if "Window " in line and "WindowGroupLimit" not in line
    )
    assert n_windows == 1, f"expected one Window pass, saw {n_windows}"
    # and it is per-type partitioned, never a global single-partition sort
    import re

    assert not re.search(r"Sort .*\n.*Exchange SinglePartition", plan)


def test_quantile_normalize_edges_broadcast_no_global_sort(spark):
    """Per-source normalization: the 32-row global-edge table broadcasts
    into the doc join, and no Sort runs above an Exchange
    SinglePartition (the two-phase order statistics carry over from
    histogram_equidepth_scalable)."""
    df = catalog.queries()["quality_quantile_normalize"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    import re

    assert not re.search(
        r"Sort .*\n.*Exchange SinglePartition", plan
    ), "global sort found"


def test_zipf_vocab_cut_is_take_ordered(spark):
    """The top-1000 vocabulary cut must be TakeOrdered — a global sort
    of the term-count table would single-partition the whole vocab."""
    df = catalog.queries()["text_zipf_slope"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_top_paths_single_scan_one_user_shuffle(spark):
    """The session/trigram pipeline runs ONCE: exactly one events scan
    (the share denominator is an unordered global window over the
    bounded path-count table, never a 1-row agg + crossJoin that
    re-executes the upstream), one per-user exchange feeding the
    stacked window pass, and a TakeOrdered top-10."""
    df = catalog.queries()["events_top_paths"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("events.parquet") == 1, "session pipeline re-executed"
    assert plan.count("hashpartitioning(user_id") == 1
    assert "TakeOrderedAndProject" in plan
    import re

    # the only SinglePartition exchange feeds the bounded global window,
    # which is unordered — no Sort may sit above it
    assert not re.search(r"Sort .*\n.*Exchange SinglePartition", plan)


def test_did_pivot_single_events_scan(spark):
    """The DiD four-cell pivot must be a conditional aggregation on ONE
    pipeline — a filtered self-join per cell would scan events four
    times (no CSE across join branches)."""
    df = catalog.queries()["events_did_readout"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("events.parquet") == 1, "cell branches re-scan events"


def test_novelty_joins_on_hashed_keys_only(spark):
    """The first-seen join must move 60-bit gram hashes, never gram
    text: no physical join key named 'shingle' or 'gram'."""
    df = catalog.queries()["text_novelty_ratio"](spark, SF_SMOKE)
    plan = _plan(df)
    import re

    for m in re.finditer(r"SortMergeJoin \[([^\]]*)\]", plan):
        assert "shingle" not in m.group(1) and "gram" not in m.group(1)
    for m in re.finditer(r"BroadcastHashJoin \[([^\]]*)\]", plan):
        assert "shingle" not in m.group(1) and "gram" not in m.group(1)


def test_correlation_matrix_single_scan_single_agg(spark):
    """All 15 sufficient statistics must come from ONE lineitem scan and
    one partial/final HashAggregate pair; the 6-pair unfold is a
    Generate over the 1-row agg, never a re-scan per pair."""
    df = catalog.queries()["stats_correlation_matrix"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1, "pair branches re-scan"
    assert "Generate explode" in plan


def test_benford_scan_never_shuffles_rows(spark):
    """Digit extraction is map-only; the only exchanges carry the ≤9-row
    digit table (hash agg partial/final) and the broadcast 1-row total —
    no Sort, no SortMergeJoin over order rows."""
    df = catalog.queries()["dq_benford_first_digit"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_fuzzy_parts_joins_distinct_names_not_rows(spark):
    """The levenshtein self-join must run on the distinct-name dimension:
    each join input aggregates BEFORE joining (distinct-first), so the
    quadratic term is vocabulary-sized, never fact-table-sized."""
    df = catalog.queries()["entity_fuzzy_parts"](spark, SF_SMOKE)
    plan = _plan(df)
    import re

    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin)", plan)
    assert joins, "expected a blocked self-join"
    # both sides of the join must be fed by aggregates (the groupBy
    # name), i.e. at least two HashAggregate pairs appear below the join
    assert plan.count("HashAggregate") >= 4


def test_oov_rate_vocab_is_take_ordered_and_broadcast(spark):
    """The top-V vocabulary cut is TakeOrdered (per-partition heap) and
    joins back as a broadcast — the (lang, token) frame never sort-merge
    joins against the vocab."""
    df = catalog.queries()["tokenizer_oov_rate"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_gini_aggregates_facts_before_dimension_join(spark):
    """Orders collapse to per-customer cents BEFORE touching the
    customer dimension (aggregate-below-join), nation arrives by
    broadcast, and the only windows partition by nation — no global
    single-partition sort."""
    df = catalog.queries()["revenue_gini_by_nation"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    import re

    assert not re.search(r"Sort .*\n.*Exchange SinglePartition", plan)
    # the orders scan feeds a HashAggregate before any join: the first
    # join keyword in the plan text appears after the first aggregate
    first_agg = plan.find("HashAggregate")
    first_join = min(
        x
        for x in (plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"))
        if x >= 0
    )
    assert 0 <= first_agg, "no aggregate found"
    assert first_join >= 0


def test_debounce_single_window_pass(spark):
    """One per-(user, type) exchange feeds the lag window; the scan is
    read once and never sort-merge joins."""
    df = catalog.queries()["events_debounce"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("events.parquet") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("hashpartitioning(user_id") == 1


def test_cramers_v_single_scan_tiny_windows(spark):
    """The contingency table is one hash agg from one orders scan; the
    marginal windows run over the r*c-row cell table only (the one
    SinglePartition exchange carries cells, not orders)."""
    df = catalog.queries()["stats_cramers_v"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("orders.parquet") == 1
    assert "SortMergeJoin" not in plan


def test_skew_report_is_one_fold_per_key(spark):
    """Each key family is a count-by-key agg folded to one row — no
    sorts, no windows, no joins anywhere in the report."""
    df = catalog.queries()["dq_join_key_skew"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "TakeOrdered" not in plan


def test_radius_join_is_equi_join_on_cells(spark):
    """The spatial join must be a hash equi-join on grid-cell keys with
    the replicated small side broadcast — never a cross join or a
    broadcast nested loop over raw coordinates."""
    df = catalog.queries()["geo_radius_join"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_km_curve_windows_are_bounded(spark):
    """The KM pipeline reads events ONCE (first-view is a window min on
    the same user partitioning the per-user aggregate reuses — the
    build-then-join-twice form re-executed the scan three times); the
    risk-set window and the ordered product run over the ≤ horizon+1
    row curve table, so at most one single-partition exchange exists
    (the curve collect)."""
    df = catalog.queries()["events_survival_km"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("events.parquet") == 1, "KM pipeline re-scans events"
    assert plan.count("Exchange SinglePartition") <= 1
    assert plan.count("hashpartitioning(user_id") == 1


def test_waterfall_is_one_conditional_agg(spark):
    """All 16 waterfall counters come from ONE documents scan and one
    aggregate — no per-rule re-scan, no joins, no shuffles beyond the
    1-row agg exchange."""
    df = catalog.queries()["curation_filter_waterfall"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("documents.parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_bot_detection_single_window_pass(spark):
    """Gaps come from one per-user window; the per-user aggregate reuses
    that partitioning (exactly one user_id exchange, one scan)."""
    df = catalog.queries()["events_bot_detection"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("events.parquet") == 1
    assert plan.count("hashpartitioning(user_id") == 1


def test_precision_gate_candidates_execute_once(spark):
    """The LSH candidate pipeline must appear once in the plan: the
    zero-overlap candidates survive via the LEFT match join, not a
    second candidates branch (one bands generation = one minhash
    aggregate over the shingle explode)."""
    df = catalog.queries()["dedup_lsh_precision_gate"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("band_idx") > 0
    # the banding explode (posexplode over band keys) appears in exactly
    # one Generate chain
    import re

    gens = [
        m.group(0)
        for m in re.finditer(r"Generate (pos)?explode[^\n]*band[^\n]*", plan)
    ]
    assert len(gens) <= 1, f"candidate pipeline duplicated: {gens}"


def test_distinctive_terms_aggregates_before_joins(spark):
    """Text is exploded and counted ONCE; all three marginals are
    windows over the vocab-sized count table (the join-back form
    re-executed the scan four times), so documents appears once and no
    join exists at all."""
    df = catalog.queries()["text_distinctive_terms"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("documents.parquet") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_cohort_ltv_single_scan(spark):
    """Cohort label via per-user window min + matrix windows for both
    cumsum and cohort size: the events scan appears exactly once (the
    size-by-second-pass form would read it twice)."""
    df = catalog.queries()["events_cohort_ltv"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("events.parquet") == 1
    assert plan.count("hashpartitioning(user_id") == 1


def test_prefix_filter_join_shuffles_hashes_only(spark):
    """The exact similarity join must carry 60-bit shingle hashes, never
    shingle text, through every join; the hashed-shingle frame is
    persist-pinned, so every one of its consumers reads the cache
    (InMemoryTableScan) and the tokenize+shingle scan runs once.

    The catalog query materializes (localCheckpoint) and releases the
    pin, hiding the pipeline — inspect the lazy operator form instead
    and release the pin here."""
    from ecs_ecommerce_data_pipeline_spark.operators.dedup import (
        prefix_filter_join,
        shingle_docs,
    )
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    df = prefix_filter_join(shingle_docs(doc), threshold=0.5, materialize=False)
    plan = _plan(df)
    spark.catalog.clearCache()
    import re

    for m in re.finditer(
        r"(SortMergeJoin|BroadcastHashJoin) \[([^\]]*)\]", plan
    ):
        assert "shingle" not in m.group(2), "raw shingle text in join key"
    # every textual appearance of the source is inside a cached-relation
    # reference — no consumer re-plans the raw scan
    assert plan.count("InMemoryTableScan") >= plan.count(
        "documents.parquet"
    )
    assert "InMemoryTableScan" in plan


def test_rank_metrics_filter_before_shuffle(spark):
    """The query-term filter must run on the exploded scan BEFORE any
    exchange (the hot path is a filtered explode, not a full-corpus
    shuffle), and the metric folds run over the tiny top-k table."""
    df = catalog.queries()["retrieval_rank_metrics"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("documents.parquet") <= 2, "tf pipeline duplicated"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# --- round-6 plan gates -------------------------------------------------------


def test_attribution_single_events_scan(spark):
    """Both attribution models come from ONE purchase frame (in-row
    melt), so the events table is scanned once and the per-user window
    runs once — a two-branch union would re-run the whole pipeline."""
    df = catalog.queries()["events_attribution_first_last"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("events.parquet") == 1
    assert plan.count("hashpartitioning(user_id") == 1


def test_chunk_windows_map_only(spark):
    """Chunking is a per-row sequence explode: zero exchanges — at
    100 TB this stage pipelines straight into whatever consumes it."""
    df = catalog.queries()["text_chunk_windows"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert plan.count("documents.parquet") == 1


def test_length_buckets_one_scan_one_agg(spark):
    """One documents scan, one hash aggregation — the bucket rule is a
    row-local CASE ladder, never a join or window."""
    df = catalog.queries()["pack_length_buckets"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("documents.parquet") == 1
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_coverage_curve_window_on_vocab_only(spark):
    """The rank window sorts the VOCAB-sized word-count table (post-
    aggregation), never the exploded occurrences: the explode feeds a
    hash aggregate first."""
    df = catalog.queries()["tokenizer_coverage_curve"](spark, SF_SMOKE)
    plan = _plan(df)
    assert plan.count("documents.parquet") == 1
    # the single-partition rank window must sit ABOVE the word-count
    # aggregate in the plan tree (aggregate appears below/after it in
    # the plan string ordering: children print after parents)
    assert plan.index("Window") < plan.index("documents.parquet")


def test_decontamination_broadcasts_eval_side(spark):
    """The eval side is benchmark-sized and must broadcast; the train
    scan joins map-side — no shuffle of the corpus for the candidate
    join."""
    df = catalog.queries()["decontamination_semantic"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_image_dhash_map_only(spark):
    """PNG encode → decode → fingerprint is one Arrow map stage: zero
    exchanges, one documents scan."""
    df = catalog.queries()["multimodal_image_dhash"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert plan.count("documents.parquet") == 1


def test_sq8_one_corpus_scan_broadcast_queries(spark):
    """SQ8 search: the quantized corpus is ONE embeddings scan against
    broadcast quantized queries + a broadcast 1-row range frame — no
    sort-merge join, no corpus re-scan per query."""
    df = catalog.queries()["sim_sq8_topk"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_truncated_rerank_single_scan_carries_vector(spark):
    """Dimension-adaptive retrieval: the full vector rides the row
    through the prefix shortlist, so the rerank needs NO second corpus
    fetch — one full-corpus embeddings scan (plus the broadcast-built
    query side's pruned scan), no sort-merge join."""
    df = catalog.queries()["sim_truncated_rerank"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    # corpus scan + id-pruned query scan: the query side's scan carries
    # a pushed IN-filter, the corpus side does not
    assert plan.count("embeddings.parquet") == 2
    assert "In(vec_id" in plan
