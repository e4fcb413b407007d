"""Conservation laws for the round-6 query families.

The oracle-parity hash proves Spark and DuckDB agree; these laws prove
the agreed answer is INTERNALLY consistent — the class of defect where
both engines faithfully compute the same wrong thing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark import catalog

from .conftest import SF_SMOKE


def _q(name, spark):
    return catalog.queries()[name](spark, SF_SMOKE)


def test_chunk_windows_cover_every_token_exactly(spark):
    """Per document: chunk 0 starts at 0; consecutive starts step by the
    stride; the last chunk reaches exactly the document's token count;
    every full chunk is 32 tokens and only the last may be shorter."""
    from collections import defaultdict

    rows = _q("text_chunk_windows", spark).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    from ecs_ecommerce_data_pipeline_spark.functions.textfn import tokens
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    n_tokens = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(tokens("text")).alias("n"))
        .collect()
    }
    assert set(by_doc) == {d for d, n in n_tokens.items() if n > 0}
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i
            assert c["start_tok"] == i * 24
            assert 1 <= c["chunk_tokens"] <= 32
            if i < len(chunks) - 1:
                assert c["chunk_tokens"] == min(
                    32, n_tokens[doc] - c["start_tok"]
                )
        last = chunks[-1]
        assert last["start_tok"] + last["chunk_tokens"] == n_tokens[doc]


def test_length_buckets_conserve_docs_and_never_underfit(spark):
    """Σ n_docs over buckets = corpus size; padding_waste =
    n_docs·bucket − sum_tokens per bucket (so bucket ≥ every member's
    token count); waste_ratio consistent with the integer columns."""
    rows = _q("pack_length_buckets", spark).collect()
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    n_corpus = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_corpus
    for r in rows:
        assert (
            r["padding_waste"]
            == r["n_docs"] * r["bucket"] - r["sum_tokens"]
        )
        assert r["padding_waste"] >= 0
        assert abs(
            r["waste_ratio"]
            - r["padding_waste"] / (r["n_docs"] * r["bucket"])
        ) < 1e-12


def test_coverage_curve_monotone_and_bounded(spark):
    """Coverage is non-decreasing in vocab size, covered ≤ total, and
    total is identical on every row (one corpus)."""
    rows = sorted(
        _q("tokenizer_coverage_curve", spark).collect(),
        key=lambda r: r["vocab_size"],
    )
    totals = {r["total_occurrences"] for r in rows}
    assert len(totals) == 1
    prev = -1
    for r in rows:
        assert 0 <= r["covered_occurrences"] <= r["total_occurrences"]
        assert r["covered_occurrences"] >= prev
        prev = r["covered_occurrences"]
        assert abs(
            r["coverage"] - r["covered_occurrences"] / r["total_occurrences"]
        ) < 1e-12


def test_attribution_conserves_purchases_and_revenue(spark):
    """Each model credits every purchase exactly once: per model,
    Σ n_purchases = purchase count and Σ attributed_revenue = total
    purchase revenue (DECIMAL-exact on both sides)."""
    rows = _q("events_attribution_first_last", spark).collect()
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    ev = load_table(spark, SF_SMOKE, "events").filter(
        F.col("event_type") == "purchase"
    )
    want = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
    ).first()
    for model in ("first_touch", "last_touch"):
        part = [r for r in rows if r["model"] == model]
        assert sum(r["n_purchases"] for r in part) == want["n"], model
        assert (
            abs(sum(r["attributed_revenue"] for r in part) - want["v"]) < 1e-6
        ), model


def test_degree_histogram_conserves_docs_and_edges(spark):
    """Σ n_docs = corpus size and Σ degree·n_docs = 2·|candidate pairs|
    (the handshake lemma over the candidate graph)."""
    rows = _q("dedup_degree_histogram", spark).collect()
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    n_corpus = load_table(spark, SF_SMOKE, "documents").count()
    n_pairs = _q("dedup_minhash_candidates", spark).count()
    assert sum(r["n_docs"] for r in rows) == n_corpus
    assert sum(r["degree"] * r["n_docs"] for r in rows) == 2 * n_pairs


def test_dedup_aware_split_conserves_docs_and_clusters(spark):
    """Σ n_docs = corpus size; Σ n_clusters = total distinct components
    (splits partition clusters, so cluster counts add with no overlap);
    Σ sum_doc_id = Σ doc_id (membership checksum)."""
    rows = _q("dedup_aware_split", spark).collect()
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    n_corpus = doc.count()
    sum_ids = doc.agg(F.sum("doc_id")).first()[0]
    assert sum(r["n_docs"] for r in rows) == n_corpus
    assert sum(r["sum_doc_id"] for r in rows) == sum_ids
    # clusters add exactly: every component lands in exactly one split
    n_components = (
        _q("dedup_cc_clusters", spark).count()
        + n_corpus
        - _q("dedup_cc_clusters", spark)
        .agg(F.sum("n_members"))
        .first()[0]
    )
    assert sum(r["n_clusters"] for r in rows) == n_components


def test_recall_queries_bounded_and_consistent(spark):
    """Recall queries: hits ≤ |Q|·k, recall = hits / (|Q|·k) per rung
    (sweep) or hits ≤ k per query (trained/IVF-PQ recall); the sweep's
    ceiling rung (nprobe = n_centroids) must equal the full-ADC recall
    implied by sim_ivfpq_recall's per-query rows."""
    sweep = {r["nprobe"]: r for r in _q("sim_ivfpq_nprobe_sweep", spark).collect()}
    for n, r in sweep.items():
        assert 0 <= r["n_hits"] <= 50
        assert abs(r["recall"] - r["n_hits"] / 50.0) < 1e-12
    per_q = _q("sim_ivfpq_recall", spark).collect()
    for r in per_q:
        assert 0 <= r["n_hits"] <= 10
    # sim_ivfpq_recall runs at nprobe=4: its total must equal the
    # sweep's nprobe=4 rung (same build, same algebra)
    assert sum(r["n_hits"] for r in per_q) == sweep[4]["n_hits"]
    trained = _q("sim_ivf_trained_recall", spark).collect()
    for r in trained:
        assert 0 <= r["n_hits_fixed"] <= 10
        assert 0 <= r["n_hits_trained"] <= 10
        assert abs(r["recall_fixed"] - r["n_hits_fixed"] / 10.0) < 1e-12
        assert abs(r["recall_trained"] - r["n_hits_trained"] / 10.0) < 1e-12
