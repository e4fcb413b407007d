"""Unit tests for operators.curation beyond the oracle-parity gate:
injected-PII redaction (the corpus has no emails, so the email path is
proven here), chunk edge cases, quota determinism under repartitioning,
and quantization round-trip bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.operators.curation import (
    chunk_documents,
    quantize_embeddings,
    quota_cap,
    redact,
    redaction_stats,
)
from ecs_ecommerce_data_pipeline_spark.queries.curation_q import (
    _EMAIL_PAT,
    _TERM_PAT,
)

SF = "/root/testdata/sf0.001"


def test_redaction_on_injected_pii(spark):
    rows = [
        (1, "contact bob.smith+x@example-mail.co.uk for the key", "en"),
        (2, "no pii here at all", "en"),
        (3, "two mails: a@b.io c@d.org and a hash table", "de"),
    ]
    doc = spark.createDataFrame(rows, "doc_id int, text string, lang string")

    stats = {
        r["lang"]: r.asDict()
        for r in redaction_stats(doc, _EMAIL_PAT, _TERM_PAT).collect()
    }
    assert stats["en"]["docs_with_email"] == 1
    assert stats["en"]["email_matches"] == 1
    assert stats["en"]["term_matches"] == 1  # "key" in doc 1
    assert stats["de"]["email_matches"] == 2
    assert stats["de"]["term_matches"] == 2  # "hash", "table"

    red = {
        r["doc_id"]: r["text"]
        for r in redact(doc, _EMAIL_PAT, _TERM_PAT).collect()
    }
    assert red[1] == "contact <EMAIL> for the <TERM>"
    assert red[2] == "no pii here at all"
    assert red[3] == "two mails: <EMAIL> <EMAIL> and a <TERM> <TERM>"


def test_chunk_edges(spark):
    doc = spark.createDataFrame(
        [
            (1, "x" * 40, 40),     # shorter than one stride -> 1 chunk
            (2, "y" * 150, 150),   # exactly one stride -> 1 chunk
            (3, "z" * 151, 151),   # one char past -> 2 chunks
            (4, "w" * 500, 500),   # 0,150,300,450 -> 4 chunks
        ],
        "doc_id int, text string, n_chars int",
    )
    out = chunk_documents(doc, chunk=200, stride=150)
    counts = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {1: 1, 2: 1, 3: 2, 4: 4}
    # chunk windows overlap: doc 4's chunk at 450 is truncated to 50 chars
    lens = {
        (r["doc_id"], r["chunk_id"]): r["chunk_len"] for r in out.collect()
    }
    assert lens[(4, 0)] == 200 and lens[(4, 3)] == 50
    assert lens[(1, 0)] == 40


def test_quota_cap_layout_independent(spark):
    doc = spark.read.parquet(f"{SF}/documents.parquet")
    a = quota_cap(doc, "source", "doc_id", 5)
    b = quota_cap(doc.repartition(13), "source", "doc_id", 5)
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b
    per_src = a.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per_src)


def test_quantize_roundtrip_bounds(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = quantize_embeddings(emb)
    checked = q.select(
        F.array_min("codes").alias("cmin"),
        F.array_max("codes").alias("cmax"),
        # max error of a 254-step affine grid is half a step
        (
            F.col("max_abs_err")
            <= (F.col("vmax") - F.col("vmin")) / 254.0 * 0.5 + 1e-12
        ).alias("err_ok"),
    )
    bad = checked.filter(
        (F.col("cmin") < -127) | (F.col("cmax") > 127) | ~F.col("err_ok")
    ).count()
    assert bad == 0


def test_boilerplate_known_answer(spark):
    """Hand-built corpus: a shared 5-word footer in 3 docs is flagged;
    unique sentences are not; ratios follow from shingle counts."""
    from ecs_ecommerce_data_pipeline_spark.operators.text import (
        boilerplate_passages,
        doc_boilerplate_stats,
    )

    footer = "all rights reserved by acme"
    docs = [
        (1, f"alpha beta gamma delta epsilon {footer}"),
        (2, f"one two three four five six {footer}"),
        (3, f"totally different words here now {footer}"),
        (4, "no shared passage in this document at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bp = {r["shingle"]: r["n_docs"] for r in boilerplate_passages(df, k=5, min_docs=3).collect()}
    assert bp == {footer: 3}

    stats = {r["doc_id"]: r for r in doc_boilerplate_stats(df, k=5, min_docs=3).collect()}
    # doc 1: 10 tokens -> 6 shingles, exactly 1 is the footer shingle
    assert stats[1]["n_shingles"] == 6 and stats[1]["n_boilerplate"] == 1
    assert abs(stats[1]["boilerplate_ratio"] - 1 / 6) < 1e-12
    assert stats[4]["n_boilerplate"] == 0


def test_incremental_lsh_candidates_is_filtered_full_set(spark, sf_dir):
    """The incremental candidate set must equal the FULL LSH candidate
    set restricted to pairs touching the new batch — no old×old pairs,
    nothing involving a new doc missed."""
    from ecs_ecommerce_data_pipeline_spark.operators import dedup
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    from pyspark.sql import functions as F

    doc = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(dedup.shingle_docs(doc, k=3), num_hashes=8)
    full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(
            sigs, num_hashes=8, band_size=2, max_bucket=50
        ).collect()
    }
    incr = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.incremental_lsh_candidates(
            sigs.withColumn("is_new", (F.col("doc_id") % 5 == 0).cast("int")),
            num_hashes=8,
            band_size=2,
            max_bucket=50,
        ).collect()
    }
    want = {(a, b) for a, b in full if a % 5 == 0 or b % 5 == 0}
    assert incr == want
    assert incr  # non-vacuous: the split must actually produce pairs


def test_attribution_credit_known_answer(spark):
    """Two views then one purchase inside the horizon: linear splits the
    value evenly, first-touch credits the earlier view, last-touch the
    later one."""
    import datetime as dt

    from ecs_ecommerce_data_pipeline_spark.queries.events_q import (
        q_attribution_credit,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 101, "view", base, None),
        (1, 102, "view", base + dt.timedelta(minutes=10), None),
        (1, 201, "purchase", base + dt.timedelta(minutes=20), 10.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp, value double"
    )
    # point the query's table loader at the hand-built frame
    import ecs_ecommerce_data_pipeline_spark.queries.events_q as eq

    orig = eq.load_table
    try:
        eq.load_table = lambda s, d, t: df
        got = {r["view_id"]: r for r in q_attribution_credit(spark, "unused").collect()}
    finally:
        eq.load_table = orig
    assert got[101]["n_purchases"] == 1 and got[102]["n_purchases"] == 1
    assert got[101]["credit_linear"] == 5.0 and got[102]["credit_linear"] == 5.0
    assert got[101]["credit_first"] == 10.0 and got[101]["credit_last"] == 0.0
    assert got[102]["credit_first"] == 0.0 and got[102]["credit_last"] == 10.0


def test_incremental_lsh_reingest_emits_no_self_pairs(spark):
    """A doc_id present on BOTH sides of the union (re-ingest of an
    existing document) must not pair with itself — every emitted pair
    honors doc_a != doc_b (ADVICE r3: the sorted bucket held the id
    twice and the adjacent-slice pairing self-paired it)."""
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.operators import dedup

    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally unrelated words over here")],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(dedup.shingle_docs(docs, k=3), num_hashes=8)
    # corpus already holds docs 1-3; the batch re-ingests doc 1 verbatim
    union = sigs.withColumn("is_new", F.lit(0)).unionByName(
        sigs.filter(F.col("doc_id") == 1).withColumn("is_new", F.lit(1))
    )
    pairs = dedup.incremental_lsh_candidates(
        union, num_hashes=8, band_size=2, max_bucket=50
    ).collect()
    assert pairs, "identical docs must still be candidates"
    for r in pairs:
        assert r["doc_a"] != r["doc_b"]
        assert r["doc_a"] < r["doc_b"]


def test_two_phase_cumsum_raises_on_null_ordering_key(spark):
    """A NULL (or non-numeric-castable) ordering key used to silently
    drop the row at the offsets join — it must fail loudly instead
    (ADVICE r3 medium)."""
    import pytest
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.functions.prefix import (
        two_phase_cumsum,
    )

    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,)], "v double"
    )
    with pytest.raises(Exception, match="non-NULL"):
        two_phase_cumsum(df, "v", {"cum": F.lit(1)}).collect()
    # strings that don't cast to double fail loudly too (ANSI cast error
    # — raised before the NULL guard can fire, equally loud)
    df2 = spark.createDataFrame([("a",), ("b",)], "v string")
    with pytest.raises(Exception, match="non-NULL|CAST_INVALID_INPUT"):
        two_phase_cumsum(df2, "v", {"cum": F.lit(1)}).collect()


def test_attribution_credit_negative_value_floors_like_duckdb(spark):
    """Refund-style negative purchase value: the linear split must floor
    (DuckDB // semantics), not truncate toward zero (Spark div) —
    -10_000_000 micro-cents over 3 touches is -3333334 each."""
    import datetime as dt

    from ecs_ecommerce_data_pipeline_spark.queries.events_q import (
        q_attribution_credit,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 101, "view", base, None),
        (1, 102, "view", base + dt.timedelta(minutes=5), None),
        (1, 103, "view", base + dt.timedelta(minutes=10), None),
        (1, 201, "purchase", base + dt.timedelta(minutes=20), -10.0),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, ts timestamp, value double",
    )
    import ecs_ecommerce_data_pipeline_spark.queries.events_q as eq

    orig = eq.load_table
    try:
        eq.load_table = lambda s, d, t: df
        got = {
            r["view_id"]: r for r in q_attribution_credit(spark, "unused").collect()
        }
    finally:
        eq.load_table = orig
    for vid in (101, 102, 103):
        assert got[vid]["credit_linear"] == -3.333334


def test_round4_operators_handle_empty_input(spark):
    """Empty frames must yield empty (or empty-state) results, never
    errors: the quality gate, the quantile state, and survivor
    selection all see empty batches in production."""
    from pyspark.sql import functions as F

    from ecs_ecommerce_data_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from ecs_ecommerce_data_pipeline_spark.operators.sketch import (
        quantile_bin_state,
        quantile_value_stats,
    )
    from ecs_ecommerce_data_pipeline_spark.operators.text import gopher_rules

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert gopher_rules(empty_docs).count() == 0

    empty_vals = spark.createDataFrame([], "v double")
    stats = quantile_value_stats(empty_vals, "v")
    assert quantile_bin_state(empty_vals, "v", stats, 8).count() == 0

    empty_edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(empty_edges).count() == 0


def test_two_phase_cummax_excl_matches_naive(spark):
    """Exclusive running max vs a brute-force reference on a skewed
    value distribution (duplicates, clusters at one bucket edge, a
    single outlier): every row must see max(target) over strictly
    earlier rows in (value, id) order, NULL for the global first."""
    import random

    from ecs_ecommerce_data_pipeline_spark.functions.prefix import (
        two_phase_cummax_excl,
    )

    rng = random.Random(3)
    vals = (
        [1.0] * 7
        + [rng.uniform(0, 1) for _ in range(40)]
        + [1000.0]
        + [rng.choice([2.5, 3.5]) for _ in range(20)]
    )
    rows = [(i, v, rng.randint(0, 50)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double, t long")

    got = {
        r["id"]: r["mx"]
        for r in two_phase_cummax_excl(
            df, "v", "t", out_col="mx", order_cols=["v", "id"], n_buckets=8
        ).collect()
    }
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    run = None
    for rid, _v, t in ordered:
        assert got[rid] == run, (rid, got[rid], run)
        run = t if run is None else max(run, t)
