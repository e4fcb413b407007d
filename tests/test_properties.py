"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures.

Three families:

* **rewrite transparency** — the skew-mitigation rewrites (salted agg,
  salted join) must equal their naive equivalents on arbitrary data,
  including hot-key distributions, empty frames, and null-free/nullable
  mixes;
* **validation soundness** — ``validate_batch`` rejects iff a defect
  (missing column / null in critical field / orphan FK) actually exists;
* **dedup correctness** — exact-dedup group counts always partition the
  corpus: Σ n_docs = |docs| and groups = |distinct normalized texts|.

Spark jobs are slow per-example, so examples are capped and deadlines
disabled — breadth comes from the generators, not the example count.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ecs_ecommerce_data_pipeline_spark.functions.numeric import MONEY
from ecs_ecommerce_data_pipeline_spark.operators.dedup import exact_duplicates, normalize_text
from ecs_ecommerce_data_pipeline_spark.operators.skew import salted_agg, salted_join
from ecs_ecommerce_data_pipeline_spark.operators.validation import validate_batch

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# Skewed key space: few distinct keys over many rows
_key = st.sampled_from(["hot", "warm", "cold-1", "cold-2"])
_row = st.tuples(_key, st.integers(min_value=-10_000, max_value=10_000))
_rows = st.lists(_row, min_size=1, max_size=60)


@pytest.mark.slow
@given(rows=_rows, buckets=st.integers(min_value=1, max_value=5))
@_SETTINGS
def test_salted_agg_equals_plain(spark, rows, buckets):
    df = spark.createDataFrame(rows, "k string, v long")
    salted = salted_agg(
        df,
        keys=["k"],
        aggs={
            "sum_v": F.sum("v"),
            "n": F.count(F.lit(1)),
            "min_v": F.min("v"),
            "max_v": F.max("v"),
        },
        buckets=buckets,
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("sum_v"),
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


@given(
    large=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)), max_size=40),
    small=st.lists(st.integers(0, 5), min_size=0, max_size=6, unique=True),
    buckets=st.integers(min_value=1, max_value=4),
    how=st.sampled_from(["inner", "left"]),
)
@pytest.mark.slow
@_SETTINGS
def test_salted_join_equals_plain(spark, large, small, buckets, how):
    ldf = spark.createDataFrame(large or [(0, 0)], "k long, v long")
    if large == []:
        ldf = ldf.filter(F.lit(False))
    sdf = spark.createDataFrame(
        [(k, f"dim-{k}") for k in small] or [(99, "x")], "k long, label string"
    )
    if small == []:
        sdf = sdf.filter(F.lit(False))
    salted = salted_join(ldf, sdf, on="k", buckets=buckets, how=how)
    plain = ldf.join(sdf, "k", how)
    key = lambda r: tuple((x is None, str(x)) for x in r)
    assert sorted(map(tuple, salted.collect()), key=key) == sorted(
        map(tuple, plain.collect()), key=key
    )


@given(
    orphan_items=st.booleans(),
    null_user=st.booleans(),
    drop_col=st.booleans(),
)
@pytest.mark.slow
@_SETTINGS
def test_validation_rejects_iff_defect(spark, orphan_items, null_user, drop_col):
    """reject ⇔ ∃ defect — the SURVEY §5 property, all 8 combinations."""
    orders_rows = [(1, 100 if not null_user else None, "2024-01-01")]
    orders = spark.createDataFrame(
        orders_rows, "order_id long, user_id long, created_at string"
    )
    item_order = 999 if orphan_items else 1
    items = spark.createDataFrame(
        [(item_order, 7, 19.99)], "order_id long, product_id long, sale_price double"
    )
    products = spark.createDataFrame(
        [(7, "sku-7", 5.0, "cat", 9.99)],
        "id long, sku string, cost double, category string, retail_price double",
    )
    if drop_col:
        orders = orders.drop("user_id")

    res = validate_batch(
        orders,
        items,
        products,
        required={
            "orders": ["order_id", "user_id", "created_at"],
            "order_items": ["order_id", "product_id", "sale_price"],
            "products": ["id", "sku", "cost", "category", "retail_price"],
        },
    )
    defect = orphan_items or null_user or drop_col
    assert res.ok == (not defect), res.reasons


_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abc XYZ\t")), min_size=0, max_size=20
    ),
    min_size=1,
    max_size=30,
)


@pytest.mark.slow
@given(texts=_texts)
@_SETTINGS
def test_exact_dedup_partitions_corpus(spark, texts):
    doc = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    groups = exact_duplicates(doc).collect()
    assert sum(r["n_docs"] for r in groups) == len(texts)
    n_norm = doc.select(normalize_text("text")).distinct().count()
    assert len(groups) == n_norm


# ---------------------------------------------------------------------------
# SCD2 invariants: for ANY dimension state + update batch (deduped per key),
# the merged result keeps exactly one current row per live key, closes rows
# only at the update's effective date, and never loses a version.
# ---------------------------------------------------------------------------

_scd_key = st.integers(min_value=1, max_value=6)
_scd_price = st.sampled_from([10.0, 20.0, 30.0])
_dim_row = st.tuples(_scd_key, _scd_price)
_upd_row = st.tuples(_scd_key, _scd_price)


@given(
    dim_rows=st.lists(_dim_row, min_size=1, max_size=6, unique_by=lambda t: t[0]),
    upd_rows=st.lists(_upd_row, min_size=0, max_size=6, unique_by=lambda t: t[0]),
)
@pytest.mark.slow
@_SETTINGS
def test_scd2_invariants(spark, dim_rows, upd_rows):
    from ecs_ecommerce_data_pipeline_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [(k, p, "2023-01-01", None, True) for k, p in dim_rows],
        "id long, price double, valid_from string, valid_to string, is_current boolean",
    )
    upd = spark.createDataFrame(
        [(k, p, "2024-06-01") for k, p in upd_rows],
        "id long, price double, eff_date string",
    ) if upd_rows else spark.createDataFrame(
        [], "id long, price double, eff_date string"
    )
    out = scd2_apply(dim, upd, key="id", attrs=["price"]).collect()

    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["id"], []).append(r)
    live_keys = {k for k, _ in dim_rows} | {k for k, _ in upd_rows}
    assert set(by_key) == live_keys
    dim_prices = dict(dim_rows)
    upd_prices = dict(upd_rows)
    for k, rows in by_key.items():
        current = [r for r in rows if r["is_current"]]
        assert len(current) == 1, (k, rows)  # exactly one current version
        closed = [r for r in rows if not r["is_current"]]
        for r in closed:
            assert r["valid_to"] == "2024-06-01"
        # current row carries the update's price if one arrived, else the
        # original
        want = upd_prices.get(k, dim_prices.get(k))
        assert current[0]["price"] == want
        # version count: 2 iff the key existed and got a DIFFERENT price
        expect_versions = (
            2
            if k in dim_prices
            and k in upd_prices
            and dim_prices[k] != upd_prices[k]
            else 1
        )
        assert len(rows) == expect_versions, (k, rows)


# --- round-2 additions: KS bounds, as-of reference equivalence, BPE ---

_vals = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.sampled_from(["a", "b"])),
    min_size=2,
    max_size=60,
).filter(lambda rs: {s for _, s in rs} == {"a", "b"})


@pytest.mark.slow
@given(rows=_vals)
@_SETTINGS
def test_ks_statistic_bounds_and_symmetry(spark, rows):
    """0 <= KS <= 1 for any two samples, and KS(a,b) == KS(b,a)."""
    from ecs_ecommerce_data_pipeline_spark.operators.drift import ks_two_sample

    df = spark.createDataFrame(rows, "v int, smp string")
    ab = ks_two_sample(df, "v", "smp", "a", "b").collect()[0]
    ba = ks_two_sample(df, "v", "smp", "b", "a").collect()[0]
    assert 0.0 <= ab["ks_stat"] <= 1.0
    assert ab["ks_stat"] == ba["ks_stat"]
    assert ab["ks_at_value"] == ba["ks_at_value"]


_asof_left = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=25
)
_asof_right = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 99)),
    min_size=0,
    max_size=25,
)


@pytest.mark.slow
@given(left=_asof_left, right=_asof_right)
@_SETTINGS
def test_asof_join_matches_naive_reference(spark, left, right):
    """The union-carry as-of join equals the quadratic reference
    implementation (per left row: max-ts right row with ties toward the
    larger value) for ANY inputs, including duplicate (key, ts) rows on
    both sides."""
    from ecs_ecommerce_data_pipeline_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(k, float(t), i) for i, (k, t) in enumerate(left)],
        "k long, ts double, row_id long",
    )
    rdf = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in right], "k long, rts double, val long"
    )
    got = {
        r["row_id"]: r["asof_val"]
        for r in asof_join(ldf, rdf, "k", "ts", "rts", "val").collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, cands)


_words = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=4), min_size=1, max_size=12
)


@pytest.mark.slow
@given(words=_words)
@_SETTINGS
def test_bpe_first_merge_is_true_max_pair(spark, words):
    """Round-1 merged pair count must equal the exact pandas-computed
    max adjacent-pair count over the word-frequency table."""
    from collections import Counter

    from ecs_ecommerce_data_pipeline_spark.operators.bpe import bpe_merge_rounds

    doc = spark.createDataFrame([(1, " ".join(words))], "doc_id int, text string")
    wf = Counter(words)
    pair_counts: Counter = Counter()
    for w, c in wf.items():
        for x, y in zip(w, w[1:]):
            pair_counts[(x, y)] += c
    if not pair_counts:
        # all 1-char words: no pairs, no merges — operator yields rows
        # with NULL merged_token (LIMIT 1 of an empty aggregate)
        out = bpe_merge_rounds(doc, rounds=1).collect()
        assert all(r["merged_token"] is None for r in out)
        return
    out = {r["round"]: r for r in bpe_merge_rounds(doc, rounds=1).collect()}
    best_cnt = max(pair_counts.values())
    best_pair = min(p for p, c in pair_counts.items() if c == best_cnt)
    assert out[1]["pair_cnt"] == best_cnt
    assert out[1]["merged_token"] == "".join(best_pair)


# --- balance folds: window identity and settle fold vs reference loops ---

_amounts = st.lists(
    st.integers(min_value=-500, max_value=900), min_size=1, max_size=40
)


@given(
    per_cust=st.lists(_amounts, min_size=1, max_size=4),
    cap=st.integers(min_value=100, max_value=2000),
)
@_SETTINGS
def test_capped_balance_window_identity_matches_loop(spark, per_cust, cap):
    """The pure-window clip identity (bal = S - max(0, runmax(S) - cap))
    must equal the sequential reference fold for ARBITRARY SIGNED
    amounts, not just the positive order totals of the dataset."""
    from ecs_ecommerce_data_pipeline_spark.queries.balance_q import capped_balances

    rows = []
    want = {}
    for ci, amounts in enumerate(per_cust):
        bal = hits = 0
        for i, x in enumerate(amounts):
            # dollars-with-cents to survive the decimal(18,2)*100 cast
            rows.append((ci, i, f"2024-{i // 28 + 1:02d}-{i % 28 + 1:02d}", x / 100))
            # reference loop works in the same (date, orderkey) order the
            # operator pins — generate dates already ascending per i
            bal = bal + x
            if bal > cap:
                bal = cap
                hits += 1
        want[ci] = (len(amounts), hits, bal / 100)
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderkey long, o_orderdate string, o_totalprice double"
    )
    got = {
        r["o_custkey"]: (r["n_orders"], r["n_caps_hit"], round(r["final_balance"], 2))
        for r in capped_balances(orders, cap_cents=cap).collect()
    }
    assert got == {k: (n, h, round(b, 2)) for k, (n, h, b) in want.items()}


@given(
    per_cust=st.lists(
        st.lists(st.integers(min_value=0, max_value=900), min_size=1, max_size=40),
        min_size=1,
        max_size=4,
    ),
    cap=st.integers(min_value=100, max_value=2000),
)
@pytest.mark.slow
@_SETTINGS
def test_settled_balance_fold_matches_loop(spark, per_cust, cap):
    """The vectorized searchsorted segment fold must equal the
    sequential reset-on-cap reference (nonnegative amounts — the
    monotone-cumsum precondition of the kernel)."""
    from ecs_ecommerce_data_pipeline_spark.queries.balance_q import settled_balances

    rows = []
    want = {}
    for ci, amounts in enumerate(per_cust):
        bal = settles = 0
        for i, x in enumerate(amounts):
            rows.append((ci, i, f"2024-{i // 28 + 1:02d}-{i % 28 + 1:02d}", x / 100))
            if bal + x > cap:
                bal = 0
                settles += 1
            else:
                bal += x
        want[ci] = (len(amounts), settles, bal / 100)
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderkey long, o_orderdate string, o_totalprice double"
    )
    got = {
        r["o_custkey"]: (
            r["n_orders"],
            r["n_settlements"],
            round(r["final_balance"], 2),
        )
        for r in settled_balances(orders, cap_cents=cap).collect()
    }
    assert got == {k: (n, s, round(b, 2)) for k, (n, s, b) in want.items()}


# --- round-4 operators -----------------------------------------------------


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=80
    ),
    n_batches=st.integers(min_value=1, max_value=4),
    n_bins=st.sampled_from([4, 16]),
    q=st.sampled_from([0.25, 0.5, 0.9]),
)
@pytest.mark.slow
@_SETTINGS
def test_quantile_bin_merge_estimate_within_one_bin(
    spark, vals, n_batches, n_bins, q
):
    """For ANY values, ANY batch split, and ANY bin count: batch states
    merged by count sum must estimate each quantile within one bin width
    of the exact order statistic at rank ceil(q·N)."""
    import math

    from ecs_ecommerce_data_pipeline_spark.operators.sketch import (
        quantile_bin_state,
        quantile_from_bins,
        quantile_value_stats,
    )

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i long, v double"
    )
    stats = quantile_value_stats(df, "v")
    states = [
        quantile_bin_state(
            df.filter(F.col("i") % n_batches == b), "v", stats, n_bins
        )
        for b in range(n_batches)
    ]
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    merged = merged.groupBy("bin").agg(F.sum("c").cast("bigint").alias("c"))
    got = {
        r["q"]: r["est"]
        for r in quantile_from_bins(merged, stats, [q], n_bins).collect()
    }
    srt = sorted(vals)
    exact = float(srt[max(0, math.ceil(q * len(vals)) - 1)])
    width = (max(vals) - min(vals)) / n_bins if max(vals) > min(vals) else 0.0
    assert abs(got[q] - exact) <= width + 1e-9


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(
                ["the", "a", "of", "value", "table", "zz", "x1", "data"]
            ),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@pytest.mark.slow
@_SETTINGS
def test_gopher_rules_match_python_reference(spark, docs):
    """Rule signals must equal a naive per-doc Python computation for
    arbitrary word mixes."""
    from collections import Counter

    from ecs_ecommerce_data_pipeline_spark.operators.text import (
        STOPWORDS_EN,
        gopher_rules,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    for i, words in enumerate(docs):
        c = Counter(words)
        n = len(words)
        r = got[i]
        assert r["n_words"] == n
        assert abs(r["mean_word_len"] - sum(map(len, words)) / n) < 1e-12
        assert r["stop_hits"] == len(
            {w for w in words if w in STOPWORDS_EN}
        )
        assert abs(r["top_word_share"] - max(c.values()) / n) < 1e-12
        assert r["rule_repetition"] == (max(c.values()) / n <= 0.12)


@given(
    words=st.lists(
        st.sampled_from(["aaab", "abab", "banana", "cc", "a"]),
        min_size=2,
        max_size=30,
    ),
    rounds=st.integers(min_value=1, max_value=3),
)
@pytest.mark.slow
@_SETTINGS
def test_bpe_encode_preserves_character_mass(spark, words, rounds):
    """Merges re-segment words but never create or destroy characters:
    Σ n_occurrences·len(token) over the FULL encoded vocabulary must
    equal Σ count(word)·len(word) over the corpus."""
    from ecs_ecommerce_data_pipeline_spark.operators.bpe import (
        bpe_encode_tokens,
    )

    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    vocab = bpe_encode_tokens(df, rounds=rounds, top_n=10_000).collect()
    got_chars = sum(r["n_occurrences"] * len(r["token"]) for r in vocab)
    want_chars = sum(len(w) for w in words)
    assert got_chars == want_chars
