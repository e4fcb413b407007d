"""Weight-driven analytics: time-decayed scoring and quality-weighted
Poisson sampling.

Determinism notes (the reason these hash-match a foreign engine):

* decay weights are exact powers of two (``1 / (1 << weeks)``) — every
  per-row product is one IEEE double multiply on identical inputs;
* per-row scores are scaled by 2^20 and FLOORed to BIGINT before the
  distributed sum (associative integer arithmetic — partitioning-
  independent, and immune to the double-vs-decimal rounding divergence
  between engines);
* sampling draws come from the md5 u01 idiom shared with
  ``operators.sampling``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.sampling import weighted_sample
from ..sources.testdata import load_table

# Weekly half-life, capped at 40 weeks (2^-40 ≈ 1e-12 — below money
# resolution; the cap also keeps the shift in BIGINT range).
_DECAY_SQL = """
WITH s AS (
    SELECT o_custkey,
           FLOOR((o_totalprice * (1.0 / (CAST(1 AS BIGINT) <<
               CAST(LEAST(FLOOR(GREATEST(0,
                   date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')) / 7.0),
                   40) AS INT))))
               * 1048576.0)::BIGINT AS scaled
    FROM orders
)
SELECT o_custkey,
       CAST(CAST(SUM(scaled) AS BIGINT) AS DOUBLE) / 1048576.0 AS decayed_revenue
FROM s
GROUP BY o_custkey
ORDER BY decayed_revenue DESC, o_custkey
LIMIT 100
"""


@register("customer_decay_score", _DECAY_SQL)
def q_customer_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 customers by exponentially time-decayed revenue (weekly
    half-life anchored at 1998-12-31) — the recency-weighted customer
    value score behind churn/LTV models, computed map-side + one agg."""
    orders = load_table(spark, sf_dir, "orders")
    days = F.greatest(
        F.lit(0),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ),
    )
    weeks = F.least(F.floor(days / F.lit(7.0)), F.lit(40)).cast("int")
    scored = (
        orders.withColumn("_weeks", weeks)
        .withColumn("_wgt", F.expr("1.0 / shiftleft(CAST(1 AS BIGINT), _weeks)"))
        .withColumn(
            "_scaled",
            F.floor(
                (F.col("o_totalprice") * F.col("_wgt")) * F.lit(1048576.0)
            ).cast("bigint"),
        )
    )
    return (
        scored.groupBy("o_custkey")
        .agg(
            (F.sum("_scaled").cast("double") / F.lit(1048576.0)).alias(
                "decayed_revenue"
            )
        )
        .orderBy(F.desc("decayed_revenue"), "o_custkey")
        .limit(100)
    )


_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE ('0x' || substr(md5('wsamp' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
      < LEAST(GREATEST(n_chars / 256.0, 0.0), 1.0) * 1000000
"""


@register("weighted_sample_quality", _WEIGHTED_SAMPLE_SQL)
def q_weighted_sample_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional Poisson sample of the documents corpus:
    inclusion probability = min(n_chars/256, 1). Map-only, seedless,
    layout-stable — the deterministic form of quality-weighted corpus
    downsampling."""
    docs = load_table(spark, sf_dir, "documents")
    wgt = F.col("n_chars") / F.lit(256.0)
    return weighted_sample(docs, "doc_id", wgt, salt="wsamp").select(
        "doc_id", "lang", "source", "n_chars"
    )


# --- DSIR-style hashed n-gram importance weights ---------------------------

_DSIR_B = 4096  # feature buckets (hashed unigrams + bigrams)
_DSIR_TOP = 100
_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

# Quantized-ln idiom: every λ term is FLOOR(ln(integer) · 2^20) — ln runs
# on an exact integer-valued double in both engines, the 2^20 quantum
# keeps a last-ulp libm divergence harmless (~1e-10/term), and everything
# downstream is associative BIGINT arithmetic.
_DSIR_SQL = f"""
WITH t AS (
    SELECT doc_id, lang, lang = 'en' AS tgt, {_TOKS} AS toks FROM documents
),
g AS (
    SELECT doc_id, lang, tgt,
           unnest(list_concat(toks,
               CASE WHEN len(toks) >= 2
                    THEN list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1])
                    ELSE [] END)) AS gram
    FROM t
),
b AS (
    SELECT doc_id, lang, tgt,
           ('0x' || substr(md5('dsir:' || gram), 1, 15))::BIGINT % {_DSIR_B}
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM g GROUP BY 1, 2, 3, 4
),
bt AS (
    SELECT bucket,
           CAST(SUM(CASE WHEN tgt THEN cnt ELSE 0 END) AS BIGINT) AS ct,
           CAST(SUM(cnt) AS BIGINT) AS cr
    FROM b GROUP BY bucket
),
tot AS (
    SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr
    FROM bt
),
lam AS (
    SELECT bucket,
           CAST(FLOOR(LN(CAST(ct + 1 AS DOUBLE)) * 1048576.0) AS BIGINT)
         + CAST(FLOOR(LN(CAST(nr + {_DSIR_B} AS DOUBLE)) * 1048576.0) AS BIGINT)
         - CAST(FLOOR(LN(CAST(cr + 1 AS DOUBLE)) * 1048576.0) AS BIGINT)
         - CAST(FLOOR(LN(CAST(nt + {_DSIR_B} AS DOUBLE)) * 1048576.0) AS BIGINT)
               AS lam_q
    FROM bt CROSS JOIN tot
),
pd AS (
    SELECT b.doc_id, b.lang,
           CAST(SUM(b.cnt) AS BIGINT) AS n_grams,
           CAST(SUM(b.cnt * l.lam_q) AS BIGINT) AS wq
    FROM b JOIN lam l USING (bucket)
    GROUP BY 1, 2
)
SELECT doc_id, lang, n_grams,
       (CAST(wq AS DOUBLE) / 1048576.0) / n_grams AS avg_logratio
FROM pd
ORDER BY avg_logratio DESC, doc_id
LIMIT {_DSIR_TOP}
"""


@register("dsir_importance_weights", _DSIR_SQL)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169): score every raw-corpus document by the
    log-likelihood ratio of a hashed-n-gram bag-of-words model of the
    TARGET distribution (here: the English slice, standing in for the
    curated target corpus) vs the RAW distribution (the whole corpus) —
    the standard pre-training trick for selecting raw data that "looks
    like" a high-quality target domain.

    Features are unigrams + bigrams hashed into 4096 buckets (the
    paper's hashed n-gram generative model); per-bucket
    λ(b) = ln p_target(b) − ln p_raw(b) with add-one smoothing; a doc's
    weight is its length-normalized Σ counts·λ, reported for the top
    100. Every λ term is FLOOR(ln(int)·2^20) BIGINT (see module note) so
    the cross-engine hash matches exactly.

    Scale shape: ONE explode over the token stream feeding a
    map-side-combinable (doc, bucket) count agg; bucket totals are a
    4096-row agg of that; λ is 4096 rows × a 1-row broadcast total and
    is itself broadcast into the per-doc join — the corpus shuffles
    once, keyed by doc. Top-100 is TakeOrdered, never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    t = docs.select(
        "doc_id",
        "lang",
        (F.col("lang") == "en").alias("tgt"),
        toks.alias("toks"),
    )
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat(
                F.element_at("toks", i), F.lit(" "), F.element_at("toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = t.select(
        "doc_id",
        "lang",
        "tgt",
        F.explode(F.concat(F.col("toks"), bigrams)).alias("gram"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dsir:"), F.col("gram"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % _DSIR_B
    )
    # round 11 (guide §2.4/§5): ``b`` feeds BOTH the bucket-total /
    # λ broadcast subtree and the per-doc weight join — one plan would
    # otherwise run the explode + md5 over every gram TWICE (no CSE
    # across the broadcast boundary).  ``b`` is bounded (≤ docs × 4096
    # bucket rows of integers), so a lazy localCheckpoint materializes
    # it once and both consumers read the checkpointed blocks.
    b = (
        g.select("doc_id", "lang", "tgt", bucket.alias("bucket"))
        .groupBy("doc_id", "lang", "tgt", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    bt = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("tgt"), F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("ct"),
        F.sum("cnt").cast("bigint").alias("cr"),
    )
    tot = bt.agg(
        F.sum("ct").cast("bigint").alias("nt"),
        F.sum("cr").cast("bigint").alias("nr"),
    )

    def _lnq(x):
        return F.floor(F.log(x.cast("double")) * 1048576.0).cast("bigint")

    lam = bt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            _lnq(F.col("ct") + 1)
            + _lnq(F.col("nr") + _DSIR_B)
            - _lnq(F.col("cr") + 1)
            - _lnq(F.col("nt") + _DSIR_B)
        ).alias("lam_q"),
    )
    pd = (
        b.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.sum(F.col("cnt") * F.col("lam_q")).cast("bigint").alias("wq"),
        )
    )
    return (
        pd.select(
            "doc_id",
            "lang",
            "n_grams",
            ((F.col("wq").cast("double") / 1048576.0) / F.col("n_grams")).alias(
                "avg_logratio"
            ),
        )
        .orderBy(F.desc("avg_logratio"), "doc_id")
        .limit(_DSIR_TOP)
    )
