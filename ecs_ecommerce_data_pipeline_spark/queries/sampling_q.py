"""Deterministic sampling / split / shard-packing queries over
``documents`` — the reproducibility surface of a training-data pipeline
(operators in ``operators.sampling``; rationale + 100 TB posture there).

Oracle parity: the bucket hash is md5-hex→BIGINT on both sides —
Spark ``conv(substr(md5(k),1,15),16,10)`` ≡ DuckDB
``('0x' || substr(md5(k),1,15))::BIGINT`` — and sample fractions are
binary-exact (0.25) or integer cutoffs, so no float-rounding divergence
can flip a membership decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.sampling import (
    assign_split,
    hash_sample,
    pack_shards,
    stratified_sample,
)
from ..sources.testdata import load_table

# DuckDB rendering of operators.sampling.hash_bucket(doc_id, buckets)
_BUCKET = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % {m}"


_SPLIT_SQL = f"""
WITH b AS (
    SELECT doc_id, n_chars, {_BUCKET.format(m=100)} AS bucket
    FROM documents
)
SELECT CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM b
GROUP BY 1
"""


@register("split_train_val_test", _SPLIT_SQL)
def q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test assignment as a pure function of doc_id
    (map-only, rerun- and layout-stable), summarized per split with
    membership checksums."""
    doc = load_table(spark, sf_dir, "documents")
    return (
        assign_split(doc, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


_HASH_SAMPLE_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE {_BUCKET.format(m=1000000)} < 100000
"""


@register("sample_hash_10pct", _HASH_SAMPLE_SQL)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample (integer bucket cutoff, no
    ``rand``), checksummed. The same rows survive every rerun."""
    doc = load_table(spark, sf_dir, "documents")
    return hash_sample(doc, "doc_id", 0.1).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


_STRATIFIED_SQL = f"""
WITH h AS (
    SELECT doc_id, lang, {_BUCKET.format(m=1000000000)} AS hk
    FROM documents
),
r AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk,
           COUNT(*) OVER (PARTITION BY lang) AS n
    FROM h
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
FROM r
WHERE rk <= CEIL(n * 0.25)
GROUP BY lang
"""


@register("stratified_sample_lang", _STRATIFIED_SQL)
def q_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 25%-per-language sample by hash rank — every stratum is
    represented at the same rate regardless of corpus imbalance."""
    doc = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample(doc, "lang", "doc_id", 0.25)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        )
    )


_PACK_SQL = """
WITH p AS (
    SELECT source, doc_id, n_chars,
           SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_chars AS prefix
    FROM documents
)
SELECT source,
       CAST(FLOOR(prefix / 20000) AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS shard_chars
FROM p
GROUP BY source, 2
"""


@register("pack_char_shards", _PACK_SQL)
def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy-streaming shard packing: per source, consecutive docs fill
    a ~20k-char shard (running-sum window, no driver loop); returns
    per-shard doc counts and sizes."""
    doc = load_table(spark, sf_dir, "documents")
    packed = pack_shards(doc, "source", "doc_id", "n_chars", budget=20_000)
    return packed.groupBy("source", "shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("shard_chars"),
    )


_TOKEN_BUDGET = 512

# the same BPE-ish token proxy verified by tokenizer_fertility_by_lang
# (non-raw string: DuckDB must receive \s, not \\s)
_TOK_EXPR = "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"

_PACK_TOKEN_SQL = f"""
WITH RECURSIVE ranked AS (
    SELECT source, doc_id,
           CAST({_TOK_EXPR} AS BIGINT) AS n_tokens,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY CAST({_TOK_EXPR} AS BIGINT) DESC, doc_id) AS rn
    FROM documents
),
walk AS (
    SELECT source, rn, doc_id, n_tokens,
           n_tokens AS fill, 0 AS bin
    FROM ranked WHERE rn = 1
    UNION ALL
    SELECT r.source, r.rn, r.doc_id, r.n_tokens,
           CASE WHEN w.fill + r.n_tokens > {_TOKEN_BUDGET}
                THEN r.n_tokens ELSE w.fill + r.n_tokens END,
           w.bin + CASE WHEN w.fill + r.n_tokens > {_TOKEN_BUDGET}
                        THEN 1 ELSE 0 END
    FROM walk w JOIN ranked r
      ON r.source = w.source AND r.rn = w.rn + 1
)
SELECT source,
       CAST(bin AS BIGINT) AS bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / {_TOKEN_BUDGET}.0 AS fill_ratio,
       SUM(n_tokens) > {_TOKEN_BUDGET} AS is_overflow,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM walk
GROUP BY source, bin
"""


@register("pack_token_budget", _PACK_TOKEN_SQL)
def q_pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (next-fit-decreasing, 512-token
    bins): the step that turns curated documents into fixed-budget
    training sequences.  No bin exceeds the budget except a single
    oversized document's own bin (flagged ``is_overflow``); every doc is
    packed exactly once (pinned by tests/test_sampling.py property
    tests).  The oracle walks the identical recurrence as a recursive
    CTE; the engine runs it as a per-bin-vectorized numpy fold behind
    one repartition+sort (``operators.sampling.pack_token_budget``)."""
    from ..operators.sampling import pack_token_budget
    from ..operators.text import bpe_ish_token_count

    doc = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", bpe_ish_token_count("text").cast("bigint").alias("n_tok")
    )
    packed = pack_token_budget(
        doc, part_col="source", token_col="n_tok", id_col="doc_id",
        budget=_TOKEN_BUDGET,
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        (F.sum("n_tokens").cast("double") / F.lit(float(_TOKEN_BUDGET))).alias(
            "fill_ratio"
        ),
        (F.sum("n_tokens") > _TOKEN_BUDGET).alias("is_overflow"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )


_ES_SQL = """
WITH scored AS (
    SELECT lang, doc_id, n_chars,
           FLOOR(
             ln((('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 15))::BIGINT + 1)
                 / 1152921504606846976.0)
             / CAST(n_chars AS DOUBLE) * 1048576.0
           ) AS es_q
    FROM documents WHERE n_chars > 0
),
ranked AS (
    SELECT lang, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY es_q DESC, doc_id ASC) AS rnk
    FROM scored
)
SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars
FROM ranked WHERE rnk <= 20
"""


@register("weighted_exact_k_sample", _ES_SQL)
def q_weighted_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis exact-k (20 per language) weighted sample,
    weights = document length: size-pinned, without replacement, one
    window over a map-computed quantized key."""
    from ..operators.sampling import weighted_sample_exact_k

    doc = load_table(spark, sf_dir, "documents")
    # the raw quantized key stays OUT of the hash-compared output —
    # selection and rank are the contract, the key is an internal
    return weighted_sample_exact_k(
        doc, key="doc_id", weight_col="n_chars", k=20, stratum="lang"
    ).select("lang", "rnk", "doc_id", "n_chars")


# ---------------------------------------------------------------------------
# Length-bucketed batching: padding-waste accounting
# ---------------------------------------------------------------------------

_LEN_BUCKETS = [16, 32, 64, 128]

_BUCKET_CASE = (
    "CASE "
    + " ".join(
        f"WHEN n <= {b} THEN {b}" for b in _LEN_BUCKETS
    )
    + f" ELSE {2 * _LEN_BUCKETS[-1]} END"
)

_LEN_BUCKET_SQL = f"""
WITH t AS (
    SELECT doc_id,
           len(string_split_regex(lower(trim(text)), '\\s+')) AS n
    FROM documents
),
b AS (SELECT doc_id, n, {_BUCKET_CASE} AS bucket FROM t)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS sum_tokens,
       CAST(SUM(bucket - n) AS BIGINT) AS padding_waste,
       CAST(SUM(bucket - n) AS DOUBLE) / SUM(bucket) AS waste_ratio
FROM b
GROUP BY bucket
"""


@register("pack_length_buckets", _LEN_BUCKET_SQL)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching accounting: each document rounds up to
    the smallest power-of-two token bucket (the padding-free batching
    trick — batches mix only same-bucket sequences), reporting per
    bucket the docs, real tokens, padded-token waste, and waste share.
    The bucket rule is an integer CASE ladder — no float log2, whose
    libm boundary behavior differs across engines.  One scan, one hash
    aggregation."""
    from ..functions.textfn import tokens

    doc = load_table(spark, sf_dir, "documents")
    n = F.size(tokens("text"))
    bucket = F.lit(2 * _LEN_BUCKETS[-1])
    for b in reversed(_LEN_BUCKETS):
        bucket = F.when(n <= b, F.lit(b)).otherwise(bucket)
    t = doc.select(n.alias("n"), bucket.alias("bucket"))
    return t.groupBy(F.col("bucket").cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("sum_tokens"),
        F.sum(F.col("bucket") - F.col("n")).cast("bigint").alias("padding_waste"),
        (
            F.sum(F.col("bucket") - F.col("n")).cast("double")
            / F.sum("bucket")
        ).alias("waste_ratio"),
    )
