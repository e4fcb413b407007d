r"""The full dataset-build pipeline as ONE composed logical plan.

``corpus_curation_pipeline`` ends at corpus stats; this is the rest of
the production flow — the output a training run actually consumes:

    clean → quality gate → exact dedup (canonical) → corpus-LM score
    (trained on the deduped corpus) → LM filter → deterministic
    train/val/test split → char-budget shard packing → shard manifest

Every stage is an already-oracle-proven operator; the value here is the
COMPOSITION: Catalyst fuses the clean/gate/hash projections into the
scan, the dominant shuffles are the dedup groupBy, the bigram frequency
aggregation + join, and the per-split packing window (the LM stage's
doc-bigram subtree is referenced twice — frequency build and score
join — so it is localCheckpoint-ed once instead of letting Catalyst
evaluate the dedup+tokenize chain twice; values and oracle unchanged) — and the oracle
reproduces the entire chain end-to-end, so a hash match certifies the
handoffs between stages, not just the stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.bpe import SEP  # noqa: F401  (documents the \x01 family)
from ..operators.dedup import normalize_text
from ..operators.lmscore import bigram_lm_scores
from ..operators.sampling import assign_split, pack_shards
from ..operators.text import clean_staged_arrow, clean_text  # noqa: F401
from ..sources.testdata import load_table

_RARE_MAX = 0.05
_BUDGET = 20_000

_CLEAN = (
    "trim(regexp_replace(regexp_replace(regexp_replace(text,"
    " '<[^>]*>', ' ', 'g'),"
    " '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),"
    " '[ \\t]{2,}', ' ', 'g'))"
)

_BUILD_SQL = rf"""
WITH cleaned AS (
    SELECT doc_id, {_CLEAN} AS text FROM documents
),
staged AS (
    SELECT doc_id, text,
           CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM cleaned
),
gated AS (
    SELECT * FROM staged WHERE n_words >= 5 AND n_alpha * 10 >= n_chars * 4
),
canon AS (
    SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
           MIN(doc_id) AS doc_id,
           MIN(text) AS text,
           MIN(n_chars) AS n_chars
    FROM gated
    GROUP BY text_hash
),
toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM canon
),
bg AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i + 1])) AS bigram
    FROM toks WHERE len(t) >= 2
),
db AS (
    SELECT doc_id, ('0x' || substr(md5(bigram), 1, 15))::BIGINT AS bg_h,
           count(*) AS m
    FROM bg GROUP BY doc_id, 2
),
freq AS (
    SELECT bg_h, CAST(sum(m) AS BIGINT) AS c FROM db GROUP BY bg_h
),
lm AS (
    SELECT d.doc_id,
           CAST(sum(d.m) AS BIGINT) AS n_bigrams,
           CAST(sum(d.m * length(bin(f.c))) AS BIGINT) AS sum_bits,
           CAST(sum(CASE WHEN f.c = 1 THEN d.m ELSE 0 END) AS DOUBLE)
               / CAST(sum(d.m) AS DOUBLE) AS rare_ratio
    FROM db d JOIN freq f USING (bg_h)
    GROUP BY d.doc_id
),
kept AS (
    SELECT c.doc_id, c.n_chars, l.n_bigrams, l.sum_bits
    FROM canon c JOIN lm l USING (doc_id)
    WHERE l.rare_ratio <= {_RARE_MAX}
),
split_assigned AS (
    SELECT *,
           CASE
             WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'train'
             WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 95 THEN 'val'
             ELSE 'test'
           END AS split
    FROM kept
),
packed AS (
    SELECT *,
           SUM(n_chars) OVER (PARTITION BY split ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_chars AS prefix
    FROM split_assigned
)
SELECT split,
       CAST(FLOOR(prefix / {_BUDGET}) AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
       CAST(SUM(sum_bits) AS DOUBLE) / CAST(SUM(n_bigrams) AS DOUBLE) AS lm_avg_bits
FROM packed
GROUP BY split, 2
"""


@register("dataset_build_pipeline", _BUILD_SQL)
def q_dataset_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean → gate → dedup → LM-score → filter → split → pack →
    manifest, one composed plan (see module docstring)."""
    doc = load_table(spark, sf_dir, "documents")
    # round 12 (guide §4.2; VERDICT item 7 — measured first): the
    # clean + gate stage ran FOUR Catalyst regex traversals of the full
    # text (3 regexp_replace + split-count + regexp_count); the Arrow
    # kernel computes the same cleaned text and the same three gate
    # statistics in one pass (A/B at sf0.1: 1.0 s -> 0.7 s warm on the
    # stage, values row-identical; patterns are pure-ASCII classes so
    # Java regex and Python re agree byte-for-byte — see
    # operators.text.clean_staged_arrow's value contract)
    staged = clean_staged_arrow(doc).filter(
        (F.col("n_words") >= 5) & (F.col("n_alpha") * 10 >= F.col("n_chars") * 4)
    )
    canon = (
        staged.groupBy(F.md5(normalize_text("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("text").alias("text"),
            F.min("n_chars").alias("n_chars"),
        )
    )
    # canon feeds the LM subtree AND the score join: one lineage cut
    # stops the scan→gate→dedup chain evaluating twice
    canon = canon.localCheckpoint(eager=False)
    lm = bigram_lm_scores(canon.select("doc_id", "text"), materialize=True)
    kept = (
        canon.join(lm.select("doc_id", "n_bigrams", "sum_bits", "rare_ratio"), "doc_id")
        .filter(F.col("rare_ratio") <= _RARE_MAX)
        .select("doc_id", "n_chars", "n_bigrams", "sum_bits")
    )
    split_assigned = assign_split(kept, "doc_id")
    packed = pack_shards(
        split_assigned, part_col="split", order_col="doc_id",
        cost_col="n_chars", budget=_BUDGET,
    )
    return packed.groupBy("split", "shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("shard_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
        (F.sum("sum_bits").cast("double") / F.sum("n_bigrams").cast("double"))
        .alias("lm_avg_bits"),
    )
