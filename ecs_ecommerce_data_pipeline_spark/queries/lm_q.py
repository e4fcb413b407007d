"""Bigram language-model quality scoring queries (corpus curation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register
from ..operators.lmscore import bigram_lm_scores
from ..sources.testdata import load_table

# Integer-exact LM score: bitlen(corpus bigram frequency) summed per doc.
# See operators/lmscore.py for why bit length replaces ln-probability
# (cross-engine hash stability).
_LM_SCORE_SQL = r"""
WITH toks AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
    FROM documents
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
)
SELECT d.doc_id,
       CAST(sum(d.m) AS BIGINT) AS n_bigrams,
       CAST(sum(d.m * length(bin(f.c))) AS BIGINT) AS sum_bits,
       CAST(sum(d.m * length(bin(f.c))) AS DOUBLE)
           / CAST(sum(d.m) AS DOUBLE) AS avg_bigram_bits,
       CAST(sum(CASE WHEN f.c = 1 THEN d.m ELSE 0 END) AS BIGINT) AS rare_bigrams,
       CAST(sum(CASE WHEN f.c = 1 THEN d.m ELSE 0 END) AS DOUBLE)
           / CAST(sum(d.m) AS DOUBLE) AS rare_ratio
FROM db d JOIN freq f USING (bg_h)
GROUP BY d.doc_id
"""


@register("text_lm_score", _LM_SCORE_SQL)
def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM quality score trained on the corpus itself
    — the integer-exact analogue of CCNet perplexity filtering."""
    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(docs)
