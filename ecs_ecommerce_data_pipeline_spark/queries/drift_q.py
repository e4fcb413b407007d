"""Distribution-drift and mixture-reweighting queries.

The ref/cur split is the engine's deterministic md5 parity of doc_id
(same idiom as ``operators.sampling.hash_bucket`` — reproducible in any
engine, stable under repartitioning), standing in for "last month's
corpus vs this ingest batch".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.drift import ks_two_sample, mix_weights, psi_bins
from ..operators.sampling import hash_bucket
from ..sources.testdata import load_table

_SMP_SQL = (
    "CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 "
    "THEN 'ref' ELSE 'cur' END"
)


def _with_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn(
        "smp",
        F.when(hash_bucket("doc_id", 2) == 0, F.lit("ref")).otherwise(F.lit("cur")),
    )


_KS_SQL = f"""
WITH s AS (
    SELECT n_chars AS v, {_SMP_SQL} AS smp FROM documents
    WHERE n_chars IS NOT NULL
),
counts AS (
    SELECT v,
           CAST(sum(CASE WHEN smp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
           CAST(sum(CASE WHEN smp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS c_b
    FROM s GROUP BY v
),
tot AS (
    SELECT CAST(sum(c_a) AS BIGINT) AS n_a, CAST(sum(c_b) AS BIGINT) AS n_b
    FROM counts
),
cdf AS (
    SELECT v,
           CAST(sum(c_a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
           CAST(sum(c_b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
    FROM counts
)
SELECT t.n_a, t.n_b,
       -- same empty-sample rule as the engine (operators/drift.py): a
       -- one-sided comparison has no KS statistic — NULL stat AND NULL
       -- location, never a /0 artifact
       CASE WHEN t.n_a > 0 AND t.n_b > 0 THEN
           ABS(CAST(c.cum_a AS DOUBLE) / CAST(t.n_a AS DOUBLE)
             - CAST(c.cum_b AS DOUBLE) / CAST(t.n_b AS DOUBLE))
       END AS ks_stat,
       CASE WHEN t.n_a > 0 AND t.n_b > 0 THEN CAST(c.v AS DOUBLE)
       END AS ks_at_value
FROM cdf c, tot t
ORDER BY ks_stat DESC NULLS LAST, c.v ASC
LIMIT 1
"""


@register("drift_ks_doc_lengths", _KS_SQL)
def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic on document lengths between the md5-parity
    ref/cur corpus halves. Exact-integer CDFs — hash-stable."""
    return ks_two_sample(_with_sample(spark, sf_dir), "n_chars", "smp", "ref", "cur")


_PSI_SQL = f"""
WITH s AS (
    SELECT CAST(n_chars AS DOUBLE) AS v, {_SMP_SQL} AS smp FROM documents
    WHERE n_chars IS NOT NULL
),
edges AS (
    SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
    FROM s WHERE smp = 'ref'
),
binned AS (
    SELECT CAST(len(list_filter(e.e, x -> s.v > x)) AS BIGINT) AS bin, s.smp
    FROM s, edges e
),
agg AS (
    SELECT bin,
           CAST(sum(CASE WHEN smp = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
           CAST(sum(CASE WHEN smp = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
    FROM binned GROUP BY bin
),
tot AS (
    SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref, CAST(sum(c_cur) AS BIGINT) AS n_cur
    FROM agg
),
terms AS (
    SELECT a.bin, a.c_ref, a.c_cur,
           CAST(a.c_ref + 1 AS DOUBLE) / (CAST(t.n_ref AS DOUBLE) + 10.0) AS p_ref,
           CAST(a.c_cur + 1 AS DOUBLE) / (CAST(t.n_cur AS DOUBLE) + 10.0) AS p_cur
    FROM agg a, tot t
)
SELECT bin, c_ref, c_cur, p_ref, p_cur,
       CAST(FLOOR((p_cur - p_ref) * ln(p_cur / p_ref) * 1099511627776.0) AS BIGINT) AS psi_term_q,
       CAST(sum(CAST(FLOOR((p_cur - p_ref) * ln(p_cur / p_ref) * 1099511627776.0) AS BIGINT))
            OVER () AS BIGINT) AS psi_total_q
FROM terms
"""


@register("drift_psi_doc_lengths", _PSI_SQL)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI per decile bin (edges from the ref half's exact quantiles),
    Laplace-smoothed, fixed-point-quantized terms."""
    return psi_bins(_with_sample(spark, sf_dir), "n_chars", "smp", "ref", "cur")


_MIX_SQL = """
WITH c AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
t AS (
    SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_domains
    FROM c
)
SELECT c.source, c.n_docs,
       CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
       1.0 / CAST(t.n_domains AS DOUBLE) AS target_share,
       (1.0 / CAST(t.n_domains AS DOUBLE))
           / (CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE)) AS weight
FROM c, t
"""


@register("domain_mix_weights", _MIX_SQL)
def q_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling multipliers that re-mix the corpus toward a
    uniform domain distribution (DoReMi-style static reweighting)."""
    docs = load_table(spark, sf_dir, "documents")
    return mix_weights(docs, "source")


# α = 0.5 exactly, so share^α is sqrt(share) — sqrt is CORRECTLY
# ROUNDED in IEEE 754 (unlike pow, where libm implementations differ in
# the last ulp); the normalizer then sums FLOOR(sqrt·2^20) BIGINTs so
# aggregation order cannot move it either (the repo's standard
# quantized-transcendental idiom — 2^20 keeps the ulp-flip hazard
# negligible per the 2^S·1e-16 analysis in the verify notes).
_TEMP_SCALE = float(2**20)

_MIX_TEMP_SQL = f"""
WITH c AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM c),
p AS (
    SELECT c.source, c.n_docs,
           CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
           CAST(FLOOR(SQRT(CAST(c.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE))
                      * {_TEMP_SCALE!r}) AS BIGINT) AS pow_q
    FROM c, t
),
z AS (SELECT CAST(SUM(pow_q) AS BIGINT) AS z FROM p)
SELECT p.source, p.n_docs, p.share,
       CAST(p.pow_q AS DOUBLE) / CAST(z.z AS DOUBLE) AS target_share,
       (CAST(p.pow_q AS DOUBLE) / CAST(z.z AS DOUBLE)) / p.share AS weight
FROM p, z
"""


@register("domain_mix_temperature", _MIX_TEMP_SQL)
def q_domain_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain sampling (multilingual-LM style):
    target share ∝ share^α with α = 0.5 — up-weights rare sources
    without flattening to uniform (α=1 keeps the natural mix, α=0 is
    uniform). The per-source multiplier feeds the weighted samplers.
    Two tiny aggregations; the normalizer rides a 1-row broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    total = counts.agg(F.sum("n_docs").cast("bigint").alias("n_total"))
    share = F.col("n_docs").cast("double") / F.col("n_total").cast("double")
    p = counts.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        share.alias("share"),
        F.floor(F.sqrt(share) * F.lit(_TEMP_SCALE)).cast("bigint").alias("pow_q"),
    )
    z = p.agg(F.sum("pow_q").cast("bigint").alias("z"))
    tgt = F.col("pow_q").cast("double") / F.col("z").cast("double")
    return p.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "share",
        tgt.alias("target_share"),
        (tgt / F.col("share")).alias("weight"),
    )
