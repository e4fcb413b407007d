"""Robust-statistics curation queries: outlier clipping by exact
quantiles.

Cross-engine note: both Spark ``percentile`` and DuckDB
``quantile_cont`` interpolate lo + (hi−lo)·frac at rank (n−1)·q over
the sorted group — empirically bit-identical on this corpus (the same
property ``stats_quantiles_exact`` pins), so the clip thresholds and
therefore every clipped value hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.curation import winsorize
from ..sources.testdata import load_table

_WINSORIZE_SQL = """
WITH thr AS (
    SELECT lang,
           quantile_cont(n_chars, 0.05) AS lo,
           quantile_cont(n_chars, 0.95) AS hi
    FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars,
       LEAST(GREATEST(CAST(d.n_chars AS DOUBLE), t.lo), t.hi) AS n_chars_winsorized,
       (CAST(d.n_chars AS DOUBLE) < t.lo OR CAST(d.n_chars AS DOUBLE) > t.hi) AS clipped
FROM documents d JOIN thr t USING (lang)
"""


@register("winsorize_doc_lengths", _WINSORIZE_SQL)
def q_winsorize_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language 5%/95% winsorization of document lengths: one
    quantile aggregation, broadcast thresholds, map-only clip."""
    docs = load_table(spark, sf_dir, "documents")
    return winsorize(docs, "n_chars", "lang").select(
        "doc_id", "lang", "n_chars", "n_chars_winsorized", "clipped"
    )


_MAD_SQL = """
WITH med AS (
    SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM documents GROUP BY lang
),
dev AS (
    SELECT d.doc_id, d.lang, d.n_chars,
           ABS(CAST(d.n_chars AS DOUBLE) - m.med) AS dev
    FROM documents d JOIN med m USING (lang)
),
mad AS (
    SELECT lang, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY lang
)
SELECT v.doc_id, v.lang, v.n_chars, v.dev,
       (v.dev > 3.0 * m.mad) AS is_outlier
FROM dev v JOIN mad m USING (lang)
"""


@register("mad_outliers_doc_lengths", _MAD_SQL)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier flags on document lengths per language
    — the 50%-breakdown companion to the z-score ``stats_outliers``."""
    from ..operators.curation import mad_outliers

    docs = load_table(spark, sf_dir, "documents")
    return mad_outliers(docs, "n_chars", "lang").select(
        "doc_id", "lang", "n_chars", "dev", "is_outlier"
    )
