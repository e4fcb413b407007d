"""Ranked-retrieval + corpus-hygiene queries over ``documents`` and a
price-histogram over ``orders`` (LLM-pipeline extension surface).

Oracle parity notes: BM25 uses the rational idf (no log — every op is an
IEEE-correctly-rounded double op, bit-identical across engines; see
``operators.retrieval``) with constants written as identical decimal
literals on both sides, and routes per-doc score sums through DECIMAL.
Tokenization/shingling mirror ``queries.text_q`` / ``queries.dedup_q``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..functions.numeric import money_sum
from ..operators import retrieval
from ..sources.testdata import load_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

_QUERY_TERMS = ["hash", "join", "vector"]
_TOP_K = 10

_terms_sql = ", ".join(f"'{t}'" for t in _QUERY_TERMS)

_BM25_SQL = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
ex AS (SELECT doc_id, unnest(toks) AS term FROM t),
hits AS (SELECT doc_id, term FROM ex WHERE term IN ({_terms_sql})),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM hits GROUP BY 1, 2),
dfx AS (
    SELECT term, COUNT(*) AS df
    FROM (SELECT DISTINCT doc_id, term FROM hits) GROUP BY 1
),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
scored AS (
    SELECT tf.doc_id,
           CAST(
             ((n_docs - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * ((CAST(tf AS DOUBLE) * 2.2)
                / (CAST(tf AS DOUBLE)
                   + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
             AS DECIMAL(25,12)) AS term_score
    FROM tf JOIN dl USING (doc_id) JOIN dfx USING (term) CROSS JOIN stats
),
per_doc AS (
    SELECT doc_id, CAST(SUM(term_score) AS DOUBLE) AS score
    FROM scored GROUP BY 1
)
SELECT doc_id, score, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
    FROM per_doc
) WHERE rnk <= {_TOP_K}
"""


@register("bm25_retrieval", _BM25_SQL)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse ranked retrieval: BM25 top-k for a fixed query-term set —
    filter to query terms BEFORE any shuffle, broadcast the per-term df
    and 1-row corpus stats, decimal-routed score sum."""
    return retrieval.bm25_scores(
        load_table(spark, sf_dir, "documents"), _QUERY_TERMS, k=_TOP_K
    )


_EVAL_MOD = 97
_CONTAM_K = 3
_CONTAM_TOP = 50

_SHINGLES = f"""
t AS (SELECT doc_id, doc_id % {_EVAL_MOD} = 0 AS ev, {_TOKS} AS toks FROM documents),
sh AS (
    SELECT doc_id, ev, unnest(
        list_distinct(CASE WHEN len(toks) < {_CONTAM_K}
             THEN [list_aggr(toks, 'string_agg', ' ')]
             ELSE list_transform(range(1, len(toks) - {_CONTAM_K} + 2),
                                 i -> array_to_string(toks[i : i + {_CONTAM_K} - 1], ' '))
        END)) AS shingle
    FROM t
)
"""

_CONTAM_SQL = f"""
WITH {_SHINGLES},
ev AS (SELECT doc_id AS eval_doc_id, shingle FROM sh WHERE ev),
corpus AS (SELECT doc_id AS corpus_doc_id, shingle FROM sh WHERE NOT ev),
sizes AS (SELECT eval_doc_id, COUNT(*) AS n_eval FROM ev GROUP BY 1),
shared AS (
    SELECT c.corpus_doc_id, e.eval_doc_id, COUNT(*) AS n_shared
    FROM corpus c JOIN ev e USING (shingle)
    GROUP BY 1, 2
),
ranked AS (
    SELECT s.corpus_doc_id, s.eval_doc_id, s.n_shared, z.n_eval,
           CAST(s.n_shared AS DOUBLE) / CAST(z.n_eval AS DOUBLE) AS overlap_ratio
    FROM shared s JOIN sizes z USING (eval_doc_id)
)
SELECT corpus_doc_id, eval_doc_id, n_shared, n_eval, overlap_ratio
FROM (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY overlap_ratio DESC, corpus_doc_id, eval_doc_id) AS rnk
    FROM ranked
) WHERE rnk <= {_CONTAM_TOP}
"""


@register("contamination_check", _CONTAM_SQL)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-vs-eval n-gram contamination scan: the corpus docs that
    cover the largest share of a held-out doc's 3-shingles (top-N by
    overlap so the report is never vacuously empty — a production run
    would alert on ratio >= 0.8). Eval side broadcast (small by
    construction); the corpus shingle stream never shuffles."""
    pairs = retrieval.contamination_pairs(
        load_table(spark, sf_dir, "documents"),
        eval_pred=(F.col("doc_id") % _EVAL_MOD == 0),
        k=_CONTAM_K,
        min_overlap=0.0,
    )
    # distributed top-N (TakeOrderedAndProject) with a full tiebreak so
    # the reported SET is deterministic at the cut boundary
    return pairs.orderBy(
        F.desc("overlap_ratio"), F.asc("corpus_doc_id"), F.asc("eval_doc_id")
    ).limit(_CONTAM_TOP)


_REP_K = 3
_REP_T = 0.05

_REPETITION_SQL = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
    SELECT doc_id,
        CASE WHEN len(toks) < {_REP_K}
             THEN [list_aggr(toks, 'string_agg', ' ')]
             ELSE list_transform(range(1, len(toks) - {_REP_K} + 2),
                                 i -> array_to_string(toks[i : i + {_REP_K} - 1], ' '))
        END AS grams
    FROM t
),
per_doc AS (
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
           CAST(list_max(list_transform(list_distinct(grams),
                    gg -> len(list_filter(grams, x -> x = gg))))
                AS BIGINT) AS max_gram_count
    FROM g
)
SELECT doc_id, n_grams, n_distinct_grams, max_gram_count,
       CAST(max_gram_count AS DOUBLE) / CAST(n_grams AS DOUBLE) AS top_gram_ratio,
       CAST(n_grams - n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
           AS dup_gram_ratio,
       max_gram_count > 1
           AND CAST(max_gram_count AS DOUBLE) / CAST(n_grams AS DOUBLE) > {_REP_T}
           AS is_repetitive
FROM per_doc
"""


@register("text_repetition", _REPETITION_SQL)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/repetition detection from NON-distinct 3-gram
    multiplicities — two map-side-combinable aggs."""
    return retrieval.repetition_stats(
        load_table(spark, sf_dir, "documents"), k=_REP_K, flag_threshold=_REP_T
    )


_BIN_WIDTH = 20000.0

_HISTOGRAM_SQL = f"""
SELECT CAST(FLOOR(o_totalprice / {_BIN_WIDTH}) AS BIGINT) AS price_bin,
       CAST(FLOOR(o_totalprice / {_BIN_WIDTH}) AS BIGINT) * {_BIN_WIDTH} AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1, 2
"""


@register("price_histogram", _HISTOGRAM_SQL)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: the binning is a map-only
    derived key (floor of an IEEE double division — engine-exact), then
    one hash agg."""
    o = load_table(spark, sf_dir, "orders")
    bin_col = F.floor(F.col("o_totalprice") / F.lit(_BIN_WIDTH)).cast("bigint")
    return (
        o.groupBy(
            bin_col.alias("price_bin"),
            (bin_col * F.lit(_BIN_WIDTH)).alias("bin_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("total_price"),
        )
    )
