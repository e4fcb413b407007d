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


# --- retrieval evaluation: MRR / precision@k / NDCG@k -------------------------

# 1/log2(i+1) for ranks 1..10 as identical decimal literals on both
# sides (a runtime log2 would differ in the last ulp across engines).
_DCG_W = {
    1: "1.0",
    2: "0.6309297535714575",
    3: "0.5",
    4: "0.43067655807339306",
    5: "0.38685280723454163",
    6: "0.3562071871080222",
    7: "0.3333333333333333",
    8: "0.31546487678572877",
    9: "0.3010299956639812",
    10: "0.2890648263178879",
}

_RM_K = 10
_RM_REL_MIN = 2  # graded relevance >= 2 counts as "relevant" for MRR/P@k

_rm_w_case = "CASE {col} " + " ".join(
    f"WHEN {i} THEN {w}" for i, w in _DCG_W.items()
) + " ELSE 0.0 END"


def _rank_metrics_sql() -> str:
    w_rank = _rm_w_case.format(col="rnk")
    w_pos = _rm_w_case.format(col="pos")
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
ex AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
       FROM t),
hits AS (SELECT doc_id, dl, term FROM ex WHERE term IN ({_terms_sql})),
tf AS (SELECT term, doc_id, MIN(dl) AS dl, CAST(COUNT(*) AS BIGINT) AS tf
       FROM hits GROUP BY 1, 2),
tfd AS (
    SELECT term, doc_id, dl, tf,
           CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
    FROM tf
),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl
    FROM t
),
scored AS (
    SELECT tfd.term, tfd.doc_id,
           least(tfd.tf, 3) AS rel,
           ((n_docs - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
           * ((CAST(tfd.tf AS DOUBLE) * 2.2)
              / (CAST(tfd.tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * (CAST(tfd.dl AS DOUBLE) / avgdl))))
               AS score
    FROM tfd CROSS JOIN stats
),
topk AS (
    SELECT term, doc_id, rel, score,
           ROW_NUMBER() OVER (PARTITION BY term
                              ORDER BY score DESC, doc_id) AS rnk
    FROM scored QUALIFY rnk <= {_RM_K}
),
ideal AS (
    SELECT term, rel,
           ROW_NUMBER() OVER (PARTITION BY term
                              ORDER BY rel DESC, rnk) AS pos
    FROM topk
),
idcg AS (
    SELECT term, SUM(CAST(rel AS DOUBLE) * ({w_pos}) ORDER BY pos) AS idcg
    FROM ideal GROUP BY term
),
met AS (
    SELECT term AS query_term,
           CAST(COUNT(*) AS BIGINT) AS n_retrieved,
           CAST(SUM(CASE WHEN rel >= {_RM_REL_MIN} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_relevant,
           COALESCE(1.0 / MIN(CASE WHEN rel >= {_RM_REL_MIN}
                                   THEN rnk END), 0.0) AS mrr,
           CAST(SUM(CASE WHEN rel >= {_RM_REL_MIN} THEN 1 ELSE 0 END)
               AS DOUBLE) / {_RM_K} AS precision_at_k,
           SUM(CAST(rel AS DOUBLE) * ({w_rank}) ORDER BY rnk) AS dcg
    FROM topk
    GROUP BY term
)
SELECT m.query_term, m.n_retrieved, m.n_relevant, m.mrr,
       m.precision_at_k, m.dcg, m.dcg / i.idcg AS ndcg
FROM met m JOIN idcg i ON i.term = m.query_term
"""


@register("retrieval_rank_metrics", _rank_metrics_sql())
def q_retrieval_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked-retrieval evaluation: MRR, precision@10, DCG and NDCG@10
    for the three standing query terms, each scored by the same
    rational-idf BM25 as ``bm25_retrieval`` and judged against a
    synthetic graded relevance (term frequency capped at 3 — the labels
    exist to exercise the METRIC implementations; swap in human labels
    and nothing else changes). The eval every retrieval change gates on
    before shipping.

    Determinism: the log2 rank discounts are shared decimal literals
    (runtime log2 differs in the last ulp across engines); DCG and
    IDCG fold their ≤10 terms in explicit rank order on BOTH engines
    (DuckDB ordered-aggregate SUM, Spark a sorted-array fold) because
    float addition does not commute; MRR is an exact rational. One
    token explode filtered to the query terms before any shuffle, a
    per-term top-10 window, then all metrics from those ≤30 rows."""
    from pyspark.sql import Window

    doc = load_table(spark, sf_dir, "documents")
    t = doc.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("toks")
    )
    ex = t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        F.explode("toks").alias("term"),
    )
    hits = ex.filter(F.col("term").isin(_QUERY_TERMS))
    tf = hits.groupBy("term", "doc_id").agg(
        F.min("dl").alias("dl"), F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    tfd = tf.select(
        "term",
        "doc_id",
        "dl",
        "tf",
        F.count(F.lit(1))
        .over(Window.partitionBy("term"))
        .cast("bigint")
        .alias("df"),
    )
    stats = t.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum(F.size("toks")).cast("double") / F.count(F.lit(1))).alias(
            "avgdl"
        ),
    )
    score = (
        (F.col("n_docs") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    ) * (
        (F.col("tf").cast("double") * 2.2)
        / (
            F.col("tf").cast("double")
            + 1.2 * (0.25 + 0.75 * (F.col("dl").cast("double") / F.col("avgdl")))
        )
    )
    scored = (
        tfd.crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            F.least(F.col("tf"), F.lit(3)).alias("rel"),
            score.alias("score"),
        )
    )
    wr = Window.partitionBy("term").orderBy(F.desc("score"), "doc_id")
    topk = scored.select(
        "term", "doc_id", "rel", "score", F.row_number().over(wr).alias("rnk")
    ).filter(F.col("rnk") <= _RM_K)
    wi = Window.partitionBy("term").orderBy(F.desc("rel"), "rnk")
    ranked = topk.select(
        "term", "rel", "rnk", F.row_number().over(wi).alias("pos")
    )
    w_expr = " ".join(f"WHEN {i} THEN {w}D" for i, w in _DCG_W.items())
    dcg_fold = (
        "aggregate(array_sort(collect_list(struct(rnk, "
        f"CAST(rel AS DOUBLE) * (CASE rnk {w_expr} ELSE 0.0D END) AS t))), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.t)"
    )
    idcg_fold = (
        "aggregate(array_sort(collect_list(struct(pos, "
        f"CAST(rel AS DOUBLE) * (CASE pos {w_expr} ELSE 0.0D END) AS t))), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.t)"
    )
    per_term = ranked.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_retrieved"),
        F.sum(F.when(F.col("rel") >= _RM_REL_MIN, 1).otherwise(0))
        .cast("bigint")
        .alias("n_relevant"),
        F.coalesce(
            F.lit(1.0)
            / F.min(F.when(F.col("rel") >= _RM_REL_MIN, F.col("rnk"))),
            F.lit(0.0),
        ).alias("mrr"),
        (
            F.sum(F.when(F.col("rel") >= _RM_REL_MIN, 1).otherwise(0)).cast(
                "double"
            )
            / _RM_K
        ).alias("precision_at_k"),
        F.expr(dcg_fold).alias("dcg"),
        F.expr(idcg_fold).alias("idcg"),
    )
    return per_term.select(
        F.col("term").alias("query_term"),
        "n_retrieved",
        "n_relevant",
        "mrr",
        "precision_at_k",
        "dcg",
        (F.col("dcg") / F.col("idcg")).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and dense ANN (round 7)
# ---------------------------------------------------------------------------

_RRF_K0 = 60       # the standard RRF damping constant (Cormack et al.)
_RRF_SHORT = 50    # per-channel shortlist depth
_RRF_QVEC = 0      # the dense channel's query vector id

_HYBRID_SQL = f"""
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
bscored AS (
    SELECT tf.doc_id,
           CAST(
             ((n_docs - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * ((CAST(tf AS DOUBLE) * 2.2)
                / (CAST(tf AS DOUBLE)
                   + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
             AS DECIMAL(25,12)) AS term_score
    FROM tf JOIN dl USING (doc_id) JOIN dfx USING (term) CROSS JOIN stats
),
bdoc AS (
    SELECT doc_id, CAST(SUM(term_score) AS DOUBLE) AS score
    FROM bscored GROUP BY 1
),
rb AS (
    SELECT doc_id, rnk AS rb FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM bdoc
    ) WHERE rnk <= {_RRF_SHORT}
),
ed AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q0 AS (SELECT v AS qv FROM ed WHERE vec_id = {_RRF_QVEC}),
dsc AS (
    SELECT ed.vec_id AS doc_id,
           list_dot_product(qv, v)
             / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v)))
             AS cos
    FROM ed CROSS JOIN q0 WHERE ed.vec_id <> {_RRF_QVEC}
),
rd AS (
    SELECT doc_id, rnk AS rd FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rnk
        FROM dsc
    ) WHERE rnk <= {_RRF_SHORT}
),
fused AS (
    SELECT COALESCE(rb.doc_id, rd.doc_id) AS doc_id,
           COALESCE(1.0 / ({_RRF_K0} + rb.rb), 0.0)
             + COALESCE(1.0 / ({_RRF_K0} + rd.rd), 0.0) AS rrf_score
    FROM rb FULL OUTER JOIN rd ON rd.doc_id = rb.doc_id
)
SELECT doc_id, rrf_score, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rnk
    FROM fused
) WHERE rnk <= {_TOP_K}
"""


@register("retrieval_hybrid_rrf", _HYBRID_SQL)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — reciprocal-rank fusion (RRF, Cormack et al.)
    of the two verified channels every RAG stack runs side by side: the
    sparse BM25 ranking (fixed query terms) and the dense cosine
    ranking (query vector {_RRF_QVEC}).  score(d) = Σ_channels
    1/(60 + rank_d) over each channel's top-50, absent-from-channel
    contributing 0 — rank fusion needs NO score calibration between
    channels, which is exactly why production uses it.  All-integer
    ranks in, two exact divisions + one fixed-order add out:
    bit-reproducible cross-engine.

    Scale shape: both channels are their already-verified pipelines
    (filter-before-shuffle BM25; one-scan broadcast-query dense); the
    fusion itself is a full-outer join of two 50-row shortlists."""
    from ..operators import similarity

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    rb = retrieval.bm25_scores(docs, _QUERY_TERMS, k=_RRF_SHORT).select(
        "doc_id", F.col("rnk").alias("rb")
    )
    rd = similarity.brute_force_topk(emb, [_RRF_QVEC], k=_RRF_SHORT).select(
        F.col("corpus_id").alias("doc_id"), F.col("rnk").alias("rd")
    )
    fused = rb.join(rd, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (F.lit(_RRF_K0) + F.col("rb")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(_RRF_K0) + F.col("rd")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return fused.withColumn(
        "rnk", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rnk") <= _TOP_K)


# ---------------------------------------------------------------------------
# RAG passage attribution (round 8): BM25 over CHUNKS
# ---------------------------------------------------------------------------
# A RAG pipeline retrieves PASSAGES, not documents — the ranked unit is
# the overlapping chunk, and the answer cites (doc, chunk).  Chunks are
# the curation family's fixed-window substrings (chunk_documents: 200
# chars, stride 150) treated as pseudo-documents through the SAME BM25
# machinery; n/avgdl statistics are chunk-level by construction.

_RAG_CHUNK = 200
_RAG_STRIDE = 150

# (doc, chunk) rides one BIGINT so BM25's tie rule stays lexicographic:
# pseudo_id = doc_id * 2^20 + chunk_id.  2^20 chunks @ stride 150 covers
# documents to ~157 MB of text; the packer FAILS LOUDLY beyond that — a
# silent wrap would corrupt attribution and tie-order (round-8 advice).
_PACK_BASE = 1 << 20


_PACK_DOC_MAX = 1 << 43  # doc_id * 2^20 must stay inside int64


def _pack_chunk_id(doc_id, chunk_id):
    from pyspark.sql import functions as F

    return F.when(
        (chunk_id < _PACK_BASE) & (doc_id < _PACK_DOC_MAX),
        doc_id * _PACK_BASE + chunk_id,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"(doc_id, chunk_id) outside the packed key range "),
                F.lit(f"(chunk_id < {_PACK_BASE}, doc_id < {_PACK_DOC_MAX})"),
                F.lit(" for doc "),
                doc_id.cast("string"),
            )
        )
    )

# chunking + tokenization CTEs shared by every chunk-level channel
_RAG_C_T = f"""c AS (
    SELECT doc_id, CAST(s // {_RAG_STRIDE} AS BIGINT) AS chunk_id,
           substring(text, s + 1, {_RAG_CHUNK}) AS text
    FROM (
        SELECT doc_id, text,
               unnest(range(0, GREATEST(n_chars - 1, 0) + 1, {_RAG_STRIDE})) AS s
        FROM documents
    )
),
t AS (SELECT doc_id, chunk_id, {_TOKS} AS toks FROM c)"""

# chunk-level BM25 CTEs (end in ``per_chunk``: doc_id, chunk_id, score)
_RAG_BM25_CTES = f"""ex AS (SELECT doc_id, chunk_id, unnest(toks) AS term FROM t),
hits AS (
    SELECT doc_id, chunk_id, term FROM ex WHERE term IN ({_terms_sql})
),
tf AS (
    SELECT doc_id, chunk_id, term, COUNT(*) AS tf FROM hits GROUP BY 1, 2, 3
),
dfx AS (
    SELECT term, COUNT(*) AS df
    FROM (SELECT DISTINCT doc_id, chunk_id, term FROM hits) GROUP BY 1
),
dl AS (SELECT doc_id, chunk_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
scored AS (
    SELECT tf.doc_id, tf.chunk_id,
           CAST(
             ((n_docs - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * ((CAST(tf AS DOUBLE) * 2.2)
                / (CAST(tf AS DOUBLE)
                   + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
             AS DECIMAL(25,12)) AS term_score
    FROM tf
    JOIN dl USING (doc_id, chunk_id)
    JOIN dfx USING (term) CROSS JOIN stats
),
per_chunk AS (
    SELECT doc_id, chunk_id, CAST(SUM(term_score) AS DOUBLE) AS score
    FROM scored GROUP BY 1, 2
)"""

_RAG_SQL = f"""
WITH {_RAG_C_T},
{_RAG_BM25_CTES}
SELECT doc_id, chunk_id, score, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY score DESC, doc_id, chunk_id) AS rnk
    FROM per_chunk
) WHERE rnk <= {_TOP_K}
"""


@register("rag_chunk_attribution", _RAG_SQL)
def q_rag_chunk_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level retrieval for RAG: BM25 top-k over the overlapping
    200/150 chunk windows, attributed back to (doc_id, chunk_id) — the
    unit a generator actually cites.  Chunks run as pseudo-documents
    through the verified BM25 operator (chunk-level n/avgdl); the
    composite (doc, chunk) key rides a single BIGINT so ranking
    tie-order matches the oracle's (score, doc_id, chunk_id)
    lexicographic rule.  Chunking is one explode (no text shuffled
    twice: the pseudo-doc frame derives chunks inline from the source
    scan); everything downstream is the timed BM25 shape."""
    from ..operators.retrieval import bm25_scores

    doc = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_chars") - 1, F.lit(0)),
        F.lit(_RAG_STRIDE),
    )
    chunks = doc.select(
        "doc_id", "text", F.explode(starts).alias("s")
    ).select(
        _pack_chunk_id(
            F.col("doc_id"), (F.col("s") / _RAG_STRIDE).cast("bigint")
        ).alias("pseudo_id"),
        F.col("text").substr(F.col("s") + 1, F.lit(_RAG_CHUNK)).alias("text"),
    ).select(F.col("pseudo_id").alias("doc_id"), "text")
    ranked = bm25_scores(chunks, _QUERY_TERMS, k=_TOP_K)
    return _unpack_chunk(ranked)


# ---------------------------------------------------------------------------
# Dense + hybrid RAG at chunk granularity (round 9)
# ---------------------------------------------------------------------------
# The round-8 chunks get a DENSE face: a feature-hashed (hashing-trick)
# embedding per chunk — every token occurrence adds ±1 to an
# md5-assigned bucket of a 32-wide vector, queries embed the same way,
# exact cosine ranks.  Trainless and bit-deterministic, yet genuinely
# text-derived (unlike the synthetic fixtures), so the lexical-vs-dense
# disagreement the hybrid fusion resolves is real: BM25 has idf + tf
# saturation, the hashed cosine has neither.

_FH_DIMS = 32

_FH_BUCKET = "('0x' || substr(md5('fh:' || term), 1, 4))::BIGINT % " + str(
    _FH_DIMS
)
_FH_SIGN = (
    "CASE WHEN ('0x' || substr(md5('fh:' || term), 5, 1))::BIGINT % 2 = 0"
    " THEN 1 ELSE -1 END"
)

# dense-channel CTEs over the shared chunk/token block (end in
# ``dscore``: doc_id, chunk_id, score) — mirrors
# operators.retrieval.hashed_dense_scores value for value
_RAG_DENSE_CTES = f"""fh AS (
    SELECT doc_id, chunk_id, {_FH_BUCKET} AS bucket, {_FH_SIGN} AS sign
    FROM (SELECT doc_id, chunk_id, unnest(toks) AS term FROM t)
),
tw AS (
    SELECT doc_id, chunk_id, bucket, CAST(SUM(sign) AS BIGINT) AS w
    FROM fh GROUP BY 1, 2, 3
),
qfh AS (
    SELECT {_FH_BUCKET} AS bucket, {_FH_SIGN} AS sign
    FROM (SELECT unnest([{_terms_sql}]) AS term)
),
qw AS (
    SELECT bucket, CAST(SUM(sign) AS BIGINT) AS qweight
    FROM qfh GROUP BY 1 HAVING SUM(sign) <> 0
),
qn AS (
    SELECT sqrt(CAST(SUM(qweight * qweight) AS DOUBLE)) AS qnrm FROM qw
),
cnorm AS (
    SELECT doc_id, chunk_id, CAST(SUM(w * w) AS BIGINT) AS n2
    FROM tw GROUP BY 1, 2
),
cdot AS (
    SELECT tw.doc_id, tw.chunk_id,
           CAST(SUM(tw.w * q.qweight) AS BIGINT) AS dp
    FROM tw JOIN qw q USING (bucket) GROUP BY 1, 2
),
dscore AS (
    SELECT d.doc_id, d.chunk_id,
           CAST(d.dp AS DOUBLE) / (sqrt(CAST(n.n2 AS DOUBLE)) * qn.qnrm)
               AS score
    FROM cdot d JOIN cnorm n USING (doc_id, chunk_id) CROSS JOIN qn
    WHERE n.n2 > 0
)"""

_RAG_DENSE_SQL = f"""
WITH {_RAG_C_T},
{_RAG_DENSE_CTES}
SELECT doc_id, chunk_id, score, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY score DESC, doc_id, chunk_id) AS rnk
    FROM dscore
) WHERE rnk <= {_TOP_K}
"""


def _chunk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 200/150 chunk windows as packed pseudo-documents (the
    ``rag_chunk_attribution`` frame, factored for the channel family)."""
    doc = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_chars") - 1, F.lit(0)),
        F.lit(_RAG_STRIDE),
    )
    return doc.select(
        "doc_id", "text", F.explode(starts).alias("s")
    ).select(
        _pack_chunk_id(
            F.col("doc_id"), (F.col("s") / _RAG_STRIDE).cast("bigint")
        ).alias("doc_id"),
        F.col("text").substr(F.col("s") + 1, F.lit(_RAG_CHUNK)).alias("text"),
    )


def _unpack_chunk(df: DataFrame) -> DataFrame:
    # integer DIV, not float division: doc_id/2^20 via double loses
    # mantissa bits past 2^53 and silently lands on a NEIGHBORING
    # document — the corruption class the loud pack guard exists for
    return df.select(
        F.expr(f"doc_id DIV {_PACK_BASE}").cast("bigint").alias("doc_id"),
        F.expr(f"doc_id % {_PACK_BASE}").cast("bigint").alias("chunk_id"),
        *[c for c in df.columns if c != "doc_id"],
    )


@register("rag_chunk_dense_topk", _RAG_DENSE_SQL)
def q_rag_chunk_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense passage retrieval: top-k chunks by exact cosine in the
    32-dim feature-hashed embedding space
    (``operators.retrieval.hashed_dense_scores``).  The chunk embedding
    is never materialized as an array — the corpus side is sparse
    (chunk, bucket, weight) rows from one token explode + one hash agg,
    the query side is a broadcast ≤3-entry bucket map, candidates are
    an inverted-index probe (docs holding weight in any nonzero query
    bucket), and dot/norm are exact integers with cosine as two IEEE
    ops — bit-reproducible cross-engine, and the serving shape a 100 TB
    chunk store would run (probe buckets, never scan-and-rank)."""
    from ..operators.retrieval import hashed_dense_scores

    return _unpack_chunk(
        hashed_dense_scores(
            _chunk_frame(spark, sf_dir), _QUERY_TERMS, dims=_FH_DIMS,
            k=_TOP_K,
        )
    )


_RAG_CHANNELS_CTES = f"""rb AS (
    SELECT doc_id, chunk_id, rnk AS rb FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY score DESC, doc_id, chunk_id) AS rnk
        FROM per_chunk
    ) WHERE rnk <= {_RRF_SHORT}
),
rd AS (
    SELECT doc_id, chunk_id, rnk AS rd FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY score DESC, doc_id, chunk_id) AS rnk
        FROM dscore
    ) WHERE rnk <= {_RRF_SHORT}
),
fused AS (
    SELECT COALESCE(rb.doc_id, rd.doc_id) AS doc_id,
           COALESCE(rb.chunk_id, rd.chunk_id) AS chunk_id,
           COALESCE(1.0 / ({_RRF_K0} + rb.rb), 0.0)
             + COALESCE(1.0 / ({_RRF_K0} + rd.rd), 0.0) AS rrf_score
    FROM rb FULL OUTER JOIN rd
      ON rd.doc_id = rb.doc_id AND rd.chunk_id = rb.chunk_id
)"""
# ^ the channel shortlists + their RRF fusion, shared VERBATIM by the
# hybrid query and the agreement readout (a drifted duplicate here
# would let the two silently disagree about what "hybrid" means)

_RAG_HYBRID_SQL = f"""
WITH {_RAG_C_T},
{_RAG_BM25_CTES},
{_RAG_DENSE_CTES},
{_RAG_CHANNELS_CTES}
SELECT doc_id, chunk_id, rrf_score, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        ORDER BY rrf_score DESC, doc_id, chunk_id) AS rnk
    FROM fused
) WHERE rnk <= {_TOP_K}
"""


def _chunk_channel_shortlists(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(bm25 shortlist, dense shortlist) over the packed chunk frame,
    both depth ``_RRF_SHORT``, unpacked to (doc_id, chunk_id, rnk)."""
    from ..operators.retrieval import bm25_scores, hashed_dense_scores

    # the chunk frame feeds two channels × several consumers each — pin
    # it once so the explode+substr derivation doesn't re-run per
    # consumer (the prefix_filter_join discipline)
    chunks = _chunk_frame(spark, sf_dir).localCheckpoint()
    rb = _unpack_chunk(
        bm25_scores(chunks, _QUERY_TERMS, k=_RRF_SHORT)
    ).select("doc_id", "chunk_id", F.col("rnk").alias("rb"))
    rd = _unpack_chunk(
        hashed_dense_scores(chunks, _QUERY_TERMS, dims=_FH_DIMS, k=_RRF_SHORT)
    ).select("doc_id", "chunk_id", F.col("rnk").alias("rd"))
    return rb, rd


def _fuse_rrf(rb: DataFrame, rd: DataFrame) -> DataFrame:
    from pyspark.sql import Window as W

    fused = rb.join(rd, ["doc_id", "chunk_id"], "full_outer").select(
        "doc_id",
        "chunk_id",
        (
            F.coalesce(1.0 / (F.lit(_RRF_K0) + F.col("rb")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(_RRF_K0) + F.col("rd")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    w = W.orderBy(F.desc("rrf_score"), F.asc("doc_id"), F.asc("chunk_id"))
    return fused.withColumn(
        "rnk", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rnk") <= _TOP_K)


@register("rag_chunk_hybrid_rrf", _RAG_HYBRID_SQL)
def q_rag_chunk_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid passage retrieval: RRF fusion (the verified
    ``retrieval_hybrid_rrf`` rule, k0=60) of the chunk-level BM25
    shortlist and the chunk-level feature-hashed dense shortlist, both
    depth 50 — the production RAG serving stack (sparse + dense +
    rank fusion) now closed at the granularity a generator actually
    cites.  Both channels are their already-verified pipelines; the
    fusion is a full-outer join of two 50-row shortlists with
    all-integer ranks in and two exact divisions out."""
    rb, rd = _chunk_channel_shortlists(spark, sf_dir)
    return _fuse_rrf(rb, rd)


_RAG_AGREE_SQL = f"""
WITH {_RAG_C_T},
{_RAG_BM25_CTES},
{_RAG_DENSE_CTES},
{_RAG_CHANNELS_CTES},
top_b AS (SELECT doc_id, chunk_id FROM rb WHERE rb <= {_TOP_K}),
top_d AS (SELECT doc_id, chunk_id FROM rd WHERE rd <= {_TOP_K}),
top_h AS (
    SELECT doc_id, chunk_id FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY rrf_score DESC, doc_id, chunk_id) AS rnk
        FROM fused
    ) WHERE rnk <= {_TOP_K}
),
tagged AS (
    SELECT 'bm25' AS channel, doc_id, chunk_id FROM top_b
    UNION ALL SELECT 'dense', doc_id, chunk_id FROM top_d
    UNION ALL SELECT 'hybrid', doc_id, chunk_id FROM top_h
),
sizes AS (
    SELECT channel, CAST(COUNT(*) AS BIGINT) AS n FROM tagged GROUP BY 1
),
names AS (SELECT unnest(['bm25', 'dense', 'hybrid']) AS channel),
cpairs AS (
    SELECT a.channel AS channel_a, b.channel AS channel_b
    FROM names a JOIN names b ON a.channel < b.channel
),
overlap AS (
    SELECT a.channel AS channel_a, b.channel AS channel_b,
           CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM tagged a JOIN tagged b
      ON a.doc_id = b.doc_id AND a.chunk_id = b.chunk_id
     AND a.channel < b.channel
    GROUP BY 1, 2
)
SELECT p.channel_a, p.channel_b,
       COALESCE(sa.n, 0) AS n_a,
       COALESCE(sb.n, 0) AS n_b,
       COALESCE(o.n_overlap, 0) AS n_overlap,
       CAST(COALESCE(o.n_overlap, 0) AS DOUBLE)
         / CAST(GREATEST(COALESCE(sa.n, 0) + COALESCE(sb.n, 0)
                         - COALESCE(o.n_overlap, 0), 1) AS DOUBLE)
           AS jaccard
FROM cpairs p
LEFT JOIN overlap o
  ON o.channel_a = p.channel_a AND o.channel_b = p.channel_b
LEFT JOIN sizes sa ON sa.channel = p.channel_a
LEFT JOIN sizes sb ON sb.channel = p.channel_b
"""


@register("rag_chunk_channel_agreement", _RAG_AGREE_SQL)
def q_rag_chunk_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-way read over the chunk channels: top-10 overlap (and
    Jaccard) for each pair of {{bm25, dense, hybrid}} — the attribution
    agreement measure that tells an operator whether the hybrid is
    actually arbitrating (bm25∩dense small, hybrid overlapping both) or
    one channel dominates.  Jaccard uses the channels' ACTUAL set sizes
    (the dense inverted probe can return fewer than k candidates on a
    sparse corpus — a hardcoded 2k denominator would understate
    agreement exactly there; round-9 review find).  All three
    shortlists are the verified channel pipelines; the readout is a
    30-row tag union self-joined — bounded driver-free work whatever
    the corpus size."""
    rb, rd = _chunk_channel_shortlists(spark, sf_dir)
    rb = rb.localCheckpoint()
    rd = rd.localCheckpoint()
    hybrid = _fuse_rrf(rb, rd)
    top_b = rb.filter(F.col("rb") <= _TOP_K).select("doc_id", "chunk_id")
    top_d = rd.filter(F.col("rd") <= _TOP_K).select("doc_id", "chunk_id")
    top_h = hybrid.select("doc_id", "chunk_id")
    tagged = (
        top_b.select(F.lit("bm25").alias("channel"), "doc_id", "chunk_id")
        .unionByName(
            top_d.select(F.lit("dense").alias("channel"), "doc_id", "chunk_id")
        )
        .unionByName(
            top_h.select(F.lit("hybrid").alias("channel"), "doc_id", "chunk_id")
        )
    )
    names = spark.createDataFrame(
        [("bm25",), ("dense",), ("hybrid",)], "channel string"
    )
    cpairs = names.select(F.col("channel").alias("channel_a")).crossJoin(
        names.select(F.col("channel").alias("channel_b"))
    ).filter(F.col("channel_a") < F.col("channel_b"))
    a = tagged.select(
        F.col("channel").alias("channel_a"), "doc_id", "chunk_id"
    )
    b = tagged.select(
        F.col("channel").alias("channel_b"), "doc_id", "chunk_id"
    )
    overlap = (
        a.join(b, ["doc_id", "chunk_id"])
        .filter(F.col("channel_a") < F.col("channel_b"))
        .groupBy("channel_a", "channel_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    sizes = tagged.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    sa = sizes.select(F.col("channel").alias("channel_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("channel").alias("channel_b"), F.col("n").alias("n_b"))
    nov = F.coalesce("n_overlap", F.lit(0)).cast("bigint")
    na = F.coalesce("n_a", F.lit(0)).cast("bigint")
    nb = F.coalesce("n_b", F.lit(0)).cast("bigint")
    return (
        cpairs.join(overlap, ["channel_a", "channel_b"], "left")
        .join(sa, "channel_a", "left")
        .join(sb, "channel_b", "left")
        .select(
            "channel_a",
            "channel_b",
            na.alias("n_a"),
            nb.alias("n_b"),
            nov.alias("n_overlap"),
            (
                nov.cast("double")
                / F.greatest(na + nb - nov, F.lit(1)).cast("double")
            ).alias("jaccard"),
        )
    )
