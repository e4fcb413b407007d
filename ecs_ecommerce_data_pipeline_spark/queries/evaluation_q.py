"""Dataset/index evaluation queries: ANN recall against the exact
baseline, train/test leakage detection, and label balance per split.

These close the loop on the similarity and sampling operators — a
training pipeline doesn't just *build* an index or a split, it measures
them.  All outputs are integers/strings (no cross-engine float
arithmetic to diverge), and the oracles reuse the very SQL that
verifies the underlying operators, composed as CTEs, so the evaluation
is checked end-to-end rather than against a hand-simplified rerun.

Scale shapes: recall is a join of two top-k result sets (tiny —
queries×k rows); leakage is two hash aggs + one equi-join on a 16-byte
text hash; balance is one hash agg.  Nothing here touches raw vectors
or text twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..operators import similarity
from ..operators.sampling import assign_split
from ..sources.testdata import load_table
from .similarity_q import _BRUTE_SQL, _IVF_TOPK_SQL, _K, _N_CENTROIDS, _NPROBE, _QUERY_IDS

_RECALL_SQL = f"""
WITH bf AS ({_BRUTE_SQL}),
ivf AS ({_IVF_TOPK_SQL})
SELECT bf.query_id,
       CAST({_K} AS BIGINT) AS k,
       CAST(COUNT(ivf.corpus_id) AS BIGINT) AS n_hits
FROM bf LEFT JOIN ivf
  ON ivf.query_id = bf.query_id AND ivf.corpus_id = bf.corpus_id
GROUP BY bf.query_id
"""


@register("sim_recall_ivf_at_k", _RECALL_SQL)
def q_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index vs the exact brute-force baseline, per
    query: how many of the true top-k the approximate index returned.
    The oracle composes the already-verified brute-force and IVF SQL as
    CTEs — the metric is checked against the same ground truth."""
    emb = load_table(spark, sf_dir, "embeddings")
    bf = similarity.brute_force_topk(emb, _QUERY_IDS, k=_K).select(
        "query_id", "corpus_id"
    )
    ivf = similarity.ivf_topk(
        emb, _QUERY_IDS, k=_K, n_centroids=_N_CENTROIDS, nprobe=_NPROBE
    ).select("query_id", "corpus_id", F.lit(1).alias("hit"))
    # LEFT join (not semi) so a query whose approximate set misses the
    # entire true top-k still reports n_hits = 0.
    return (
        bf.join(ivf, ["query_id", "corpus_id"], "left")
        .groupBy("query_id")
        .agg(
            F.lit(_K).cast("bigint").alias("k"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
        )
    )


# Same split rule as sampling_q.split_train_val_test (bucket of md5(id)).
_SPLIT_CASE = """CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'train'
            WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 95 THEN 'val'
            ELSE 'test' END"""

_LEAKAGE_SQL = f"""
WITH s AS (
    SELECT doc_id, md5(text) AS h, {_SPLIT_CASE} AS split
    FROM documents
),
g AS (
    SELECT h, COUNT(DISTINCT split) AS n_splits
    FROM s GROUP BY h
)
SELECT s.split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN g.n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_leaked_docs,
       CAST(COUNT(DISTINCT CASE WHEN g.n_splits > 1 THEN s.h END) AS BIGINT)
           AS n_leaked_texts
FROM s JOIN g ON g.h = s.h
GROUP BY s.split
"""


@register("split_leakage_check", _LEAKAGE_SQL)
def q_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate leakage across train/val/test: per split, how
    many docs share their text (by md5) with a different split — the
    contamination a dedup-before-split pipeline must drive to zero.
    Shape: two hash aggs + an equi-join on the 16-byte hash."""
    doc = load_table(spark, sf_dir, "documents")
    s = assign_split(doc, "doc_id").select(
        "doc_id", F.md5("text").alias("h"), "split"
    )
    g = s.groupBy("h").agg(F.count_distinct("split").alias("n_splits"))
    leaked = F.col("n_splits") > 1
    return (
        s.join(g, "h")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(leaked, 1).otherwise(0))
            .cast("bigint")
            .alias("n_leaked_docs"),
            F.count_distinct(F.when(leaked, F.col("h")))
            .cast("bigint")
            .alias("n_leaked_texts"),
        )
    )


_BALANCE_SQL = """
WITH s AS (
    SELECT label,
           CASE WHEN ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM embeddings
)
SELECT split, CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s
GROUP BY split, label
"""


@register("label_balance_by_split", _BALANCE_SQL)
def q_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class distribution per split — the sanity table read before
    training to catch a skewed or empty stratum.  One hash agg."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        assign_split(emb, "vec_id")
        .groupBy("split", F.col("label").cast("bigint").alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _lsh_recall_sql() -> str:
    from .similarity_q import _LSH_TOPK_SQL

    return f"""
WITH bf AS ({_BRUTE_SQL}),
lsh AS ({_LSH_TOPK_SQL})
SELECT bf.query_id,
       CAST({_K} AS BIGINT) AS k,
       CAST(COUNT(lsh.corpus_id) AS BIGINT) AS n_hits
FROM bf LEFT JOIN lsh
  ON lsh.query_id = bf.query_id AND lsh.corpus_id = bf.corpus_id
GROUP BY bf.query_id
"""


@register("sim_recall_lsh_at_k", _lsh_recall_sql())
def q_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the hyperplane-LSH index vs the exact brute-force
    baseline — together with ``sim_recall_ivf_at_k`` this completes the
    recall matrix over both ANN paths (same composed-CTE oracle
    technique)."""
    from .similarity_q import _N_PLANES

    emb = load_table(spark, sf_dir, "embeddings")
    bf = similarity.brute_force_topk(emb, _QUERY_IDS, k=_K).select(
        "query_id", "corpus_id"
    )
    lsh = similarity.lsh_topk(emb, _QUERY_IDS, k=_K, n_planes=_N_PLANES).select(
        "query_id", "corpus_id", F.lit(1).alias("hit")
    )
    return (
        bf.join(lsh, ["query_id", "corpus_id"], "left")
        .groupBy("query_id")
        .agg(
            F.lit(_K).cast("bigint").alias("k"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
        )
    )


def _lsh_multiprobe_recall_sql() -> str:
    from .similarity_q import _LSH_MULTIPROBE_SQL, _LSH_TOPK_SQL

    return f"""
WITH bf AS ({_BRUTE_SQL}),
single AS ({_LSH_TOPK_SQL}),
multi AS ({_LSH_MULTIPROBE_SQL})
SELECT bf.query_id,
       CAST({_K} AS BIGINT) AS k,
       CAST(COUNT(single.corpus_id) AS BIGINT) AS n_hits_single,
       CAST(COUNT(multi.corpus_id) AS BIGINT) AS n_hits_multiprobe
FROM bf
LEFT JOIN single
  ON single.query_id = bf.query_id AND single.corpus_id = bf.corpus_id
LEFT JOIN multi
  ON multi.query_id = bf.query_id AND multi.corpus_id = bf.corpus_id
GROUP BY bf.query_id
"""


@register("sim_recall_lsh_multiprobe", _lsh_multiprobe_recall_sql())
def q_recall_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of single-probe vs multi-probe LSH side by side, per
    query, against the exact baseline.  Multi-probe dominance is exact,
    not statistical: its candidate set is a superset of single-probe's,
    and any candidate that displaces a true top-k member from the
    result window must itself rank inside the true top-k (same
    cosine/tie ordering on both sides) — the invariant test pins
    n_hits_multiprobe >= n_hits_single on every row."""
    from .similarity_q import _N_EXTRA, _N_PLANES

    emb = load_table(spark, sf_dir, "embeddings")
    bf = similarity.brute_force_topk(emb, _QUERY_IDS, k=_K).select(
        "query_id", "corpus_id"
    )
    single = similarity.lsh_topk(emb, _QUERY_IDS, k=_K, n_planes=_N_PLANES).select(
        "query_id", "corpus_id", F.lit(1).alias("hit_s")
    )
    multi = similarity.lsh_multiprobe_topk(
        emb, _QUERY_IDS, k=_K, n_planes=_N_PLANES, n_extra=_N_EXTRA
    ).select("query_id", "corpus_id", F.lit(1).alias("hit_m"))
    return (
        bf.join(single, ["query_id", "corpus_id"], "left")
        .join(multi, ["query_id", "corpus_id"], "left")
        .groupBy("query_id")
        .agg(
            F.lit(_K).cast("bigint").alias("k"),
            F.sum(F.coalesce(F.col("hit_s"), F.lit(0)))
            .cast("bigint")
            .alias("n_hits_single"),
            F.sum(F.coalesce(F.col("hit_m"), F.lit(0)))
            .cast("bigint")
            .alias("n_hits_multiprobe"),
        )
    )


# --- score calibration: is the LM score predictive of rule-based quality? ----

_CAL_BINS = 10


def _calibration_sql() -> str:
    from .lm_q import _LM_SCORE_SQL
    from .text_q import _GOPHER_SQL

    return f"""
WITH lm AS ({_LM_SCORE_SQL}),
g AS ({_GOPHER_SQL}),
j AS (
    SELECT lm.doc_id, lm.sum_bits, lm.n_bigrams, lm.avg_bigram_bits AS s,
           CAST(g.passes AS INTEGER) AS label
    FROM lm JOIN g ON g.doc_id = lm.doc_id
),
edges AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM j),
b AS (
    SELECT least({_CAL_BINS - 1}, CAST(FLOOR(
               (s - lo) / (hi - lo) * {_CAL_BINS}) AS BIGINT)) AS bin,
           sum_bits, n_bigrams, label
    FROM j, edges
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(CAST(SUM(sum_bits) AS BIGINT) AS DOUBLE)
           / CAST(SUM(n_bigrams) AS BIGINT) AS mean_score,
       CAST(SUM(label) AS BIGINT) AS n_pass,
       CAST(SUM(label) AS DOUBLE) / COUNT(*) AS pass_rate
FROM b GROUP BY bin
"""


@register("model_calibration_bins", _calibration_sql())
def q_model_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration/reliability bins for the bigram-LM quality score
    against the Gopher rule gate: docs bucketed into 10 equal-width
    score bins, each bin's exact mean score and rule-pass rate — the
    eval that says whether a cheap learned-ish score can REPLACE the
    rule suite (monotone pass_rate across bins ⇒ a threshold works).
    Composes two existing verified pipelines; the oracle reuses their
    exact SQL as CTEs, so this evaluation is checked end-to-end.

    Determinism: bin edges are the corpus min/max score (one broadcast
    1-row frame); the score itself is an exact-integer division, so
    edges and bin assignment are identical doubles on both engines;
    per-bin mean score comes from exact BIGINT bit/bigram sums, never a
    float sum."""
    from ..operators.lmscore import bigram_lm_scores
    from ..operators.text import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    lm = bigram_lm_scores(docs).select(
        "doc_id",
        "sum_bits",
        "n_bigrams",
        F.col("avg_bigram_bits").alias("s"),
    )
    g = gopher_rules(docs).select(
        "doc_id", F.col("passes").cast("int").alias("label")
    )
    # round 11 (guide §2.4/§5): ``j`` feeds BOTH the broadcast min/max
    # edge subtree and the binning scan — without a lineage cut the one
    # physical plan contains the whole lm+gopher pipeline TWICE (Spark
    # does not CSE across the broadcast boundary).  A lazy
    # localCheckpoint materializes the bounded (doc_id, score, label)
    # frame once; both consumers read the checkpointed blocks.
    j = lm.join(g, "doc_id").localCheckpoint(eager=False)
    edges = j.agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    b = j.crossJoin(F.broadcast(edges)).select(
        F.least(
            F.lit(_CAL_BINS - 1),
            F.floor(
                (F.col("s") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * _CAL_BINS
            ).cast("bigint"),
        ).alias("bin"),
        "sum_bits",
        "n_bigrams",
        "label",
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum("sum_bits").cast("double")
            / F.sum("n_bigrams").cast("bigint")
        ).alias("mean_score"),
        F.sum("label").cast("bigint").alias("n_pass"),
        (F.sum("label").cast("double") / F.count(F.lit(1))).alias(
            "pass_rate"
        ),
    )
