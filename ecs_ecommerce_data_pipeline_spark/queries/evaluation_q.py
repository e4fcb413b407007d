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
