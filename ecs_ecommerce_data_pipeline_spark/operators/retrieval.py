"""Ranked retrieval + corpus-hygiene operators for LLM data pipelines.

Three operators over ``documents(doc_id, text, ...)``:

* **BM25 ranked retrieval** — classic sparse retrieval scoring for a
  fixed query-term set. The idf factor is the RATIONAL BM25 idf
  ``(N − df + ½)/(df + ½)`` *without* the log wrapper: the ranking it
  induces for single-term contributions is the same monotone order, and
  — unlike ``ln`` — every operation (IEEE +, ×, ÷ on doubles) is
  correctly rounded and therefore bit-identical across engines, so the
  DuckDB oracle reproduces scores exactly. Per-doc score sums route
  through DECIMAL (order-independent) like all money aggregation.
* **Benchmark-contamination check** — the train-vs-eval n-gram overlap
  scan every training-data pipeline needs: distinct k-word shingles of
  the (small) eval set are joined against the corpus shingles; a corpus
  doc covering ≥ threshold of an eval doc's shingles is flagged.
* **Repetition detection** — per-doc boilerplate signal: frequency of
  the most-repeated k-gram and the duplicate-gram ratio, from
  NON-distinct shingles (distinct shingles would hide the repetition).

Scale design: everything is explode → hash-agg → (broadcast) join. BM25
filters to the query terms BEFORE any shuffle, so the grouped data is
|query terms| × |matching docs|, not the token stream. Contamination
broadcasts the eval side (eval sets are small by construction); the
corpus-side shingle stream is never shuffled — the join is map-side.
Repetition is two map-side-combinable aggs keyed by (doc, gram) then doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.textfn import tokens, word_shingles

# BM25 constants as LITERALS everywhere (Spark and oracle SQL parse the
# same decimal strings to the same doubles; computing 1.2 + 1.0 at
# runtime could round differently from parsing "2.2")
_K1 = 1.2          # saturation
_K1_PLUS_1 = 2.2   # k1 + 1, as a literal
_B = 0.75          # length normalization
_ONE_MINUS_B = 0.25


def bm25_scores(
    doc: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` by (rational-idf) BM25.

    Returns (doc_id, score DOUBLE, rnk BIGINT), rnk 1..k, ties on score
    broken by doc_id.
    """
    toks = doc.select("doc_id", F.explode(tokens(text_col)).alias("term"))
    hits = toks.filter(F.col("term").isin(query_terms))

    # term frequency per (doc, term) — grouped AFTER the term filter, so
    # the shuffle carries only matching rows
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))

    # document frequency per term (tiny: |query_terms| rows) + corpus
    # stats (1 row) — both broadcast, never collected to the driver
    df_t = (
        hits.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    dl = doc.select("doc_id", F.size(tokens(text_col)).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        # exact integer sum, ONE double division — a running double avg
        # would be partitioning-dependent
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                (
                    (F.col("n_docs") - F.col("df").cast("double") + F.lit(0.5))
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
                * (
                    (F.col("tf").cast("double") * F.lit(_K1_PLUS_1))
                    / (
                        F.col("tf").cast("double")
                        + F.lit(_K1)
                        * (
                            F.lit(_ONE_MINUS_B)
                            + F.lit(_B) * (F.col("dl").cast("double") / F.col("avgdl"))
                        )
                    )
                )
            )
            .cast("decimal(25,12)")
            .alias("term_score"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("term_score").cast("double").alias("score")
    )
    # distributed top-k (TakeOrderedAndProject: per-partition heads then
    # one merge) — a global row_number window here would drag EVERY
    # matching doc to a single partition; the rank column is attached
    # after the limit, over k rows only
    topk = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = W.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rnk", F.row_number().over(w).cast("bigint"))


def contamination_pairs(
    doc: DataFrame,
    eval_pred,
    k: int = 3,
    min_overlap: float = 0.8,
    text_col: str = "text",
) -> DataFrame:
    """Corpus docs whose shingles cover ≥ ``min_overlap`` of an eval
    doc's shingles: (corpus_doc_id, eval_doc_id, n_shared, n_eval,
    overlap_ratio).

    ``eval_pred`` is a Column predicate selecting the held-out eval set
    (deterministic, e.g. ``doc_id % 97 == 0``). The eval side is
    broadcast — benchmark sets are orders of magnitude smaller than the
    corpus, so the corpus shingle stream joins map-side without a
    shuffle.
    """
    toks = doc.select("doc_id", tokens(text_col).alias("toks"), eval_pred.alias("_ev"))
    shingled = toks.select(
        "doc_id", "_ev", F.explode(word_shingles(F.col("toks"), k)).alias("shingle")
    )
    ev = shingled.filter(F.col("_ev")).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    corpus = shingled.filter(~F.col("_ev")).select(
        F.col("doc_id").alias("corpus_doc_id"), "shingle"
    )
    ev_sizes = ev.groupBy("eval_doc_id").agg(F.count(F.lit(1)).alias("n_eval"))

    shared = (
        corpus.join(F.broadcast(ev), "shingle")
        .groupBy("corpus_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(F.broadcast(ev_sizes), "eval_doc_id")
        .select(
            "corpus_doc_id",
            "eval_doc_id",
            "n_shared",
            "n_eval",
            (F.col("n_shared").cast("double") / F.col("n_eval").cast("double"))
            .alias("overlap_ratio"),
        )
        .filter(F.col("overlap_ratio") >= min_overlap)
    )


def repetition_stats(
    doc: DataFrame,
    k: int = 3,
    flag_threshold: float = 0.05,
    text_col: str = "text",
) -> DataFrame:
    """Per-doc k-gram repetition: (doc_id, n_grams, n_distinct_grams,
    max_gram_count, top_gram_ratio, dup_gram_ratio, is_repetitive).

    Uses NON-distinct shingles (``word_shingles`` dedups for Jaccard;
    repetition needs multiplicity). ``top_gram_ratio`` is the share of
    the most-repeated gram; ``dup_gram_ratio`` the share of grams that
    are repeats. Both int/int double divisions — exact.

    ``is_repetitive`` additionally requires ``max_gram_count > 1``: a
    short doc collapsing to a single whole-text gram has ratio 1.0 but
    zero actual repetition.

    MAP-ONLY shape: all three counts are per-row array expressions
    (size / array_distinct / a nested higher-order max-of-occurrence
    fold) — ZERO shuffle, the stage pipelines into the scan. The fold is
    O(distinct·total) per doc, fine for natural documents (≤ a few
    thousand grams); for pathological mega-docs switch to the
    explode + groupBy(doc, md5(gram)) form, which shuffles 16-byte
    hashes.
    """
    toks = doc.select("doc_id", tokens(text_col).alias("toks"))
    n = F.size(F.col("toks"))
    gram_expr = F.when(
        n < k, F.array(F.concat_ws(" ", F.col("toks")))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, k)),
        )
    )
    g = toks.select("doc_id", gram_expr.alias("grams"))
    max_count = F.aggregate(
        F.array_distinct(F.col("grams")),
        F.lit(0),
        lambda acc, gg: F.greatest(
            acc, F.size(F.filter(F.col("grams"), lambda x: x == gg))
        ),
    )
    per_doc = g.select(
        "doc_id",
        F.size(F.col("grams")).cast("bigint").alias("n_grams"),
        F.size(F.array_distinct(F.col("grams"))).cast("bigint")
        .alias("n_distinct_grams"),
        max_count.cast("bigint").alias("max_gram_count"),
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_distinct_grams",
        "max_gram_count",
        (F.col("max_gram_count").cast("double") / F.col("n_grams").cast("double"))
        .alias("top_gram_ratio"),
        (
            (F.col("n_grams") - F.col("n_distinct_grams")).cast("double")
            / F.col("n_grams").cast("double")
        ).alias("dup_gram_ratio"),
        (
            (F.col("max_gram_count") > F.lit(1))
            & (
                (
                    F.col("max_gram_count").cast("double")
                    / F.col("n_grams").cast("double")
                )
                > F.lit(flag_threshold)
            )
        ).alias("is_repetitive"),
    )
