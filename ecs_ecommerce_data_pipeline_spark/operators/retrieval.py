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


def _feature_hash_py(term: str, dims: int) -> tuple[int, int]:
    """(bucket, sign) for a token under the md5 feature-hash: bucket =
    first 4 hex chars mod ``dims``, sign = parity of the 5th hex char.
    Oracle-SQL equivalent (DuckDB):
    ``('0x' || substr(md5('fh:' || term), 1, 4))::BIGINT % dims`` and
    ``CASE WHEN ('0x' || substr(md5('fh:' || term), 5, 1))::BIGINT % 2
    = 0 THEN 1 ELSE -1 END``."""
    import hashlib

    h = hashlib.md5(f"fh:{term}".encode()).hexdigest()
    return int(h[:4], 16) % dims, (1 if int(h[4], 16) % 2 == 0 else -1)


def hashed_dense_scores(
    doc: DataFrame,
    query_terms: list[str],
    dims: int = 32,
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by cosine in a ``dims``-dimensional
    FEATURE-HASHED embedding space (Weinberger et al.'s hashing trick —
    the deterministic, trainless stand-in for a learned dense encoder):
    every token occurrence adds ±1 to the md5-assigned bucket of a
    ``dims``-wide vector, the query embeds the same way, and candidates
    are ranked by exact cosine.  Unlike BM25 there is no idf and no tf
    saturation, so the two channels genuinely disagree — which is what
    makes their RRF fusion and the three-way agreement readout
    (``rag_chunk_channel_agreement``) informative.

    Scale shape — the embedding is never materialized as an array:

    * corpus side: one token explode → one hash-agg to sparse
      (doc, bucket, weight) rows → one hash-agg for per-doc norm²;
    * query side: the ≤|terms| nonzero (bucket, qweight) entries are
      computed DRIVER-side (bit-identical md5 formula, the
      ``_hyperplane_weights_py`` precedent) and broadcast;
    * candidates = docs holding weight in ANY nonzero query bucket (an
      inverted-index probe, not a corpus scan⁻ranking); dot and norms
      are exact integers, cosine is two IEEE ops on both engines.

    Returns (doc_id, score DOUBLE, rnk BIGINT), ties (score, doc_id).
    """
    import math

    from pyspark.sql.window import Window as W

    from ..functions.textfn import tokens

    qw: dict[int, int] = {}
    for t in query_terms:
        d, s = _feature_hash_py(t, dims)
        qw[d] = qw.get(d, 0) + s
    qw = {d: w for d, w in qw.items() if w != 0}
    if not qw:
        # fully self-cancelling query: empty result, stable schema
        return doc.select(
            F.col("doc_id"),
            F.lit(0.0).alias("score"),
            F.lit(0).cast("bigint").alias("rnk"),
        ).limit(0)
    qnrm = math.sqrt(sum(w * w for w in qw.values()))
    spark = doc.sparkSession
    qdf = spark.createDataFrame(
        sorted(qw.items()), "bucket bigint, qweight bigint"
    )

    ex = doc.select("doc_id", F.explode(tokens(text_col)).alias("term"))
    h = F.md5(F.concat(F.lit("fh:"), F.col("term")))
    hashed = ex.select(
        "doc_id",
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % dims)
        .alias("bucket"),
        F.when(
            F.conv(F.substring(h, 5, 1), 16, 10).cast("bigint") % 2 == 0,
            F.lit(1),
        ).otherwise(F.lit(-1)).cast("bigint").alias("sign"),
    )
    tw = hashed.groupBy("doc_id", "bucket").agg(
        F.sum("sign").cast("bigint").alias("w")
    )
    # the sparse weight rows feed BOTH the norm agg and the dot probe —
    # cut once so the token explode + hash runs once.  Round 12: this
    # was a persist() + EAGER result checkpoint (the unpersist needed a
    # materialized result), which made every call pay ~8 driver-
    # synchronized jobs at PLAN-BUILD time and serialized this channel
    # before whatever the caller fuses it with (the RRF hybrid ran its
    # two channels strictly one after the other).  A lazy localCheckpoint
    # keeps the single-execution guarantee (first consumer materializes,
    # the ContextCleaner reclaims the blocks when the plan is GC'd — no
    # unpersist discipline needed), the operator returns a fully LAZY
    # plan, and the caller's one action executes both fused channels
    # with overlapping stages (guide §2.6's effect without threads).
    tw = tw.localCheckpoint(eager=False)
    norms = tw.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("n2")
    )
    dots = (
        tw.join(F.broadcast(qdf), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("qweight")).cast("bigint").alias("dp"))
    )
    # n2 = 0 is possible (every bucket's signs cancelled): no
    # direction to rank — excluded on both engines
    scored = dots.join(norms, "doc_id").filter(F.col("n2") > 0).select(
        "doc_id",
        (
            F.col("dp").cast("double")
            / (F.sqrt(F.col("n2").cast("double")) * F.lit(qnrm))
        ).alias("score"),
    )
    w = W.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
    )
