"""Text-analysis queries over ``documents`` (LLM-pipeline extension
surface, SURVEY §7.2 M7).

Oracle parity notes: tokenization is ``string_split_regex(lower(trim(x)),
'\\s+')`` on the DuckDB side — byte-identical to Spark ``split``; all
ratios are int-sum / int-count double divisions (exact); fingerprint
hashes are md5 hex strings compared lexicographically (engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import register
from ..operators.text import LANG_PROFILES, STOPWORDS_EN, lang_id, quality_scores, token_stats
from ..sources.testdata import load_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

_TOKEN_STATS_SQL = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
       CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks)
           AS mean_token_len
FROM t
"""


@register("text_token_stats", _TOKEN_STATS_SQL)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load_table(spark, sf_dir, "documents"))


_stop_list = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

_QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '[.!?,;]')) AS BIGINT) AS n_punct,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
           AS n_bpe_tokens,
       CAST(len(toks) AS BIGINT) AS n_words,
       CAST(len(list_intersect(list_distinct(toks), [{_stop_list}])) AS DOUBLE)
           / len(list_distinct(toks)) AS stopword_ratio,
       CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / length(text)
           AS alpha_ratio
FROM t
"""


@register("text_quality", _QUALITY_SQL)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap corpus-cleaning quality signals — all JVM-side regexp/array
    expressions, linear scan, no shuffle."""
    return quality_scores(load_table(spark, sf_dir, "documents"))


def _profile_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
    return f"len(list_intersect(dt, [{words}]))"


_langs = sorted(LANG_PROFILES)
_score_cols = ",\n       ".join(
    f"CAST({_profile_sql(lang)} AS BIGINT) AS score_{lang}" for lang in _langs
)
_best = "greatest(" + ", ".join(_profile_sql(lang) for lang in _langs) + ")"
_pred_case = "CASE "
for lang in _langs:
    _pred_case += f"WHEN {_profile_sql(lang)} = {_best} AND {_best} > 0 THEN '{lang}' "
_pred_case += "ELSE 'und' END"

_LANGID_SQL = f"""
WITH t AS (SELECT doc_id, lang, list_distinct({_TOKS}) AS dt FROM documents)
SELECT doc_id,
       lang AS labeled_lang,
       {_score_cols},
       {_pred_case} AS predicted_lang
FROM t
"""


@register("text_langid", _LANGID_SQL)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language-ID heuristic with deterministic
    (lexicographic) tie-break — SQL CASE picks the first max, matching
    the Spark chained-when construction."""
    return lang_id(load_table(spark, sf_dir, "documents"))


# Winnowing fingerprints: char 4-grams → md5 → sliding-window (w=5) minima
# → distinct set. Hex-string minima are engine-portable.
_K, _W = 4, 5

_FINGERPRINT_SQL = f"""
WITH t AS (
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
    FROM documents
),
g AS (
    SELECT doc_id,
           CASE WHEN length(nt) >= {_K}
                THEN list_transform(range(1, length(nt) - {_K} + 2),
                                    i -> md5(substr(nt, i, {_K})))
                ELSE [] END AS hashes
    FROM t
),
w AS (
    SELECT doc_id,
           CASE WHEN len(hashes) >= {_W}
                THEN list_distinct(list_transform(range(1, len(hashes) - {_W} + 2),
                                   j -> list_min(hashes[j : j + {_W} - 1])))
                ELSE list_distinct(CASE WHEN len(hashes) > 0 THEN [list_min(hashes)] ELSE [] END)
                END AS fps
    FROM g
)
SELECT doc_id,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       list_min(fps) AS min_fingerprint
FROM w
"""


@register("text_fingerprint", _FINGERPRINT_SQL)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash dedup signature):
    per-row array pipeline — char shingles → md5 → window minima →
    distinct. Pure Catalyst expressions, linear scan."""
    doc = load_table(spark, sf_dir, "documents")

    # Stage each array as a NAMED column: referencing `hashes` from four
    # places in one expression tree would make Catalyst duplicate the O(n)
    # md5-array computation inside the per-window transform → O(n²) md5
    # calls per document (observed 520 s at sf0.01 vs <2 s staged).
    nt = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    staged = doc.select("doc_id", nt.alias("nt"))

    n_grams = F.length(F.col("nt")) - F.lit(_K - 1)
    hashes = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(F.col("nt").substr(i, F.lit(_K))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.select("doc_id", hashes.alias("hashes"))

    n_wins = F.size(F.col("hashes")) - F.lit(_W - 1)
    fps = F.when(
        n_wins >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_wins),
                lambda j: F.array_min(F.slice(F.col("hashes"), j, _W)),
            )
        ),
    ).otherwise(
        F.array_distinct(
            F.when(F.size(F.col("hashes")) > 0, F.array(F.array_min(F.col("hashes"))))
            .otherwise(F.array().cast("array<string>"))
        )
    )
    staged = staged.select("doc_id", fps.alias("fps"))

    return staged.select(
        "doc_id",
        F.size(F.col("fps")).cast("bigint").alias("n_fingerprints"),
        F.array_min(F.col("fps")).alias("min_fingerprint"),
    )


# ---------------------------------------------------------------------------
# Composite: the full corpus-curation pipeline as ONE query
# ---------------------------------------------------------------------------

_CURATION_SQL = f"""
WITH scored AS (
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash,
           CAST(len({_TOKS}) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
           CAST(length(text) AS BIGINT) AS n_chars,
           list_distinct({_TOKS}) AS dt
    FROM documents
),
langed AS (
    SELECT *, {_pred_case.replace("dt", "dt")} AS predicted_lang
    FROM scored
    WHERE n_words >= 5 AND n_alpha * 10 >= n_chars * 4
),
dedup AS (
    SELECT text_hash,
           MIN(doc_id) AS canonical_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_in_group,
           MIN(predicted_lang) AS predicted_lang,
           MIN(n_words) AS n_words,
           MIN(n_alpha) AS n_alpha,
           MIN(n_chars) AS n_chars
    FROM langed
    GROUP BY text_hash
)
SELECT predicted_lang,
       CAST(COUNT(*) AS BIGINT) AS n_canonical_docs,
       CAST(SUM(n_in_group - 1) AS BIGINT) AS n_duplicate_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_alpha) AS DOUBLE) / SUM(n_chars) AS alpha_pct
FROM dedup
GROUP BY predicted_lang
ORDER BY predicted_lang
"""


@register("corpus_curation_pipeline", _CURATION_SQL)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data curation flow as one logical plan:
    quality gate → language ID → exact dedup (canonical = min doc_id) →
    per-language corpus stats.

    Composition notes:

    * the quality gate is integer arithmetic (``n_alpha·10 ≥ n_chars·4``
      ⇔ alpha ratio ≥ 0.4) — no double comparison at a filter boundary;
    * per-language alpha percentage aggregates integer character counts
      and divides ONCE — exact under any partitioning (a mean of per-doc
      double ratios would be order-dependent);
    * the whole pipeline is scan → project → filter → two hash
      aggregations; the only shuffles are the dedup groupBy (16-byte
      hashes) and the tiny per-language rollup.

    Within a duplicate group every metric is identical (same text), so
    MIN picks the canonical row's values without a join back.
    """
    from ..operators.dedup import normalize_text
    from ..operators.text import LANG_PROFILES

    doc = load_table(spark, sf_dir, "documents")
    staged = doc.select(
        "doc_id",
        F.md5(normalize_text("text")).alias("text_hash"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("bigint").alias("n_words"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]")).cast("bigint").alias("n_alpha"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("dt"),
    ).filter((F.col("n_words") >= 5) & (F.col("n_alpha") * 10 >= F.col("n_chars") * 4))

    langs = sorted(LANG_PROFILES)
    scores = {
        lang: F.size(
            F.array_intersect(F.col("dt"), F.array(*[F.lit(w) for w in LANG_PROFILES[lang]]))
        )
        for lang in langs
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when((scores[lang] == best) & (best > 0), lang).otherwise(pred)
    langed = staged.select("doc_id", "text_hash", "n_words", "n_alpha", "n_chars",
                           pred.alias("predicted_lang"))

    dedup = langed.groupBy("text_hash").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_in_group"),
        F.min("predicted_lang").alias("predicted_lang"),
        F.min("n_words").alias("n_words"),
        F.min("n_alpha").alias("n_alpha"),
        F.min("n_chars").alias("n_chars"),
    )
    return (
        dedup.groupBy("predicted_lang")
        .agg(
            F.count(F.lit(1)).alias("n_canonical_docs"),
            F.sum(F.col("n_in_group") - 1).alias("n_duplicate_docs"),
            F.sum("n_words").alias("total_words"),
            (F.sum("n_alpha").cast("double") / F.sum("n_chars")).alias("alpha_pct"),
        )
        .orderBy("predicted_lang")
    )


_VOCAB_K = 100

_VOCAB_SQL = f"""
WITH t AS (
    SELECT unnest({_TOKS}) AS token FROM documents
),
counts AS (
    SELECT token, COUNT(*) AS n FROM t WHERE token <> '' GROUP BY token
),
ranked AS (
    SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rk
    FROM counts
)
SELECT CAST(rk AS BIGINT) AS rank, token,
       CAST(n AS BIGINT) AS n_occurrences
FROM ranked WHERE rk <= {_VOCAB_K}
"""


@register("text_vocabulary", _VOCAB_SQL)
def q_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-k tokens by frequency (ties broken
    lexically, so the cut is deterministic). The top-k is
    ``orderBy().limit()`` — Spark's TakeOrdered reduction, a per-
    partition heap + driver merge of k rows, NOT a global sort shuffle;
    the rank window then runs over just k rows."""
    from pyspark.sql import Window

    doc = load_table(spark, sf_dir, "documents")
    counts = (
        doc.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.desc("n"), "token").limit(_VOCAB_K)
    w = Window.orderBy(F.desc("n"), "token")
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "token",
        F.col("n").cast("bigint").alias("n_occurrences"),
    )


_CLEAN_SQL = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_raw,
       CAST(length(trim(regexp_replace(regexp_replace(regexp_replace(
           text, '<[^>]*>', ' ', 'g'),
           '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
           '[ \t]{2,}', ' ', 'g'))) AS BIGINT) AS n_chars_clean,
       CAST(len(regexp_extract_all(text, '<[^>]*>')) AS BIGINT) AS tag_matches,
       CAST(len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]')) AS BIGINT) AS ctrl_chars,
       CAST(len(regexp_extract_all(text, '[ \t]{2,}')) AS BIGINT) AS ws_runs
FROM documents
"""


@register("text_clean_stats", _CLEAN_SQL)
def q_text_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization audit: tag/control/whitespace removal counts and
    cleaned lengths per document (map-only regexp chain, no UDF)."""
    from ..operators.text import clean_stats

    return clean_stats(load_table(spark, sf_dir, "documents"))


# --- cross-document repeated passages (boilerplate) ------------------------

_SHINGLE5_CTES = r"""
toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
         FROM documents),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(
               CASE WHEN len(t) < 5 THEN [list_aggr(t, 'string_agg', ' ')]
                    ELSE list_transform(range(1, len(t) - 5 + 2),
                                        i -> array_to_string(t[i : i + 4], ' '))
               END)) AS shingle
    FROM toks
)"""

_BOILERPLATE_SQL = f"""
WITH {_SHINGLE5_CTES},
freq AS (
    SELECT shingle, CAST(count(*) AS BIGINT) AS n_docs FROM sh GROUP BY shingle
)
SELECT shingle, n_docs FROM freq WHERE n_docs >= 3
ORDER BY n_docs DESC, shingle ASC
LIMIT 50
"""


@register("boilerplate_passages", _BOILERPLATE_SQL)
def q_boilerplate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 most repeated 5-word passages across the corpus (document
    frequency >= 3) — templated spans a curation pass strips (the
    repeated-substring dedup signal at shingle granularity)."""
    from ..operators.text import boilerplate_passages

    return (
        boilerplate_passages(load_table(spark, sf_dir, "documents"), k=5, min_docs=3)
        .orderBy(F.desc("n_docs"), F.asc("shingle"))
        .limit(50)
    )


_DOC_BP_SQL = f"""
WITH {_SHINGLE5_CTES},
hashed AS (
    SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h FROM sh
),
freq AS (SELECT h, count(*) AS nd FROM hashed GROUP BY h),
bp AS (SELECT h FROM freq WHERE nd >= 3)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN bp.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boilerplate,
       CAST(sum(CASE WHEN bp.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS boilerplate_ratio
FROM hashed LEFT JOIN bp USING (h)
GROUP BY doc_id
"""


@register("doc_boilerplate_stats", _DOC_BP_SQL)
def q_doc_boilerplate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate contamination share — the doc↔frequency
    join runs on 60-bit md5 shingle keys (16-byte shuffle rows), exact
    on both engines."""
    from ..operators.text import doc_boilerplate_stats

    return doc_boilerplate_stats(
        load_table(spark, sf_dir, "documents"), k=5, min_docs=3
    )


_GOPHER_SQL = f"""
WITH t AS (
    SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS tn FROM documents
),
d AS (
    SELECT doc_id,
           CAST(len(tn) AS BIGINT) AS n_words,
           CAST(list_max(list_transform(list_distinct(tn),
                    x -> len(list_filter(tn, y -> y = x)))) AS BIGINT)
               AS top_word_cnt,
           CAST(list_sum(list_transform(tn, x -> length(x))) AS BIGINT)
               AS char_sum,
           CAST(len(list_filter(tn, x -> regexp_matches(x, '[a-z]')))
                AS BIGINT) AS alpha_words,
           CAST(len(list_intersect(list_distinct(tn), [{_stop_list}]))
                AS BIGINT) AS stop_hits
    FROM t WHERE len(tn) > 0
)
SELECT doc_id, n_words,
       CAST(char_sum AS DOUBLE) / n_words AS mean_word_len,
       CAST(alpha_words AS DOUBLE) / n_words AS alpha_word_ratio,
       stop_hits,
       CAST(top_word_cnt AS DOUBLE) / n_words AS top_word_share,
       (n_words >= 20 AND n_words <= 100000) AS rule_word_count,
       (CAST(char_sum AS DOUBLE) / n_words >= 3.0
        AND CAST(char_sum AS DOUBLE) / n_words <= 10.0) AS rule_mean_word_len,
       (CAST(alpha_words AS DOUBLE) / n_words >= 0.8) AS rule_alpha_words,
       (stop_hits >= 2) AS rule_stopwords,
       (CAST(top_word_cnt AS DOUBLE) / n_words <= 0.12) AS rule_repetition,
       ((n_words >= 20 AND n_words <= 100000)
        AND (CAST(char_sum AS DOUBLE) / n_words >= 3.0
             AND CAST(char_sum AS DOUBLE) / n_words <= 10.0)
        AND (CAST(alpha_words AS DOUBLE) / n_words >= 0.8)
        AND (stop_hits >= 2)
        AND (CAST(top_word_cnt AS DOUBLE) / n_words <= 0.12)) AS passes
FROM d
"""


@register("text_gopher_rules", _GOPHER_SQL)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality gate: per-doc word-count / mean
    word-length / alpha-word / stopword / top-word-repetition rules and
    the composite pass flag. Map-only: every per-doc statistic is an
    array fold over the tokenized text (no shuffle, no aggregation, no
    window — plan-gated in tests/test_plans.py)."""
    from ..operators.text import gopher_rules

    return gopher_rules(load_table(spark, sf_dir, "documents"))


_FERTILITY_SQL = f"""
WITH t AS (
    SELECT lang,
           CAST(len({_TOKS}) AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                AS BIGINT) AS n_bpe
    FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_words) AS fertility
FROM t
GROUP BY lang
"""


@register("tokenizer_fertility_by_lang", _FERTILITY_SQL)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (BPE-ish tokens per whitespace word) by
    language — the standard multilingual-tokenizer health metric; a
    lang whose fertility balloons is under-served by the vocabulary.
    One map + one tiny aggregation."""
    from ..operators.text import bpe_ish_token_count
    from ..functions.textfn import tokens as _tok

    doc = load_table(spark, sf_dir, "documents")
    per = doc.select(
        "lang",
        F.size(_tok("text")).cast("bigint").alias("n_words"),
        bpe_ish_token_count("text").cast("bigint").alias("n_bpe"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
        (
            F.sum("n_bpe").cast("double") / F.sum("n_words").cast("double")
        ).alias("fertility"),
    )


# --- Zipf's-law fit over the term rank-frequency curve ---------------------

_ZIPF_TOP = 1000

# x = lnq(rank), y = lnq(freq), both FLOOR(ln(int)·2^20) BIGINT — the
# least-squares slope is scale-invariant, so the quantization factor
# cancels; moment sums are exact BIGINT, the final slope/intercept are a
# handful of double ops on identical integers.
_ZIPF_SQL = f"""
WITH t AS (SELECT unnest({_TOKS}) AS term FROM documents),
cnts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1),
top AS (
    SELECT term, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rnk
    FROM cnts
    ORDER BY cnt DESC, term
    LIMIT {_ZIPF_TOP}
),
q AS (
    SELECT CAST(FLOOR(LN(CAST(rnk AS DOUBLE)) * 1048576.0) AS BIGINT) AS xq,
           CAST(FLOOR(LN(CAST(cnt AS DOUBLE)) * 1048576.0) AS BIGINT) AS yq
    FROM top
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(xq) AS BIGINT) AS sx,
           CAST(SUM(yq) AS BIGINT) AS sy,
           CAST(SUM(xq * xq) AS BIGINT) AS sxx,
           CAST(SUM(xq * yq) AS BIGINT) AS sxy
    FROM q
)
SELECT n AS n_terms,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS zipf_slope,
       (CAST(sy AS DOUBLE)
        - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
          * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) / 1048576.0 AS intercept_ln
FROM m
"""


@register("text_zipf_slope", _ZIPF_SQL)
def q_text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic: least-squares slope of ln(frequency) vs
    ln(rank) over the top-1000 corpus terms — natural text sits near
    −1; a slope far off it flags synthetic, boilerplate-heavy, or
    truncated corpora (a standard corpus-health check before
    tokenizer training).

    Scale shape: term counts are the one corpus-sized hash agg; the
    top-1000 cut is TakeOrdered (never a global sort of the vocab);
    ranking and the moment sums run over a bounded 1000-row set. The
    quantized-ln BIGINT moments make the regression bit-reproducible
    (module-note idiom); the slope is scale-invariant so the 2^20
    factor cancels."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term")
    )
    cnts = t.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    top = cnts.orderBy(F.desc("cnt"), "term").limit(_ZIPF_TOP)
    w = W.orderBy(F.desc("cnt"), "term")
    ranked = top.select(
        F.row_number().over(w).cast("bigint").alias("rnk"), "cnt"
    )

    def _lnq(c):
        return F.floor(F.log(c.cast("double")) * 1048576.0).cast("bigint")

    q = ranked.select(
        _lnq(F.col("rnk")).alias("xq"), _lnq(F.col("cnt")).alias("yq")
    )
    m = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xq").cast("bigint").alias("sx"),
        F.sum("yq").cast("bigint").alias("sy"),
        F.sum(F.col("xq") * F.col("xq")).cast("bigint").alias("sxx"),
        F.sum(F.col("xq") * F.col("yq")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    slope = (nd * F.col("sxy").cast("double") - sxd * syd) / (
        nd * F.col("sxx").cast("double") - sxd * sxd
    )
    return m.select(
        F.col("n").alias("n_terms"),
        slope.alias("zipf_slope"),
        ((syd - slope * sxd) / nd / 1048576.0).alias("intercept_ln"),
    )


# --- corpus novelty ratio (first-seen n-gram share per document) -----------

_NOV_K = 8

_NOV_SQL = f"""
WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
sh AS (
    SELECT doc_id, source, unnest(
        list_distinct(CASE WHEN len(toks) < {_NOV_K}
             THEN [list_aggr(toks, 'string_agg', ' ')]
             ELSE list_transform(range(1, len(toks) - {_NOV_K} + 2),
                                 i -> array_to_string(toks[i : i + {_NOV_K} - 1], ' '))
        END)) AS gram
    FROM t
),
hashed AS (
    SELECT doc_id, source,
           ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
    FROM sh
),
first_seen AS (
    SELECT h, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM hashed GROUP BY h
),
per_doc AS (
    SELECT x.doc_id, x.source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = x.doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel
    FROM hashed x JOIN first_seen f ON f.h = x.h
    GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_grams) AS BIGINT) AS n_grams,
       CAST(SUM(n_novel) AS BIGINT) AS n_novel,
       CAST(SUM(n_novel) AS DOUBLE) / SUM(n_grams) AS novelty_ratio,
       CAST(SUM(CASE WHEN n_novel = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_fully_derivative
FROM per_doc
GROUP BY source
"""


@register("text_novelty_ratio", _NOV_SQL)
def q_text_novelty_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus novelty: the share of each source's distinct
    8-gram occurrences that are FIRST seen in that document (ingestion
    order = doc_id) — the dataset-report metric behind "how much of
    this crawl is new text": a source full of re-posts scores near 0
    novelty and ``n_fully_derivative`` counts docs contributing nothing
    first-seen.

    Scale shape: one shingle explode deduped per doc, first-seen owner
    via a map-side-combinable MIN(doc_id) agg on 60-bit md5 gram keys,
    then one big-big join back on those 8-byte keys (the
    ``doc_boilerplate_stats`` join discipline — never the gram text) and
    two hash aggs down to |sources| rows."""
    from ..operators.dedup import shingle_docs
    from ..functions.textfn import md5_bigint

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_docs(docs, text_col="text", k=_NOV_K)
    # round 11 (guide §2.4): the hashed gram stream feeds the first-seen
    # aggregate AND the join probe — cut it once instead of running
    # tokenize+shingle+md5 twice
    hashed = (
        sh.join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", md5_bigint(F.col("shingle")).alias("h"))
        .localCheckpoint(eager=False)
    )
    first_seen = hashed.groupBy("h").agg(
        F.min("doc_id").cast("bigint").alias("first_doc")
    )
    per_doc = (
        hashed.join(first_seen, "h")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_grams").cast("bigint").alias("n_grams"),
        F.sum("n_novel").cast("bigint").alias("n_novel"),
        (F.sum("n_novel").cast("double") / F.sum("n_grams")).alias(
            "novelty_ratio"
        ),
        F.sum(F.when(F.col("n_novel") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_fully_derivative"),
    )


# --- vocabulary coverage / OOV rate per language ----------------------------

_OOV_V = 500

_OOV_SQL = f"""
WITH t AS (
    SELECT lang, unnest({_TOKS}) AS token FROM documents
),
occ AS (
    SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n
    FROM t WHERE token <> '' GROUP BY lang, token
),
freq AS (
    SELECT token, CAST(SUM(n) AS BIGINT) AS n FROM occ GROUP BY token
),
vocab AS (
    SELECT token FROM freq ORDER BY n DESC, token LIMIT {_OOV_V}
)
SELECT o.lang,
       CAST(SUM(o.n) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN o.n ELSE 0 END) AS BIGINT)
           AS n_oov,
       CAST(SUM(CASE WHEN v.token IS NULL THEN o.n ELSE 0 END) AS DOUBLE)
           / CAST(SUM(o.n) AS BIGINT) AS oov_rate,
       CAST(COUNT(DISTINCT o.token) AS BIGINT) AS n_distinct_tokens,
       CAST(COUNT(DISTINCT CASE WHEN v.token IS NULL THEN o.token END)
           AS BIGINT) AS n_distinct_oov
FROM occ o LEFT JOIN vocab v ON o.token = v.token
GROUP BY o.lang
"""


@register("tokenizer_oov_rate", _OOV_SQL)
def q_tokenizer_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage: the share of each language's token
    OCCURRENCES (and distinct token types) falling outside the top-500
    corpus vocabulary — the go/no-go check before freezing a tokenizer
    vocab, and the per-language fairness lens on it (a vocab fit on the
    majority language starves the rest; compare
    ``tokenizer_fertility_by_lang``).

    Scale shape: occurrences collapse to (lang, token) counts FIRST (one
    combinable agg — the explode never reaches a join), corpus totals
    collapse from those, the top-V cut is TakeOrdered (per-partition
    heap, no global sort shuffle), and the V-row vocab broadcasts back
    onto the (lang, token) frame. Ties at the boundary break lexically
    ⇒ a deterministic vocabulary on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    occ = (
        docs.select(
            "lang",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias(
                "token"
            ),
        )
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    freq = occ.groupBy("token").agg(F.sum("n").cast("bigint").alias("fn"))
    vocab = (
        freq.orderBy(F.desc("fn"), "token")
        .limit(_OOV_V)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    joined = occ.join(F.broadcast(vocab), "token", "left")
    oov_n = F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(F.lit(0))
    return joined.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.sum(oov_n).cast("bigint").alias("n_oov"),
        (F.sum(oov_n).cast("double") / F.sum("n").cast("bigint")).alias(
            "oov_rate"
        ),
        F.countDistinct("token").cast("bigint").alias("n_distinct_tokens"),
        F.countDistinct(
            F.when(F.col("in_vocab").isNull(), F.col("token"))
        )
        .cast("bigint")
        .alias("n_distinct_oov"),
    )


# --- quality-filter waterfall (per-rule kill attribution) --------------------

_WF_RULES = [
    "rule_word_count",
    "rule_mean_word_len",
    "rule_alpha_words",
    "rule_stopwords",
    "rule_repetition",
]


def _waterfall_sql() -> str:
    rows = []
    for i, r in enumerate(_WF_RULES):
        others = [o for o in _WF_RULES if o != r]
        prior = _WF_RULES[:i]
        only = " AND ".join([f"NOT {r}"] + others)
        at_stage = " AND ".join([f"NOT {r}"] + prior) if prior else f"NOT {r}"
        rows.append(
            f"SELECT {i + 1} AS stage, '{r}' AS rule,\n"
            f"  CAST(SUM(CASE WHEN NOT {r} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_fail,\n"
            f"  CAST(SUM(CASE WHEN {only} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_only,\n"
            f"  CAST(SUM(CASE WHEN {at_stage} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_killed_at_stage,\n"
            f"  CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_survivors\n"
            f"FROM g"
        )
    body = "\nUNION ALL\n".join(rows)
    return f"WITH g AS ({_GOPHER_SQL})\n{body}"


@register("curation_filter_waterfall", _waterfall_sql())
def q_curation_filter_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule kill attribution for the Gopher quality gate: for each
    rule, how many docs fail it at all (``n_fail``), how many it is the
    SOLE reason for losing (``n_only`` — drop this rule and exactly
    these docs come back), and how many die at its stage in the fixed
    waterfall order (``n_killed_at_stage`` — sums to total kills). The
    report a curation run reads before tuning thresholds: a rule with
    big ``n_fail`` but zero ``n_only`` is redundant; one with big
    ``n_only`` is load-bearing.

    Scale shape: the per-doc rule flags are the map-only
    ``gopher_rules`` pass; all 5×4 counters land in ONE conditional
    aggregation (no per-rule re-scan — same discipline as
    ``events_did_readout``'s cell pivot). Docs with zero words fall
    outside the rule base on both engines."""
    from ..operators.text import gopher_rules

    g = gopher_rules(load_table(spark, sf_dir, "documents"))
    aggs = []
    for i, r in enumerate(_WF_RULES):
        others = [o for o in _WF_RULES if o != r]
        prior = _WF_RULES[:i]
        fail = ~F.col(r)
        only = fail
        for o in others:
            only = only & F.col(o)
        at_stage = fail
        for p in prior:
            at_stage = at_stage & F.col(p)
        aggs += [
            F.sum(F.when(fail, 1).otherwise(0))
            .cast("bigint")
            .alias(f"f_{i}"),
            F.sum(F.when(only, 1).otherwise(0))
            .cast("bigint")
            .alias(f"o_{i}"),
            F.sum(F.when(at_stage, 1).otherwise(0))
            .cast("bigint")
            .alias(f"k_{i}"),
        ]
    aggs.append(
        F.sum(F.when(F.col("passes"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_survivors")
    )
    one = g.agg(*aggs)
    rows = [
        F.struct(
            F.lit(i + 1).alias("stage"),
            F.lit(r).alias("rule"),
            F.col(f"f_{i}").alias("n_fail"),
            F.col(f"o_{i}").alias("n_only"),
            F.col(f"k_{i}").alias("n_killed_at_stage"),
        )
        for i, r in enumerate(_WF_RULES)
    ]
    return one.select(
        F.explode(F.array(*rows)).alias("p"), "n_survivors"
    ).select(
        "p.stage", "p.rule", "p.n_fail", "p.n_only", "p.n_killed_at_stage",
        "n_survivors",
    )


# --- distinctive terms per source (keyword extraction) -----------------------

_DT_MIN_TF = 5
_DT_TOP = 5

_DT_SQL = f"""
WITH t AS (
    SELECT source, unnest({_TOKS}) AS token FROM documents
),
st AS (
    SELECT source, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM t WHERE token <> '' GROUP BY source, token
),
m AS (
    SELECT source, token, tf,
           CAST(SUM(tf) OVER (PARTITION BY source) AS BIGINT) AS n_src,
           CAST(SUM(tf) OVER (PARTITION BY token) AS BIGINT) AS tf_corpus,
           CAST(SUM(tf) OVER () AS BIGINT) AS n_corpus
    FROM st
),
lift AS (
    SELECT source, token, tf,
           (CAST(tf AS DOUBLE) / n_src)
               / (CAST(tf_corpus AS DOUBLE) / n_corpus) AS lift
    FROM m
    WHERE tf >= {_DT_MIN_TF}
),
rk AS (
    SELECT source, token, tf, lift,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY lift DESC, token) AS rank
    FROM lift
)
SELECT source, CAST(rank AS BIGINT) AS rank, token, tf, lift
FROM rk WHERE rank <= {_DT_TOP}
"""


@register("text_distinctive_terms", _DT_SQL)
def q_text_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction per source: the top-5 terms by LIFT — the
    term's in-source occurrence share over its corpus-wide share (the
    odds-ratio flavor of TF-IDF that needs NO logarithm, so there is no
    transcendental to diverge cross-engine: both shares are exact
    integer divisions and their ratio is one more correctly-rounded
    double op). The dataset-card staple: what vocabulary makes each
    source different.

    Scale shape: the explode collapses immediately to (source, token)
    counts (one combinable agg); source, token, and corpus totals are
    WINDOW sums over that vocab-sized table — a join-back form consumed
    the count table four times and re-executed the text scan per branch
    (no CSE across join branches); windows read it once. The per-source
    top-5 window runs over only the tf ≥ 5 candidates. Ties break
    lexically."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias(
                "token"
            ),
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    m = st.select(
        "source",
        "token",
        "tf",
        F.sum("tf")
        .over(Window.partitionBy("source"))
        .cast("bigint")
        .alias("n_src"),
        F.sum("tf")
        .over(Window.partitionBy("token"))
        .cast("bigint")
        .alias("tf_corpus"),
        F.sum("tf").over(Window.partitionBy()).cast("bigint").alias(
            "n_corpus"
        ),
    )
    lift = m.filter(F.col("tf") >= _DT_MIN_TF).select(
        "source",
        "token",
        "tf",
        (
            (F.col("tf").cast("double") / F.col("n_src"))
            / (F.col("tf_corpus").cast("double") / F.col("n_corpus"))
        ).alias("lift"),
    )

    w = Window.partitionBy("source").orderBy(F.desc("lift"), "token")
    return (
        lift.select(
            "source",
            F.row_number().over(w).cast("bigint").alias("rank"),
            "token",
            "tf",
            "lift",
        )
        .filter(F.col("rank") <= _DT_TOP)
    )


# ---------------------------------------------------------------------------
# Sliding chunk windows (RAG / context-window training prep)
# ---------------------------------------------------------------------------

_CHUNK_C = 32   # chunk size (tokens)
_CHUNK_S = 24   # stride (tokens) -> 8-token overlap

_CHUNK_SQL = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
c AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {_CHUNK_S} AS BIGINT) AS start_tok,
       CAST(LEAST({_CHUNK_C}, n - i * {_CHUNK_S}) AS BIGINT) AS chunk_tokens,
       md5(array_to_string(
           toks[i * {_CHUNK_S} + 1 :
                i * {_CHUNK_S} + LEAST({_CHUNK_C}, n - i * {_CHUNK_S})],
           ' ')) AS chunk_md5
FROM c, unnest(range(0, (n - 1) // {_CHUNK_S} + 1)) u(i)
"""


@register("text_chunk_windows", _CHUNK_SQL)
def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding chunk windows over each document's token stream (chunk
    32 tokens, stride 24 — the RAG / context-window packing prep): one
    row per (doc, chunk) with its position, length, and an md5 of the
    actual chunk TEXT — the hash proves the slicing is identical, not
    just the arithmetic.  Map-only: a per-row sequence explode, no
    shuffle, chunk rows are 4 scalars however long the document."""
    from ..functions.textfn import tokens

    doc = load_table(spark, sf_dir, "documents")
    t = doc.select("doc_id", tokens("text").alias("toks")).withColumn(
        "n", F.size("toks")
    ).filter(F.col("n") > 0)
    s, c = _CHUNK_S, _CHUNK_C
    chunks = t.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.floor((F.col("n") - 1) / s).cast("int"))
        ).alias("i"),
    )
    clen = F.least(F.lit(c), F.col("n") - F.col("i") * s)
    return chunks.select(
        "doc_id",
        F.col("i").cast("bigint").alias("chunk_idx"),
        (F.col("i") * s).cast("bigint").alias("start_tok"),
        clen.cast("bigint").alias("chunk_tokens"),
        F.md5(
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("i") * s + 1, clen))
        ).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# Curriculum ordering (round 8)
# ---------------------------------------------------------------------------
# Training pipelines feed data easy-to-hard (or clean-to-noisy): order
# the corpus by a quality bucket, deterministically shuffled WITHIN each
# bucket so no spurious correlation (source order, id order) leaks into
# the schedule.  All-integer quality key (stopword permille), 60-bit
# md5 shuffle, and the global rank through the two-phase prefix
# machinery — no sort-to-one-partition anywhere.

_CUR_U = "('0x' || substr(md5('cur:' || doc_id), 1, 15))::BIGINT"

_CURRICULUM_SQL = f"""
WITH t AS (
    SELECT doc_id, list_distinct({_TOKS}) AS dt FROM documents
),
keyed AS (
    SELECT doc_id,
           CAST((len(list_intersect(dt, [{_stop_list}])) * 1000)
                // GREATEST(len(dt), 1) AS BIGINT) AS stop_permille,
           CAST((len(list_intersect(dt, [{_stop_list}])) * 1000)
                // GREATEST(len(dt), 1) // 250 AS BIGINT) AS bucket,
           {_CUR_U} AS u60
    FROM t
)
SELECT doc_id, stop_permille, bucket,
       CAST(ROW_NUMBER() OVER (
           ORDER BY bucket * 1152921504606846976 + u60, doc_id
       ) AS BIGINT) AS curriculum_rank
FROM keyed
"""


@register("text_curriculum_order", _CURRICULUM_SQL)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule for the corpus: quality bucket (integer
    stopword permille, quartile-width buckets — higher stopword density
    reads as more natural running text, the classic cheap properness
    signal) ascending, deterministic md5 shuffle within the bucket, and
    the GLOBAL schedule position as a two-phase prefix rank (equal-width
    key buckets + broadcast offsets — the plan stays shuffle-bounded at
    any corpus size, never a sort to one partition).  The oracle states
    the same order as one window."""
    from ..functions.prefix import two_phase_cumsum

    doc = load_table(spark, sf_dir, "documents")
    from ..functions.textfn import tokens

    staged = doc.select(
        "doc_id", F.array_distinct(tokens("text")).alias("dt")
    )
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    spm = (
        F.size(F.array_intersect(F.col("dt"), stop_arr)).cast("bigint")
        * F.lit(1000)
    ) / F.greatest(F.size("dt"), F.lit(1))
    keyed = staged.select(
        "doc_id",
        F.floor(spm).cast("bigint").alias("stop_permille"),
    ).select(
        "doc_id",
        "stop_permille",
        (F.col("stop_permille") / 250).cast("bigint").alias("bucket"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cur:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint").alias("u60"),
    ).withColumn(
        "_key",
        F.col("bucket") * F.lit(1152921504606846976) + F.col("u60"),
    )
    ranked = two_phase_cumsum(
        keyed, "_key", {"curriculum_rank": F.lit(1)},
        order_cols=["_key", "doc_id"],
    )
    return ranked.select(
        "doc_id",
        "stop_permille",
        "bucket",
        F.col("curriculum_rank").cast("bigint").alias("curriculum_rank"),
    )


# ---------------------------------------------------------------------------
# TF-IDF keyterms (round 8)
# ---------------------------------------------------------------------------

_KT_K = 5

_KEYTERMS_SQL = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
ex AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM ex GROUP BY 1, 2
),
dfx AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df
    FROM (SELECT DISTINCT doc_id, term FROM ex) GROUP BY 1
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM t),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
           CAST(tf.tf * (n_docs - dfx.df) AS BIGINT) AS score_q
    FROM tf JOIN dfx USING (term) CROSS JOIN nd
)
SELECT doc_id, term, tf, df, score_q, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_q DESC, term) AS rnk
    FROM scored
) WHERE rnk <= {_KT_K}
"""


@register("text_tfidf_keyterms", _KEYTERMS_SQL)
def q_tfidf_keyterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyterm extraction: top-5 terms by the ALL-INTEGER
    tf·(N − df) rational-idf surrogate — monotone in tf·idf for fixed
    N (idf = log(N/df) is monotone decreasing in df; so is N − df),
    chosen so ranking needs no transcendental and both engines agree
    bit-for-bit with lexicographic ties (the ``bm25_retrieval``
    rational-idf discipline).  The doc-level summarization/tagging
    primitive a corpus pipeline materializes next to quality scores:
    one token explode, two hash aggs, one per-doc window."""
    from ..functions.textfn import tokens as _tokens

    doc = load_table(spark, sf_dir, "documents")
    ex = doc.select("doc_id", F.explode(_tokens("text")).alias("term"))
    tf = ex.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dfx = (
        ex.select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    nd = doc.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = tf.join(dfx, "term").crossJoin(F.broadcast(nd)).select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * (F.col("n_docs") - F.col("df"))).cast("bigint").alias(
            "score_q"
        ),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score_q"), F.asc("term"))
    return scored.withColumn(
        "rnk", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rnk") <= _KT_K)


# --- T5 span-corruption prep (round 10) --------------------------------------

_SC_PCT = 15

_SPAN_CORRUPT_SQL = f"""
WITH toks AS (
    SELECT doc_id AS d, generate_subscripts(string_split(text, ' '), 1) - 1 AS t
    FROM documents
),
flagged AS (
    SELECT d, t,
           CASE WHEN ('0x' || substr(md5(d || ':' || t), 1, 15))::BIGINT
                     % 100 < {_SC_PCT} THEN 1 ELSE 0 END AS masked
    FROM toks
),
runs AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS span_len
    FROM (
        SELECT d, t,
               t - ROW_NUMBER() OVER (PARTITION BY d ORDER BY t) AS island
        FROM flagged WHERE masked = 1
    ) GROUP BY d, island
),
per_tok AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(masked) AS BIGINT) AS n_masked
    FROM flagged GROUP BY d
),
per_span AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(MAX(span_len) AS BIGINT) AS max_span_tokens
    FROM runs GROUP BY d
)
SELECT pt.d AS doc_id, pt.n_tokens, pt.n_masked,
       CAST(COALESCE(ps.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(ps.max_span_tokens, 0) AS BIGINT) AS max_span_tokens,
       CAST(pt.n_tokens - pt.n_masked + COALESCE(ps.n_spans, 0) AS BIGINT)
           AS input_len_tokens,
       CAST(pt.n_masked + COALESCE(ps.n_spans, 0) + 1 AS BIGINT)
           AS target_len_tokens
FROM per_tok pt LEFT JOIN per_span ps ON ps.d = pt.d
"""


@register("text_span_corruption", _SPAN_CORRUPT_SQL)
def q_text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption example geometry per document
    (``operators.text.span_corruption_stats``): a deterministic
    md5-analytic ~15% of whitespace tokens masks, adjacent masks merge
    to spans (gaps-and-islands, one doc-bounded window), and the
    emitted input/target token lengths are the denoising-objective
    shapes (kept + sentinel-per-span / masked + sentinel-per-span +
    EOS) a pretraining pipeline packs downstream.  No RNG state
    anywhere — the mask is a pure function of (doc_id, token index),
    so both engines derive identical geometry."""
    from ..operators.text import span_corruption_stats

    return span_corruption_stats(
        load_table(spark, sf_dir, "documents"), mask_pct=_SC_PCT
    )
