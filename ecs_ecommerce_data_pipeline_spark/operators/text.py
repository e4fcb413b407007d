"""Text-analysis operators for LLM training-data pipelines.

Operates on the ``documents`` table (``doc_id, text, lang, source,
n_chars``). All operators are pure Catalyst column expressions — no Python
UDFs — so they run JVM-side inside whole-stage codegen and scale linearly:
a per-document map with no shuffle (aggregations happen only in the
queries that consume these columns).

Portability contract: every hash is md5-based (``functions.textfn``) so a
SQL oracle reproduces values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import tokens

# Small fixed stopword profiles for the language-ID heuristic. Deliberately
# tiny and deterministic — the point is the *operator shape* (profile
# overlap scoring), not linguistic quality.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "to", "and", "is", "in", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "que", "est", "en"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "in"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不"],
}

STOPWORDS_EN = LANG_PROFILES["en"] + ["it", "for", "on", "with", "as"]


def token_stats(doc: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + distinct tokens + mean token
    length. Integer sums → exact double division (deterministic)."""
    toks = tokens(text_col)
    tok_lens = F.transform(toks, lambda t: F.length(t))
    return doc.withColumn("_toks", toks).select(
        "doc_id",
        F.size("_toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).cast("bigint").alias("n_unique_tokens"),
        (
            F.aggregate("_toks", F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
            .cast("double")
            / F.size("_toks")
        ).alias("mean_token_len"),
    )


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """Sub-word-ish token count: words + digit runs + punctuation marks
    counted separately (a cheap BPE proxy: splits on letter/digit/punct
    class boundaries). Pure regexp_count — JVM-side.

    Oracle: ``len(regexp_extract_all(x, pattern, 0))`` in DuckDB with the
    same pattern (character classes behave identically in Java regex and
    RE2 for ASCII classes).
    """
    return F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def quality_scores(doc: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, punctuation density, stopword ratio,
    alpha ratio, mean word length — the standard cheap pre-filters for
    LLM corpus cleaning."""
    # stage the token arrays as named columns: referencing the split/
    # array_distinct expressions more than once would make Catalyst
    # re-run the regex split per reference
    staged = doc.select(
        "doc_id",
        F.col(text_col).alias("_text"),
        tokens(text_col).alias("_toks"),
    ).withColumn("_dtoks", F.array_distinct(F.col("_toks")))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.array_intersect(F.col("_dtoks"), stop_arr))
    return staged.select(
        "doc_id",
        F.length("_text").cast("bigint").alias("n_chars"),
        F.regexp_count(F.col("_text"), F.lit(r"[.!?,;]")).cast("bigint")
        .alias("n_punct"),
        bpe_ish_token_count("_text").cast("bigint").alias("n_bpe_tokens"),
        F.size("_toks").cast("bigint").alias("n_words"),
        (n_stop.cast("double") / F.size("_dtoks")).alias("stopword_ratio"),
        (
            F.regexp_count(F.col("_text"), F.lit(r"[A-Za-z]")).cast("double")
            / F.length("_text")
        ).alias("alpha_ratio"),
    )


def lang_id(doc: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword-profile language ID heuristic: score = |distinct
    tokens ∩ profile| per language; argmax with lexicographic tie-break.

    Expressed as a greatest()+chained-CASE over per-language overlap
    counts — branch-free Catalyst expressions, no shuffle.
    """
    # stage: the distinct-token array feeds 2 expressions per language
    # plus the argmax CASE — inline it and Catalyst re-splits per use
    staged = doc.select(
        "doc_id", "lang", F.array_distinct(tokens(text_col)).alias("_dtoks")
    )
    langs = sorted(LANG_PROFILES)  # lexicographic tie-break: first max wins
    score_cols = [
        F.size(
            F.array_intersect(
                F.col("_dtoks"), F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
            )
        ).alias(f"score_{lang}")
        for lang in langs
    ]
    staged = staged.select("doc_id", "lang", *score_cols)
    scores = {lang: F.col(f"score_{lang}") for lang in langs}
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    # build reversed so earlier (lexicographically smaller) langs win ties
    for lang in reversed(langs):
        pred = F.when((scores[lang] == best) & (best > 0), lang).otherwise(pred)
    return staged.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[scores[lang].cast("bigint").alias(f"score_{lang}") for lang in langs],
        pred.alias("predicted_lang"),
    )


_CTRL_PAT = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_TAG_PAT = r"<[^>]*>"
_WS_PAT = r"[ \t]{2,}"


def clean_text(col: str | Column = "text") -> Column:
    """Normalization kernel for raw ingest: strip HTML-ish tags, remove
    control characters (\n and \t survive — a lone tab is preserved;
    tabs only vanish when a whitespace RUN collapses to one space),
    collapse repeated horizontal whitespace, trim. Pure
    ``regexp_replace`` chain — JVM-side,
    map-only; patterns use explicit ASCII classes so Java regex and RE2
    agree byte-for-byte.

    Oracle-SQL equivalent: the same four ``regexp_replace(..., 'g')``
    calls in the same order.
    """
    c = F.col(col) if isinstance(col, str) else col
    no_tags = F.regexp_replace(c, _TAG_PAT, " ")
    no_ctrl = F.regexp_replace(no_tags, _CTRL_PAT, "")
    collapsed = F.regexp_replace(no_ctrl, _WS_PAT, " ")
    return F.trim(collapsed)


def clean_staged_arrow(doc: DataFrame, text_col: str = "text") -> DataFrame:
    """The dataset-build pipeline's clean + stats stage as ONE Arrow
    kernel (round 12, guide §4.2): per document, the :func:`clean_text`
    normalization plus the three gate statistics (word count, alpha
    count, char count) computed in a single pass over the bytes, instead
    of four separate Catalyst regex traversals of the full text.

    Value contract (byte-identical to the Catalyst chain, A/B-verified
    row-for-row at sf0.1 and oracle-gated at sf0.001/0.01):

    * the three cleaning patterns are pure-ASCII classes — Java regex
      and Python ``re`` agree byte-for-byte on them;
    * trim is SPACE-only (``strip(' ')``), matching Spark/DuckDB
      ``trim`` — a Python ``.strip()`` would also eat the newlines that
      survive cleaning;
    * the word split uses the explicit Java ``\\s`` class
      ``[ \\t\\n\\x0b\\f\\r]`` — Python's ``\\s`` on str also matches
      unicode whitespace (NEL, NBSP) that Java's default ``\\s`` does
      not;
    * ``lower()`` is omitted: case never changes whitespace, so the
      word COUNT is unaffected (the Catalyst form lowers only as part
      of its shared tokenize expression).

    Returns (doc_id, text CLEANED, n_words, n_alpha, n_chars) —
    ungated; the caller applies the quality predicate.  The kernel sees
    only (doc_id, text), so column pruning at the scan is preserved by
    the explicit select.
    """
    import re

    import pandas as pd

    def kernel(batches):
        tag = re.compile(_TAG_PAT)
        ctrl = re.compile(_CTRL_PAT)
        ws2 = re.compile(_WS_PAT)
        wsplit = re.compile(r"[ \t\n\x0b\f\r]+")
        alpha = re.compile(r"[A-Za-z]")
        for pdf in batches:
            t = pdf[text_col].map(
                lambda s: ws2.sub(
                    " ", ctrl.sub("", tag.sub(" ", s or ""))
                ).strip(" ")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text": t,
                    "n_words": t.map(
                        lambda s: len(wsplit.split(s.strip(" ")))
                    ).astype("int64"),
                    "n_alpha": t.map(
                        lambda s: len(alpha.findall(s))
                    ).astype("int64"),
                    "n_chars": t.map(len).astype("int64"),
                }
            )

    return doc.select("doc_id", F.col(text_col).alias(text_col)).mapInPandas(
        kernel,
        "doc_id bigint, text string, n_words bigint, n_alpha bigint,"
        " n_chars bigint",
    )


def clean_stats(doc: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document cleaning report: cleaned text length plus what was
    removed (tag matches, control chars, collapsed whitespace runs) —
    the audit columns a curation pipeline keeps so cleaning is
    reviewable, not silent."""
    c = F.col(text_col)
    return doc.select(
        "doc_id",
        F.length(c).cast("bigint").alias("n_chars_raw"),
        F.length(clean_text(c)).cast("bigint").alias("n_chars_clean"),
        F.regexp_count(c, F.lit(_TAG_PAT)).cast("bigint").alias("tag_matches"),
        F.regexp_count(c, F.lit(_CTRL_PAT)).cast("bigint").alias("ctrl_chars"),
        F.regexp_count(c, F.lit(_WS_PAT)).cast("bigint").alias("ws_runs"),
    )


def boilerplate_passages(
    doc: DataFrame, text_col: str = "text", k: int = 5, min_docs: int = 3
) -> DataFrame:
    """Cross-document repeated passages: k-word shingles that occur in at
    least ``min_docs`` DISTINCT documents (headers, footers, license
    blurbs, templated spans — the repeated-substring dedup signal of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499, approximated at shingle granularity).

    Distinct from the doc-level dedup families (``operators.dedup``):
    those find pairs/clusters of similar DOCUMENTS; this finds PASSAGES
    repeated across otherwise-unrelated documents.

    Scale shape: one shingle explode (O(total words) rows, deduped
    per-doc by ``word_shingles``) → one map-side-combinable count per
    shingle (each doc contributes a shingle once, so COUNT = document
    frequency) → post-aggregation frequency filter. The shuffle carries
    the shingle text because the report needs it; the per-doc scorer
    below joins on a 60-bit hash instead.

    Returns (shingle, n_docs).
    """
    from .dedup import shingle_docs

    sh = shingle_docs(doc, text_col=text_col, k=k)
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def doc_boilerplate_stats(
    doc: DataFrame, text_col: str = "text", k: int = 5, min_docs: int = 3
) -> DataFrame:
    """Per-document boilerplate contamination: the share of a document's
    k-word shingles that are corpus-level boilerplate
    (``boilerplate_passages``). High-ratio docs are templated/duplicated
    content a curation pass down-weights or drops.

    The doc↔frequency join runs on ``md5``-derived 60-bit BIGINT shingle
    keys, not the shingle text — the big-big join shuffles 16 bytes per
    side instead of ~40-char strings (same idiom as exact dedup; the
    oracle reproduces the exact same hash).

    Returns (doc_id, n_shingles, n_boilerplate, boilerplate_ratio).
    """
    from ..functions.textfn import md5_bigint
    from .dedup import shingle_docs

    sh = shingle_docs(doc, text_col=text_col, k=k).select(
        "doc_id", md5_bigint(F.col("shingle")).alias("h")
    )
    freq = sh.groupBy("h").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    flagged = sh.join(
        freq.filter(F.col("n_docs") >= min_docs).select(
            "h", F.lit(1).alias("_bp")
        ),
        "h",
        "left",
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(F.coalesce(F.col("_bp"), F.lit(0))).cast("bigint").alias(
            "n_boilerplate"
        ),
        (
            F.sum(F.coalesce(F.col("_bp"), F.lit(0))).cast("double")
            / F.count(F.lit(1))
        ).alias("boilerplate_ratio"),
    )


def gopher_rules(
    doc: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
    max_top_word_share: float = 0.12,
) -> DataFrame:
    """Gopher-style heuristic quality gate (Rae et al. 2021 §A1.1
    adapted to this corpus): per-document rule signals and a composite
    ``passes`` flag.

    Rules: word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; share of words containing a
    latin letter ≥ min_alpha_word_ratio; at least ``min_stop_hits``
    DISTINCT English stopwords present; the single most frequent word's
    share of the doc ≤ max_top_word_share (the repetition gate).

    Shape: MAP-ONLY — every signal is an array fold over the row's own
    token list, so the plan contains NO shuffle at all (an earlier form
    exploded tokens and aggregated by (doc_id, word): that shuffles
    every token in the corpus to compute what is logically a per-row
    function — the top-word count is instead a run-length fold over the
    sorted token array). No windows, no Python.
    """
    toks_ne = F.filter(tokens(text_col), lambda x: x != "")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    zero = F.lit(0).cast("bigint")
    # max multiplicity of any word = longest run in the sorted array
    run_acc = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def _run_step(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(
            F.lit(1).cast("bigint")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
        )

    per_doc = doc.select(
        "doc_id",
        F.size(toks_ne).cast("bigint").alias("n_words"),
        F.aggregate(
            F.array_sort(toks_ne), run_acc, _run_step, lambda a: a["best"]
        ).alias("top_word_cnt"),
        F.aggregate(
            toks_ne, zero, lambda a, x: a + F.length(x)
        ).alias("_char_sum"),
        F.size(F.filter(toks_ne, lambda x: x.rlike("[a-z]")))
        .cast("bigint")
        .alias("_alpha_words"),
        F.size(F.array_intersect(F.array_distinct(toks_ne), stop_arr))
        .cast("bigint")
        .alias("stop_hits"),
    ).filter(F.col("n_words") > 0)
    mean_len = F.col("_char_sum").cast("double") / F.col("n_words").cast("double")
    alpha_ratio = (
        F.col("_alpha_words").cast("double") / F.col("n_words").cast("double")
    )
    top_share = (
        F.col("top_word_cnt").cast("double") / F.col("n_words").cast("double")
    )
    rules = {
        "rule_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "rule_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "rule_alpha_words": alpha_ratio >= min_alpha_word_ratio,
        "rule_stopwords": F.col("stop_hits") >= min_stop_hits,
        "rule_repetition": top_share <= max_top_word_share,
    }
    out = per_doc.select(
        "doc_id",
        "n_words",
        mean_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        "stop_hits",
        top_share.alias("top_word_share"),
        *[expr.alias(name) for name, expr in rules.items()],
    )
    passes = None
    for name in rules:
        passes = F.col(name) if passes is None else passes & F.col(name)
    return out.withColumn("passes", passes)


def span_corruption_stats(
    doc: DataFrame,
    mask_pct: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T5-style span-corruption prep (Raffel et al., 'Exploring the
    Limits of Transfer Learning...'): per document, a deterministic
    ~``mask_pct``% of whitespace tokens is masked, adjacent masked
    tokens merge into SPANS, and each span is replaced by one sentinel
    on the input side while the target carries sentinel + original
    tokens — the denoising-objective example shape every
    encoder-decoder (and UL2-style decoder) pipeline materializes from
    its corpus.

    Mask choice is md5-analytic per (doc, token index) — content- and
    engine-independent, reproducible without any RNG state (the
    preference-fixture discipline): token t masks iff
    ``md5_60bit(doc_id:':'/t) % 100 < mask_pct``.  Spans via
    gaps-and-islands (token_idx − rank over masked tokens is constant
    within a run) — one doc-bounded window.

    Emits the per-document example GEOMETRY (the part worth
    hash-pinning cross-engine; the actual text assembly is a trivial
    deterministic concat downstream): (doc_id, n_tokens, n_masked,
    n_spans, input_len_tokens = kept + one sentinel per span,
    target_len_tokens = masked + one sentinel per span + final EOS
    sentinel, max_span_tokens)."""
    toks = doc.select(
        F.col(id_col).alias("d"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("t", "tok"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("d").cast("string"),
                        F.col("t").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    flagged = toks.withColumn("masked", (u < mask_pct).cast("int"))
    from pyspark.sql import Window

    wm = Window.partitionBy("d").orderBy("t")
    runs = (
        flagged.filter(F.col("masked") == 1)
        .withColumn("island", F.col("t") - F.row_number().over(wm))
        .groupBy("d", "island")
        .agg(F.count(F.lit(1)).cast("bigint").alias("span_len"))
    )
    per_doc_tok = flagged.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("masked").cast("bigint").alias("n_masked"),
    )
    per_doc_span = runs.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.max("span_len").cast("bigint").alias("max_span_tokens"),
    )
    return (
        per_doc_tok.join(per_doc_span, "d", "left")
        .select(
            F.col("d").alias(id_col),
            "n_tokens",
            "n_masked",
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("max_span_tokens", F.lit(0))
            .cast("bigint")
            .alias("max_span_tokens"),
        )
        .withColumn(
            "input_len_tokens",
            (F.col("n_tokens") - F.col("n_masked") + F.col("n_spans")).cast(
                "bigint"
            ),
        )
        .withColumn(
            "target_len_tokens",
            (F.col("n_masked") + F.col("n_spans") + F.lit(1)).cast("bigint"),
        )
    )
