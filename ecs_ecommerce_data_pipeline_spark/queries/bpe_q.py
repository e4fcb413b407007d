"""BPE vocabulary-induction query: K merge rounds, oracle-chained.

The oracle reproduces every round as chained CTEs — same word-frequency
base, same pair counting (overlapping, count-weighted), same
(count desc, pair asc) winner rule, same ``replace``-based left-to-right
merge on ``chr(1)``-separated symbol strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..operators.bpe import bpe_encode_tokens, bpe_merge_rounds
from ..sources.testdata import load_table

_ROUNDS = 3
_ENCODE_TOP = 20


def _bpe_sql(rounds: int) -> str:
    parts = [
        r"""
WITH wf AS (
    SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        FROM documents
    ) w WHERE word <> '' GROUP BY word
),
s0 AS (
    SELECT word, cnt,
           regexp_replace(word, '(.)', chr(1) || '\1' || chr(1), 'g') AS seq
    FROM wf
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
p{r} AS (
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS pair_cnt FROM (
        SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                                     i -> sy[i] || ' ' || sy[i + 1])) AS pair,
               cnt
        FROM (SELECT list_filter(string_split(seq, chr(1)), x -> x <> '') AS sy,
                     cnt
              FROM s{r - 1}) t{r}
    ) u{r} GROUP BY pair
),
t{r} AS (
    SELECT CAST({r} AS BIGINT) AS round,
           string_split(pair, ' ')[1] AS a,
           string_split(pair, ' ')[2] AS b,
           pair_cnt
    FROM p{r} ORDER BY pair_cnt DESC, pair ASC LIMIT 1
),
s{r} AS (
    -- LEFT JOIN: a round with no remaining pair has an empty winner and
    -- must pass the fully-merged corpus through unchanged (a comma join
    -- would annihilate it — same guard as the engine's merge loop)
    SELECT word, cnt,
           CASE WHEN t.a IS NULL THEN seq
                ELSE replace(seq, chr(1) || t.a || chr(1) || chr(1) || t.b || chr(1),
                             chr(1) || t.a || t.b || chr(1)) END AS seq
    FROM s{r - 1} LEFT JOIN t{r} t ON TRUE
)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT round, a || b AS merged_token, pair_cnt FROM t{r}"
        for r in range(1, rounds + 1)
    )
    return "".join(parts) + "\n" + selects


def _bpe_encode_sql(rounds: int, top_n: int) -> str:
    """Same chained merge CTEs, but the final select ENCODES: explode the
    post-merge symbol strings back to tokens, count-weighted, top-N."""
    head = _bpe_sql(rounds).rsplit("\nSELECT round", 1)[0]
    # head ends with the s{rounds} CTE definition; replace the merge-table
    # union tail with the vocabulary aggregation
    return (
        head
        + f"""
SELECT token, CAST(SUM(cnt) AS BIGINT) AS n_occurrences FROM (
    SELECT unnest(list_filter(string_split(seq, chr(1)), x -> x <> '')) AS token,
           cnt
    FROM s{rounds}
) GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT {top_n}
"""
    )


@register("bpe_merge_rounds", _bpe_sql(_ROUNDS))
def q_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First K BPE merges induced from the corpus word-frequency table —
    per round one vocab-sized pair aggregation, a 1-row broadcast, and a
    map-only string merge."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_merge_rounds(docs, rounds=_ROUNDS)


@register("bpe_encode_corpus", _bpe_encode_sql(_ROUNDS, _ENCODE_TOP))
def q_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY: encode the corpus with the K-round merge table
    and report the top post-merge vocabulary tokens (count-weighted by
    word frequency). All symbol work is O(distinct words); the top-N
    rides a TakeOrdered, never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_encode_tokens(docs, rounds=_ROUNDS, top_n=_ENCODE_TOP)


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: corpus coverage vs vocab size
# ---------------------------------------------------------------------------

_COVERAGE_SIZES = [8, 16, 32, 64, 128]

_COVERAGE_SQL = f"""
WITH t AS (
    SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
    FROM documents
),
wc AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM t WHERE word <> '' GROUP BY word
),
ranked AS (
    SELECT word, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rnk
    FROM wc
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM wc)
SELECT v.vocab_size,
       CAST(SUM(CASE WHEN r.rnk <= v.vocab_size THEN r.cnt ELSE 0 END)
            AS BIGINT) AS covered_occurrences,
       MIN(tot.total) AS total_occurrences,
       CAST(SUM(CASE WHEN r.rnk <= v.vocab_size THEN r.cnt ELSE 0 END)
            AS DOUBLE) / MIN(tot.total) AS coverage
FROM ranked r
CROSS JOIN (VALUES {", ".join(f"({v})" for v in _COVERAGE_SIZES)}) v(vocab_size)
CROSS JOIN tot
GROUP BY v.vocab_size
"""


@register("tokenizer_coverage_curve", _COVERAGE_SQL)
def q_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus coverage as a function of vocabulary size: for each
    candidate vocab size V, the share of word OCCURRENCES covered by
    the V most frequent distinct words (count desc, word asc — the
    deterministic rank both engines share).  The curve that sizes a
    tokenizer's vocab / decides the OOV budget.

    Shape: one corpus-scan word count (hash agg), then one rank window
    and one conditional aggregation over the VOCAB-sized table — the
    data-sized explode never shuffles twice, and the window sorts
    distinct words, not occurrences."""
    from ..functions.textfn import tokens

    doc = load_table(spark, sf_dir, "documents")
    wc = (
        doc.select(F.explode(tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = W.orderBy(F.desc("cnt"), F.asc("word"))
    ranked = wc.withColumn("rnk", F.row_number().over(w))
    aggs = []
    for v in _COVERAGE_SIZES:
        aggs.append(
            F.sum(F.when(F.col("rnk") <= v, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias(f"c{v}")
        )
    aggs.append(F.sum("cnt").cast("bigint").alias("total"))
    one = ranked.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(v).alias("vocab_size"), F.col(f"c{v}").alias("covered")
            )
            for v in _COVERAGE_SIZES
        ]
    )
    return one.select(F.explode(pairs).alias("p"), "total").select(
        F.col("p.vocab_size").cast("int").alias("vocab_size"),
        F.col("p.covered").alias("covered_occurrences"),
        F.col("total").alias("total_occurrences"),
        (F.col("p.covered").cast("double") / F.col("total")).alias("coverage"),
    )
