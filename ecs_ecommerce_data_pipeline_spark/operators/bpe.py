"""Distributed BPE vocabulary induction: fixed pair-merge rounds.

Byte-pair encoding's training loop — count adjacent symbol pairs, merge
the most frequent, repeat — is the canonical tokenizer-construction
step of an LLM data pipeline. The engine runs it distributed over the
corpus **word-frequency table** (the classic formulation: symbol work is
O(vocab), not O(corpus) — the corpus is touched once to build word
counts, exactly how production BPE trainers scale).

Determinism/portability contract (what makes the DuckDB oracle match):

* a word's symbol sequence is one string of ``␁sym␁`` units
  (``abc`` → ``␁a␁␁b␁␁c␁``, ␁ = ``\\x01``) — merging the top pair is
  then one ``replace(seq, ␁a␁␁b␁, ␁ab␁)``: non-regex, left-to-right,
  non-overlapping in BOTH engines. The DOUBLE separator between units
  matters: adjacent pair occurrences share no characters, so a run
  ``aaaa`` merges canonically to ``aa aa`` in a single scan (with a
  shared single separator the second occurrence would overlap the
  first's trailing ␁ and the run would merge as ``aa a a``);
* pair counting is over ALL adjacent pairs (overlapping — ``aaa``
  contributes (a,a) twice), weighted by exact word counts;
* the winning pair each round is (max total count, then lexicographic
  smallest pair string) — a total order, no float, no RNG.

Scale: each round = one hash aggregation over (vocab × avg symbols)
pair rows + a 1-row broadcast + a map-only merge. K rounds = K such
plans; the driver never sees data (the top-1 rides a broadcast join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import tokens

SEP = "\x01"


def word_freq_table(doc: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — the one corpus-sized aggregation."""
    return (
        doc.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def init_sequences(words: DataFrame) -> DataFrame:
    """Character-level symbol sequences: ``abc`` → ``␁a␁␁b␁␁c␁``
    (each symbol its own ␁-wrapped unit)."""
    return words.select(
        "word",
        "cnt",
        F.regexp_replace("word", "(.)", SEP + "$1" + SEP).alias("seq"),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """Adjacent-pair totals for one round: explode each word's symbol
    list into (sym_a, sym_b) pairs weighted by the word count."""
    syms = F.filter(F.split("seq", SEP), lambda s: s != "")
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat_ws(" ", F.slice(syms, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        state.select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").cast("bigint").alias("pair_cnt"))
    )


def bpe_merge_rounds(doc: DataFrame, rounds: int = 3) -> DataFrame:
    """Run ``rounds`` BPE merges; return one row per round:
    (round, merged_token, pair_cnt) — the induced merge table."""
    out, _state = _run_merges(doc, rounds)
    return out


def bpe_encode_tokens(doc: DataFrame, rounds: int = 3, top_n: int = 20) -> DataFrame:
    """ENCODE the corpus with the merge table induced by ``rounds`` BPE
    rounds (training and applying share one pass here — the per-round
    winning merge is applied to the word table as it is learned), then
    report the resulting token vocabulary: the ``top_n`` most frequent
    post-merge tokens as (token, n_occurrences), count-weighted by word
    frequency.

    The apply step a tokenizer service runs at corpus scale: everything
    is map-only over the VOCABULARY table (O(distinct words), not
    O(corpus)); the corpus is touched once for word counts. Ties at the
    top-N boundary break lexicographically — a total order, so the
    reported set is deterministic.
    """
    _out, state = _run_merges(doc, rounds)
    syms = F.filter(F.split("seq", SEP), lambda s: s != "")
    return (
        state.select(F.explode(syms).alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(top_n)
    )


def _run_merges(doc: DataFrame, rounds: int) -> tuple[DataFrame, DataFrame]:
    """Shared merge loop: returns (merge table, post-merge word state)."""
    # round 12 (guide §2.4/§5): the initial word table feeds round 1's
    # pair counts AND round 1's merge — without a cut the corpus-sized
    # tokenize+groupBy ran once per consumer
    state = init_sequences(word_freq_table(doc)).localCheckpoint(eager=False)
    out: DataFrame | None = None
    for r in range(1, rounds + 1):
        # the 1-row winner feeds BOTH the output row and the broadcast
        # merge — cut it so the vocab-sized pair aggregation runs once
        # per round, not twice (round 12, same class)
        top = (
            _pair_counts(state)
            .orderBy(F.desc("pair_cnt"), F.asc("pair"))
            .limit(1)
            .select(
                F.lit(r).cast("bigint").alias("round"),
                F.split("pair", " ").getItem(0).alias("_a"),
                F.split("pair", " ").getItem(1).alias("_b"),
                "pair_cnt",
            )
            .localCheckpoint(eager=False)
        )
        row = top.select(
            "round", F.concat("_a", "_b").alias("merged_token"), "pair_cnt"
        )
        out = row if out is None else out.unionByName(row)
        # each round references `state` twice (pair counts + merge) and
        # embeds the previous round's subtree — without a per-round
        # lineage cut the logical plan doubles every round (2^K growth).
        # LEFT join against the 1-row winner: when a round finds NO pair
        # (every word already a single symbol) the winner is empty, and a
        # cross join would annihilate the state — the fully-merged corpus
        # must pass through unchanged instead.
        state = state.join(F.broadcast(top), F.lit(True), "left").select(
            "word",
            "cnt",
            F.when(F.col("_a").isNull(), F.col("seq"))
            .otherwise(
                F.replace(
                    F.col("seq"),
                    F.concat(
                        F.lit(SEP), F.col("_a"), F.lit(SEP),
                        F.lit(SEP), F.col("_b"), F.lit(SEP),
                    ),
                    F.concat(F.lit(SEP), F.col("_a"), F.col("_b"), F.lit(SEP)),
                )
            )
            .alias("seq"),
        ).localCheckpoint(eager=False)
    assert out is not None
    return out, state
