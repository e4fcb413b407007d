"""BPE merge rounds: known-answer corpus, overlap semantics, and
determinism under repartitioning."""

from __future__ import annotations

import pytest

from ecs_ecommerce_data_pipeline_spark.operators.bpe import (
    bpe_merge_rounds,
    init_sequences,
    word_freq_table,
)


@pytest.mark.slow
def test_known_corpus_merge_order(spark):
    # words: "low" x5, "lower" x2, "widest" x3  (classic BPE example)
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["widest"] * 3)
    doc = spark.createDataFrame([(1, text)], "doc_id int, text string")
    out = {r["round"]: r for r in bpe_merge_rounds(doc, rounds=3).collect()}
    # pair counts round 1: (l,o)=7, (o,w)=7, (w,e)=2+3=5, ...
    # tie on 7 -> lexicographic: "l o" < "o w" -> merge "lo"
    assert out[1]["merged_token"] == "lo"
    assert out[1]["pair_cnt"] == 7
    # round 2: (lo,w)=7 wins
    assert out[2]["merged_token"] == "low"
    assert out[2]["pair_cnt"] == 7
    # round 3: widest pairs (w,i)=3,(i,d)=3,(d,e)=3,(e,s)=3,(s,t)=3;
    # (low,e)=2 loses; lexicographic smallest of the 3-count pairs:
    # "d e" < "e s" < "i d" < "s t" < "w i" -> "de"
    assert out[3]["merged_token"] == "de"
    assert out[3]["pair_cnt"] == 3


def test_overlapping_run_merges_left_to_right(spark):
    # "aaaa" x1: pairs (a,a)=3 -> merge left-to-right gives [aa][aa]
    doc = spark.createDataFrame([(1, "aaaa")], "doc_id int, text string")
    out = sorted(
        bpe_merge_rounds(doc, rounds=2).collect(), key=lambda r: r["round"]
    )
    assert out[0]["merged_token"] == "aa"
    assert out[0]["pair_cnt"] == 3  # overlapping count
    # after merge seq is [aa, aa] -> round 2 merges (aa,aa)=1
    assert out[1]["merged_token"] == "aaaa"
    assert out[1]["pair_cnt"] == 1


def test_repartition_invariant(spark, sf_dir):
    from ecs_ecommerce_data_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = bpe_merge_rounds(docs, rounds=2).orderBy("round").collect()
    b = bpe_merge_rounds(docs.repartition(11), rounds=2).orderBy("round").collect()
    assert a == b


def test_word_freq_and_init(spark):
    doc = spark.createDataFrame([(1, "ab ab c")], "doc_id int, text string")
    wf = {r["word"]: r["cnt"] for r in word_freq_table(doc).collect()}
    assert wf == {"ab": 2, "c": 1}
    seqs = {r["word"]: r["seq"] for r in init_sequences(word_freq_table(doc)).collect()}
    assert seqs["ab"] == "\x01a\x01\x01b\x01"
    assert seqs["c"] == "\x01c\x01"
