"""BPE tokenizer training and application: hand-computed merges on the
classic low/lower/lowest corpus, determinism, and the mapInPandas
encode path."""

from __future__ import annotations

import pytest

from clickhouse_mysql_data_reader_spark.operators.bpe import (
    bpe_apply,
    bpe_train,
    encode_word,
    train_merges,
)


def test_train_merges_hand_computed():
    # word freqs: low x3, lower x1, lowest x1 (Sennrich running example)
    freq = [("low", 3), ("lower", 1), ("lowest", 1)]
    merges = train_merges(freq, n_merges=4)
    # round 1: (l,o)=5 wins; round 2: (lo,w</w>)=3; round 3: tie at 2
    # between (lo,w) and (w,e) -> lexicographic; round 4: (low,e)=2
    assert merges == [("l", "o"), ("lo", "w</w>"), ("lo", "w"), ("low", "e")]
    # early stop: no pair occurs twice afterwards
    assert train_merges(freq, n_merges=50) == merges


def test_encode_word_uses_rank_priority():
    merges = [("l", "o"), ("lo", "w</w>"), ("lo", "w"), ("low", "e")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("low", ranks) == ["low</w>"]
    assert encode_word("lowest", ranks) == ["lowe", "s", "t</w>"]
    assert encode_word("zzz", ranks) == ["z", "z", "z</w>"]  # no merges apply


def test_bpe_train_and_apply_end_to_end(spark):
    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "low"), (3, "")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, "text", n_merges=4)
    assert merges == [("l", "o"), ("lo", "w</w>"), ("lo", "w"), ("low", "e")]
    out = {r.doc_id: r for r in bpe_apply(docs, "text", "doc_id", merges).collect()}
    assert out[2].bpe_tokens == "low</w>" and out[2].n_bpe_tokens == 1
    # doc 1: low x3 (1 sym each) + lower (lowe,r</w>) + lowest (lowe,s,t</w>)
    assert out[1].n_bpe_tokens == 3 + 2 + 3
    assert "lowe r</w>" in out[1].bpe_tokens and "lowe s t</w>" in out[1].bpe_tokens
    assert out[3].n_bpe_tokens == 0

    # determinism across physical layouts
    merges2 = bpe_train(docs.repartition(5), "text", n_merges=4)
    assert merges2 == merges


def test_bpe_train_size_guard(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_word_rows"):
        bpe_train(docs, "text", n_merges=2, max_word_rows=3)
