"""Vocabulary application (greedy WordPiece inference): Python-model
agreement, UNK semantics, and a Column-only detokenize round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.tokenize import (
    UNK_ID,
    detokenize_expr,
    encode_word,
    tokenize,
)

VOCAB = {
    "[UNK]": 0,
    "the": 1,
    "quick": 2,
    "brown": 3,
    "fox": 4,
    "jump": 5,
    "##s": 6,
    "##ing": 7,
    "over": 8,
    "dog": 9,
    "un": 10,
    "##believ": 11,
    "##able": 12,
}


def test_encode_word_greedy_longest_match():
    assert encode_word("jumps", VOCAB) == [5, 6]
    assert encode_word("jumping", VOCAB) == [5, 7]
    assert encode_word("unbelievable", VOCAB) == [10, 11, 12]
    assert encode_word("the", VOCAB) == [1]
    # unmatchable remainder -> whole word is UNK, never partial ids
    assert encode_word("foxtrot", VOCAB) == [UNK_ID]
    assert encode_word("zzz", VOCAB) == [UNK_ID]


def test_tokenize_dataframe_matches_model(spark):
    rows = [
        (1, "The quick brown fox jumps over the dog"),
        (2, "unbelievable jumping"),
        (3, ""),
        (4, None),
        (5, "zzz the"),
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    got = {
        r.id: r.token_ids for r in tokenize(df, "text", VOCAB).collect()
    }
    assert got[1] == [1, 2, 3, 4, 5, 6, 8, 1, 9]
    assert got[2] == [10, 11, 12, 5, 7]
    assert got[3] == [] and got[4] == []
    assert got[5] == [UNK_ID, 1]
    # schema: non-null array<int>
    out = tokenize(df, "text", VOCAB)
    f = out.schema["token_ids"]
    assert not f.nullable and f.dataType.simpleString() == "array<int>"


def test_round_trip_for_fully_covered_text(spark):
    texts = [
        (1, "the quick brown fox jumps over the dog"),
        (2, "unbelievable jumping over the fox"),
    ]
    df = spark.createDataFrame(texts, "id INT, text STRING")
    inv = {i: p for p, i in VOCAB.items()}
    out = tokenize(df, "text", VOCAB).withColumn(
        "rebuilt", detokenize_expr(F.col("token_ids"), inv)
    )
    for r in out.collect():
        assert r.rebuilt == r.text


def test_empty_vocab_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "id INT, text STRING")
    with pytest.raises(ValueError, match="empty vocab"):
        tokenize(df, "text", {})
