"""BPE merge training: greedy-merge semantics pinned against
hand-computed fixtures (including the l == r overlap rule), DuckDB
trajectory parity, and the round-trip property — the trained
vocabulary drives tokenize() to a lossless re-encoding of the
training corpus."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.bpe import (
    bpe_merges_df,
    bpe_oracle_sql,
    bpe_vocab,
    bpe_word_counts,
    train_bpe,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_first_merge_is_most_frequent_pair(spark):
    # 'ab' appears inside: abc x3, ab x2 -> (a, ##b) freq 5
    df = _docs(spark, ["abc abc abc ab ab", "xy xy"])
    merges = train_bpe(df, "text", 1)
    assert merges == [(1, "a", "##b", 5)]


def test_same_symbol_run_merges_at_even_offsets(spark):
    # 'aaaa' x2: pair (##a, ##a) occurs at 3 positions per word
    # (overlap-counted, weight 2 -> 6); the merge itself is greedy
    # left-to-right: a ##a ##a ##a -> [a##a? no] — word-initial 'a'
    # then ##a run of 3: (##a,##a) merges once per word interior run
    df = _docs(spark, ["aaaa aaaa"])
    merges = train_bpe(df, "text", 2)
    # rank 1: (##a, ##a) with overlap-counted freq 2 words * 2 = 4
    assert merges[0] == (1, "##a", "##a", 4)
    # after merging: [a, ##aa, ##a] per word -> next best pair is
    # deterministic by tie-break
    assert merges[1][0] == 2


def test_trajectory_matches_duckdb_on_synthetic_corpus(spark):
    rows = [
        "the theme there then the",
        "other mother weather the",
        "aaa aaaa aa the mother",
    ]
    df = _docs(spark, rows)
    got = train_bpe(df, "text", 6)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(rows))
        + ") t(doc_id, text)"
    )
    want = sorted(con.execute(bpe_oracle_sql("documents", "text", 6)).fetchall())
    assert [tuple(m) for m in got] == want


def test_trajectory_matches_duckdb_on_documents_table(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = train_bpe(docs, "text", 8)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = sorted(con.execute(bpe_oracle_sql("documents", "text", 8)).fetchall())
    assert [tuple(m) for m in got] == want


def test_round_trip_through_tokenize(spark):
    """The trained vocab (base chars + merges) segments every training
    word without UNK, and detokenize reproduces the whitespace-
    normalized lowercase corpus."""
    from osrs_dashboard_elt_spark.operators.tokenize import (
        detokenize_expr,
        tokenize,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    merges = train_bpe(docs, "text", 10)
    vocab = bpe_vocab(docs, "text", merges)
    assert 0 not in vocab.values()  # ids avoid UNK_ID
    toked = tokenize(docs, "text", vocab)
    inv = {i: p for p, i in vocab.items()}
    back = toked.select(
        "doc_id",
        detokenize_expr(F.col("token_ids"), inv).alias("rt"),
        F.regexp_replace(
            F.trim(F.lower(F.col("text"))), r"\s+", " "
        ).alias("norm"),
    )
    assert back.filter(F.col("rt") != F.col("norm")).count() == 0
    # no UNK anywhere: every id maps through the vocab
    assert (
        toked.select(F.explode("token_ids").alias("i"))
        .filter(F.col("i") == 0)
        .count()
        == 0
    )


def test_degenerate_corpus_stops_early(spark):
    # single-char words only -> no adjacent pairs -> zero merges
    df = _docs(spark, ["a b c", "a a b"])
    assert train_bpe(df, "text", 5) == []


def test_word_counts_match_tokenization_contract(spark):
    df = _docs(spark, ["The  the\tthe\nTHE", "x"])
    got = {
        r.w: r.n for r in bpe_word_counts(df, "text").collect()
    }
    assert got == {"the": 4, "x": 1}


def test_merges_df_schema(spark):
    df = bpe_merges_df(spark, [(1, "a", "##b", 5)])
    assert df.columns == ["merge_rank", "left_sym", "right_sym", "pair_freq"]
    assert dict(df.dtypes) == {
        "merge_rank": "int",
        "left_sym": "string",
        "right_sym": "string",
        "pair_freq": "bigint",
    }


def test_merge_order_encode_matches_training_state(spark):
    """Encoding the training corpus with the trained merges IN RANK
    ORDER reproduces the trained word table bit-for-bit (they ran the
    identical greedy passes), document order preserved."""
    from osrs_dashboard_elt_spark.operators.bpe import bpe_encode, train_bpe

    rows = [
        (1, "low lower lowest"),
        (2, "new newer newest"),
        (3, "low new low"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, "text", 6)
    enc = {
        r["doc_id"]: r["pieces"]
        for r in bpe_encode(df, "text", merges).collect()
    }
    # replay word-by-word through the same pass sequence
    from osrs_dashboard_elt_spark.operators.bpe import encode_word_merges

    pairs = [(l, r) for _, l, r, _ in merges]
    for doc_id, text in rows:
        want = [
            p for w in text.lower().split() for p in encode_word_merges(w, pairs)
        ]
        assert enc[doc_id] == want, doc_id


def test_greedy_and_merge_order_diverge(spark):
    """Pinned diverging input: vocab pieces {a, ##b, ##c, ##bc, ab}
    from merges [(##b,##c), (a,##b)].  Greedy longest-match takes the
    LONGEST first piece 'ab' -> [ab, ##c]; merge-order replays rank 1
    first, so '##b##c' fuses before 'a' can bind -> [a, ##bc].  Each
    matches its own reference semantics (WordPiece inference vs
    Sennrich apply_bpe)."""
    from osrs_dashboard_elt_spark.operators.bpe import encode_word_merges
    from osrs_dashboard_elt_spark.operators.tokenize import encode_word

    merges = [("##b", "##c"), ("a", "##b")]
    vocab = {"a": 1, "##b": 2, "##c": 3, "##bc": 4, "ab": 5}
    assert encode_word_merges("abc", merges) == ["a", "##bc"]
    assert encode_word("abc", vocab) == [vocab["ab"], vocab["##c"]]


def test_encode_word_merges_edges():
    from osrs_dashboard_elt_spark.operators.bpe import encode_word_merges

    assert encode_word_merges("", [("a", "##b")]) == []
    # run of the same symbol merges at relative 0,2,4 per pass
    assert encode_word_merges("aaaa", [("a", "##a")]) == ["aa", "##a", "##a"]
    # inapplicable merges are skipped by the symbol-set probe
    assert encode_word_merges("xy", [("q", "##q")] * 1000) == ["x", "##y"]


def test_whitespace_dialect_matches_java_split(spark):
    """java_ws_words must split EXACTLY like the training side's
    F.split(text, r'\\s+') (Java \\s = ASCII [ \\t\\n\\x0B\\f\\r]) —
    Unicode separators (NBSP, thin space, ideographic space) are word
    CHARACTERS in both, not boundaries.  Python's str.split() treats
    them as boundaries, which silently desynced train vs encode."""
    from osrs_dashboard_elt_spark.operators.bpe import java_ws_words

    tricky = [
        "foo bar baz",          # NBSP inside a word
        "a b\tc",               # thin space + tab
        "x　y\r\nz",             # ideographic space + CRLF
        " lead trail ",
        "only\x0bvertical\x0ctab",
        " ",                    # NBSP alone is ONE word
    ]
    df = spark.createDataFrame([(t,) for t in tricky], "text string")
    got_spark = [
        [w for w in r["ws"] if w]
        for r in df.select(
            F.split("text", r"\s+").alias("ws")
        ).collect()
    ]
    got_py = [java_ws_words(t) for t in tricky]
    assert got_py == got_spark


def test_encode_of_training_corpus_preserves_word_boundaries(spark):
    """The docstring contract: encoding the training corpus must
    reproduce the trained word table's boundaries — for every doc,
    the concatenated pieces equal the concatenated TRAIN-side words.
    Pinned on NBSP input, where str.split() used to split words the
    trainer never saw."""
    from osrs_dashboard_elt_spark.operators.bpe import (
        bpe_encode,
        java_ws_words,
    )

    rows = ["foo bar foo bar baz", "baz qux quux"]
    df = _docs(spark, rows)
    merges = train_bpe(df, "text", 6)
    out = bpe_encode(df, "text", merges, out="pieces").collect()
    by_id = {r["doc_id"]: r["pieces"] for r in out}
    for i, t in enumerate(rows):
        want = "".join(java_ws_words(t.lower()))
        got = "".join(
            p[2:] if p.startswith("##") else p for p in by_id[i]
        )
        assert got == want, (i, by_id[i])
