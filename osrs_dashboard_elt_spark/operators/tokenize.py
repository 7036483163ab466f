"""Vocabulary application: text -> token-id arrays at corpus scale.

``q_token_vocab`` (suite) induces the frequency-ranked vocabulary —
the counting core of BPE/WordPiece training; this module APPLIES a
trained vocabulary, the step between raw text and ``pack_chunks``'s
sequence assembly.  Segmentation is greedy longest-match within each
whitespace word (WordPiece-style inference with ``##`` continuation
pieces), which is inherently sequential per word — not expressible as
a Catalyst expression — so this is one of the repo's few sanctioned
Python paths: an Arrow-batched ``mapInPandas`` with the vocabulary
shipped via an EXPLICIT ``SparkContext.broadcast`` — the closure
captures only the broadcast handle, so the 100k-piece dict is
serialized ONCE per job and fetched once per executor (torrent
blocks), never re-pickled into every task batch the way a closure
capture would be.  O(word_len^2) worst case per word against a plain
dict (no trie needed: max piece length bounds the inner scan).

Scale shape: pure map — no shuffle, no state; partitions stream
through Arrow batches; the vocab rides the broadcast (a dict of at
most a few hundred thousand short strings — MBs).  Determinism: the
output is a pure function of (text, vocab); unknown spans emit
``unk_id``.  A round-trip property (detokenize(tokenize(x)) == x for
fully-covered text) is pinned in tests/test_tokenize.py.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers' convenience)
from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

from .bpe import java_ws_words

UNK_ID = 0


def encode_word(
    word: str,
    vocab: dict[str, int],
    unk_id: int = UNK_ID,
    max_piece: int | None = None,
) -> list[int]:
    """Greedy longest-match WordPiece segmentation of one word.

    First piece matches the raw prefix; continuation pieces match with
    a ``##`` prefix.  An unmatchable REMAINDER yields a single
    ``unk_id`` for the whole word (WordPiece semantics: a word either
    segments fully or is UNK — partial ids would detokenize wrong).

    The inner scan starts at ``i + max_piece`` (the longest vocab
    key), not at the end of the word — longer substrings cannot be in
    the vocab, so skipping them changes nothing, and without the
    bound a single pathological unbroken token (a 100 KB base64 blob)
    would drive O(len^2) substring probes inside one task.
    ``max_piece`` is computed per call when not supplied; ``tokenize``
    computes it once for the whole run.
    """
    if max_piece is None:
        max_piece = max(map(len, vocab))
    ids: list[int] = []
    i, n = 0, len(word)
    while i < n:
        end = min(n, i + max_piece)
        piece_id = None
        while end > i:
            sub = word[i:end]
            if i > 0:
                sub = "##" + sub
            if sub in vocab:
                piece_id = vocab[sub]
                break
            end -= 1
        if piece_id is None:
            return [unk_id]
        ids.append(piece_id)
        i = end
    return ids


def tokenize(
    df: DataFrame,
    text_col: str,
    vocab: dict[str, int],
    out: str = "token_ids",
    unk_id: int = UNK_ID,
    lowercase: bool = True,
) -> DataFrame:
    """Append ``out``: array<int> of token ids for ``text_col``.

    ``vocab`` maps piece -> id (continuations carry the ``##``
    prefix); ids should avoid ``unk_id``.  Empty/whitespace-only text
    yields an empty array.
    """
    if not vocab:
        raise ValueError("empty vocab")
    max_piece = max(map(len, vocab))
    fields = df.schema.fields + [
        StructField(out, ArrayType(IntegerType(), containsNull=False), False)
    ]
    out_schema = StructType(fields)
    cols = [f.name for f in df.schema.fields]
    # Explicit broadcast: tasks capture the handle (bytes), executors
    # fetch the dict once — a plain closure capture would re-ship the
    # whole vocab pickle inside every serialized task.
    bc_vocab = df.sparkSession.sparkContext.broadcast(vocab)

    def run(batches: Iterator) -> Iterator:
        v = bc_vocab.value
        for pdf in batches:
            texts = pdf[text_col]
            encoded = []
            for t in texts:
                if t is None:
                    encoded.append([])
                    continue
                s = t.lower() if lowercase else t
                ids: list[int] = []
                for w in java_ws_words(s):
                    ids.extend(encode_word(w, v, unk_id, max_piece))
                encoded.append(ids)
            pdf = pdf[cols].copy()
            pdf[out] = encoded
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def detokenize_expr(ids_col, inv_vocab: dict[int, str]):
    """Column expression reassembling text from token ids via a
    literal id->piece map: continuation pieces (``##``) glue to the
    previous piece, others join with spaces.  Pure Column ops
    (transform + aggregate concat), so the INVERSE direction needs no
    Python — used by the round-trip test and by debug rehydration."""
    m = F.create_map(
        *[x for i, p in inv_vocab.items() for x in (F.lit(i), F.lit(p))]
    )
    pieces = F.transform(ids_col, lambda i: m[i])
    return F.aggregate(
        pieces,
        F.lit(""),
        lambda acc, p: F.concat(
            acc,
            F.when(p.startswith("##"), F.substring(p, 3, 1 << 20)).otherwise(
                F.concat(F.when(acc == "", F.lit("")).otherwise(F.lit(" ")), p)
            ),
        ),
    )
