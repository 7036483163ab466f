"""Distributed subword-vocabulary training: the BPE merge loop as K
small Spark aggregate jobs over a word-count table.

Completes the tokenize stack: ``q_token_vocab`` counts frequencies,
``operators/tokenize.py`` APPLIES a trained vocabulary — this module
TRAINS one.  The classic observation (Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016)
makes that tractable at corpus scale: pair statistics are a function
of the word-frequency table, not the corpus.  One corpus scan builds
(word, count); every one of the K merge iterations is then an
aggregate over that table — pair counts weighted by word count, an
argmax, and a per-word symbol merge — so K merges = K tiny jobs, and
the 100 TB corpus is read exactly ONCE.

Scale shape:

- the word table is Heaps-law bounded (millions of rows for a 100 TB
  corpus — vocabulary grows ~sqrt(corpus)), and each iteration's
  pair aggregate shuffles only (left, right, partial-count) rows;
- the per-iteration argmax collects ONE row to the driver (the same
  sanctioned scalar as ``components.py``'s convergence check);
- the symbol merge is a narrow ``F.aggregate`` fold — no shuffle, no
  explode — and the table is ``localCheckpoint``-ed per iteration so
  lineage stays flat across K rounds (the components discipline);
- symbols carry WordPiece ``##`` continuation markers from the start,
  so the trained vocabulary plugs directly into
  ``operators.tokenize.tokenize`` (greedy longest-match inference)
  and the detokenize round-trip.

Merge semantics (identical, by construction, in the Spark fold and
the DuckDB oracle): one greedy LEFT-TO-RIGHT pass per word; a just-
merged symbol does not re-merge within the same pass.  For a pair
(l, r) with l != r matches can never overlap; for l == r a run of m
copies merges at relative positions 0, 2, 4, ... (floor(m/2) merges)
— which is exactly what the fold produces and what the oracle's
gaps-and-islands window formulation selects.

``bpe_oracle_sql`` unrolls the K iterations as a generated chain of
CTEs (one pair-count + argmax + merge block per iteration) — the same
technique as the dedup-clusters recursive-CTE oracle, letting DuckDB
replay the full training trajectory for the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


import re as _re

# Java regex \s (the dialect bpe_word_counts trains with via
# F.split(text, r"\s+")) is the ASCII class [ \t\n\x0B\f\r]; Python's
# str.split() adds Unicode separators (NBSP, thin space, ...), so a
# document containing them would get DIFFERENT word boundaries at train
# vs encode time and silently break the "encoding the training corpus
# reproduces the trained word table" contract.  All Python-side word
# splitting in this package must use this exact class.
_JAVA_WS = _re.compile("[ \t\n\x0b\f\r]+")


def java_ws_words(s: str) -> list:
    r"""Split exactly like Spark's F.split(col, r"\s+") + empty drop."""
    return [w for w in _JAVA_WS.split(s) if w]

# Initial symbolization: first character raw, continuations with the
# WordPiece '##' prefix — shared by the Spark and DuckDB sides.
_SYMS0_SPARK = (
    "transform(sequence(1, length(w)), i -> "
    "CASE WHEN i = 1 THEN substring(w, 1, 1) "
    "ELSE concat('##', substring(w, i, 1)) END)"
)
# Adjacent pairs without a window: (syms[i], syms[i+1]) structs.
_PAIRS_SPARK = (
    "transform(slice(syms, 1, greatest(size(syms) - 1, 0)), (x, i) -> "
    "struct(x AS l, element_at(syms, i + 2) AS r))"
)


def bpe_word_counts(
    df: DataFrame, text_col: str, lowercase: bool = True
) -> DataFrame:
    """(w, n) word-frequency table — the ONLY pass over the corpus.
    Whitespace tokenization (``\\s+``), empties dropped, matching the
    oracle's ``regexp_split_to_array`` exactly."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        df.select(F.explode(F.split(text, r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_fold(left: str, right: str):
    """Greedy left-to-right single-pass merge of the pair as a pure
    Column fold: append each symbol unless the accumulator ends with
    ``left`` and the symbol is ``right``, in which case the tail is
    replaced by the merged symbol (``left`` + ``right`` sans '##').
    A merged tail equals ``left || stripped-right``, never ``left``
    (right is non-empty), so it cannot re-merge in the same pass —
    the fold IS the greedy semantics."""
    merged_tail = F.concat(F.lit(left), F.lit(_strip_cont(right)))
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(merged_tail),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _strip_cont(sym: str) -> str:
    return sym[2:] if sym.startswith("##") else sym


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    lowercase: bool = True,
    word_counts: DataFrame | None = None,
) -> list[tuple[int, str, str, int]]:
    """Train ``num_merges`` BPE merges; returns [(rank, left, right,
    pair_freq)] with rank starting at 1, ties broken (freq DESC, left
    ASC, right ASC) — fully deterministic.  Stops early only if the
    corpus runs out of adjacent pairs (degenerate inputs).

    ``word_counts`` takes a precomputed (w, n) table (from
    :func:`bpe_word_counts`) so a caller that also needs
    :func:`bpe_vocab` pays the corpus scan ONCE, not per call — the
    module's one-corpus-pass contract."""
    if word_counts is None:
        word_counts = bpe_word_counts(df, text_col, lowercase)
    words = word_counts.withColumn("syms", F.expr(_SYMS0_SPARK))
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, num_merges + 1):
        best = (
            words.select(F.col("n"), F.explode(F.expr(_PAIRS_SPARK)).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((k, left, right, cnt))
        words = words.withColumn("syms", _merge_fold(left, right))
        # flat lineage across iterations; also materializes so the
        # next pair count reads the merged table, not a re-fold chain
        words = words.localCheckpoint(eager=True)
    return merges


def bpe_merges_df(
    spark: SparkSession, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """The (tiny) trained-merge table for publishing/oracle checks."""
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, pair_freq long",
    )


def bpe_vocab(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[int, str, str, int]],
    lowercase: bool = True,
    unk_id: int = 0,
    word_counts: DataFrame | None = None,
) -> dict[str, int]:
    """piece -> id vocabulary usable by ``tokenize``: every base
    character symbol seen in the corpus (sorted, ids from unk_id+1),
    then the merged symbols in training order.  Because the base
    covers all characters, greedy segmentation never emits UNK on the
    training corpus — the round-trip property.

    Pass the same ``word_counts`` frame given to :func:`train_bpe` to
    avoid re-scanning the corpus — base symbols are a function of the
    (Heaps-bounded) word table, not the corpus."""
    if word_counts is None:
        word_counts = bpe_word_counts(df, text_col, lowercase)
    base_rows = (
        word_counts.select(F.explode(F.expr(_SYMS0_SPARK)).alias("s"))
        .distinct()
        .collect()
    )
    pieces = sorted(r.s for r in base_rows)
    for _, left, right, _ in merges:
        merged = left + _strip_cont(right)
        if merged not in pieces:
            pieces.append(merged)
    return {p: unk_id + 1 + i for i, p in enumerate(pieces)}


def _merge_pass(syms: list[str], left: str, right: str, merged: str) -> list[str]:
    """One greedy left-to-right pass of a single merge over a symbol
    list — the Python twin of :func:`_merge_fold` (same semantics:
    a just-merged tail never re-merges within the pass, runs of
    l == r merge at relative positions 0, 2, 4, ...)."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = merged
        else:
            out.append(x)
    return out


def encode_word_merges(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """TRUE BPE inference for one word: start from character symbols
    (first raw, continuations ``##``-prefixed) and apply every trained
    merge IN RANK ORDER, one greedy pass each — exactly the passes
    training ran, so encoding the training corpus reproduces the
    trained word table bit-for-bit.

    This is the rank-ordered sibling of
    ``operators.tokenize.encode_word`` (greedy longest-match): the two
    DISAGREE on real inputs — longest-match picks the longest piece a
    later merge happened to create, merge-order replays history (see
    tests/test_bpe.py for a pinned diverging string) — and each
    matches its own reference semantics (WordPiece inference vs
    Sennrich BPE apply_bpe).

    A symbol-set skip makes the loop O(passes that can fire): a merge
    whose left symbol isn't present in the word costs one set probe,
    so 30k trained merges against a 10-char word do ~30k probes and
    a handful of passes, not 30k full passes."""
    if not word:
        return []
    syms = [word[0]] + ["##" + c for c in word[1:]]
    present = set(syms)
    for left, right in merges:
        if left not in present or right not in present:
            continue
        new = _merge_pass(syms, left, right, left + _strip_cont(right))
        if len(new) != len(syms):
            syms = new
            present = set(syms)
            if len(syms) == 1:
                break
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple],
    out: str = "pieces",
    lowercase: bool = True,
) -> DataFrame:
    """Append ``out``: array<string> of merge-order BPE pieces for
    ``text_col`` (whitespace words, each encoded by
    :func:`encode_word_merges`, flattened in document order).

    ``merges`` accepts :func:`train_bpe` output — ``(rank, left,
    right, freq)`` tuples, applied in list order — or bare
    ``(left, right)`` pairs.

    Scale shape: pure Arrow map — no shuffle, no state; the merge
    table ships via an explicit ``SparkContext.broadcast`` (rank list
    of short strings, KBs–MBs) so tasks carry a handle, not the
    pickled table.  Within each Arrow batch a word->pieces memo
    collapses repeated words (Heaps: most of a batch is repeats), so
    per-batch cost tracks DISTINCT words, not rows."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    pairs = [
        (m[1], m[2]) if len(m) == 4 else (m[0], m[1]) for m in merges
    ]
    fields = df.schema.fields + [
        StructField(out, ArrayType(StringType(), containsNull=False), False)
    ]
    out_schema = StructType(fields)
    cols = [f.name for f in df.schema.fields]
    bc = df.sparkSession.sparkContext.broadcast(pairs)

    def run(batches):
        mg = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            encoded = []
            for t in pdf[text_col]:
                if t is None:
                    encoded.append([])
                    continue
                s = t.lower() if lowercase else t
                pieces: list[str] = []
                for w in java_ws_words(s):
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = encode_word_merges(w, mg)
                    pieces.extend(got)
                encoded.append(pieces)
            pdf = pdf[cols].copy()
            pdf[out] = encoded
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def bpe_encode_oracle_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    num_merges: int,
    lowercase: bool = True,
) -> str:
    """DuckDB replay of merge-order ENCODING: re-run the training
    trajectory (the :func:`bpe_oracle_sql` CTE chain — per-word state
    after k rank-ordered greedy passes IS the encoding with merges
    1..k), then join each document's whitespace words, in order,
    against the final word table and flatten — a completely
    independent path from the Arrow-side :func:`bpe_encode`."""
    text = f"lower({text_expr})" if lowercase else text_expr
    ctes, _ = _bpe_oracle_parts(table, text_expr, num_merges, lowercase)
    return f"""{ctes},
docw AS (
  SELECT {id_expr} AS doc_id,
         unnest(regexp_split_to_array({text}, '\\s+')) AS w,
         unnest(range(1, len(regexp_split_to_array({text}, '\\s+')) + 1))
           AS pos
  FROM {table}
),
enc AS (
  SELECT d.doc_id,
         array_to_string(flatten(list(f.syms ORDER BY d.pos)), ' ')
           AS encoded
  FROM docw d JOIN words{num_merges} f ON f.w = d.w
  WHERE d.w <> ''
  GROUP BY d.doc_id
)
SELECT t.{id_expr} AS doc_id, coalesce(e.encoded, '') AS encoded
FROM {table} t LEFT JOIN enc e ON e.doc_id = t.{id_expr}
"""


def bpe_oracle_sql(
    table: str,
    text_expr: str,
    num_merges: int,
    lowercase: bool = True,
) -> str:
    """The DuckDB replay of the full training trajectory: K unrolled
    CTE blocks, each = pair count (zipped-unnest explode + lead
    window) -> argmax (same tie-break) -> greedy merge (gaps-and-
    islands selects relative-even match positions within runs, which
    for l != r degenerates to 'every match' — the fold's semantics
    exactly)."""
    ctes, union = _bpe_oracle_parts(table, text_expr, num_merges, lowercase)
    return ctes + "\n" + union


def _bpe_oracle_parts(
    table: str,
    text_expr: str,
    num_merges: int,
    lowercase: bool = True,
) -> tuple[str, str]:
    """(CTE chain, merge-union select) — split so the encode oracle
    can reuse the trajectory CTEs with a different final select."""
    text = f"lower({text_expr})" if lowercase else text_expr
    parts = [
        f"""WITH words0 AS MATERIALIZED (
  SELECT w, COUNT(*)::BIGINT AS n,
         list_transform(range(1, length(w) + 1), i ->
           CASE WHEN i = 1 THEN substring(w, 1, 1)
                ELSE '##' || substring(w, i, 1) END) AS syms
  FROM (SELECT unnest(regexp_split_to_array({text}, '\\s+')) AS w
        FROM {table})
  WHERE w <> ''
  GROUP BY w
)"""
    ]
    for k in range(1, num_merges + 1):
        p = k - 1
        parts.append(f"""ex{k} AS (
  SELECT w, n, unnest(syms) AS sym,
         unnest(range(1, len(syms) + 1)) AS pos
  FROM words{p}
),
lk{k} AS MATERIALIZED (
  SELECT w, n, pos, sym,
         lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
  FROM ex{k}
),
best{k} AS MATERIALIZED (
  SELECT sym AS l, nxt AS r, SUM(n)::BIGINT AS cnt
  FROM lk{k} WHERE nxt IS NOT NULL
  GROUP BY sym, nxt
  ORDER BY cnt DESC, l, r LIMIT 1
),
isl{k} AS (
  SELECT a.w, a.n, a.pos, a.sym, a.nxt, b.l, b.r, b.cnt,
         CASE WHEN a.sym = b.l THEN a.pos - ROW_NUMBER() OVER (
           PARTITION BY a.w, a.sym = b.l ORDER BY a.pos) END AS isl
  FROM lk{k} a CROSS JOIN best{k} b
),
sel{k} AS (
  SELECT *, (sym = l AND nxt = r AND (l <> r OR
    (pos - MIN(pos) OVER (PARTITION BY w, isl)) % 2 = 0)) AS mstart
  FROM isl{k}
),
out{k} AS (
  SELECT w, n, pos,
         CASE WHEN mstart THEN sym ||
           CASE WHEN r LIKE '##%' THEN substring(r, 3) ELSE r END
         ELSE sym END AS sym
  FROM (SELECT *, coalesce(lag(mstart) OVER (
          PARTITION BY w ORDER BY pos), false) AS consumed
        FROM sel{k})
  WHERE NOT consumed
),
words{k} AS MATERIALIZED (
  SELECT w, n, list(sym ORDER BY pos) AS syms FROM out{k} GROUP BY w, n
),
mg{k} AS (
  SELECT CAST({k} AS INTEGER) AS merge_rank, l AS left_sym,
         r AS right_sym, cnt AS pair_freq
  FROM best{k}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM mg{k}" for k in range(1, num_merges + 1)
    )
    return ",\n".join(parts), union
