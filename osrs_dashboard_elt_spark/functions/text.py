"""Text-analysis column expressions for document pipelines.

Generalizes the reference's string functions (F1-F3, R6) into the text
operators a training-data pipeline needs: tokenization, quality
scoring, language-ID heuristic, and document fingerprinting.  All pure
column expressions (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English-ish stopword list for quality ratios (deterministic,
# mirrored in SQL oracles).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def clean_discord_escapes(col: Column) -> Column:
    """Strip Discord backslash escapes before punctuation (reference S3,
    src/1_fetch_data.py:18-20: ``re.sub(r'\\\\([^\\w\\s])', r'\\1')``)."""
    return F.regexp_replace(col, r"\\([^\w\s])", r"$1")


def parse_item_quantity(col: Column) -> tuple[Column, Column]:
    """'72 x Onyx bolts' -> ('Onyx bolts', 72); plain names -> (name, 1)
    (reference R6, src/3_transform_data.py:434-453)."""
    qty = F.regexp_extract(col, r"^(\d+) x ", 1)
    name = F.when(qty != "", F.regexp_replace(col, r"^\d+ x ", "")).otherwise(col)
    return name, F.when(qty != "", qty.cast("long")).otherwise(F.lit(1))


def token_count(col: Column) -> Column:
    """Whitespace token count (BPE-ish proxy: words + punctuation runs
    counted separately would need regexp_extract_all; whitespace is the
    deterministic baseline)."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def quality_score_cols(col: Column) -> dict[str, Column]:
    """Deterministic quality features: n_chars, n_tokens, mean token
    length, stopword ratio, punctuation ratio."""
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    n_tok = token_count(col)
    n_chars = F.length(col)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_punct = n_chars - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    def _dr(c):  # decimal-cast round: engine-stable (see suite.dround)
        return c.cast("decimal(28,6)").cast("double")

    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_token_len": _dr(
            F.when(n_tok > 0, (F.length(F.regexp_replace(col, r"\s+", "")).cast("double")) / n_tok)
        ),
        "stopword_ratio": _dr(
            F.when(n_tok > 0, stop_hits.cast("double") / n_tok).otherwise(0.0)
        ),
        "punct_ratio": _dr(
            F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
        ),
    }


def language_id(col: Column) -> Column:
    """Tiny n-gram-frequency language heuristic: score a text against
    per-language marker token sets and pick the argmax (deterministic;
    'und' when nothing matches).  Real pipelines plug a model here via
    mapInPandas — the operator shape (scan-side classify) is the same.
    """
    markers = {
        "en": ["the", "and", "of", "is"],
        "es": ["el", "la", "de", "que"],
        "de": ["der", "die", "und", "das"],
        "fr": ["le", "la", "et", "les"],
    }
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    scores = [
        (lang, F.size(F.filter(toks, lambda t: t.isin(*ms))))
        for lang, ms in markers.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, s in reversed(scores):  # earlier languages win ties
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def doc_fingerprint(col: Column, mod: int = 2**31 - 1) -> Column:
    """Order-sensitive rolling document fingerprint: left-fold
    polynomial hash over token hashes — token reorderings change it,
    unlike a set-hash.  Cross-engine reproducible (md5-derived token
    hashes, explicit arithmetic).

    ``mod`` is bounded so the fold step ``acc*31 + h`` stays inside
    int64: ``acc < mod`` and ``h < 2^32``, so ``mod`` may not exceed
    ``(2^63 - 2^32) // 31``.  (The earlier 2^61-1 default overflowed —
    an ARITHMETIC_OVERFLOW crash under ANSI, silent wraparound
    otherwise, and no DuckDB oracle can reproduce a wrap.)"""
    from ..operators.dedup import token_hash32

    if mod <= 0 or mod > (2**63 - 2**32) // 31:
        raise ValueError(
            "mod must be in (0, (2^63 - 2^32) // 31] so the fold step "
            "acc*31 + h cannot overflow int64"
        )
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    th = F.transform(toks, token_hash32)
    return F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(31) + h) % F.lit(mod),
    )


# ---------------------------------------------------------------------------
# PII redaction (training-data hygiene)
# ---------------------------------------------------------------------------

# Deliberately RE2-compatible (no lookaround/backrefs) and ASCII-safe,
# so the DuckDB oracle applies the IDENTICAL patterns: redaction must
# be auditable cross-engine before it runs over a real corpus.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IPv4 dotted quad (octet-ish: 1-3 digits; over-matching beats
    # under-matching for redaction)
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # long digit runs (card/account numbers), tolerate spaces/dashes
    (r"\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{2,4}\b", "<NUMBER>"),
    # phone-ish: intl prefix or area code, 7+ digits with separators
    (r"\+?[0-9]{1,3}[ .-]?\(?[0-9]{2,4}\)?[ .-]?[0-9]{3}[ .-]?[0-9]{3,4}\b", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Replace emails, IPv4s, long digit runs, and phone-shaped
    numbers with typed placeholder tokens, applying the patterns in
    ``PII_PATTERNS`` order (earlier redactions can consume text later
    patterns would have matched — the order IS the contract, identical
    in the SQL oracle)."""
    out = col
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_flags(col: Column) -> dict[str, Column]:
    """Per-category detection flags (pre-redaction audit columns)."""
    names = ["email", "ip", "number", "phone"]
    return {
        f"has_{n}": col.rlike(p)
        for n, (p, _t) in zip(names, PII_PATTERNS)
    }
