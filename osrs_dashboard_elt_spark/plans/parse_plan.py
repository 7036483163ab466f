"""The flagship operator: config-driven multi-pattern parse dispatch
(reference R1-R5, src/2_parse_engine.py:118-267).

The reference iterates rows in Python, trying the chat regex then every
pattern group x variant in config order (first match wins), routing
each row to chat / clan_broadcasts / unparsed_logs and enriching with
game mode, numeric casts, and a multi-user explode.  That is a
row-at-a-time interpreter.

Here the SAME config compiles to one declarative Spark plan:

- a single ``__variant`` index column — a ``when`` chain emitted in
  config order (Catalyst preserves CaseWhen ordering, so
  first-match-wins short-circuits exactly like the reference loop);
- per output column, a ``when(variant == i, regexp_extract(...))``
  chain so each row evaluates only its matched variant's extraction;
- three outputs = ONE pass over the input + three narrow filters
  (Spark caches the parsed intermediate; no per-row Python, no
  shuffle anywhere in the parse itself);
- multi-user broadcasts explode via ``explode(split(...))``
  (reference src/2_parse_engine.py:208-245 splits "A, B and C" and
  repairs the glued "Aand B" malformation);
- required-column validation (reference :147,:166) routes failures to
  the dead-letter output with a ``failure_reason``.

At 100 TB: the whole parse is scan -> project -> filter, fully inside
whole-stage codegen; it scales linearly with input and parallelizes
per file split.  ~40 variants x ~10 columns of CaseWhen is well within
codegen limits (falls back to interpreted projection gracefully).

Driver-side compile cost: the CaseWhen forests are built as SQL
expression STRINGS and parsed with one ``F.expr`` call per output
column — building them as chained ``.when()`` Column objects costs
thousands of py4j round trips (~8s of driver time for the 42-variant
library; measured, see git history) for the identical plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import ParseConfig
from ..functions.text import clean_discord_escapes

# Leading emoji token like <:Ironman:1234>
_EMOJI_RX = r"^<:(\w+):\d+>\s*"


@dataclass
class ParsedStreams:
    """The three routed outputs of one parse pass.  ``core`` is the
    persisted routing barrier (None when the plan was built uncached
    or from a streaming input); call :meth:`unpersist` once all three
    outputs are consumed — per-micro-batch callers MUST, or one
    MEMORY_AND_DISK dataset leaks per batch for the stream's life."""

    chat: DataFrame
    broadcasts: DataFrame
    unparsed: DataFrame
    core: DataFrame | None = None

    def unpersist(self) -> None:
        if self.core is not None:
            self.core.unpersist()


def _q(s: str) -> str:
    """Spark-SQL single-quoted string literal (backslash-escaping)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _required_literals(pattern: str) -> list[str]:
    """Literal substrings every match of ``pattern`` must contain.

    Walks the regex AST (stdlib parser): top-level and group-nested
    LITERAL runs are required; branches (``a|b``), optional/char-class
    parts, and >=1 repeats contribute only what is provably present in
    ANY match.  Conservative by construction — on a parse failure
    (Java-only syntax) or an ignore-case flag it returns [] and the
    caller skips gating.  This is the classic prefilter trick (cf.
    RE2's required-literal extraction): a cheap ``contains`` check
    skips the expensive regex for rows that cannot match it.
    """
    import re as _re

    try:
        import re._parser as _sre  # py3.11+
    except ImportError:  # pragma: no cover - older stdlib layout
        import sre_parse as _sre
    try:
        tree = _sre.parse(pattern)
    except Exception:
        return []
    if tree.state.flags & _re.IGNORECASE:
        return []
    out: list[str] = []

    def walk(seq) -> None:
        run: list[str] = []

        def flush() -> None:
            if run:
                out.append("".join(run))
                run.clear()

        for op, av in seq:
            name = str(op)
            if name == "LITERAL":
                run.append(chr(av))
            elif name == "SUBPATTERN":
                flush()
                # av = (group, add_flags, del_flags, subpattern): a
                # scoped (?i:...) group sets add_flags, NOT the global
                # tree.state.flags — literals inside it are not
                # case-required, so skip the subtree entirely
                if not (av[1] & _re.IGNORECASE):
                    walk(av[3])
            elif name in ("MAX_REPEAT", "MIN_REPEAT"):
                flush()
                lo, _hi, sub = av
                if lo >= 1:
                    walk(sub)
            else:
                # BRANCH / IN / ANY / AT / CATEGORY / ... — nothing
                # provably required beyond what surrounds it
                flush()
        flush()

    walk(tree)
    return out


def _gate_literal(pattern: str, min_len: int = 4) -> str | None:
    """Longest required literal worth gating on, or None."""
    lits = [l for l in _required_literals(pattern) if len(l) >= min_len]
    return max(lits, key=len) if lits else None


def _gated_rlike(src: str, regex: str) -> str:
    """``contains(...) AND src RLIKE regex`` when a required literal
    exists — the AND short-circuits in codegen, so the regex runs only
    on rows that pass the (~10x cheaper) substring scan."""
    cond = f"{src} RLIKE {_q(regex)}"
    lit = _gate_literal(regex)
    if lit is not None:
        cond = f"(contains({src}, {_q(lit)}) AND {cond})"
    return cond


# Column-level memo for the cfg-derived expression forests.  Unlike
# _PLAN_CACHE (keyed on the INPUT plan), these unresolved Column trees
# depend only on (source column name, config) — they are reusable
# across different input DataFrames, so e.g. a second parse query over
# differently-synthesized raw content still skips the ~40-branch
# F.expr parses.  Keyed on the session (Py4J expression handles don't
# outlive the JVM); bounded FIFO.
_COL_CACHE: dict[tuple, object] = {}
_COL_CACHE_MAX = 64


def _cfg_memo(tag: str, cfg: ParseConfig, extra: tuple, build):
    try:
        from pyspark.sql import SparkSession

        sess = SparkSession.getActiveSession()
        app = sess.sparkContext.applicationId if sess else None
    except Exception:
        app = None
    key = (app, tag, repr(cfg), extra)
    hit = _COL_CACHE.get(key)
    if hit is not None:
        return hit
    val = build()
    while len(_COL_CACHE) >= _COL_CACHE_MAX:
        del _COL_CACHE[next(iter(_COL_CACHE))]
    _COL_CACHE[key] = val
    return val


def _variant_index(src: str, cfg: ParseConfig, gated: bool = True) -> Column:
    """0-based global variant index in config order; -1 = no match.
    The CASE order IS the first-match-wins semantics (the contains
    gates never change which regexes CAN match, only skip ones that
    cannot — property-tested against the ungated form).  ``gated=False``
    emits plain RLIKEs (test/measurement hook)."""
    branches = []
    idx = 0
    for group in cfg.groups:
        for variant in group.variants:
            cond = (
                _gated_rlike(src, variant.regex)
                if gated
                else f"{src} RLIKE {_q(variant.regex)}"
            )
            branches.append(f"WHEN {cond} THEN {idx}")
            idx += 1
    if not branches:
        return F.lit(-1).cast("int")
    return _cfg_memo(
        "variant_index", cfg, (src, gated),
        lambda: F.expr("CAST(CASE " + " ".join(branches) + " ELSE -1 END AS INT)"),
    )


def _extract_columns(src: str, variant_col: str, cfg: ParseConfig) -> dict[str, Column]:
    """Per output column: CASE WHEN variant=i THEN regexp_extract(pos)."""
    specs: list[tuple[int, str, str, int]] = []  # (idx, regex, col, pos)
    idx = 0
    for group in cfg.groups:
        for variant in group.variants:
            pos = 0
            for col_name in variant.columns:
                pos += 1
                if col_name == "_":
                    continue
                specs.append((idx, variant.regex, col_name, pos))
            idx += 1
    def _build() -> dict[str, Column]:
        out: dict[str, Column] = {}
        for col_name in cfg.all_columns():
            branches = [
                f"WHEN {variant_col} = {i} THEN regexp_extract({src}, {_q(rx)}, {pos})"
                for i, rx, c, pos in specs
                if c == col_name
            ]
            if branches:
                sql = "nullif(trim(CASE " + " ".join(branches) + " END), '')"
            else:
                sql = "CAST(NULL AS STRING)"
            if col_name in cfg.numeric_columns:
                sql = f"CAST(regexp_replace({sql}, ',', '') AS BIGINT)"
            out[col_name] = F.expr(sql)
        return out

    return dict(_cfg_memo("extract_columns", cfg, (src, variant_col), _build))


def _broadcast_type(variant_col: str, cfg: ParseConfig) -> Column:
    """Variant ranges are contiguous per group -> one BETWEEN branch
    per group (22 branches, not 42)."""
    branches = []
    idx = 0
    for group in cfg.groups:
        lo, hi = idx, idx + len(group.variants) - 1
        branches.append(
            f"WHEN {variant_col} BETWEEN {lo} AND {hi} THEN {_q(group.broadcast_type)}"
        )
        idx += len(group.variants)
    if not branches:
        return F.lit(None).cast("string")
    return F.expr("CASE " + " ".join(branches) + " END")


def _required_ok_by_variant(src: str, variant_col: str, cfg: ParseConfig) -> Column:
    """Per-VARIANT required-column validation: one CASE branch per
    variant, so a row evaluates only its matched variant's required
    extractions (~2 regex runs) instead of materializing every output
    column first."""
    branches = []
    idx = 0
    all_cols = set(cfg.all_columns())
    for group in cfg.groups:
        for variant in group.variants:
            required = group.variant_required(variant)
            conds = []
            pos = 0
            for col_name in variant.columns:
                pos += 1
                if col_name == "_" or col_name not in required:
                    continue
                conds.append(
                    f"nullif(trim(regexp_extract({src}, {_q(variant.regex)}, {pos})), '') IS NOT NULL"
                )
            # a required column the variant does not capture is null by
            # definition -> validation fails for that variant
            captured = {c for c in variant.columns if c != "_"}
            if any(rc in all_cols and rc not in captured for rc in required):
                ok = "false"
            elif conds:
                ok = "(" + " AND ".join(conds) + ")"
            else:
                ok = "true"
            branches.append(f"WHEN {variant_col} = {idx} THEN {ok}")
            idx += 1
    if not branches:
        return F.lit(False)
    return _cfg_memo(
        "required_ok", cfg, (src, variant_col),
        lambda: F.expr("CASE " + " ".join(branches) + " ELSE false END"),
    )


def _game_mode(content: Column, cfg: ParseConfig) -> Column:
    """Mode tag from the leading icon token(s), or null.

    Two rule forms (config.GameModeRule): first-emoji NAME membership
    (id-portable), and literal prefix match — the reference's
    ``content.startswith("".join(icons))`` semantics
    (src/2_parse_engine.py:92-114), covering AND-sequences of icons.
    First matching rule in config order wins.
    """
    if not cfg.game_modes:
        return F.lit(None).cast("string")
    emoji = F.regexp_extract(content, _EMOJI_RX, 1)
    expr = None
    for rule in cfg.game_modes:
        cond = F.lit(False)
        if rule.emojis:
            cond = cond | emoji.isin(*rule.emojis)
        for prefix in rule.prefixes:
            cond = cond | content.startswith(F.lit(prefix))
        expr = F.when(cond, rule.mode) if expr is None else expr.when(cond, rule.mode)
    return expr.otherwise(F.lit(None))


def _explode_users(df: DataFrame, user_col: str) -> DataFrame:
    """Multi-user broadcasts -> one row per user.

    Normalizations mirroring the reference (src/2_parse_engine.py:
    208-245): repair the glued "Aand B" malformation, fold
    "A, B and C" to a uniform separator, split, explode, trim.
    """
    u = F.col(user_col)
    # "UserAand UserB" -> "UserA and UserB" (missing space before
    # 'and').  PARITY NOTE: the reference repairs ANY word that ends
    # in 'and' (len>3, case-insensitive suffix —
    # src/2_parse_engine.py:215-221), which means a genuine username
    # like "Brand X" or "Roland Fan" is split there too, and the rule
    # applies to the LAST word as well ("PlayerA and Roland" splits
    # Roland); this engine reproduces that behavior, false positives
    # included — diverging would change silver row counts against the
    # reference on the same input.  The (?i:and) matches the
    # reference's word.lower().endswith('and') case rule; the
    # ``( |$)`` alternative covers the word-final-at-end-of-string
    # case the reference's per-word loop naturally includes.
    repaired = F.regexp_replace(u, r"(\w)(?i:and)( |$)", r"$1 and$2")
    # The reference then branches on the PROCESSED string: only when
    # it contains a comma or the ' and ' separator does it split —
    # otherwise the ORIGINAL captured username is kept verbatim
    # (src/2_parse_engine.py:225-246).  The branch matters for a
    # single trailing-'and' word: 'Roland' alone is repaired to
    # 'Rol and', which has NO ' and ' separator (no trailing space),
    # so the reference keeps 'Roland' — splitting unconditionally
    # would emit 'Rol and' instead.
    is_multi = repaired.contains(",") | repaired.contains(" and ")
    # commas become the same separator as 'and'
    normalized = F.regexp_replace(repaired, r",\s*", " and ")
    users = F.when(is_multi, F.split(normalized, r" and ")).otherwise(F.array(u))
    # explode_outer: inner explode makes InferFiltersFromGenerate
    # synthesize a size(split(..))>0 filter that duplicates the two
    # regexp_replaces per row; the filter below restores inner
    # semantics for rows that HAD a username.  Rows whose variant
    # captures no username at all (e.g. the Bin mention patterns) pass
    # through as a single null-username row.
    had_user = "__had_user"
    return (
        df.withColumn(had_user, u.isNotNull())
        .withColumn(user_col, F.explode_outer(users))
        .withColumn(user_col, F.nullif(F.trim(F.col(user_col)), F.lit("")))
        .filter(~F.col(had_user) | F.col(user_col).isNotNull())
        .drop(had_user)
    )


# Compiled-plan cache: building the ~40-variant CaseWhen forest costs
# ~1 s of driver time per call (42 F.expr parses + Column tree
# assembly), paid identically for identical inputs.  Keyed on (session
# id, semantic hash of the input plan, schema, config fingerprint,
# options); bounded FIFO so per-micro-batch misses (foreachBatch input
# plans embed source offsets) can't grow it.
_PLAN_CACHE: dict[tuple, ParsedStreams] = {}
_PLAN_CACHE_MAX = 8


def build_parse_plan(
    raw: DataFrame,
    cfg: ParseConfig,
    id_col: str = "id",
    ts_col: str = "timestamp",
    content_col: str = "raw_content",
    explode_multi_user: bool = True,
    cache: bool = True,
) -> ParsedStreams:
    """Compile the config into the three routed silver DataFrames.

    ``raw`` columns: (id, timestamp, raw_content).

    ``cache`` persists a COMPACT routing core — (id, ts, content,
    route flags, variant index, mode) — before the three route
    filters.  The barrier is load-bearing twice over: (a) the routing
    decision is computed ONCE for all three outputs, and (b) it stops
    filter pushdown from inlining the ~40-variant CaseWhen forest into
    each route predicate — without a barrier Catalyst collapses the
    staged projections and the duplicated expression tree explodes
    codegen/driver memory (measured: OOMs a 1g driver at sf0.01).

    Column EXTRACTION deliberately happens AFTER the route filters:
    each consumer re-derives its columns from the staged content, so
    extraction regexes run only on the rows that routed to that
    output and the wide extraction projection never feeds the cache
    (at sf0.1 this is ~3x cheaper than caching the full extraction
    for every row).
    """
    key: tuple | None = None
    if not raw.isStreaming:
        try:
            key = (
                raw.sparkSession.sparkContext.applicationId,
                raw.semanticHash(),
                str(raw.schema),
                repr(cfg),
                id_col,
                ts_col,
                content_col,
                explode_multi_user,
                cache,
            )
        except Exception:
            key = None
        if key is not None:
            hit = _PLAN_CACHE.get(key)
            if hit is not None:
                return hit

    # NO parallelism floor here: a repartition barrier before the
    # dispatch costs a full shuffle of the raw text (measured ~4.8s
    # extra at sf0.1 — 1.46s -> 6.24s for q_parse_engine) and buys
    # nothing at scale, where the corpus already arrives as many scan
    # splits.  Callers with a genuinely single-split input can pre-
    # apply operators.ensure_min_partitions themselves.
    content = clean_discord_escapes(F.col(content_col))

    # --- chat: tried first, exactly like the reference ---------------
    def chat_extract(src: Column) -> dict[str, Column]:
        out = {}
        pos = 0
        for c in cfg.chat.columns:
            pos += 1
            out[c] = F.nullif(
                F.trim(F.regexp_extract(src, cfg.chat.regex, pos)), F.lit("")
            )
        return out

    is_chat = content.rlike(cfg.chat.regex)
    _chat_gate = _gate_literal(cfg.chat.regex)
    if _chat_gate is not None:
        # same prefilter as the variant dispatch: skip the chat regex
        # for rows that can't contain its required literal
        is_chat = content.contains(_chat_gate) & is_chat
    chat_req = chat_extract(content)
    chat_ok = F.lit(True)
    for rc in cfg.chat.required:
        chat_ok = chat_ok & chat_req[rc].isNotNull()

    # --- broadcasts: strip game-mode prefix, then dispatch -----------
    mode = _game_mode(content, cfg)

    def strip_mode(src: Column, mode_col: Column) -> Column:
        return F.when(
            mode_col.isNotNull(), F.regexp_replace(src, r"^(?:<:\w+:\d+>\s*)+", "")
        ).otherwise(src)

    stripped = strip_mode(content, mode)

    # staged projections: each stage's expensive expressions are real
    # columns the next stage references as ATTRIBUTES.  Inlining would
    # re-run the producer per consumer reference — e.g. the stripped
    # content inside all 40 dispatch rlikes, or the 40-rlike variant
    # chain inside every required-check branch condition.
    core = raw.select(
        F.col(id_col).alias("raw_log_id"),
        F.col(ts_col).alias("Timestamp"),
        content.alias("Content"),
        is_chat.alias("__is_chat"),
        chat_ok.alias("__chat_ok"),
        mode.alias("__mode"),
        stripped.alias("__stripped0"),
    )
    core = core.select(
        "*", _variant_index("__stripped0", cfg).alias("__variant")
    )
    core = core.select(
        "*",
        _required_ok_by_variant(
            "__stripped0", "__variant", cfg
        ).alias("__req_ok"),
    )
    core = core.withColumn(
        "__bc_ok", (F.col("__variant") >= 0) & F.col("__req_ok")
    ).drop("__stripped0", "__req_ok")
    persisted = None
    if cache and not raw.isStreaming:
        # a streaming lineage cannot persist (AnalysisException at
        # plan build); foreachBatch callers hand in BATCH frames and
        # do persist — and must unpersist per batch, see ParsedStreams
        from pyspark import StorageLevel

        core = core.persist(StorageLevel.MEMORY_AND_DISK)
        persisted = core

    # --- chat output: extraction post-filter, chat rows only ---------
    chat_out_cols = chat_extract(F.col("Content"))
    chat = core.filter(F.col("__is_chat") & F.col("__chat_ok")).select(
        "raw_log_id",
        "Timestamp",
        F.lit("Chat").alias("MessageType"),
        *[v.alias(c) for c, v in chat_out_cols.items() if c != "_"],
    )

    # --- broadcasts output: extraction post-filter -------------------
    routed = core.filter(~F.col("__is_chat") & F.col("__bc_ok"))
    re_stripped = strip_mode(F.col("Content"), F.col("__mode"))
    # stage the stripped content as a column so the ~13 per-column
    # extraction chains reference an attribute, not 13 copies of the
    # regexp_replace
    routed = routed.withColumn("__stripped", re_stripped)
    extracted = _extract_columns("__stripped", "__variant", cfg)
    btype = _broadcast_type("__variant", cfg)
    # Total Level constant patch (reference src/2_parse_engine.py:205-206)
    skill = extracted.get("Skill", F.lit(None))
    extracted["Skill"] = F.when(btype == "Total Level", F.lit("Total")).otherwise(skill)
    broadcasts = routed.select(
        "raw_log_id",
        "Timestamp",
        "Content",
        F.when(
            F.col("__mode").isNotNull() & btype.isNotNull(),
            F.concat(F.lit("("), F.col("__mode"), F.lit(") "), btype),
        )
        .otherwise(btype)
        .alias("Broadcast_Type"),
        *[v.alias(k) for k, v in extracted.items()],
    )
    if explode_multi_user and cfg.multi_user_column in broadcasts.columns:
        broadcasts = _explode_users(broadcasts, cfg.multi_user_column)

    # --- dead letter -------------------------------------------------
    failure = (
        F.when(F.col("__is_chat") & ~F.col("__chat_ok"), "chat_missing_required")
        .when(F.col("__variant") == -1, "no_pattern_match")
        .otherwise("missing_required_columns")
    )
    unparsed = core.filter(
        ~(F.col("__is_chat") & F.col("__chat_ok")) & ~(~F.col("__is_chat") & F.col("__bc_ok"))
    ).select(
        "raw_log_id",
        F.col("Timestamp").alias("timestamp"),
        F.col("Content").alias("raw_content"),
        failure.alias("failure_reason"),
    )
    result = ParsedStreams(
        chat=chat, broadcasts=broadcasts, unparsed=unparsed, core=persisted
    )
    if key is not None:
        # evict other sessions' entries, then FIFO-bound this one's —
        # RELEASING each evicted entry's persisted core (the cache is
        # the owner; without this the block manager accumulates one
        # dataset per evicted plan)
        for k in [k for k in _PLAN_CACHE if k[0] != key[0]]:
            _PLAN_CACHE.pop(k).unpersist()
        while len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE))).unpersist()
        _PLAN_CACHE[key] = result
    return result
