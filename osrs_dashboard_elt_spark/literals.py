"""Tiny literal dimensions as pure-JVM ``VALUES`` LocalRelations.

``spark.createDataFrame(python_rows)`` routes through a pickled Python
RDD: every downstream stage that scans it launches Python worker
processes — measured here at ~1.8 s of executor wall-clock PER TASK
(x32 tasks) for a 20-row group skeleton, dwarfing the query it feeds.
A ``VALUES`` relation is parsed JVM-side into a ``LocalTableScan``:
no Python workers, no RDD, broadcast-joinable, and constant-folded by
Catalyst.

Use this for every literal/config dimension on a hot path (report
skeletons, historical seeds, rule tables).  ``createDataFrame`` stays
appropriate for driver-side fetch results that are written straight to
parquet (e.g. the REST mapping cache) where the one-off worker cost is
immaterial.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sql_lit(v) -> str:
    """One Python value as a SQL literal with createDataFrame's type
    mapping (int -> BIGINT, float -> DOUBLE, str -> STRING)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        # repr round-trips IEEE doubles; the string cast parses
        # correctly rounded, so the value is bit-identical
        return f"CAST('{v!r}' AS DOUBLE)"
    if isinstance(v, datetime):
        return "TIMESTAMP '" + v.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
    if isinstance(v, date):
        return "DATE '" + v.isoformat() + "'"
    # backslashes FIRST: Spark's default (escapedStringLiterals=false)
    # interprets \n, \t, ... inside string literals, and a trailing
    # backslash would escape the closing quote -> ParseException
    s = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return "'" + s + "'"


def _split_ddl(schema: str) -> tuple[list[str], list[str]]:
    """Split ``"name type, name type"`` respecting parens in types
    (``decimal(28,6)``)."""
    parts: list[str] = []
    depth = 0
    cur = ""
    for ch in schema:
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
            continue
        depth += ch == "("
        depth -= ch == ")"
        cur += ch
    parts.append(cur)
    names, types = [], []
    for p in parts:
        bits = p.strip().split(None, 1)
        names.append(bits[0])
        types.append(bits[1] if len(bits) > 1 else "")
    return names, types


def literal_frame(
    spark: SparkSession,
    rows: Sequence[Sequence],
    schema: str | list[str],
) -> DataFrame:
    """A small literal DataFrame as a JVM ``VALUES`` relation.

    ``schema`` is either a DDL string (``"name type, ..."`` — values
    are cast to the declared types, so ``None`` columns work) or a
    plain list of column names (types follow the Python values).
    """
    if isinstance(schema, str):
        names, types = _split_ddl(schema)
    else:
        names, types = list(schema), None
    if not rows:
        if types is None:
            raise ValueError("empty literal_frame requires a DDL schema")
        return spark.createDataFrame([], ", ".join(f"{n} {t}" for n, t in zip(names, types)))
    vals = ", ".join(
        "(" + ", ".join(sql_lit(v) for v in r) + ")" for r in rows
    )
    df = spark.sql(f"SELECT * FROM (VALUES {vals}) AS __t({', '.join(names)})")
    if types is not None:
        df = df.select(
            *[F.col(n).cast(t).alias(n) for n, t in zip(names, types)]
        )
    return df


_LITERAL_TYPES = (bool, int, float, str, datetime, date)


def local_frame(
    spark: SparkSession,
    rows: Sequence[Sequence],
    schema: str,
) -> DataFrame:
    """A driver-local row set as a DataFrame, JVM-backed when possible.

    The maintenance/planning machinery builds many SMALL frames (probe
    value lists, source-file maps, update changesets) that each feed
    exactly one or two jobs; as ``createDataFrame`` results they are
    pickled Python RDDs, and EVERY job that touches one pays Python
    worker startup — measured ~4.5 s fixed per tiny write job in this
    environment, which dominated the whole mutation path.  Rows whose
    values are all plain literals (int/float/str/bool/date/datetime/
    None) become a ``VALUES`` LocalTableScan via :func:`literal_frame`
    (no Python workers anywhere downstream); anything else (arrays,
    binaries, Decimals, Rows) falls back to ``createDataFrame``
    unchanged."""
    def _lit_ok(v) -> bool:
        if v is None:
            return True
        if type(v) is datetime and v.tzinfo is not None:
            # sql_lit renders naive session-tz timestamps; an aware
            # datetime would silently drop its offset
            return False
        return type(v) in _LITERAL_TYPES

    literal_ok = all(
        _lit_ok(v)
        for r in rows
        for v in (r if isinstance(r, (list, tuple)) else tuple(r))
    )
    if literal_ok:
        return literal_frame(spark, [tuple(r) for r in rows], schema)
    return spark.createDataFrame([tuple(r) for r in rows], schema)
