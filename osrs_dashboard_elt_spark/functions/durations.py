"""Duration string <-> seconds (reference R8,
src/3_transform_data.py:25-43).

The reference parses "H:M:S" / "M:S.f" / "S" to float seconds with
``float('inf')`` as the invalid sentinel.  Here: a pure column
expression (split + arithmetic — stays inside whole-stage codegen) and
NULL instead of inf; downstream mins must therefore not need
null-ordering tricks (nulls are filtered, see
operators.sessionize.near_best_band).

The reference's "0:00" historical placeholder ("no recorded time",
treated as infinity, src/3_transform_data.py:656-659) is handled by
``treat_zero_as_null``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def duration_seconds(col: Column, treat_zero_as_null: bool = False) -> Column:
    """Parse 'H:M:S(.f)' / 'M:S(.f)' / 'S(.f)' to double seconds.

    Invalid strings -> NULL (the reference returns inf).  With
    ``treat_zero_as_null``, 0.0 also becomes NULL ("0:00" = no time).
    """
    s = F.trim(col)
    valid = s.rlike(r"^\d+(:\d+)?(:\d+)?(\.\d+)?$")
    parts = F.split(s, ":")
    n = F.size(parts)
    p0 = F.element_at(parts, 1).cast("double")
    p1 = F.element_at(parts, 2).cast("double")
    p2 = F.element_at(parts, 3).cast("double")
    secs = (
        F.when(n == 1, p0)
        .when(n == 2, p0 * 60 + p1)
        .when(n == 3, p0 * 3600 + p1 * 60 + p2)
    )
    out = F.when(valid, secs)
    if treat_zero_as_null:
        out = F.when(valid & (secs != 0.0), secs)
    return out


def seconds_to_duration(col: Column) -> Column:
    """Format double seconds as 'H:MM:SS.f' / 'M:SS.f' (reference
    formats times back into embeds); fractional part kept to 1 decimal
    when non-integral."""
    # Round to tenths FIRST, then decompose — so 59.96s carries into
    # the minute (1:00.0) instead of formatting as 59.10.
    tenths = F.round(col * 10).cast("long")
    sec_total = F.floor(tenths / 10).cast("long")
    frac = tenths % 10
    h = F.floor(sec_total / 3600).cast("long")
    m = F.floor((sec_total % 3600) / 60).cast("long")
    s_int = sec_total % 60
    s_str = F.when(
        frac > 0, F.concat(F.lpad(s_int.cast("string"), 2, "0"), F.lit("."), frac.cast("string"))
    ).otherwise(F.lpad(s_int.cast("string"), 2, "0"))
    return F.when(
        h > 0,
        F.concat(h.cast("string"), F.lit(":"), F.lpad(m.cast("string"), 2, "0"), F.lit(":"), s_str),
    ).otherwise(F.concat(m.cast("string"), F.lit(":"), s_str))
