"""Embed-render half of the Discord sink (S13).

Reference ``src/5_post_pbs_to_discord.py``: ``update_pbs`` (:151-215)
walks the TOML group definitions IN ORDER, joins each configured
record name against the personal-bests table (placeholder when
absent), always appends the "Miscellaneous" group holding the
observed-but-unconfigured tasks sorted alphabetically, and renders
one embed description per group (``create_embed_for_group``,
:50-104) with Discord's 4096-char description budget; the misc group
additionally appends a "Newest Clan Records" section (:224-255).

Spark-first shape: the config side is a ``VALUES`` literal frame
(group/record order indexes preserved), the data side is the gold
personal-bests table (config-sized — one row per task), and the whole
render — join, per-group ordered assembly, truncation — is one
DataFrame plan returning ONE ROW PER GROUP ``(position, group_title,
description, image, has_records)``.  That row set is exactly what
``streaming.upsert_sink.ExternalUpsertSink`` consumes: key =
group_title, payload = the rendered page, so re-runs EDIT the
external documents in place via the sink's id commit log.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..literals import literal_frame

DESCRIPTION_LIMIT = 4096  # Discord embed description budget


@dataclass(frozen=True)
class RecordDef:
    name: str
    discord_emoji: str = ""


@dataclass(frozen=True)
class GroupDef:
    title: str
    image: str | None = None
    records: tuple[RecordDef, ...] = field(default_factory=tuple)


def _record_part() -> F.Column:
    """One record's description block (create_embed_for_group:67-91):
    emoji title line + Time/Holder(s) bullets + optional date line.
    Placeholder semantics for unmatched tasks: time '0:00', no
    holders, no date."""
    time = F.coalesce(F.col("Time"), F.lit("0:00"))
    # reference: holder CSV split + ", ".join -> normalize separators
    holder_list = F.filter(
        F.transform(F.split(F.coalesce(F.col("Holder"), F.lit("")), ","), F.trim),
        lambda h: h != F.lit(""),
    )
    holder_str = F.when(
        F.size(holder_list) > 0, F.array_join(holder_list, ", ")
    ).otherwise(F.lit("N/A"))
    emoji = F.when(
        F.col("discord_emoji") != "", F.col("discord_emoji")
    ).otherwise(F.lit("⚔️"))
    title_line = F.concat(emoji, F.lit(" **"), F.col("task"), F.lit("**"))
    details = F.concat(
        F.lit("* **Time:** "), time, F.lit("\n* **Holder(s):** "), holder_str
    )
    with_date = F.when(
        F.col("Date").isNotNull(),
        F.concat(details, F.lit("\n* *"), F.col("Date"), F.lit("*")),
    ).otherwise(details)
    return F.concat(title_line, F.lit("\n"), with_date)


def render_pb_pages(
    spark: SparkSession,
    pb: DataFrame,
    groups: list[GroupDef],
    other_group_name: str = "Miscellaneous PBs",
    recent_count: int = 0,
    task_col: str = "Task",
    time_col: str = "Time",
    holder_col: str = "Holder",
    date_col: str = "Date",
    group_col: str = "Group",
) -> DataFrame:
    """Render the per-group embed pages.

    ``pb`` columns (reference pb_df): task, formatted time string,
    comma-separated holder string, optional date string, group name.
    Returns (position, group_title, description, image, has_records),
    one row per group in config order with the misc group last.
    """
    db = pb.select(
        F.col(task_col).alias("task"),
        F.col(time_col).alias("Time"),
        F.col(holder_col).alias("Holder"),
        F.col(date_col).alias("Date"),
        F.col(group_col).alias("Group"),
    )

    # --- config side: (group position, record order, title, image) ---
    rows = []
    for gi, g in enumerate(groups):
        if not g.title:
            continue  # reference: warn and skip title-less groups
        if not g.records:
            rows.append((gi, g.title, g.image, None, "", -1))
        for ri, r in enumerate(g.records):
            if not r.name:
                continue
            rows.append((gi, g.title, g.image, r.name, r.discord_emoji, ri))
    defs = literal_frame(
        spark,
        rows,
        "gpos int, group_title string, image string, task string, "
        "discord_emoji string, rorder int",
    )

    # --- misc group: observed tasks of the other group, sorted -------
    # The misc group is ALWAYS rendered (reference :163-167 appends it
    # unconditionally) — the placeholder row keeps its page when no
    # misc tasks were observed.
    other_pos = len(groups)
    defs = defs.unionByName(
        literal_frame(
            spark,
            [(other_pos, other_group_name, None, None, "", -1)],
            "gpos int, group_title string, image string, task string, "
            "discord_emoji string, rorder int",
        )
    )
    misc = (
        db.filter(F.col("Group") == other_group_name)
        .select("task")
        .distinct()
        .withColumn("rorder", F.row_number().over(Window.orderBy("task")) - 1)
        .select(
            F.lit(other_pos).alias("gpos"),
            F.lit(other_group_name).alias("group_title"),
            F.lit(None).cast("string").alias("image"),
            "task",
            F.lit("").alias("discord_emoji"),
            "rorder",
        )
    )
    all_defs = defs.unionByName(misc)

    joined = all_defs.join(
        F.broadcast(db.drop("Group")), "task", "left"
    ).withColumn(
        "part",
        F.when(F.col("rorder") >= 0, _record_part()).otherwise(F.lit(None)),
    )

    has_holder = F.when(
        (F.col("rorder") >= 0)
        & F.coalesce(F.trim(F.col("Holder")) != "", F.lit(False)),
        1,
    ).otherwise(0)
    pages = (
        joined.groupBy("gpos", "group_title")
        .agg(
            F.first("image", ignorenulls=True).alias("image"),
            F.max(has_holder).alias("__has"),
            F.array_sort(
                F.collect_list(F.struct(F.col("rorder"), F.col("part")))
            ).alias("__parts"),
        )
        .withColumn(
            "__body",
            F.array_join(
                F.filter(
                    F.transform(F.col("__parts"), lambda s: s.part),
                    lambda p: p.isNotNull(),
                ),
                "\n\n",
            ),
        )
    )
    header = F.concat(F.lit("# **"), F.col("group_title"), F.lit("**"))
    raw_desc = F.when(
        F.col("__has") == 0,
        F.concat(header, F.lit("\nNo records to display in this category.")),
    ).otherwise(
        F.when(
            F.col("__body") == "", header
        ).otherwise(F.concat(header, F.lit("\n\n"), F.col("__body")))
    )
    # suffix is 15 chars: the kept prefix must shrink by exactly that
    # much or the "truncated" page exceeds the limit and is rejected
    _suffix = "\n...*truncated*"
    desc = F.when(
        F.length(raw_desc) > DESCRIPTION_LIMIT,
        F.concat(
            F.substring(raw_desc, 1, DESCRIPTION_LIMIT - len(_suffix)),
            F.lit(_suffix),
        ),
    ).otherwise(raw_desc)
    pages = pages.select(
        F.col("gpos").alias("position"),
        "group_title",
        "image",
        desc.alias("description"),
        (F.col("__has") == 1).alias("has_records"),
    )

    # --- misc group: append the Newest Clan Records section ----------
    if recent_count > 0:
        w = Window.orderBy(F.col("Date").desc(), F.col("task").asc())
        recent = (
            db.filter(F.col("Date").isNotNull())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= recent_count)
        )
        line = F.concat(
            F.lit("* **"), F.col("Holder"), F.lit("**\n  * *"),
            F.col("task"), F.lit(" - "), F.coalesce(F.col("Time"), F.lit("0:00")),
            F.lit("*"),
        )
        recent_agg = recent.agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__rn"), line.alias("l")))
                    ),
                    lambda s: s.l,
                ),
                "\n",
            ).alias("__recent_lines")
        ).select(
            F.concat(
                F.lit("## **\U0001f3c6 Newest Clan Records**\n"),
                F.col("__recent_lines"),
            ).alias("__recent"),
            F.lit(1).alias("__one"),
        )
        sep = "\n\n" + "─" * 20 + "\n\n"
        is_other = F.col("group_title") == other_group_name
        base = F.when(
            is_other
            & F.col("description").contains(
                "No records to display in this category."
            ),
            F.concat(
                F.lit("## **"),
                F.col("group_title"),
                F.lit("**\n*No miscellaneous records to display.*"),
            ),
        ).otherwise(F.col("description"))
        appended = F.concat(base, F.lit(sep), F.col("__recent"))
        capped = F.when(
            F.length(appended) > DESCRIPTION_LIMIT,
            F.concat(F.substring(appended, 1, DESCRIPTION_LIMIT - 3), F.lit("...")),
        ).otherwise(appended)
        pages = (
            pages.withColumn("__one", F.lit(1))
            .join(F.broadcast(recent_agg), "__one", "left")
            .withColumn(
                "description",
                F.when(
                    is_other & F.col("__recent").isNotNull(), capped
                ).otherwise(F.col("description")),
            )
            .drop("__one", "__recent")
        )
    return pages.orderBy("position")
