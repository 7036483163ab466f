"""Pipeline orchestration policy: stage elision + per-stage failure
tolerance (reference ``src/run_all_etl.py:117-133,145-155``).

The reference's runner applies two rules this module re-expresses:

- **Elision by age**: the price-fetch stage is skipped when its last
  SUCCESSFUL run is younger than ``min_time_between_runs`` hours,
  tracked in ``ETL_state.json`` under
  ``{stage: {"last_successful_run_utc": iso}}``.  An unreadable or
  corrupt state file means "run everything" (reference: warns and
  proceeds).
- **Failure tolerance**: the price stage may fail without aborting the
  pipeline (its result is recorded and the run continues); any other
  stage's failure aborts.

Both are data-independent driver-side policy, so they live apart from
the Spark stages themselves; ``scripts/run_pipeline.py`` wires them
around its DataFrame jobs.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterable, Mapping
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from pathlib import Path


@dataclass
class StageResult:
    name: str
    status: str  # "ok" | "skipped" | "failed"
    seconds: float = 0.0
    detail: str = ""


def _utcnow() -> datetime:
    return datetime.now(timezone.utc)


def last_success(state_path: str | Path, stage: str) -> datetime | None:
    """Parse the stage's last successful run from the state file;
    None on missing/corrupt state (-> run the stage), mirroring the
    reference's warn-and-run-everything handling."""
    p = Path(state_path)
    try:
        if not p.exists() or p.stat().st_size == 0:
            return None
        state = json.loads(p.read_text())
        raw = state.get(stage, {}).get("last_successful_run_utc")
        if not raw:
            return None
        ts = datetime.fromisoformat(raw)
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        return ts
    except (
        json.JSONDecodeError,
        KeyError,
        ValueError,
        OSError,
        # valid JSON of the wrong SHAPE ([], "x", {"stage": "str"}):
        # .get on a non-dict raises these — still "corrupt state,
        # run everything", never an aborted pipeline
        AttributeError,
        TypeError,
    ):
        return None


def should_skip_by_age(
    state_path: str | Path,
    stage: str,
    min_hours: float,
    now: datetime | None = None,
) -> bool:
    """True when the stage ran successfully less than ``min_hours``
    ago (reference run_all_etl.py:122-131)."""
    last = last_success(state_path, stage)
    if last is None:
        return False
    now = now or _utcnow()
    return now < last + timedelta(hours=min_hours)


def record_success(
    state_path: str | Path, stage: str, now: datetime | None = None
) -> None:
    """Persist the stage's successful run time, preserving other
    stages' entries (reference run_all_etl.py:157-165)."""
    p = Path(state_path)
    try:
        state = json.loads(p.read_text()) if p.exists() and p.stat().st_size else {}
    except (json.JSONDecodeError, OSError):
        state = {}
    entry = state.setdefault(stage, {})
    entry["last_successful_run_utc"] = (now or _utcnow()).isoformat()
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(p.suffix + ".tmp")
    tmp.write_text(json.dumps(state, indent=2))
    tmp.replace(p)


def run_stages(
    stages: Iterable[tuple[str, Callable[[], object]]],
    state_path: str | Path,
    elide_after_hours: Mapping[str, float] | None = None,
    tolerate_failure: Iterable[str] = (),
    now: datetime | None = None,
    log_dir: str | Path | None = None,
) -> list[StageResult]:
    """Run ``(name, thunk)`` stages in order under the reference's
    policy: stages named in ``elide_after_hours`` are skipped when
    fresh; stages named in ``tolerate_failure`` record a failure and
    the run continues; any other failure re-raises (aborts).
    Successful elidable stages update the state file.

    With ``log_dir`` set, each stage writes its start/ok/skip/fail
    narrative to a rotating per-stage log file
    (``observability.stage_logger`` — reference parity with the
    per-script loguru files, src/loguru_setup.py:1-48)."""
    from .observability import stage_logger

    elide = dict(elide_after_hours or {})
    tolerated = set(tolerate_failure)
    results: list[StageResult] = []
    for name, thunk in stages:
        lg = stage_logger(name, str(log_dir)) if log_dir else None
        if name in elide and should_skip_by_age(state_path, name, elide[name], now):
            results.append(
                StageResult(name, "skipped", 0.0, f"fresh (<{elide[name]}h)")
            )
            if lg:
                lg.info("skipped: fresh (<%sh)", elide[name])
            continue
        t0 = time.time()
        if lg:
            lg.info("start")
        try:
            thunk()
        except Exception as exc:  # noqa: BLE001 - policy layer
            if name in tolerated:
                results.append(
                    StageResult(name, "failed", time.time() - t0, str(exc)[:200])
                )
                if lg:
                    lg.error(
                        "failed (tolerated) after %.2fs: %s",
                        time.time() - t0,
                        exc,
                    )
                continue
            if lg:
                lg.error("failed (aborting) after %.2fs: %s", time.time() - t0, exc)
            raise
        results.append(StageResult(name, "ok", time.time() - t0))
        if lg:
            lg.info("ok in %.2fs", time.time() - t0)
        if name in elide:
            record_success(state_path, name, now)
    return results


# ---------------------------------------------------------------------------
# Backfill planning: which day partitions are missing or incomplete
# ---------------------------------------------------------------------------


def plan_backfill(
    existing_days: Iterable[str],
    start_day: str,
    end_day: str,
) -> list[str]:
    """Days in ``[start_day, end_day]`` (ISO yyyy-mm-dd, inclusive)
    with no partition yet — the work-list a backfill driver feeds one
    day at a time through the normal idempotent ingest (S4 dedup-append
    makes re-running a partially-filled day safe).

    Driver-side policy on a tiny day list; the data-side cost of each
    backfilled day is the same window-pruned append as live ingest.
    """
    t0 = datetime.fromisoformat(start_day).date()
    t1 = datetime.fromisoformat(end_day).date()
    if t1 < t0:
        raise ValueError(f"end_day {end_day} before start_day {start_day}")
    have = set(existing_days)
    out = []
    d = t0
    while d <= t1:
        iso = d.isoformat()
        if iso not in have:
            out.append(iso)
        d += timedelta(days=1)
    return out


def existing_day_partitions(path: str | Path, col: str = "event_date") -> list[str]:
    """Day values present as Hive partition directories
    (``<col>=yyyy-mm-dd``) under ``path`` — a LISTING, not a scan."""
    root = Path(path)
    if not root.exists():
        return []
    prefix = f"{col}="
    return sorted(
        p.name[len(prefix):]
        for p in root.iterdir()
        if p.is_dir() and p.name.startswith(prefix)
    )
