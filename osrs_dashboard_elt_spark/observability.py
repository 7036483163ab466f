"""S14/S15: run-summary and notify sinks (engine-side halves).

The reference ends every pipeline script by composing a markdown run
summary, writing it to ``summaries/<script>_summary_<ts>.txt``, and
POSTing the same text to a Discord webhook
(reference src/shared_utils.py:32-42 ``write_summary_file``,
:128-147 ``post_to_discord_webhook``; composition example
src/2_parse_engine.py:400-416).

Spark-first split of responsibilities:

- **Metric capture is engine-side and free.** Counting "rows
  processed / rows added" with ``df.count()`` would re-run the job
  once per metric; ``pyspark.sql.Observation`` attaches named
  aggregates to the SAME action, so a pipeline collects all its
  summary numbers in the single write pass.  ``ObservedMetrics``
  wraps that: ``obs.observe(df, rows=F.count(F.lit(1)), ...)`` then
  ``obs.get()`` after the action.  At 100 TB this is the difference
  between one scan and N scans.
- **Rendering is pure** (``render_run_summary`` — reference format,
  bold title / backticked values, ✅/❌ variants) so both the batch
  driver and the streaming listener reuse it.
- **Transport is injected.** The container has no network; the HTTP
  POST is a ``Callable[[str], None]``.  ``webhook_transport`` builds
  one from ``requests`` behind an import-try (matching the
  reference's 10 s timeout + 200/204 success contract) and
  ``notify`` applies the reference's 2000-char Discord cap
  (truncate to 1990 + '...') and its skip-when-unconfigured rule.
- **Streaming gets a listener, not ad-hoc prints.**
  ``SummaryListener`` is a ``StreamingQueryListener`` that
  accumulates per-query ``numInputRows`` and writes/sends one
  summary at termination — the structured-streaming analog of the
  reference's end-of-script summary block.
"""

from __future__ import annotations

import logging
import os
import tempfile
from logging.handlers import RotatingFileHandler
from typing import Callable, Mapping

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)

#: Discord hard message cap and the reference's truncation point.
_MSG_CAP = 2000
_TRUNC_AT = 1990


# ---------------------------------------------------------------------------
# Per-stage rotating run logs (reference src/loguru_setup.py:1-48)
# ---------------------------------------------------------------------------

#: Mirrors the reference's loguru line layout (time | level |
#: name:function:line | message) in stdlib logging terms.
_LOG_FORMAT = (
    "%(asctime)s | %(levelname)-8s | "
    "%(name)s:%(funcName)s:%(lineno)d | %(message)s"
)


def stage_logger(
    stage: str,
    log_dir: str,
    level: int = logging.INFO,
    max_bytes: int = 10 * 1024 * 1024,
    backup_count: int = 7,
    console: bool = False,
) -> logging.Logger:
    """Per-stage rotating file logger — the reference's run-logging
    surface (src/loguru_setup.py:1-48: per-script log file, ``10 MB``
    rotation, ``7 days`` retention, optional colorized console copy)
    re-expressed with stdlib logging (loguru is not a dependency
    here): ``RotatingFileHandler(maxBytes=10MB, backupCount=7)``
    gives size rotation with count-bounded retention.

    Idempotent per call (existing handlers are closed and replaced —
    the stdlib analog of ``logger.remove()``), so re-running a
    pipeline appends to the same ``<log_dir>/<stage>.log`` and
    rotation carries across runs.  Driver-side only by design: at
    cluster scale executor logs belong to the cluster manager; this
    records the ORCHESTRATION narrative (stage start/ok/skip/fail),
    which is what the reference's per-script logs hold.
    """
    os.makedirs(log_dir, exist_ok=True)
    lg = logging.getLogger(f"osrs_elt.{stage}")
    lg.setLevel(level)
    lg.propagate = False
    for h in list(lg.handlers):
        lg.removeHandler(h)
        h.close()
    fh = RotatingFileHandler(
        os.path.join(log_dir, f"{stage}.log"),
        maxBytes=max_bytes,
        backupCount=backup_count,
    )
    fh.setFormatter(logging.Formatter(_LOG_FORMAT))
    lg.addHandler(fh)
    if console:
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter(_LOG_FORMAT))
        lg.addHandler(sh)
    return lg


# ---------------------------------------------------------------------------
# Metric capture (one-scan summaries via Observation)
# ---------------------------------------------------------------------------


class ObservedMetrics:
    """Collects named metrics from several DataFrames in one place.

    >>> obs = ObservedMetrics()
    >>> df = obs.observe(df, "parse", rows=F.count(F.lit(1)),
    ...                  parsed=F.sum(F.when(F.col("ok"), 1).otherwise(0)))
    >>> df.write...   # the single action computes the metrics too
    >>> obs.get()     # {"parse": {"rows": ..., "parsed": ...}}

    Metrics ride the action that materializes the DataFrame — zero
    extra scans, unlike ``df.count()`` bookkeeping.
    """

    def __init__(self) -> None:
        self._obs: dict[str, Observation] = {}

    def observe(self, df: DataFrame, stage: str, **metrics) -> DataFrame:
        if stage in self._obs:
            raise ValueError(f"stage {stage!r} already observed")
        ob = Observation(stage)
        self._obs[stage] = ob
        exprs = [expr.alias(name) for name, expr in metrics.items()]
        return df.observe(ob, *exprs)

    def get(self) -> dict[str, dict]:
        """Blocks until each observed DataFrame's action has run."""
        return {stage: dict(ob.get) for stage, ob in self._obs.items()}


# ---------------------------------------------------------------------------
# Rendering + summary-file sink (S15)
# ---------------------------------------------------------------------------


def render_run_summary(
    project: str,
    script: str,
    lines: Mapping[str, object],
    ok: bool = True,
    error: str | None = None,
) -> str:
    """Reference-format markdown summary (src/2_parse_engine.py:400-416):
    bold ✅/❌ title, then ``- Label: `value``` rows."""
    if not ok:
        return (
            f"**❌ {project}: {script} FAILED**\n"
            f"**Error:**\n```{error or 'unknown'}```"
        )
    body = "\n".join(f"- {k}: `{v}`" for k, v in lines.items())
    return f"**✅ {project}: {script} Complete**\n\n{body}"


def write_summary_file(
    script: str,
    content: str,
    summaries_dir: str,
    run_ts: str,
) -> str:
    """Write ``<script>_summary_<run_ts>.txt`` atomically (temp +
    rename, same crash-safety contract as the blue/green publisher).
    ``run_ts`` is injected, not ``now()`` — engine code stays
    deterministic/testable; the driver stamps wall-clock.
    """
    os.makedirs(summaries_dir, exist_ok=True)
    path = os.path.join(summaries_dir, f"{script}_summary_{run_ts}.txt")
    fd, tmp = tempfile.mkstemp(dir=summaries_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(content)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


# ---------------------------------------------------------------------------
# Notify sink (S14)
# ---------------------------------------------------------------------------


def notify(
    message: str,
    transport: Callable[[str], None] | None,
) -> bool:
    """Send ``message`` through ``transport`` with the reference's
    rules: skip silently when unconfigured (returns False), truncate
    over-cap messages to 1990 chars + ``'...'``
    (shared_utils.py:130-136).  Transport errors propagate to the
    caller — the reference logs-and-continues, which is the DRIVER's
    choice, not the sink's.
    """
    if transport is None:
        return False
    if len(message) > _MSG_CAP:
        message = message[:_TRUNC_AT] + "..."
    transport(message)
    return True


def webhook_transport(url: str | None, timeout: float = 10.0):
    """Build an HTTP-POST transport matching the reference webhook
    contract (shared_utils.py:138-147: JSON ``{"content": msg}``,
    success = 200/204).  Returns None when the url is unconfigured or
    a placeholder — callers then skip via :func:`notify`.  Gated
    behind an import-try: no ``requests`` (or no network) -> None.
    """
    if not url or "YOUR_WEBHOOK_URL_HERE" in url:
        return None
    try:
        import requests  # noqa: PLC0415
    except ImportError:
        return None

    def _send(message: str) -> None:
        resp = requests.post(
            url, json={"content": message}, timeout=timeout
        )
        if resp.status_code not in (200, 204):
            raise RuntimeError(
                f"webhook post failed: {resp.status_code} {resp.text[:200]}"
            )

    return _send


# ---------------------------------------------------------------------------
# Streaming listener (S14/S15 for Structured Streaming)
# ---------------------------------------------------------------------------

try:  # StreamingQueryListener import path is stable in pyspark>=3.4
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore[assignment,misc]


class SummaryListener(StreamingQueryListener):
    """Accumulates per-query input-row totals and batch counts from
    progress events; on termination renders ONE reference-format
    summary and hands it to ``sink(query_name, summary_text)``.

    Driver wiring::

        lis = SummaryListener(project="OSRS Dashboard",
                              sink=lambda name, text: notify(text, transport))
        spark.streams.addListener(lis)

    The listener runs driver-side on the listener-bus thread — it
    must never touch DataFrames; it only reads the progress JSON the
    stream already emits (so it adds zero load to executors).
    """

    def __init__(
        self,
        project: str,
        sink: Callable[[str, str], None],
    ) -> None:
        self.project = project
        self._sink = sink
        self._rows: dict[str, int] = {}
        self._batches: dict[str, int] = {}
        self._names: dict[str, str] = {}
        self._errors: dict[str, str] = {}
        self._state_rows: dict[str, int] = {}
        self._watermark: dict[str, str] = {}

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:
        self._names[str(event.id)] = event.name or str(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        qid = str(p.id)
        self._rows[qid] = self._rows.get(qid, 0) + int(p.numInputRows)
        self._batches[qid] = self._batches.get(qid, 0) + 1
        # stateful-operator health: peak state rows (is eviction
        # working?) and the last watermark (is event time advancing?)
        # — both straight off the progress JSON, zero executor load
        try:
            total = sum(
                int(s.numRowsTotal) for s in (p.stateOperators or [])
            )
            if total > self._state_rows.get(qid, -1):
                self._state_rows[qid] = total
        except Exception:
            pass
        try:
            wm = (p.eventTime or {}).get("watermark")
            if wm:
                self._watermark[qid] = wm
        except Exception:
            pass

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryTerminated(self, event) -> None:
        qid = str(event.id)
        name = self._names.get(qid, qid)
        err = getattr(event, "exception", None)
        metrics = {
            "Batches": self._batches.get(qid, 0),
            "Input Rows": self._rows.get(qid, 0),
        }
        if qid in self._state_rows:
            metrics["Peak State Rows"] = self._state_rows[qid]
        if qid in self._watermark:
            metrics["Last Watermark"] = self._watermark[qid]
        summary = render_run_summary(
            self.project,
            name,
            metrics,
            ok=err is None,
            error=str(err) if err else None,
        )
        self._sink(name, summary)
        # evict the terminated query's state: a long-lived session
        # starting many one-shot queries would otherwise grow these
        # dicts forever, and a RESTARTED query reusing the id would
        # double-count the previous run's rows
        for d in (
            self._rows,
            self._batches,
            self._names,
            self._errors,
            self._state_rows,
            self._watermark,
        ):
            d.pop(qid, None)
