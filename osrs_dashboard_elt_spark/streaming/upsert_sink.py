"""S13 engine half: stateful external-document upsert sink.

The reference posts each report group as a Discord embed and keeps a
``{group_title: message_id}`` JSON state file so a re-run EDITS the
existing message instead of posting a duplicate
(reference src/5_post_pbs_to_discord.py:171-290, state load/save
:30-48, NotFound -> repost :280-284).

Spark-first shape: the report tables feeding the sink are gold
outputs (config-sized — one row per report group), so the sink is a
``foreachBatch`` consumer that collects THE RENDERED GROUPS ONLY
(never raw data) and drives an external transport with an id commit
log:

- key exists in the id map  -> ``update(external_id, payload)``;
- key unknown               -> ``create`` and record the new id;
- transport raises NotFound -> re-create and re-record (the external
  side lost the doc);
- the id map persists via atomic write (temp file + rename), so a
  crash between batches never corrupts it, and a REPLAYED batch
  re-updates in place — replay-idempotent, the foreachBatch
  at-least-once contract made effectively exactly-once by idempotent
  edits.

The Discord client itself stays out of the engine (network sink,
driver-side per SURVEY §2 S13 scoping); ``LocalJsonTransport`` is the
in-repo transport used by tests and doubles as a file-based publish
target.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Protocol

from pyspark.sql import DataFrame


class NotFoundError(KeyError):
    """External document vanished (reference discord.NotFound)."""


class UpsertTransport(Protocol):
    """Minimal external-document API (create/update by id)."""

    def create(self, key: str, payload: dict) -> str:
        """Create a document for ``key``; returns its external id."""
        ...

    def update(self, external_id: str, payload: dict) -> None:
        """Replace the document's content; raises NotFoundError if the
        id no longer exists externally."""
        ...


class LocalJsonTransport:
    """File-per-document transport: external id = filename.  Used by
    tests and as a local publish target."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._seq = 0

    def _path(self, external_id: str) -> str:
        return os.path.join(self.root, f"{external_id}.json")

    def create(self, key: str, payload: dict) -> str:
        existing = sorted(os.listdir(self.root))
        self._seq = max(self._seq, len(existing))
        self._seq += 1
        external_id = f"doc-{self._seq:06d}"
        with open(self._path(external_id), "w", encoding="utf-8") as f:
            json.dump({"key": key, **payload}, f)
        return external_id

    def update(self, external_id: str, payload: dict) -> None:
        path = self._path(external_id)
        if not os.path.exists(path):
            raise NotFoundError(external_id)
        with open(path, "r", encoding="utf-8") as f:
            key = json.load(f).get("key")
        with open(path, "w", encoding="utf-8") as f:
            json.dump({"key": key, **payload}, f)


def _load_state(path: str) -> dict:
    if not os.path.exists(path):
        return {}
    try:
        with open(path, "r", encoding="utf-8") as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        # reference behavior: unreadable state -> start fresh (the
        # upserts then repost; ids re-record on the next save)
        return {}


def _save_state(path: str, state: dict) -> None:
    """Atomic publish through the injectable commit protocol (a crash
    mid-save can never corrupt the map; atomic on object stores, no
    rename — round-10 ADVICE moved this off raw mkstemp+replace)."""
    from ..sources import commitio

    commitio.publish_bytes(
        path, json.dumps(state, indent=2).encode("utf-8")
    )


class ExternalUpsertSink:
    """The S13 sink: key column -> one external document, id-mapped.

    ``render`` turns a collected Row into the document payload (the
    reference's embed builder, :74-160); default = the row as a dict.
    """

    def __init__(
        self,
        transport: UpsertTransport,
        state_path: str,
        key_col: str,
        render: Callable[[dict], dict] | None = None,
        max_rows: int = 10_000,
    ) -> None:
        self.transport = transport
        self.state_path = state_path
        self.key_col = key_col
        self.render = render or (lambda row: row)
        self.max_rows = max_rows

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> dict:
        """foreachBatch body.  Collects the batch — the input contract
        is a REPORT table (one row per rendered group, config-sized),
        enforced by ``max_rows`` so a mis-wired raw stream fails fast
        instead of flooding the driver."""
        rows = batch_df.limit(self.max_rows + 1).collect()
        if len(rows) > self.max_rows:
            raise ValueError(
                f"upsert sink got > {self.max_rows} rows; it is meant "
                "for rendered report groups, not raw data"
            )
        state = _load_state(self.state_path)
        ids = state.setdefault("ids", {})
        created = updated = reposted = 0
        for row in rows:
            d = row.asDict(recursive=True)
            key = str(d[self.key_col])
            payload = self.render(d)
            external_id = ids.get(key)
            if external_id is None:
                ids[key] = self.transport.create(key, payload)
                created += 1
            else:
                try:
                    self.transport.update(external_id, payload)
                    updated += 1
                except NotFoundError:
                    ids[key] = self.transport.create(key, payload)
                    reposted += 1
        state["last_batch_id"] = batch_id
        _save_state(self.state_path, state)
        return {"created": created, "updated": updated, "reposted": reposted}

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        """Adapter for ``writeStream.foreachBatch`` (discards stats)."""

        def _f(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)

        return _f
