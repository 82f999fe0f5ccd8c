"""Cross-cluster sync — forward-sync a segment store to another store.

Reference: ``MiruSyncSender`` (``miru-sync-deployable/.../
MiruSyncSender.java:74-1152``): a sync sender walks each tenant
partition's WAL forward from a durable per-partition **progress
cursor**, ships the raw *activities* (not index bytes) to the
destination cluster's writer, which re-indexes them under its own id
space, and advances the cursor; re-delivery is safe because the
destination dedupes by activity key.

Spark-native re-expression over :class:`SegmentStore`:

- the source store's manifest-backed unit directories ARE the WAL: each
  live unit is an immutable chunk of turn rows with lineage, and the
  **cursor is the set of unit names already shipped** (kept in
  ``sync_progress.json`` beside the destination store, written
  tmp+rename so a crash mid-sync re-ships at most the in-flight round);
- a sync round reads ONLY the new units' ``docs`` parquet (the stored
  turn rows — the activity payload), strips source-cluster docints, and
  ``dest.append()``s them: the destination assigns its own composite
  docints exactly like the reference's destination writer;
- idempotency: re-shipped rows (crash replay, or a source merge
  compacting already-synced deltas into a ``merged_`` unit) are dropped
  by the destination's per-shard (conv_id, turn_idx) watermark — the
  same "destination dedupes by key" contract the reference relies on.

At scale each round moves only the delta units since the last cursor, so
sync cost is proportional to NEW data, never to store size; rounds are
one Spark read + one append job regardless of shard count.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from miru_spark.indexing.incremental import SegmentStore

TURN_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


class SyncSender:
    def __init__(
        self, src: SegmentStore, dest: SegmentStore, progress_path: str | None = None
    ):
        self.src = src
        self.dest = dest
        self.progress_path = progress_path or os.path.join(
            dest.path, "sync_progress.json"
        )

    # -- progress cursor ----------------------------------------------------

    def shipped_units(self) -> set[str]:
        if not os.path.exists(self.progress_path):
            return set()
        with open(self.progress_path) as f:
            return set(json.load(f)["units"])

    def _record(self, units: set[str]) -> None:
        tmp = self.progress_path + "._tmp"
        with open(tmp, "w") as f:
            json.dump({"units": sorted(units)}, f)
        os.replace(tmp, self.progress_path)

    # -- one sync round -----------------------------------------------------

    def pending_units(self) -> list[str]:
        """Source units not yet shipped (unit path is the cursor key,
        relative to the source root so the cursor survives moves)."""
        shipped = self.shipped_units()
        out = []
        for u in self.src.live_units():
            rel = os.path.relpath(u, self.src.path)
            if rel not in shipped:
                out.append(u)
        return sorted(out)

    def sync(self) -> dict:
        """Ship every pending unit's turn rows to the destination.

        Returns {"units": n_shipped, "rows": n_rows}. A no-op round
        (cursor current) costs zero Spark jobs."""
        pending = self.pending_units()
        if not pending:
            return {"units": 0, "rows": 0}
        docs = self.src.spark.read.parquet(*[f"{u}/docs" for u in pending])
        turns = docs.select(*TURN_COLS)
        n_rows = turns.count()
        self.dest.append(turns)
        shipped = self.shipped_units()
        shipped.update(os.path.relpath(u, self.src.path) for u in pending)
        self._record(shipped)
        return {"units": len(pending), "rows": n_rows}
