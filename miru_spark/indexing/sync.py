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

**Reverse (backfill) cursor**: the reference keeps forward AND reverse
progress per (tenant, partition) — when a sync relationship is created
against a tenant that already has history, the forward cursor starts at
the largest partition and ships new data, while the reverse cursor
walks partitions NEWEST-FIRST back toward the oldest, backfilling
history so recent data lands at the destination first
(``MiruSyncSender.java:74-112`` progress types,
``:530-565`` reverse traversal, ``:800`` ``partitionId.prev()``
advance, ``:843-856`` initial cursor pair commit). Spark-native twin:
:meth:`SyncSender.init_reverse` snapshots the source's current live
units as the backfill queue (newest-first, excluded from forward
rounds); each :meth:`SyncSender.sync_reverse` round pops the next
unit(s), ships only the rows the destination doesn't already hold (an
anti-join on the (conv_id, turn_idx) activity key — the same
destination-dedupes contract), and persists the shrunken queue
tmp+rename, so a crash mid-round re-ships at most the in-flight batch.
Backfilled rows land through :meth:`SegmentStore.repair`'s insert path
(their keys predate the destination watermark, so a plain append would
silently drop them as stale). If a source merge compacts queued units
away mid-backfill, the walker substitutes the covering ``merged_`` unit
and still ships through the repair path — see
:meth:`SyncSender._queue_live_map`.
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

    def _progress(self) -> dict:
        if not os.path.exists(self.progress_path):
            return {"units": [], "reverse_pending": None}
        with open(self.progress_path) as f:
            p = json.load(f)
        p.setdefault("reverse_pending", None)
        return p

    def shipped_units(self) -> set[str]:
        return set(self._progress()["units"])

    def _record(self, units: set[str], reverse_pending: list[str] | None) -> None:
        # the cursor may be written before the destination's first unit
        # (init_reverse on a fresh relationship) — ensure its dir exists
        os.makedirs(os.path.dirname(self.progress_path) or ".", exist_ok=True)
        tmp = self.progress_path + "._tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"units": sorted(units), "reverse_pending": reverse_pending}, f
            )
        os.replace(tmp, self.progress_path)

    # -- one sync round -----------------------------------------------------

    def pending_units(self) -> list[str]:
        """Source units not yet shipped (unit path is the cursor key,
        relative to the source root so the cursor survives moves).
        Units queued for the reverse walker are NOT forward-pending —
        each cursor owns its direction, like the reference's paired
        forward/reverse progress records."""
        p = self._progress()
        shipped = set(p["units"])
        rq = set(p["reverse_pending"] or [])
        out = []
        for u in self.src.live_units():
            rel = os.path.relpath(u, self.src.path)
            if rel not in shipped and rel not in rq:
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
        p = self._progress()
        shipped = set(p["units"])
        shipped.update(os.path.relpath(u, self.src.path) for u in pending)
        self._record(shipped, p["reverse_pending"])
        return {"units": len(pending), "rows": n_rows}

    # -- reverse (backfill) rounds ------------------------------------------

    def init_reverse(self) -> int:
        """Start a backfill: snapshot the source's CURRENT live units as
        the reverse queue, newest-first (highest unit index — the
        newest data — ships first, the reference's reverse traversal
        order), excluding anything already shipped. Idempotent: a
        second call while a queue exists is a no-op. Returns the queue
        length."""
        p = self._progress()
        if p["reverse_pending"] is not None:
            return len(p["reverse_pending"])
        shipped = set(p["units"])
        rels = [
            os.path.relpath(u, self.src.path)
            for u in self.src.live_units()
        ]
        queue = sorted(
            (r for r in rels if r not in shipped),
            key=lambda r: (self.src._unit_span(os.path.basename(r))[1], r),
            reverse=True,
        )
        self._record(shipped, queue)
        return len(queue)

    def _queue_live_map(self) -> tuple[list[str], dict]:
        """Map the persisted reverse queue onto LIVE source units.

        A source merge may compact queued deltas into a ``merged_``
        unit. The queued rows still exist — inside the covering unit —
        but letting them ride that unit through the watermark-gated
        forward ``append`` would silently drop every key below the
        destination watermark once newer data has forward-shipped
        (permanent loss). So a queued unit that is no longer live is
        SUBSTITUTED by its covering live unit (same shard dir, span
        containment — the merge that consumed it) and backfilled
        through the same anti-join + repair path as any other queued
        unit. Substitution is safe even if the covering unit also
        carries already-delivered rows: the key anti-join arbitrates
        them to already-present.

        Returns ``(effective_queue, covers)`` where
        ``covers[eff_unit]`` lists the original queue entries that
        unit carries (cursor bookkeeping) and ``covers[None]`` lists
        entries with NO covering unit left on disk (vacuumed /
        expunged away at the source — nothing exists to ship)."""
        p = self._progress()
        raw = p["reverse_pending"] or []
        if not raw:
            return [], {}
        live = {
            os.path.relpath(u, self.src.path) for u in self.src.live_units()
        }
        spans = {r: self.src._unit_span(os.path.basename(r)) for r in live}
        queue: list[str] = []
        covers: dict = {}
        for r in raw:
            if r in live:
                eff = r
            else:
                shard_dir = os.path.dirname(r)
                lo, hi = self.src._unit_span(os.path.basename(r))
                eff = next(
                    (
                        c
                        for c in sorted(live)
                        if os.path.dirname(c) == shard_dir
                        and spans[c][0] <= lo
                        and hi <= spans[c][1]
                    ),
                    None,
                )
            if eff not in covers and eff is not None:
                queue.append(eff)
            covers.setdefault(eff, []).append(r)
        return queue, covers

    def reverse_pending(self) -> list[str]:
        """Reverse-queue unit names still to backfill (newest-first),
        mapped onto live units (a compacted queued delta appears as its
        covering ``merged_`` unit); empty when no queue is active or
        the walk is done."""
        return self._queue_live_map()[0]

    def sync_reverse(self, batch: int = 1) -> dict:
        """One backfill round: ship the next ``batch`` queued units'
        rows that the destination does not already hold.

        The key anti-join (conv_id, turn_idx) makes re-delivery safe —
        a crash after the repair but before the cursor write re-ships
        the same unit and every row arbitrates to already-present.
        Rows land via ``dest.repair`` (plain-insert arbitration), since
        their keys predate the destination's shard watermarks. When the
        walk completes, the queue is CLOSED (``reverse_pending`` reset
        to None) so a later :meth:`init_reverse` can start a fresh
        backfill."""
        queue, covers = self._queue_live_map()
        take = queue[:batch]
        p = self._progress()
        if not take:
            if p["reverse_pending"] is not None:
                # walk done (or every remaining entry vacuumed away at
                # the source): close the queue
                self._record(set(p["units"]), None)
            return {"units": 0, "rows": 0}
        docs = self.src.spark.read.parquet(
            *[os.path.join(self.src.path, r, "docs") for r in take]
        )
        turns = docs.select(*TURN_COLS)
        if self.dest.live_units():
            held = self.dest.load().docs.select("conv_id", "turn_idx")
            fresh = turns.join(held, ["conv_id", "turn_idx"], "left_anti")
            n_rows = fresh.count()
            if n_rows:
                self.dest.repair(fresh)
        else:
            n_rows = turns.count()
            self.dest.append(turns)
        # Cursor bookkeeping: a shipped unit counts as forward-shipped
        # too (a substituted merged_ unit is FULLY delivered by the
        # anti-join path, so forward need not re-append it), and every
        # original queue entry a shipped unit covers leaves the queue —
        # as do entries with nothing left on disk to ship.
        shipped = set(p["units"])
        shipped.update(take)
        done = {orig for eff in take for orig in covers.get(eff, [])}
        done.update(covers.get(None, []))
        rest = [r for r in (p["reverse_pending"] or []) if r not in done]
        self._record(shipped, rest or None)
        return {"units": len(take), "rows": n_rows}
