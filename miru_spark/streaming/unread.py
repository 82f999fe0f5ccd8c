"""Inbox / unread tracking as a custom stateful streaming operator.

Reference semantics (enterstudio/miru): per-streamId inbox and unread
bitmaps updated by ACTIVITY / READ / UNREAD / MARK_ALL_READ event types
(``MiruInboxIndex.java:12``, ``MiruUnreadTrackingIndex``, event types in
``MiruPartitionedActivity.java:12-23``); a READ applies a mask of
everything up to a position, MARK_ALL_READ clears.

Spark-native: ``applyInPandasWithState`` keyed by (user_id, stream_id).
State is COMPACT — (n_msgs counter, last_read watermark, max delivered
id, pending ids above the watermark) — O(unread), never O(history): a
hot key (bot inbox) that keeps reading what it receives holds near-zero
state forever, the same property the reference gets from masking a
Roaring bitmap with the read watermark (``MiruUnreadTrackingIndex``
applyRead). Delivered ids at or below ``last_read`` are counted and
dropped; ids above it are the unread set, pruned every time the
watermark rises.

Event rows: (stream_id string, user_id long, kind 'msg'|'read'|
'mark_all_read', msg_id long, ts timestamp).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, stream_id string, n_msgs int, unread int, last_read long"
STATE_SCHEMA = (
    "n_msgs int, last_read long, max_seen long, pending array<long>"
)


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    user_id, stream_id = key
    if state.exists:
        n_msgs, last_read, max_seen, pending = state.get
        pending = list(pending)
    else:
        n_msgs, last_read, max_seen, pending = 0, -1, -1, []

    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "msg_id"])
        for kind, msg_id in zip(pdf["kind"], pdf["msg_id"]):
            if kind == "msg":
                m = int(msg_id)
                n_msgs += 1
                max_seen = max(max_seen, m)
                if m > last_read:  # at-or-below-watermark arrivals are read
                    pending.append(m)
            elif kind == "read":
                last_read = max(last_read, int(msg_id))
            elif kind == "mark_all_read":
                # reference semantics: clears everything DELIVERED so far
                last_read = max(last_read, max_seen)

    # prune to the unread set — this is the state-size bound
    pending = [m for m in pending if m > last_read]
    state.update((n_msgs, last_read, max_seen, pending))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "stream_id": [stream_id],
            "n_msgs": [n_msgs],
            "unread": [len(pending)],
            "last_read": [last_read],
        }
    )


def unread_counts(events: DataFrame) -> DataFrame:
    """Streaming DF of per-(user, stream) inbox state; attach a sink."""
    return events.groupBy("user_id", "stream_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
