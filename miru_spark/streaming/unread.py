"""Inbox / unread tracking as a custom stateful streaming operator.

Reference semantics (enterstudio/miru): per-streamId inbox and unread
bitmaps updated by ACTIVITY / READ / UNREAD / MARK_ALL_READ event types
(``MiruInboxIndex.java:12``, ``MiruUnreadTrackingIndex``, event types in
``MiruPartitionedActivity.java:12-23``); a READ applies a mask of
everything up to a position, MARK_ALL_READ clears.

Spark-native: ``applyInPandasWithState`` keyed by (user_id, stream_id).
State = (delivered msg ids, last_read watermark) — the unread set is
"ids > nothing-read-yet minus masked" exactly like the reference's
bitmap andNot. Here state stores the id list (fine for inbox-sized
groups; the at-scale variant swaps in a compressed id-set — the same
upgrade path as the reference's Roaring bitmaps).

Event rows: (stream_id string, user_id long, kind 'msg'|'read'|
'mark_all_read', msg_id long, ts timestamp).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, stream_id string, n_msgs int, unread int, last_read long"
STATE_SCHEMA = "msg_ids array<long>, last_read long"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    user_id, stream_id = key
    if state.exists:
        msg_ids, last_read = state.get
        msg_ids = list(msg_ids)
    else:
        msg_ids, last_read = [], -1

    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "msg_id"])
        for kind, msg_id in zip(pdf["kind"], pdf["msg_id"]):
            if kind == "msg":
                msg_ids.append(int(msg_id))
            elif kind == "read":
                last_read = max(last_read, int(msg_id))
            elif kind == "mark_all_read":
                if msg_ids:
                    last_read = max([last_read] + msg_ids)

    state.update((msg_ids, last_read))
    unread = sum(1 for m in msg_ids if m > last_read)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "stream_id": [stream_id],
            "n_msgs": [len(msg_ids)],
            "unread": [unread],
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
