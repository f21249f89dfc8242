"""Custom stateful streaming operator (SURVEY §2.10 engine addition):
gap-based sessionization with ``applyInPandasWithState``.

Spark has session windows, but the reference-derived requirement — emit a
session row carrying arbitrary per-session aggregates (count, value sum,
first/last type) exactly when the gap closes or the watermark passes — is
the canonical case for a custom stateful operator.  State per user_id:
(session_start_ms, last_ms, n_events, value_sum).  A session closes when a
new event arrives more than ``gap_ms`` after the last, or on state timeout
once the watermark clears the gap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start_ms", T.LongType()),
    T.StructField("session_end_ms", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("value_sum", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("start_ms", T.LongType()),
    T.StructField("last_ms", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("vsum", T.DoubleType()),
])

GAP_MS = 30 * 60 * 1000


def sessionize_fn(key, pdf_iter: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_ms, last_ms, n, vsum = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id, "session_start_ms": start_ms,
            "session_end_ms": last_ms, "n_events": n, "value_sum": vsum,
        }])
        return

    if state.exists:
        start_ms, last_ms, n, vsum = state.get
    else:
        start_ms = last_ms = None
        n, vsum = 0, 0.0

    closed = []
    seen_any = False
    for pdf in pdf_iter:
        pdf = pdf.sort_values("ms_ts")
        for ms, val in zip(pdf["ms_ts"], pdf["value"]):
            if pd.isna(ms):
                # NULL event time: the row has no position on the session
                # timeline (the watermark would eventually drop it anyway;
                # Spark still delivers it in the batch it arrives in) —
                # skip it instead of crashing int(NaN)
                continue
            seen_any = True
            ms = int(ms)
            if last_ms is not None and ms - last_ms > GAP_MS:
                closed.append({
                    "user_id": user_id, "session_start_ms": start_ms,
                    "session_end_ms": last_ms, "n_events": n,
                    "value_sum": vsum,
                })
                start_ms, n, vsum = ms, 0, 0.0
            if start_ms is None:
                start_ms = ms
            last_ms = ms
            n += 1
            if not pd.isna(val):  # SQL SUM semantics: NULLs don't poison
                vsum += float(val)

    if last_ms is None:
        # every row in this batch had NULL event time and no prior state:
        # nothing to hold, no timeout to arm (a timestamp is mandatory
        # for EventTimeTimeout state)
        assert not seen_any
        return

    state.update((start_ms, last_ms, n, vsum))
    # replayed/late batches: the watermark may already be past the natural
    # timeout — a timeout timestamp must be strictly ahead of the watermark
    state.setTimeoutTimestamp(max(last_ms + GAP_MS,
                                  state.getCurrentWatermarkMs() + 1))
    if closed:
        yield pd.DataFrame(closed)


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream (ts, user_id, value) -> closed-session rows."""
    from pyspark.sql import functions as F
    # watermarks require TIMESTAMP (tz-aware); parquet NTZ is cast first
    # (session tz is pinned to UTC by build_session)
    prepared = (events
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .withWatermark("ts", "2 hours")
                # keep the watermarked `ts` column itself — projecting it
                # away severs the watermark from the stateful operator
                .select(F.col("user_id"), F.col("ts"),
                        F.unix_millis(F.col("ts")).alias("ms_ts"),
                        F.col("value")))
    return (prepared.groupBy("user_id")
            .applyInPandasWithState(sessionize_fn, SESSION_SCHEMA,
                                    STATE_SCHEMA, "append",
                                    GroupStateTimeout.EventTimeTimeout))
