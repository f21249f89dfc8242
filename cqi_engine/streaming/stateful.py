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

    # Arrow chunk boundaries within a group are arbitrary (shuffle
    # order), and late-but-within-watermark events are DELIVERED by
    # Spark, not dropped — so neither per-chunk sorting nor "newest
    # event extends the tail" holds.  Treat the problem as interval
    # merging instead: every event is a [ms, ms] interval, the open
    # session in state is a [start, last] interval, and a linear sweep
    # over the intervals sorted by start merges everything closer than
    # the gap.  Out-of-order arrivals then extend/backfill the open
    # session instead of regressing its clock (which double-emitted
    # sessions and re-armed the timeout in the past).
    items: list[tuple[int, int, int, float]] = []
    for pdf in pdf_iter:
        for ms, val in zip(pdf["ms_ts"], pdf["value"]):
            if pd.isna(ms):
                # NULL event time: the row has no position on the session
                # timeline (the watermark would eventually drop it anyway;
                # Spark still delivers it in the batch it arrives in) —
                # skip it instead of crashing int(NaN)
                continue
            ms = int(ms)
            # SQL SUM semantics: NULL values don't poison the sum
            items.append((ms, ms, 1, 0.0 if pd.isna(val) else float(val)))
    if state.exists:
        items.append(tuple(state.get))

    if not items:
        # every row in this batch had NULL event time and no prior state:
        # nothing to hold, no timeout to arm (a timestamp is mandatory
        # for EventTimeTimeout state)
        return

    items.sort(key=lambda t: (t[0], t[1]))
    closed = []
    cs, ce, cn, cv = items[0]
    for s, e, n2, v2 in items[1:]:
        if s - ce <= GAP_MS:
            ce, cn, cv = max(ce, e), cn + n2, cv + v2
        else:
            closed.append({
                "user_id": user_id, "session_start_ms": cs,
                "session_end_ms": ce, "n_events": cn, "value_sum": cv,
            })
            cs, ce, cn, cv = s, e, n2, v2

    state.update((cs, ce, cn, cv))
    # replayed/late batches: the watermark may already be past the natural
    # timeout — a timeout timestamp must be strictly ahead of the watermark
    state.setTimeoutTimestamp(max(ce + GAP_MS,
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
