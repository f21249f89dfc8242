"""Custom stateful streaming operator (SURVEY §2.10 engine addition):
gap-based sessionization with ``applyInPandasWithState``.

Spark has session windows, but the reference-derived requirement — emit a
session row carrying arbitrary per-session aggregates (count, value sum)
exactly when the watermark proves the session can no longer change — is
the canonical case for a custom stateful operator.

Semantics (why state holds a LIST of intervals, not one open session):

* Arrow chunk boundaries within a group are arbitrary (shuffle order) and
  late-but-within-watermark events are DELIVERED by Spark, not dropped —
  so "newest event extends the tail" is wrong.  Every event is a
  [ms, ms] interval; a linear sweep over (state ∪ batch) intervals sorted
  by start merges everything closer than the gap.
* A gap between two merged intervals does NOT by itself close the earlier
  one: a later batch may still deliver an event inside or adjacent to it
  (anything ≥ the watermark is admissible).  Emitting on gap alone
  double-emits exactly the sessions a late arrival would have extended.
  A session is FINAL — emitted and dropped from state — only once
  ``session_end + gap < watermark``: every future event has
  ``ms ≥ watermark``, so nothing can merge with it anymore.
* The state timeout is armed at the earliest pending expiry
  (min(end) + gap, clamped above the current watermark), so sessions
  flush as soon as the watermark proves them final even if the user goes
  quiet.

At 100 TB this is the same shape Spark's own session windows use:
per-key state is O(live sessions per user) — bounded by the watermark
horizon — and everything shuffles once on user_id.
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

# column-parallel arrays: interval i is (start_ms[i], last_ms[i], n[i],
# vsum[i]); all not-yet-watermark-expired sessions for the key
STATE_SCHEMA = T.StructType([
    T.StructField("start_ms", T.ArrayType(T.LongType())),
    T.StructField("last_ms", T.ArrayType(T.LongType())),
    T.StructField("n", T.ArrayType(T.LongType())),
    T.StructField("vsum", T.ArrayType(T.DoubleType())),
    # non-NULL value count: SUM over only NULLs is NULL, not 0.0 — the
    # emit needs to know whether vsum ever saw a value
    T.StructField("nv", T.ArrayType(T.LongType())),
])

GAP_MS = 30 * 60 * 1000


def sessionize_fn(key, pdf_iter: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key

    items: list[tuple[int, int, int, float, int]] = []
    if not state.hasTimedOut:
        for pdf in pdf_iter:
            for ms, val in zip(pdf["ms_ts"], pdf["value"]):
                if pd.isna(ms):
                    # NULL event time: the row has no position on the
                    # session timeline (the watermark would eventually
                    # drop it anyway; Spark still delivers it in the
                    # batch it arrives in) — skip it, don't crash int(NaN)
                    continue
                # SQL SUM semantics: NULL values don't poison the sum;
                # nv tracks whether the sum ever saw a real value (SUM of
                # only NULLs must come out NULL, not 0.0)
                items.append((int(ms), int(ms), 1,
                              0.0 if pd.isna(val) else float(val),
                              0 if pd.isna(val) else 1))
    if state.exists:
        starts, ends, ns, vs, nvs = state.get
        items.extend(zip(starts, ends, ns, vs, nvs))

    if not items:
        # every row in this batch had NULL event time and no prior state:
        # nothing to hold, no timeout to arm (a timestamp is mandatory
        # for EventTimeTimeout state)
        return

    items.sort(key=lambda t: (t[0], t[1]))
    merged = []
    cs, ce, cn, cv, cnv = items[0]
    for s, e, n2, v2, nv2 in items[1:]:
        if s - ce <= GAP_MS:
            ce, cn, cv, cnv = max(ce, e), cn + n2, cv + v2, cnv + nv2
        else:
            merged.append((cs, ce, cn, cv, cnv))
            cs, ce, cn, cv, cnv = s, e, n2, v2, nv2
    merged.append((cs, ce, cn, cv, cnv))

    # final iff no admissible future event (ms >= wm) can merge:
    # merge needs ms - end <= gap, impossible once end + gap < wm
    wm = state.getCurrentWatermarkMs()
    expired = [m for m in merged if m[1] + GAP_MS < wm]
    live = [m for m in merged if m[1] + GAP_MS >= wm]

    if live:
        state.update(([m[0] for m in live], [m[1] for m in live],
                      [m[2] for m in live], [m[3] for m in live],
                      [m[4] for m in live]))
        # earliest pending expiry; replayed/late batches: the timeout
        # timestamp must be strictly ahead of the current watermark
        state.setTimeoutTimestamp(
            max(min(m[1] + GAP_MS for m in live), wm + 1))
    elif state.exists:
        # every interval flushed (timeout path, or a pure-state rerun)
        state.remove()

    if expired:
        # NaN converts to SQL NULL on the Arrow path — the all-NULL-value
        # session emits value_sum NULL exactly like SUM(value) would
        yield pd.DataFrame([{
            "user_id": user_id, "session_start_ms": s,
            "session_end_ms": e, "n_events": n,
            "value_sum": (v if nv > 0 else None),
        } for s, e, n, v, nv in expired])


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
