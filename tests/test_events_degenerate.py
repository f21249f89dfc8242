"""Degenerate-event equivalence for the event-analytics family.

Event streams at scale carry NULL timestamps (clock loss), NULL user ids
(anonymous traffic), NULL event types, NULL values, and exact-timestamp
ties.  Unlike the documents/embeddings sweeps this one found no defects —
the family is pure window/aggregate SQL — but it pins the NULL-group and
tie-break semantics (NULL user_id is a real group; equal-ts events split
deterministically) so a future template edit cannot silently diverge the
dialects on dirty data.
"""

import datetime

import duckdb
import pytest

from cqi_engine.queries.catalog import CATALOG, run_query

QUERIES = ["events_hourly", "events_sessionize", "events_majority",
           "events_mode", "events_argmax_rank", "events_percentiles",
           "props_extract"]


def _ts(minutes):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(minutes=minutes)


ROWS = [
    (0, _ts(0), 1, "click", 1.0, '{"k":1}'),
    (1, _ts(1), 1, "click", 2.0, None),        # NULL props
    (2, _ts(2), 1, None, 3.0, '{}'),           # NULL event_type
    (3, None, 1, "view", 4.0, '{}'),           # NULL ts
    (4, _ts(3), None, "view", 5.0, '{}'),      # NULL user_id
    (5, _ts(3), 2, "view", None, '{}'),        # NULL value
    (6, _ts(3), 2, "view", 6.0, '{}'),         # exact-ts tie ...
    (7, _ts(3), 2, "buy", 7.0, '{}'),          # ... across types
    (8, _ts(90), 2, "view", 8.0, '{}'),        # gap -> new session
    (9, _ts(91), 3, "buy", 9.0, '{}'),
    # dirty props for props_extract: Spark's get_json_object NULLs
    # malformed JSON where DuckDB's json_extract_string raises, and
    # DuckDB's string->bigint cast ROUNDS '3.5' where Spark NULLs it —
    # both pinned in the template (json_valid guard + integral regexp)
    (10, _ts(92), 3, "buy", 1.0, 'not json at all'),
    (11, _ts(93), 3, "buy", 1.0, '{broken'),
    (12, _ts(94), 3, "buy", 1.0, '{"k": 3.5}'),
    (13, _ts(95), 3, "buy", 1.0, '{"k": "12"}'),
    (14, _ts(96), 3, "buy", 1.0, '{"k": null}'),
    (15, _ts(97), 3, "buy", 1.0, '[]'),
    # integral SHAPE but wider than int64: passes the regexp guard, so
    # the cast inside it must be try_cast — a plain cast THROWS in both
    # dialects (Spark ANSI overflow, DuckDB ConversionException).
    # Pinned: wider-than-int64 -> NULL, the row still counts in n.
    (16, _ts(98), 3, "buy", 1.0, '{"k": "12345678901234567890"}'),
    (17, _ts(99), 3, "buy", 1.0, '{"k": -99999999999999999999}'),
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("degenerate_events")
    ev = spark.createDataFrame(
        ROWS, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    ev.coalesce(1).write.mode("overwrite").parquet(
        str(root / "events.parquet"))
    return str(root)


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple(
            None if v is None
            else (round(v, 6) if isinstance(v, float) else str(v))
            for v in r))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name", QUERIES)
def test_event_query_matches_oracle_on_degenerate_events(spark, corpus_dir,
                                                         name):
    got = _norm(run_query(spark, corpus_dir, CATALOG[name]).collect())
    con = duckdb.connect()
    con.sql("create view events as select * from "
            f"'{corpus_dir}/events.parquet/*.parquet'")
    want = _norm(con.sql(CATALOG[name].duck_sql).fetchall())
    assert got == want
    assert got  # every query produces rows on this corpus
