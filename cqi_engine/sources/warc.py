"""WARC-style Common-Crawl record source (another pages wire format).

Common Crawl ships WARC: concatenated records, each a header block
(`WARC/1.0`, named fields) + blank line + payload, separated by blank
lines.  This module reads uncompressed WARC files distributed:
`spark.read.text` with a custom record delimiter yields one record per
row, parsed to the pages schema inside a mapInPandas batch (no driver
JSON/regex).  Real Common-Crawl .warc.gz is a multi-member gzip whose
members align to records — the same parser applies after member split;
gzip member handling is a container concern, not an engine one.

The deterministic writer exists so tests can round-trip without external
data (no real crawl data in this sandbox).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .pages import PAGES_SCHEMA

_DELIM = "\r\n\r\n==WARC-RECORD-BOUNDARY==\r\n\r\n"


def write_warc(pages_pdf: pd.DataFrame, path: str) -> int:
    """Deterministic WARC-style file from a pages pandas frame (test
    fixture writer; one file, records in input order)."""
    recs = []
    for _, row in pages_pdf.iterrows():
        payload = row["text"]
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {row['url']}\r\n"
            f"WARC-Date: {row['warc_ts'].isoformat()}\r\n"
            f"Content-Length: {len(payload.encode('utf-8'))}\r\n"
            f"X-Crawler-Language: {row['lang']}\r\n"
        )
        recs.append(header + "\r\n" + payload)
    with open(path, "w", encoding="utf-8", newline="") as fh:
        fh.write(_DELIM.join(recs))
    return len(recs)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan -> pages table (url, warc_ts, html, text, lang).

    `lineSep` makes Spark split records at the boundary marker, so each
    task parses only its own records — the file is consumed in parallel by
    byte range like any text source.
    """
    raw = spark.read.option("lineSep", _DELIM).text(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for rec in pdf["value"]:
                if not rec or "WARC/1.0" not in rec:
                    continue
                head, _, payload = rec.partition("\r\n\r\n")
                fields = {}
                for line in head.split("\r\n")[1:]:
                    k, _, v = line.partition(": ")
                    fields[k] = v
                if not fields.get("WARC-Target-URI"):
                    # no URI, no identity: url is the pages table's
                    # non-null key (PAGES_SCHEMA / per-row invariant) —
                    # a keyless record is dropped, not emitted as NULL
                    continue
                # real crawls carry corrupt records; a malformed date
                # must quarantine THIS record's timestamp (NULL), not
                # kill the scan task for the whole byte range
                try:
                    ts = pd.Timestamp(fields.get("WARC-Date"))
                    ts = None if pd.isna(ts) else ts.to_pydatetime()
                except (ValueError, TypeError):
                    ts = None
                rows.append({
                    "url": fields.get("WARC-Target-URI"),
                    "warc_ts": ts,
                    "html": payload.encode("utf-8"),
                    "text": payload,
                    "lang": fields.get("X-Crawler-Language"),
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return raw.mapInPandas(parse, PAGES_SCHEMA)
