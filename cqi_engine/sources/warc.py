"""WARC-style Common-Crawl record source (another pages wire format).

Common Crawl ships WARC: concatenated records, each a header block
(`WARC/1.0`, named fields) + blank line + payload.  This module reads
WARC-style records distributed over an explicit boundary marker (the
write_warc framing): `spark.read.text` with a custom record delimiter
yields one record per row, parsed to the pages schema inside a
mapInPandas batch (no driver JSON/regex).  STANDARD blank-line /
Content-Length framing is NOT splittable by a text delimiter — read_warc
sniffs for it and fails loudly rather than collapsing a file to one row.
Real Common-Crawl .warc.gz is a multi-member gzip whose members align to
records — after member split the same header parser applies; gzip member
handling is a container concern, not an engine one.

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
        if _DELIM in payload:
            # a payload carrying the boundary marker is unrepresentable
            # in this framing: written verbatim it would split into two
            # records on read, silently truncating the text (breaking
            # the byte-identical per-url invariant).  Fail loudly.
            raise ValueError(
                f"write_warc: payload for url={row['url']!r} contains "
                "the record boundary marker; this framing cannot "
                "represent it")
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


def _sniff_framing(path: str) -> None:
    """Driver-side peek at the first input file: >=2 'WARC/1.0' headers
    with no boundary marker in the first MiB means standard WARC framing
    — refuse at plan time rather than losing data silently.  Unreadable
    paths (object stores, globs with no local match) skip the sniff; the
    per-record parser still runs."""
    import glob as _glob
    import os as _os
    cands = sorted(_glob.glob(path)) or [path]
    p = cands[0]
    if _os.path.isdir(p):
        inner = sorted(_glob.glob(_os.path.join(p, "*")))
        if inner:
            p = inner[0]
    try:
        # newline="" — universal-newline mode would fold the delimiter's
        # \r\n to \n and the marker test would false-positive on our own
        # boundary-framed files
        with open(p, encoding="utf-8", errors="replace", newline="") as fh:
            head = fh.read(1 << 20)
    except OSError:
        return
    if head.count("WARC/1.0") >= 2 and _DELIM not in head:
        raise ValueError(
            f"read_warc: {p} looks like a STANDARD-framed WARC (multiple "
            "records, no boundary markers) — this reader handles the "
            "write_warc boundary framing only and would collapse the "
            "file to one row; convert the input or use a Content-Length "
            "framing reader")


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan -> pages table (url, warc_ts, html, text, lang).

    `lineSep` makes Spark split records at the boundary marker, so each
    task parses only its own records — the file is consumed in parallel by
    byte range like any text source.

    PRECONDITION: the input uses this module's boundary framing (the
    write_warc format).  A STANDARD-framed WARC (records delimited by
    blank lines + Content-Length, no boundary markers) would otherwise
    collapse to one row per file with near-total silent data loss — so
    the scan sniffs the first file driver-side and fails loudly instead.
    """
    _sniff_framing(path)
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
