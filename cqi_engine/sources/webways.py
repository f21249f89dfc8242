"""documents -> pages -> scored ways: the flagship web-scale path.

Each row of the driver's ``documents`` table deterministically yields one
Common-Crawl-style page (url, warc_ts, html, text, lang — BASELINE.json
``input_hint`` shape) whose ``text`` embeds one OSM way record.  The way's
tags are drawn cyclically from the 138-way reference fixture corpus
(`/root/reference/data/test_ways/test_ways.geojson`, read-only input data),
and its geometry is shifted by a per-doc deterministic offset so that the
spatial join only ever matches ways synthesized from the same source doc
block — keeping the join selective at any scale.

Everything is distributed: the fixture corpus (138 tiny rows) ships to the
executors as a broadcast-style closure, and page synthesis + extraction +
scoring run in mapInPandas Arrow batches.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_geojson_lines
from .pages import PAGES_SCHEMA, page_row

FIXTURE_WAYS = "/root/reference/data/test_ways/test_ways.geojson"


@functools.lru_cache(maxsize=1)
def fixture_way_records() -> list[tuple[str, dict, list]]:
    """(way_id, tags, lonlat_coords) for the 138 fixture ways."""
    ways = read_geojson_lines(FIXTURE_WAYS).drop(columns=["geom_metric"])
    out = []
    for _, row in ways.iterrows():
        tags = {c: row[c] for c in ways.columns
                if c != "geom_lonlat" and row[c] is not None}
        out.append((str(tags.get("id", "way")), tags,
                    np.asarray(row["geom_lonlat"], dtype=float)))
    return out


def pages_from_documents(docs: DataFrame) -> DataFrame:
    """Distributed page synthesis: one page per document row."""
    fixtures = fixture_way_records()
    n_fix = len(fixtures)

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                base_id, tags, coords = fixtures[int(doc_id) % n_fix]
                clone = int(doc_id) // n_fix
                wid = base_id if clone == 0 else f"{base_id}__d{clone}"
                tags = dict(tags)
                tags["id"] = wid
                shifted = coords.copy()
                # 0.2 deg ~ 14 km per clone block: spatially disjoint
                shifted[:, 0] += 0.2 * clone
                rows.append(page_row(wid, tags, shifted.tolist()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return docs.select("doc_id").mapInPandas(gen, PAGES_SCHEMA)


def score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query: documents table -> scored way table."""
    from ..operators.pipeline import score_pages
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return score_pages(pages_from_documents(docs))
