"""Spark end-to-end: pages -> extraction -> distributed spatial join ->
scoring, diffed against the golden corpus and the byte-identity invariant."""

import json

import numpy as np
import pandas as pd
import pytest

from cqi_engine.io import read_geojson_lines
from cqi_engine.sources.pages import pages_dataframe, synthesize_pages_pdf
from cqi_engine.operators.pipeline import score_pages

INPUT = "/root/reference/data/test_ways/test_ways.geojson"
GOLDEN = "/root/reference/data/test_ways/test_ways_alex.geojson"


@pytest.fixture(scope="module")
def fixture_pages(spark):
    ways = read_geojson_lines(INPUT).drop(columns=["geom_metric"])
    return pages_dataframe(spark, ways)


def test_text_byte_identity(spark, fixture_pages):
    """BASELINE per-row invariant: extracted text round-trips byte-identical
    per url through the engine's page handling."""
    rows = fixture_pages.select("url", "text", "html").collect()
    assert len(rows) == 138
    src = synthesize_pages_pdf(read_geojson_lines(INPUT).drop(columns=["geom_metric"]))
    by_url = dict(zip(src["url"], src["text"]))
    for r in rows:
        assert r["text"].encode("utf-8") == by_url[r["url"]].encode("utf-8")
        assert r["text"].encode("utf-8") in bytes(r["html"])


def test_spark_matches_golden(spark, fixture_pages):
    scored = score_pages(fixture_pages).toPandas()
    with open(GOLDEN, encoding="utf-8") as fh:
        golden = pd.DataFrame(
            [f["properties"] for f in json.load(fh)["features"]])
    assert len(scored) == len(golden) == 164

    def keyed(df):
        return {(i, s if s is not None and not (isinstance(s, float) and np.isnan(s)) else ""): r
                for (i, s), r in zip(zip(df["id"], df["side"]),
                                     df.to_dict("records"))}

    sm, gm = keyed(scored), keyed(golden)
    assert set(sm) == set(gm)
    mismatches = []
    for k, grow in gm.items():
        srow = sm[k]
        for col, gv in grow.items():
            sv = srow.get(col)
            gnull = gv is None or (isinstance(gv, float) and np.isnan(gv))
            snull = sv is None or (isinstance(sv, float) and np.isnan(sv)) or (sv is pd.NA)
            if gnull or snull:
                if gnull != snull:
                    mismatches.append((k, col, gv, sv))
                continue
            try:
                same = abs(float(gv) - float(sv)) < 1e-9
            except (TypeError, ValueError):
                same = str(gv) == str(sv)
            if not same:
                mismatches.append((k, col, gv, sv))
    assert not mismatches, f"{len(mismatches)}: {mismatches[:10]}"
