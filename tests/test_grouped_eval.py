"""Signature-grouped kernel evaluation must be row-for-row identical to
direct evaluation (dictionary-encoded rule execution, kernel/pipeline.py)."""

import numpy as np
import pandas as pd
import pytest

from cqi_engine.io import read_geojson_lines
from cqi_engine.kernel.pipeline import (_post_sidepath_stages,
                                        _signature_codes,
                                        post_sidepath_stages_grouped)

INPUT = "/root/reference/data/test_ways/test_ways.geojson"


def _norm(v):
    if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NA:
        return None
    return v


def _as_multiset(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.to_dict("records")),
        key=repr)
    return cols, rows


def _dup_corpus(reps: int, seed: int) -> pd.DataFrame:
    ways = read_geojson_lines(INPUT).drop(
        columns=["geom_lonlat", "geom_metric"])
    rng = np.random.default_rng(seed)
    parts = []
    for r in range(reps):
        part = ways.copy()
        part["id"] = [f"{i}__r{r}" for i in part["id"]]
        parts.append(part)
    df = pd.concat(parts, ignore_index=True)
    # shuffle row order and sprinkle both null spellings over one column
    df = df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    if "maxspeed" in df.columns:
        idx = rng.choice(len(df), size=len(df) // 10, replace=False)
        half = len(idx) // 2
        col = df.columns.get_loc("maxspeed")
        df.iloc[idx[:half], col] = None
        df.iloc[idx[half:], col] = np.nan
    return df


@pytest.mark.parametrize("offset_distance", [None, "realistic"])
def test_grouped_matches_direct(offset_distance):
    df = _dup_corpus(reps=8, seed=7)
    assert len(df) >= 256
    direct = _post_sidepath_stages(df.copy(), offset_distance=offset_distance)
    grouped = post_sidepath_stages_grouped(df.copy(),
                                           offset_distance=offset_distance)
    dc, dr = _as_multiset(direct)
    gc, gr = _as_multiset(grouped)
    assert dc == gc
    assert len(dr) == len(gr)
    assert dr == gr


def test_grouped_falls_back_below_thresholds():
    df = _dup_corpus(reps=1, seed=3)            # 138 rows < 256
    direct = _post_sidepath_stages(df.copy())
    grouped = post_sidepath_stages_grouped(df.copy())
    assert _as_multiset(direct) == _as_multiset(grouped)


def test_signature_codes_group_identical_tuples():
    df = pd.DataFrame({
        "a": ["x", "x", "y", None, np.nan, "x"],
        "b": [1.0, 1.0, 2.0, 3.0, 3.0, 1.0],
        "id": list("abcdef"),
    })
    codes, first = _signature_codes(df, ["a", "b"])
    assert codes[0] == codes[1] == codes[5]
    assert codes[3] == codes[4]          # None and nan are one null
    assert codes[2] != codes[0] and codes[3] != codes[0]
    assert list(first) == [0, 2, 3]


def _spark_multiset(df):
    cols = sorted(df.columns)
    rows = sorted((tuple(_norm(r[c]) for c in cols)
                   for r in df.collect()), key=repr)
    return cols, rows


def test_score_distinct_join_matches_direct(spark):
    """The JVM-dedup + signature-join scoring plan (kept for the regime
    where the Python boundary dominates; measured slower here — see its
    docstring) must be row-identical to the default Arrow-grouped path."""
    from pyspark.sql import functions as F

    from cqi_engine.operators.pipeline import (apply_sidepath_spark,
                                               sample_points,
                                               road_cell_index,
                                               dwithin_pairs,
                                               sidepath_aggregates,
                                               score_batches,
                                               score_distinct_join)
    from cqi_engine.sources.webways import ways_from_documents
    from cqi_engine import config as C

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    ways = ways_from_documents(docs).persist()
    paths = ways.filter(F.col("highway").isin(C.PATH_HIGHWAYS))
    roads = ways.filter(~F.col("highway").isin(C.ROAD_EXCLUDED_HIGHWAYS)
                        | F.col("highway").isNull())
    points = sample_points(paths).persist()
    pairs = dwithin_pairs(points, road_cell_index(roads), None).persist()
    agg = sidepath_aggregates(points, pairs)
    slim = ways.drop("geom_lonlat", "url")

    direct = score_batches(apply_sidepath_spark(slim, agg))
    via_join = score_distinct_join(slim, agg)
    assert _spark_multiset(direct) == _spark_multiset(via_join)
    for df in (ways, points, pairs):
        df.unpersist()


def test_score_distinct_join_low_dup_fallback(spark):
    """Below min_dup the plan must fall back (plan contains the Arrow-
    grouped stage over the full relation, not the signature join)."""
    from pyspark.sql import functions as F

    from cqi_engine.operators.pipeline import (sample_points,
                                               road_cell_index,
                                               dwithin_pairs,
                                               sidepath_aggregates,
                                               score_distinct_join)
    from cqi_engine.sources.webways import ways_from_documents
    from cqi_engine import config as C

    docs = spark.range(150).select(F.col("id").alias("doc_id"))
    ways = ways_from_documents(docs).persist()
    paths = ways.filter(F.col("highway").isin(C.PATH_HIGHWAYS))
    roads = ways.filter(~F.col("highway").isin(C.ROAD_EXCLUDED_HIGHWAYS)
                        | F.col("highway").isNull())
    points = sample_points(paths).persist()
    pairs = dwithin_pairs(points, road_cell_index(roads), None).persist()
    agg = sidepath_aggregates(points, pairs)
    slim = ways.drop("geom_lonlat", "url")
    # ~140 distinct tuples over 150 rows: duplication < 4x -> fallback
    out = score_distinct_join(slim, agg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__sig" not in plan
    assert out.count() > 0
    for df in (ways, points, pairs):
        df.unpersist()
