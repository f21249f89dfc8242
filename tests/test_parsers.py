"""Tag-parsing unit fixtures (FIXTURES.md §5, bit-for-bit)."""

import numpy as np
import pandas as pd
import pytest

from cqi_engine.geometry import lonlat_to_metric, metric_to_lonlat
from cqi_engine.kernel.sidepath import determine_maxspeed_value
from cqi_engine.parse import (falsy, first_nonfalsy, get_number,
                              last_lane_value, split_both_to_sides,
                              weakest_surface_value)


@pytest.mark.parametrize("raw,expected", [
    ("50", 50.0), ("6.5", 6.5), ("", None), ("wide", None),
    ("6.5 m", None),  # getNumber is a plain float() cast (ref:definitions.py:77)
    ("50;70", None), (None, None),
])
def test_get_number(raw, expected):
    out = get_number(pd.Series([raw], dtype=object))[0]
    if expected is None:
        assert pd.isna(out)
    else:
        assert out == expected


@pytest.mark.parametrize("ms,hw,expected", [
    ("walk", "residential", 10.0),
    ("none", "unclassified", 299.0),
    (None, "living_street", 10.0),
    ("", "living_street", 10.0),
    ("DE:rural", "unclassified", None),   # golden sr18: not parsed
    ("50;70", "tertiary", None),          # golden sr07: not parsed
    ("30", "residential", 30.0),
])
def test_determine_maxspeed(ms, hw, expected):
    out = determine_maxspeed_value(ms, hw)
    if expected is None:
        assert np.isnan(out)
    else:
        assert out == expected


@pytest.mark.parametrize("values,expected", [
    ("asphalt;sett", "sett"),
    ("cobblestone;sand", "sand"),
    ("asphalt;gravel;sand;mud", "sand"),
    ("asphalt", "asphalt"),
    ("cheese", None),
])
def test_weakest_surface(values, expected):
    assert weakest_surface_value(values) == expected


def test_last_lane_value():
    out = last_lane_value(pd.Series(["a|b|2.5"], dtype="string"))[0]
    assert out == 2.5


def test_falsy_matrix():
    s = pd.Series([None, "", "x", 0, "0"], dtype=object)
    assert list(falsy(s)) == [True, True, False, True, False]


def test_both_split():
    both = pd.Series(["lane", None], dtype=object)
    left = pd.Series([None, "street"], dtype=object)
    right = pd.Series(["no", None], dtype=object)
    l, r = split_both_to_sides(both, left, right)
    assert list(l) == ["lane", "street"]
    assert list(r) == ["no", None]


def test_first_nonfalsy():
    a = pd.Series([None, "", "x"], dtype=object)
    b = pd.Series(["y", "z", "w"], dtype=object)
    assert list(first_nonfalsy(a, b)) == ["y", "z", "x"]


def test_projection_roundtrip():
    lon = np.array([13.5, 13.7301, 15.0])
    lat = np.array([51.05, 51.11, 0.0])
    x, y = lonlat_to_metric(lon, lat)
    # natural origin of UTM33
    assert abs(x[2] - 500000.0) < 1e-6 and abs(y[2]) < 1e-6
    lon2, lat2 = metric_to_lonlat(x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
