"""Empty-input robustness for the driver-logic catalog queries.

At web scale an empty relation is a normal runtime state, not an edge
case — a snapshot with zero new files, a partition-pruned read, a filter
that matches nothing.  Pure-SQL catalog entries degrade to zero rows by
construction (Catalyst semantics), but the fn-backed queries run driver
Python (density heuristics, collected query blocks, block-count
arithmetic) that can crash on an empty table even though the distributed
plan would have been fine — knn_blocked divided by a zero site density
and ann_topk_blocked built a 0-d query matrix before this test existed.

The sweep runs EVERY fn-backed query (the set is derived from the
catalog, so a new fn entry is covered automatically) against a 0-row
mirror of the test tables and requires an empty result, not an exception.
"""

import os

import pytest

from cqi_engine.queries.catalog import CATALOG, run_query

SRC_SF = os.environ.get("CQI_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """0-row parquet mirror with the real tables' schemas."""
    root = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        (spark.read.parquet(f"{SRC_SF}/{t}.parquet").limit(0)
         .coalesce(1).write.mode("overwrite")
         .parquet(str(root / f"{t}.parquet")))
    return str(root)


def _fn_backed():
    return sorted(n for n, q in CATALOG.items() if q.fn is not None)


@pytest.mark.parametrize("name", _fn_backed())
def test_fn_query_empty_input_yields_zero_rows(spark, empty_sf, name):
    assert run_query(spark, empty_sf, CATALOG[name]).count() == 0


def test_sql_query_empty_input_control(spark, empty_sf):
    # one pure-SQL control so a broken mirror fails loudly here, not in
    # a confusing fn-query traceback
    assert run_query(spark, empty_sf, CATALOG["knn_sites"]).count() == 0
