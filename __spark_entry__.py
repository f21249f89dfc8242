"""Driver contract for the spark-graft builder (PySpark target).

`entry` runs the flagship documents->pages->spatial-join->CQI-scoring
pipeline at sf0.001.  `queries`/`oracle_sql` expose the full operator
catalog (cqi_engine.queries.catalog): every SQL-expressible operator ships
with a DuckDB oracle generated from the same dual-dialect template; the
full CQI scoring kernel, the stubbed media decode, and the numpy-blocked
ANN are rows-only (non-SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cqi_engine.queries.catalog import CATALOG, run_query  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cqi_engine.session import ship_package, tune_runtime
    from cqi_engine.sources.webways import score_documents
    ship_package(spark)
    tune_runtime(spark)
    return score_documents(spark, "/root/testdata/sf0.001")


def _make(qname: str) -> Callable[[SparkSession, str], DataFrame]:
    def _run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return run_query(spark, sf_dir, CATALOG[qname])
    _run.__name__ = f"query_{qname}"
    return _run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _make(name) for name in CATALOG}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per query (omitted for non-SQL-expressible ops)."""
    return {name: q.duck_sql for name, q in CATALOG.items()
            if q.duck_sql is not None}
