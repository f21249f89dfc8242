"""Bucketed-table co-location (SURVEY §4: pre-partitioned joins).

At 100 TB the way table and its derived artifacts (check points, pair
lists, per-cell aggregates) are joined on the same keys round after round.
Writing both sides bucketed on the join key lets every subsequent join run
WITHOUT a shuffle — Spark matches bucket specs and plans a SortMergeJoin
whose children are plain scans (no Exchange), verified by
tests/test_plan_audit.py::test_bucketed_join_has_no_exchange.

Buckets are the static sibling of AQE: the cluster pays the partitioning
once at write time instead of per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 16, path: str | None = None,
                   partition_by: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist `df` as a bucketed+sorted table on `key` (external when
    `path` given — the warehouse dir is a static conf).

    `partition_by` + mode="append" is the incremental-index shape
    (streaming/dedup.py): each append lands a NEW partition directory of
    bucketed files, so per-partition visibility can be gated externally
    (manifest) while every reader still gets the table-level bucket spec
    — joins on `key` co-locate without an Exchange on this side."""
    writer = (df.write.mode(mode)
              .bucketBy(n_buckets, key).sortBy(key)
              .format("parquet"))
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables — planned without any Exchange."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
