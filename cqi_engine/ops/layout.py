"""Storage layout for scan pruning (SURVEY §4: partition pruning +
min/max skipping on cell-sorted data).

Two cooperating mechanisms, both plain Spark:

* ``write_cell_partitioned`` — directory partitioning on a coarse cell
  bucket: a cell-range predicate prunes whole directories at planning
  time (`PartitionFilters` in the scan, audited).
* within each partition the rows are sorted by the fine cell id
  (``sortWithinPartitions``), so parquet row-group min/max statistics
  skip pages for narrow cell ranges (`PushedFilters`).

This is the parquet rendering of Iceberg's partition-spec + sort-order;
swapping the writer for `writeTo(...).partitionedBy(...)` keeps the
layout discipline identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_cell_partitioned(df: DataFrame, path: str, cell_col: str = "cell",
                           bucket_div: int = 100) -> None:
    """Partition directories on cell//bucket_div, sort files by cell.

    floor(), not a double-divide cast: CAST(x AS LONG) truncates toward
    zero, so negative cell ids (south/west of the origin — np.floor cell
    assignment produces them) would land in a bucket one off from the
    Python `//` floor the read side prunes with, silently losing rows.
    """
    (df.withColumn("cell_bucket",
                   F.floor(F.col(cell_col) / F.lit(bucket_div))
                   .cast("long"))
     .repartition("cell_bucket")
     .sortWithinPartitions(cell_col)
     .write.mode("overwrite")
     .partitionBy("cell_bucket")
     .parquet(path))


def read_cell_range(spark: SparkSession, path: str, lo: int, hi: int,
                    cell_col: str = "cell",
                    bucket_div: int = 100) -> DataFrame:
    """Range read that engages both pruning layers: the bucket predicate
    prunes directories, the cell predicate prunes row groups."""
    return (spark.read.parquet(path)
            .filter((F.col("cell_bucket") >= lo // bucket_div)
                    & (F.col("cell_bucket") <= hi // bucket_div))
            .filter((F.col(cell_col) >= lo) & (F.col(cell_col) <= hi)))
