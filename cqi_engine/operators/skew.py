"""Explicit skew handling for the cell-bucketed spatial join (north_rule:
"skew handled by adaptive repartition on H3 cell histograms").

AQE's skew-join split is the backstop; this is the *explicit* mechanism:

1. ``cell_histogram``   — sampled per-cell point counts (one cheap agg);
2. ``hot_cells``        — cells above ``threshold`` x mean;
3. ``salt_points``      — points in hot cells get a salt in [0, k);
4. ``replicate_index``  — the build side duplicates hot-cell rows k times,
                          once per salt value,
so the join key becomes (cell, salt) and a single dense city cell fans out
over k reducers instead of one.

Dense-city skew is real at web scale: a res-9 H3 cell over Manhattan holds
orders of magnitude more geocoded pages than rural cells; without salting
one reducer owns the whole borough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_histogram(points: DataFrame, cell_col: str = "cell",
                   sample_fraction: float | None = None) -> DataFrame:
    src = points.sample(sample_fraction) if sample_fraction else points
    return src.groupBy(cell_col).agg(F.count("*").alias("cell_n"))


def hot_cells(hist: DataFrame, threshold: float = 8.0) -> DataFrame:
    """Cells with > threshold x mean load; returns (cell, salt_k)."""
    stats = hist.agg(F.avg("cell_n").alias("mean_n")).collect()[0]
    mean_n = stats["mean_n"] or 1.0
    return (hist.filter(F.col("cell_n") > threshold * mean_n)
            .select("cell",
                    F.least(F.ceil(F.col("cell_n") / (threshold * mean_n)),
                            F.lit(32)).cast("int").alias("salt_k")))


def salt_points(points: DataFrame, hot: DataFrame,
                cell_col: str = "cell", id_col: str = "way_id") -> DataFrame:
    """Deterministic salt per point: hash(id, pt_seq) % salt_k (no RNG —
    reruns must land identically for resume/lineage)."""
    joined = points.join(F.broadcast(hot), cell_col, "left")
    salt = F.when(
        F.col("salt_k").isNotNull(),
        F.pmod(F.xxhash64(F.col(id_col), F.col("pt_seq")),
               F.col("salt_k"))).otherwise(F.lit(0)).cast("int")
    return joined.withColumn("salt", salt).drop("cell_n", "salt_k")


def replicate_index(index: DataFrame, hot: DataFrame,
                    cell_col: str = "cell") -> DataFrame:
    """Build side: hot-cell rows replicated once per salt value."""
    joined = index.join(F.broadcast(hot), cell_col, "left")
    salts = F.when(F.col("salt_k").isNotNull(),
                   F.sequence(F.lit(0), F.col("salt_k") - 1)) \
        .otherwise(F.array(F.lit(0)))
    return (joined.withColumn("salts", salts)
            .withColumn("salt", F.explode("salts"))
            .withColumn("salt", F.col("salt").cast("int"))
            .drop("salts", "cell_n", "salt_k"))


def salted_join(points: DataFrame, index: DataFrame, on_extra: list,
                cell_col: str = "cell", threshold: float = 8.0,
                id_col: str = "way_id"):
    """points JOIN index ON (cell, salt, *on_extra) with histogram salting."""
    hist = cell_histogram(points, cell_col)
    hot = hot_cells(hist, threshold)
    p = salt_points(points, hot, cell_col, id_col)
    ix = replicate_index(index, hot, cell_col)
    cond = [p[cell_col] == ix[cell_col], p["salt"] == ix["salt"], *[
        c(p, ix) for c in on_extra]]
    # drop the build-side copies of the join keys so `cell` stays an
    # unambiguous (probe-side) column for downstream grouping
    return (p.join(ix.hint("shuffle_hash"), on=cond, how="inner")
            .drop(ix[cell_col]).drop(ix["salt"]))
