"""Distributed GeoJSON scan (S1 of SURVEY §2.1 at scale).

The reference loads one FeatureCollection file through OGR with a
LineString geometry-type filter (ref:cycling_quality_index.py:1452).  At
web scale the engine reads newline-delimited GeoJSON (GeoJSONL — one
Feature per line, the format our sink writes) with ``spark.read.text`` +
``from_json``: fully parallel, no driver-side JSON, filters/pruning pushed
to the text scan.  Classic FeatureCollection files are supported through a
small normalizer that splits them into lines first (driver-side, only for
legacy small files).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FEATURE_SCHEMA = T.StructType([
    T.StructField("type", T.StringType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    T.StructField("geometry", T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("coordinates",
                      T.ArrayType(T.ArrayType(T.DoubleType()))),
    ])),
])


def read_geojsonl(spark: SparkSession, path: str,
                  tag_columns: list[str]) -> DataFrame:
    """GeoJSONL -> way table (LineStrings only), distributed.

    Properties land in a MapType and are projected to typed columns, so
    adding a tag later is a column-pruned map lookup, not a schema change.
    """
    raw = spark.read.text(path)
    feats = raw.select(
        F.from_json(F.col("value"), _FEATURE_SCHEMA).alias("f"))
    # from_json is permissive (malformed lines parse to NULL and fall out
    # of the type filter); geometry VALIDITY needs its own guard — a
    # claimed LineString with missing coordinates or a single position is
    # invalid per the GeoJSON spec, and the reference's OGR loader never
    # yields such features, so the scan drops them rather than handing
    # the geometry kernels a NULL/degenerate vertex list.
    # ... and the INNER positions need the same care: a null position or
    # a 1-element position crashes/corrupts the vectorized kernels, and a
    # spec-valid 3D (lon, lat, elevation) position would interleave
    # garbage through the flatten-reshape fast path.  Matching OGR: drop
    # features with invalid positions, keep 3D ones but slice to XY.
    lines = feats.filter(
        (F.col("f.geometry.type") == "LineString")
        & F.col("f.geometry.coordinates").isNotNull()
        & (F.size("f.geometry.coordinates") >= 2)
        # ... including the ordinates: a JSON null inside a position
        # parses to a NULL array element and would flow into the
        # kernels as NaN — only the first two matter (3D slices to XY)
        & F.forall("f.geometry.coordinates",
                   lambda p: p.isNotNull() & (F.size(p) >= 2)
                   & F.get(p, 0).isNotNull() & F.get(p, 1).isNotNull()))
    geom = F.transform("f.geometry.coordinates", lambda p: F.slice(p, 1, 2))
    cols = [F.col("f.properties").getItem(c).alias(c) for c in tag_columns]
    return lines.select(*cols, geom.alias("geom_lonlat"))


def featurecollection_to_lines(src_path: str, dst_path: str) -> int:
    """Legacy FeatureCollection file -> GeoJSONL (driver-side, small files)."""
    with open(src_path, encoding="utf-8") as fh:
        fc = json.load(fh)
    n = 0
    with open(dst_path, "w", encoding="utf-8") as out:
        for feat in fc.get("features", []):
            out.write(json.dumps(feat, ensure_ascii=False) + "\n")
            n += 1
    return n


def merge_way_files(spark: SparkSession, paths: list[str],
                    tag_columns: list[str]) -> DataFrame:
    """S2 multi-file merge (ref:cycling_quality_index.py:1817-1833):
    enumerate way files, merge (`native:mergevectorlayers` -> unionByName)
    and drop duplicate geometries (`native:deleteduplicategeometries` ->
    dropDuplicates on a canonical geometry key).

    The dedupe key is the exact coordinate sequence serialized to a
    string — byte-stable, so two features are duplicates iff their
    vertex lists are identical (the QGIS semantic).  KEEP-FIRST is part
    of that semantic (deleteduplicategeometries keeps the first feature
    in layer order): the survivor is pinned by (file index, position in
    file), not by whichever row a shuffle partition delivers first —
    dropDuplicates would make the surviving TAGS nondeterministic when
    two imports carry the same geometry with different attributes."""
    if not paths:
        raise ValueError("merge_way_files: empty path list")
    frames = []
    for i, p in enumerate(paths):
        # layer order within one path entry: a path may expand to SEVERAL
        # files (directory/glob), and Spark packs file splits into
        # partitions by size DESCENDING — so monotonically_increasing_id
        # (partition << 33 | row) alone does NOT follow file-name order
        # across those files.  Key by (path index, file name, position):
        # file name is the declared layer order within a directory
        # (part-00000 < part-00001, the writer convention), and within
        # one file equal-size splits keep offset order under Spark's
        # stable size sort, so the mono id is a valid minor key.
        frames.append(read_geojsonl(spark, p, tag_columns)
                      .withColumn("_src", F.lit(i))
                      .withColumn("_file", F.input_file_name())
                      .withColumn("_pos", F.monotonically_increasing_id()))
    merged = frames[0]
    for f in frames[1:]:
        merged = merged.unionByName(f, allowMissingColumns=True)
    from pyspark.sql.window import Window
    geom_key = F.sha2(F.to_json(F.col("geom_lonlat")), 256)
    w = Window.partitionBy("_geom_key").orderBy("_src", "_file", "_pos")
    return (merged.withColumn("_geom_key", geom_key)
            .withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_geom_key", "_src", "_file", "_pos", "_rn"))
