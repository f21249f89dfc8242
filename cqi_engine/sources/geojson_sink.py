"""GeoJSON sink (S3 of SURVEY §2.1): scored way table -> GeoJSON.

Small outputs collect to one FeatureCollection file (the reference's
QgsVectorFileWriter path, ref:cycling_quality_index.py:1806); large
outputs write distributed newline-delimited GeoJSON (one Feature per
line, the GeoJSONL convention) so no driver collect happens — each task
serializes its partition with ``to_json`` over a struct column, staying
JVM-side.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _feature_struct(df: DataFrame, geometry_col: str | None):
    props = [c for c in df.columns if c != geometry_col]
    prop_struct = F.struct(*[F.col(c) for c in props])
    if geometry_col is None:
        # no geometry member at all: every row takes the _no_geom path
        # and _null_geom splices the explicit '"geometry":null' after
        # serialization (a lit(None) member would be dropped by
        # ignoreNullFields anyway)
        return F.struct(F.lit("Feature").alias("type"),
                        prop_struct.alias("properties"))
    # a row-level NULL geometry must null the whole member: serializing
    # the struct as-is would emit {"type":"LineString"} with the
    # coordinates member dropped by ignoreNullFields — spec-invalid
    # (RFC 7946 §3.1.4 requires coordinates in every LineString)
    geom = F.when(
        F.col(geometry_col).isNotNull(),
        F.struct(F.lit("LineString").alias("type"),
                 F.col(geometry_col).alias("coordinates")))
    return F.struct(F.lit("Feature").alias("type"),
                    prop_struct.alias("properties"),
                    geom.alias("geometry"))


def _null_geom():
    """to_json's default ignoreNullFields drops null struct members, which
    is right for null PROPERTIES (OGR omits unset attributes) but
    spec-fatal for the geometry member: RFC 7946 requires every Feature to
    carry a "geometry" key, null or not, and strict parsers reject lines
    without it.  Keep the default for the feature body and splice an
    explicit "geometry":null into geometry-less features after
    serialization — both when the COLUMN is absent and when a ROW's
    geometry is NULL.  Built lazily: Column construction asserts an
    active SparkContext, so a module-level constant would crash any
    import that happens before a session exists."""
    return F.concat(F.expr("substring(value, 1, length(value) - 1)"),
                    F.lit(',"geometry":null}'))


def _features_json(df: DataFrame, gcol: str | None):
    feats = df.select(
        F.to_json(_feature_struct(df, gcol)).alias("value"),
        (F.lit(True) if gcol is None else F.col(gcol).isNull())
        .alias("_no_geom"))
    return feats.select(
        F.when(F.col("_no_geom"), _null_geom())
        .otherwise(F.col("value")).alias("value"))


def write_geojsonl(df: DataFrame, path: str,
                   geometry_col: str | None = "geom_lonlat") -> None:
    """Distributed newline-delimited GeoJSON (no driver materialization)."""
    gcol = geometry_col if geometry_col in df.columns else None
    _features_json(df, gcol).write.mode("overwrite").text(path)


def collect_feature_collection(df: DataFrame,
                               geometry_col: str | None = "geom_lonlat",
                               limit: int = 100_000) -> dict:
    """Driver-side FeatureCollection for small exports (golden-diff sized)."""
    gcol = geometry_col if geometry_col in df.columns else None
    rows = _features_json(df, gcol).limit(limit).collect()
    return {"type": "FeatureCollection",
            "features": [json.loads(r["value"]) for r in rows]}
