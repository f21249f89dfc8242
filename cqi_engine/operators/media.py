"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct.  The Spark-side plumbing (schema, Arrow batch shape, partitioning)
is real; the actual codec step is STUBBED — the sandbox has no image/audio
libraries — behind ``_decode_payload``, which produces deterministic fake
features so the pipeline stays testable end-to-end.  Swap the stub for a
real decoder (PIL / torchaudio / pyav) in production.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])

HAVE_REAL_CODECS = False  # PIL/libav not present in this container


def _decode_payload(payload: bytes) -> dict:
    """STUB decoder: deterministic fake image metadata + 8-dim feature.

    A real implementation would dispatch on magic bytes and call the codec;
    raising NotImplementedError here would break the smoke path, so the
    stub derives everything from a SHA-256 of the payload instead.
    """
    if HAVE_REAL_CODECS:  # pragma: no cover
        raise NotImplementedError("real codec path not available in sandbox")
    h = hashlib.sha256(payload).digest()
    return {
        "media_type": ["image/png", "image/jpeg", "audio/wav",
                       "video/mp4"][h[0] % 4],
        "width": 64 + (h[1] % 64) * 16,
        "height": 64 + (h[2] % 64) * 16,
        "n_frames": 1 + h[3] % 240,
        "feature": [round(b / 255.0, 6) for b in h[4:12]],
    }


def decode_media_features(docs: DataFrame) -> DataFrame:
    """documents -> media feature table.

    The binary payload is synthesized from ``text`` (the corpus has no real
    media column); everything downstream treats it as opaque bytes.
    """
    src = docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload"))

    def decode(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                rec = _decode_payload(payload)
                rows.append({"doc_id": int(doc_id),
                             "n_bytes": len(payload), **rec})
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return src.mapInPandas(decode, MEDIA_SCHEMA)


def decode_media_features_flat(docs: DataFrame) -> DataFrame:
    """Driver-canonicalizable projection of :func:`decode_media_features`.

    The array-typed ``feature`` column is the internal API (what a model
    pipeline consumes); external consumers that sort/hash rows (the
    correctness driver, CSV exports) get the 8 feature dims as scalar
    double columns instead, plus bigint-cast metadata.
    """
    wide = decode_media_features(docs)
    return wide.selectExpr(
        "doc_id",
        "n_bytes",
        "media_type",
        "cast(width as bigint) as width",
        "cast(height as bigint) as height",
        "cast(n_frames as bigint) as n_frames",
        *[f"element_at(feature, {i + 1}) as feature_{i}" for i in range(8)],
    )
