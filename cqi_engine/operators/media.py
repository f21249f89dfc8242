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
                if payload is None:  # no media: all metadata NULL
                    rows.append({"doc_id": int(doc_id), "n_bytes": None,
                                 "media_type": None, "width": None,
                                 "height": None, "n_frames": None,
                                 "feature": None})
                    continue
                payload = bytes(payload)
                rec = _decode_payload(payload)
                rows.append({"doc_id": int(doc_id),
                             "n_bytes": len(payload), **rec})
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return src.mapInPandas(decode, MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])


def resize_media(docs: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every media payload to ``width`` x ``height`` (binary->binary).

    Real plumbing: opaque-binary in / opaque-binary out through one Arrow
    mapInPandas pass, metadata recomputed on the way through — the shape a
    thumbnailing / model-preprocessing stage has at scale (pure map, no
    shuffle; partitioning is inherited).  STUB codec: the "resized" payload
    is a deterministic function of (payload digest, target size) sized
    proportionally to width*height, so tests can assert byte-exact output
    without PIL.
    """
    src = docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload"))

    def resize(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # no media: nothing to resample
                    rows.append({"doc_id": int(doc_id), "media_type": None,
                                 "width": width, "height": height,
                                 "payload": None})
                    continue
                payload = bytes(payload)
                meta = _decode_payload(payload)
                if HAVE_REAL_CODECS:  # pragma: no cover
                    raise NotImplementedError("real resampler not available")
                seed = hashlib.sha256(
                    payload + f":{width}x{height}".encode()).digest()
                n_out = max(16, (width * height) // 256)
                fake = (seed * (n_out // len(seed) + 1))[:n_out]
                rows.append({"doc_id": int(doc_id),
                             "media_type": meta["media_type"],
                             "width": width, "height": height,
                             "payload": fake})
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return src.mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(docs: DataFrame, every_k: int = 24) -> DataFrame:
    """Sample every k-th frame of each video payload (binary -> N rows).

    Real plumbing: a 1->N fan-out inside mapInPandas (output batch shape
    differs from input batch shape — the part Arrow makes non-obvious),
    frame count taken from the decoded metadata, non-video rows dropped.
    At scale this is still a narrow map: fan-out happens within the
    partition, no shuffle, and the output row count is bounded by
    n_frames/k per video.  STUB codec: frame bytes are sha256(payload,
    frame_idx) — deterministic, so tests assert exact multiplicity and
    content without libav.
    """
    src = docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload"))

    def frames(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # no media: no frames to sample
                    continue
                payload = bytes(payload)
                meta = _decode_payload(payload)
                if meta["media_type"] != "video/mp4":
                    continue
                if HAVE_REAL_CODECS:  # pragma: no cover
                    raise NotImplementedError("real demuxer not available")
                n = meta["n_frames"]
                for idx in range(0, n, every_k):
                    rows.append({
                        "doc_id": int(doc_id), "frame_idx": idx,
                        "n_frames": n,
                        "frame": hashlib.sha256(
                            payload + idx.to_bytes(4, "big")).digest()})
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return src.mapInPandas(frames, FRAME_SCHEMA)


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
