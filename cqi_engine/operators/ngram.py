"""Shingle-set Jaccard via vocabulary-broadcast incidence GEMM.

The explode/equi-join plan for all-pairs n-gram Jaccard shuffles one row
per (doc, shingle) and then joins on the shingle — on a template-heavy web
corpus the joined intermediate is O(sum over shingles of df(shingle)^2),
millions of rows for thousands of docs.  When the distinct-shingle
vocabulary is bounded (it is tiny on template corpora; guarded here), the
same intersections are one boolean-matrix product:

    inter[a, b] = |S_a ∩ S_b| = (A @ A.T)[a, b],   A = doc x shingle 0/1

so the scale plan is: one tokenization pass -> broadcast the vocabulary ->
pack docs into blocks -> tile-pair the blocks (tiny equi-joins, same shape
as operators/ann.neardup_candidates_blocked) -> one float32 GEMM per tile
-> emit only the pairs that can pass the threshold, as EXACT INTEGER
(inter, union).  The caller applies the final `jaccard >= t` comparison
and rounding with the oracle's own SQL expression, so results are
bit-identical to the explode-join form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ann import tile_pair_blocks

_PAIR_SCHEMA = T.StructType([
    T.StructField("doc_a", T.LongType()),
    T.StructField("doc_b", T.LongType()),
    T.StructField("inter", T.LongType()),
    T.StructField("union", T.LongType()),
])

MAX_GEMM_VOCAB = 200_000  # beyond this the dense incidence row (~800 KB
#                           float32) stops paying; caller falls back to the
#                           explode-join plan


def shingle_pairs_gemm(docs_grams: DataFrame, threshold: float,
                       block: int = 1024,
                       margin: float = 1e-3) -> DataFrame | None:
    """docs_grams(doc_id long, grams array<string>) -> (doc_a, doc_b,
    inter, union) for pairs with inter/union >= threshold - margin.

    Returns None when the vocabulary exceeds MAX_GEMM_VOCAB (caller must
    use the shuffle-join plan).  ``margin`` keeps borderline pairs so the
    caller's exact SQL threshold decides membership, never this kernel.
    """
    spark = docs_grams.sparkSession
    docs_grams = docs_grams.persist()  # vocab scan + two tile sides reuse it
    # Driver-memory guard FIRST: pull at most cap+1 distinct shingles.  On
    # a web corpus the distinct vocabulary is billions of rows — the limit
    # makes the over-cap case cost O(cap) driver memory (the executors stop
    # feeding rows once cap+1 are collected) instead of materializing the
    # whole vocabulary before the check.
    vocab_rows = (docs_grams.select(F.explode("grams").alias("g"))
                  .distinct().limit(MAX_GEMM_VOCAB + 1).collect())
    if len(vocab_rows) > MAX_GEMM_VOCAB:
        docs_grams.unpersist()
        return None
    vmap = {r["g"]: i for i, r in enumerate(vocab_rows)}
    nv = len(vmap)
    bc = spark.sparkContext.broadcast(vmap)

    packed = (docs_grams
              .withColumn("blk", (F.col("doc_id") / block).cast("long"))
              .groupBy("blk")
              .agg(F.collect_list(F.struct("doc_id", "grams")).alias("items"))
              ).persist()

    n = docs_grams.agg(F.max("doc_id")).collect()[0][0] or 0
    nb = int(n) // block + 1
    tiles = tile_pair_blocks(packed, nb)  # distributed pair enumeration

    cut = max(threshold - margin, 0.0)

    def gemm(batches):
        vm = bc.value

        def pack(items):
            ids = np.array([r["doc_id"] for r in items], dtype=np.int64)
            m = np.zeros((len(items), nv), dtype=np.float32)
            for r_i, r in enumerate(items):
                for g in r["grams"]:
                    m[r_i, vm[g]] = 1.0
            return ids, m

        for pdf in batches:
            for items_a, items_b in zip(pdf["items_a"], pdf["items_b"]):
                ida, ma = pack(items_a)
                idb, mb = pack(items_b)
                inter = ma @ mb.T                      # exact int counts
                sa = ma.sum(axis=1)[:, None]
                sb = mb.sum(axis=1)[None, :]
                union = sa + sb - inter
                union_safe = np.where(union > 0, union, 1.0)
                ii, jj = np.nonzero((inter / union_safe >= cut)
                                    & (ida[:, None] < idb[None, :]))
                yield pd.DataFrame({
                    "doc_a": ida[ii], "doc_b": idb[jj],
                    "inter": inter[ii, jj].astype(np.int64),
                    "union": union[ii, jj].astype(np.int64),
                })

    return tiles.select("items_a", "items_b").mapInPandas(gemm, _PAIR_SCHEMA)
