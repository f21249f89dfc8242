"""Approximate-nearest-neighbor scale path: blocked numpy matmul.

The oracle-checked baseline (`ann_topk` in the catalog) folds the dot
product element-by-element in Catalyst expressions — bit-exact but O(d)
per pair in codegen.  At scale the winning plan is Arrow batches + BLAS:
broadcast the (small) query block, stream candidate partitions through
``mapInPandas``, matmul per batch, keep a per-batch top-k, then do ONE
narrow shuffle to merge per-batch top-k into the global top-k.

Per-batch candidate sets shrink the shuffle payload from O(N) rows to
O(batches * k) rows — the same two-level local/global pattern the
north_rule requires for aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_TOPK_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType()),
    T.StructField("cand_id", T.LongType()),
    T.StructField("cosine", T.DoubleType()),
])


def ann_topk_blocked(emb: DataFrame, n_queries: int = 32, k: int = 5) -> DataFrame:
    """Exact top-k by cosine, computed the scale-path way.

    Rounding to 6 decimals before ranking matches the `ann_topk` oracle's
    tie-breaking exactly (rank by rounded sim desc, cand_id asc).
    """
    spark = emb.sparkSession
    qrows = (emb.filter(F.col("vec_id") < n_queries)
             .select("vec_id", "embedding").collect())
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm, k))

    def probe(batches):
        ids, mat, normq, kk = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cand_ids = pdf["vec_id"].to_numpy(np.int64)
            cand = np.array(list(pdf["embedding"]), dtype=np.float64)
            sims = (mat @ cand.T) / (normq[:, None]
                                     * np.linalg.norm(cand, axis=1)[None, :])
            sims = np.round(sims, 6)
            out = {"query_id": [], "cand_id": [], "cosine": []}
            for qi, qid in enumerate(ids):
                row = sims[qi]
                mask = cand_ids != qid
                order = np.lexsort((cand_ids[mask], -row[mask]))[:kk]
                sel = np.flatnonzero(mask)[order]
                out["query_id"].extend([qid] * len(sel))
                out["cand_id"].extend(cand_ids[sel])
                out["cosine"].extend(row[sel])
            yield pd.DataFrame(out)

    local_topk = emb.select("vec_id", "embedding").mapInPandas(
        probe, _TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id"))
    return (local_topk.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "cosine",
                    F.col("rank").cast("long").alias("rank")))
