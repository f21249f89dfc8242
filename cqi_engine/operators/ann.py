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


def _majority_dim(lengths) -> int | None:
    """The corpus dimension = the MODE of the positive embedding lengths
    (ties break toward the smaller dim, deterministically).  Inferring it
    from the first non-null row instead would let a single truncated or
    empty leading row silently poison every query in the batch — at
    100 TB the first row of a scan is an arbitrary row."""
    counts: dict[int, int] = {}
    for n in lengths:
        if n:
            counts[n] = counts.get(n, 0) + 1
    if not counts:
        return None
    return max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]


def _mat_with_nan_rows(embs: list, dim: int | None) -> np.ndarray:
    """Stack embeddings into an (n, dim) float64 matrix; rows that are
    NULL (or of a foreign dimension) become all-NaN instead of crashing
    np.array with an inhomogeneous-shape error — at 100 TB a null
    embedding is data, not an exception."""
    if dim is None:
        dim = 1
    out = np.full((len(embs), dim), np.nan)
    for i, e in enumerate(embs):
        if e is not None and len(e) == dim:
            out[i] = np.asarray(e, dtype=np.float64)
    return out


def ann_topk_blocked(emb: DataFrame, n_queries: int = 32, k: int = 5,
                     slack: int = 3) -> DataFrame:
    """Exact top-k by cosine, computed the scale-path way.

    Two levels: each candidate partition keeps its own top (k + slack) per
    query (numpy matmul, O(batches * k) rows shuffled instead of O(N)),
    then the merged candidate set is re-scored with the exact Catalyst
    cosine fold and ranked by (round(cos, 6) desc, cand_id asc) — the same
    total order as the `ann_topk` oracle, evaluated by the same arithmetic,
    so results are bit-identical.  ``slack`` + a 1e-6 margin below the
    per-batch cut protect the selection against last-ulp disagreement
    between the matmul and the fold: the global top-k under the exact
    order is always contained in the union of per-batch top-(k+slack).
    """
    spark = emb.sparkSession
    qrows = (emb.filter(F.col("vec_id") < n_queries)
             .select("vec_id", "embedding").collect())
    if not qrows:  # no query vectors (empty corpus / snapshot): 0 rows out
        return spark.createDataFrame([], T.StructType(
            _TOPK_SCHEMA.fields
            + [T.StructField("rank", T.LongType())]))
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    # degenerate rows (NULL embedding, zero norm) carry NaN through the
    # matmul: NaN similarities sort LAST in the per-batch selection (and
    # in cand-id order among themselves — lexsort is a chain of stable
    # sorts), mirroring the exact re-rank where their cosine is SQL NULL
    # (nullif denominator) and desc ranks NULLS LAST.  They still fill
    # top-k slots when a query has fewer than k finite neighbors, exactly
    # like the all-pairs oracle.
    q_dim = _majority_dim(len(r["embedding"]) for r in qrows
                          if r["embedding"] is not None)
    q_mat = _mat_with_nan_rows([r["embedding"] for r in qrows], q_dim)
    q_norm = np.linalg.norm(q_mat, axis=1) if q_dim else None
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm, k + slack))
    # queries whose length differs from the corpus dim probe as all-NaN
    # rows (every majority-dim cosine is NULL in the fold — correct), but
    # they CAN have real cosines against same-length rows; those pairs
    # are few (dirty data), so feed them to the exact re-rank directly
    # via a size-equality join instead of the GEMM.
    odd_sizes = sorted({len(r["embedding"]) for r in qrows
                        if r["embedding"] is not None
                        and 0 < len(r["embedding"]) != q_dim})

    def probe(batches):
        ids, mat, normq, kk = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cand_ids = pdf["vec_id"].to_numpy(np.int64)
            if normq is None:  # every query degenerate: all-NaN sims
                sims = np.full((len(ids), len(pdf)), np.nan)
            else:
                cand = _mat_with_nan_rows(list(pdf["embedding"]),
                                          mat.shape[1])
                with np.errstate(invalid="ignore", divide="ignore"):
                    sims = ((mat @ cand.T)
                            / (normq[:, None]
                               * np.linalg.norm(cand, axis=1)[None, :]))
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

    cand = (emb.select("vec_id", "embedding").mapInPandas(probe, _TOPK_SCHEMA)
            .select("query_id", "cand_id"))
    if odd_sizes:
        dq = (emb.filter((F.col("vec_id") < n_queries)
                         & F.size("embedding").isin(odd_sizes))
              .select(F.col("vec_id").alias("query_id"),
                      F.size("embedding").alias("qs")))
        extra = (dq.join(emb.select(F.col("vec_id").alias("cand_id"),
                                    F.size("embedding").alias("cs")),
                         F.col("qs") == F.col("cs"))
                 .filter("query_id != cand_id")
                 .select("query_id", "cand_id"))
        # distinct: a same-size candidate may also appear in the probe's
        # NaN fill for the same query; a duplicate would occupy two
        # row_number slots in the re-rank
        cand = cand.union(extra).distinct()

    # exact re-score of the merged candidates with the oracle's own fold
    dot = ("aggregate(zip_with(q.embedding, c.embedding, (x, y) -> "
           "cast(x as double) * cast(y as double)), cast(0 as double), "
           "(acc, v) -> acc + v)")
    nrm = ("sqrt(aggregate(transform({0}.embedding, x -> cast(x as double) "
           "* cast(x as double)), cast(0 as double), (acc, v) -> acc + v))")
    # nullif: zero-norm/NULL embeddings have undefined cosine -> SQL NULL
    # (ANSI-safe), ranked last by the desc window — same pinned semantics
    # as the catalog's _cos template
    cos = f"({dot} / nullif(({nrm.format('q')} * {nrm.format('c')}), 0))"
    q = emb.alias("q")
    c = emb.alias("c")
    scored = (cand
              .join(q, cand["query_id"] == F.col("q.vec_id"))
              .join(c, cand["cand_id"] == F.col("c.vec_id"))
              .selectExpr("query_id", "cand_id",
                          f"cast(round({cos}, 6) as double) as cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "cosine",
                    F.col("rank").cast("long").alias("rank")))


_PAIR_SCHEMA = T.StructType([
    T.StructField("vec_a", T.LongType()),
    T.StructField("vec_b", T.LongType()),
])


def tile_pair_blocks(packed: DataFrame, nb: int) -> DataFrame:
    """(blk, items) x upper-triangular block pairs -> (items_a, items_b).

    Join shape matters at scale, twice over:

    * ``packed`` is the FULL packed corpus (O(n*d) bytes) — broadcasting
      it ships the dataset to every executor, which is exactly the
      unbounded-broadcast pathology the plan audit forbids.
    * the (bi, bj | bi <= bj) pair set is O(nb^2) ROWS — materializing it
      on the driver (or broadcasting it) dies at web scale: 10^9 vectors /
      block=512 gives nb≈2M and ~2*10^12 pairs.

    So the pair set never exists as a table at all: each packed block row
    GENERATES its own row of upper-triangular tile partners executor-side
    via ``explode(sequence(blk, nb-1))`` — O(nb) longs per block row, no
    join, no broadcast, no driver Python list — and the only join is a
    shuffle-hash equi-join on the partner block key (the operators/knn.py
    pattern): each side shuffles O(rows) on `blk`, no relation is ever
    replicated whole.  (``sequence`` caps at ~2^31 elements, i.e. nb up to
    ~2*10^9 blocks = 10^12 vectors at block=512 — past any exact-GEMM
    corpus; the sub-quadratic LSH/IVF paths take over long before that.)
    """
    side_a = (packed.withColumnRenamed("items", "items_a")
              .withColumn("bj", F.explode(
                  F.sequence(F.col("blk"), F.lit(nb - 1).cast("long"))))
              .drop("blk"))
    side_b = (packed.withColumnRenamed("items", "items_b")
              .withColumnRenamed("blk", "blk_b"))
    return (side_a.join(side_b.hint("shuffle_hash"),
                        F.col("bj") == F.col("blk_b"))
            .drop("blk_b"))


def neardup_candidates_blocked(emb: DataFrame, threshold: float,
                               block: int = 512,
                               margin: float = 1e-6) -> DataFrame:
    """Exact all-pairs cosine candidates via tiled matmul — the scale shape.

    The naive exact near-dup plan self-joins the vector table (O(n^2)
    materialized pair ROWS, each carrying two full vectors).  The tiled
    plan moves O(n^2 * d / block) data instead: vectors are packed into
    n/block block rows (one `collect_list` shuffle), the upper-triangular
    (block_i <= block_j) tile set is enumerated DISTRIBUTED (each block
    row generates its partners executor-side — see tile_pair_blocks; no
    O(nb^2) driver list), and one numpy GEMM per tile emits only the
    qualifying
    (vec_a, vec_b) id pairs.  Exact FLOPs are inherent to exact
    similarity; what the tiling removes is the pair-row shuffle explosion
    and any driver-side pair materialization.

    ``margin`` loosens the numpy-side threshold so candidate generation
    can never drop a pair the exact Catalyst fold would keep (float64
    matmul vs sequential fold differ by ~1e-15 relative); callers re-verify
    with the exact expression and the final ``>= threshold`` filter.
    """
    # NULL embeddings can never qualify (their cosine is NULL in the
    # verify) and would crash the np.array pack — drop them JVM-side.
    # Zero-norm vectors stay: the GEMM yields NaN for them, NaN fails the
    # >= cut, and the SQL verify agrees (NULL via the nullif denominator).
    # Foreign-dimension rows (truncated/dirty) would ALSO crash the pack
    # (inhomogeneous np.array): the GEMM packs only the majority dim;
    # odd-size rows can still pair with SAME-size rows (real cosine in
    # the zip_with fold), so the few of them go through an exact
    # size-equality join below instead.
    dim_rows = (emb.filter(F.col("embedding").isNotNull())
                .groupBy(F.size("embedding").alias("d")).count()
                .filter("d > 0").collect())
    main_dim = (max(dim_rows, key=lambda r: (r["count"], -r["d"]))["d"]
                if dim_rows else None)
    emb2 = (emb.filter(F.col("embedding").isNotNull())
            .filter(F.size("embedding") == F.lit(main_dim or -1))
            .withColumn("blk", (F.col("vec_id") / block).cast("long")))
    packed = emb2.groupBy("blk").agg(
        F.collect_list(F.struct("vec_id", "embedding")).alias("items"))

    n = emb.agg(F.max("vec_id")).collect()[0][0] or 0
    nb = int(n) // block + 1
    tiles = tile_pair_blocks(packed, nb)

    cut = threshold - margin

    def gemm(batches):
        for pdf in batches:
            for items_a, items_b in zip(pdf["items_a"], pdf["items_b"]):
                ida = np.array([r["vec_id"] for r in items_a], dtype=np.int64)
                ma = np.array([r["embedding"] for r in items_a],
                              dtype=np.float64)
                idb = np.array([r["vec_id"] for r in items_b], dtype=np.int64)
                mb = np.array([r["embedding"] for r in items_b],
                              dtype=np.float64)
                with np.errstate(invalid="ignore", divide="ignore"):
                    sims = (ma @ mb.T) / (np.linalg.norm(ma, axis=1)[:, None]
                                          * np.linalg.norm(mb, axis=1)[None, :])
                ii, jj = np.nonzero((sims >= cut)
                                    & (ida[:, None] < idb[None, :]))
                yield pd.DataFrame({"vec_a": ida[ii], "vec_b": idb[jj]})

    cand = tiles.select("items_a", "items_b").mapInPandas(gemm, _PAIR_SCHEMA)

    # odd-size rows (size > 0, != main_dim): exact pair join among rows
    # of EQUAL size — a dirty sliver at scale, so the equi-join on size
    # is tiny; callers re-verify every candidate with the exact fold
    # anyway, so >= cut here only needs to be a superset filter.
    if len(dim_rows) > 1:  # the size histogram already told us
        odd = (emb.filter(F.col("embedding").isNotNull())
               .withColumn("sz", F.size("embedding"))
               .filter((F.col("sz") > 0)
                       & (F.col("sz") != F.lit(main_dim or -1))))
        dot = ("aggregate(zip_with(a.embedding, b.embedding, (x, y) -> "
               "cast(x as double) * cast(y as double)), cast(0 as double), "
               "(acc, v) -> acc + v)")
        nrm = ("sqrt(aggregate(transform({0}.embedding, x -> "
               "cast(x as double) * cast(x as double)), "
               "cast(0 as double), (acc, v) -> acc + v))")
        cos = f"({dot} / nullif(({nrm.format('a')} * {nrm.format('b')}), 0))"
        odd_pairs = (odd.alias("a")
                     .join(odd.alias("b"),
                           (F.col("a.sz") == F.col("b.sz"))
                           & (F.col("a.vec_id") < F.col("b.vec_id")))
                     .filter(F.expr(cos) >= F.lit(cut))
                     .selectExpr("a.vec_id as vec_a", "b.vec_id as vec_b"))
        cand = cand.unionByName(odd_pairs)
    return cand
