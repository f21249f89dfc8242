"""Incremental near-duplicate dedup against a persisted band index.

The catalog's graded ``dedup_minhash_lsh`` answers "which pairs in THIS
corpus are near-dups" — the corpus-at-once shape.  Production training-data
pipelines run the other shape daily: a new crawl batch arrives and every
incoming document must be checked against EVERYTHING already seen, without
re-scanning the seen corpus' text.  This module is that operator: per
batch, one equi-join of the batch's MinHash band keys against a persisted
band index (seen corpus), one exact-Jaccard verify over stored token sets,
and an append-only index commit — O(batch × collisions) work per batch,
never O(corpus²).

Semantics (deterministic, batch-size-invariant): a document is a
DUPLICATE iff some seen document with a SMALLER doc_id verifies at
``jaccard >= MINHASH_JACCARD`` against it, where "seen" = all committed
prior batches plus the document's own batch.  Because the predicate
depends only on the seen-set, splitting a monotone-doc_id feed into 1, 2,
or N batches yields identical keep/drop decisions (tested).  The contract
is monotone batches (ids assigned at arrival — the streaming case); a
non-monotone feed degrades gracefully: an already-committed larger-id
document is never retroactively dropped.

The MinHash/band/Jaccard arithmetic is expression-for-expression the
catalog's (`queries/catalog.py` ``dedup_minhash_lsh``), sharing the
constants in ``operators/dialect.py`` — an incremental run over N batches
and the corpus-at-once query agree exactly on which pairs verify.

Index layout under ``index_dir`` (the sandbox stand-in for one Iceberg
table with snapshot commits; per-batch directories + a rename-committed
manifest give the same resume property):

    bands/batch=<id>/   doc_id, nt, band_idx, band_key, k0..k3  (parquet)
    toks/batch=<id>/    doc_id, toks                            (parquet)
    MANIFEST            json lines, one per committed batch; rewritten
                        atomically (tmp + rename) on each commit

Only manifest-listed batch directories are read, so a batch that died
mid-write is invisible until its re-run commits; re-running a committed
batch overwrites its directories idempotently and yields byte-identical
annotations (a doc's smaller-id batch-mates are then in the index, but
the drop predicate is unchanged — tested).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dialect as D

_MIXM = (1 << 31) - 1


def _sig_cols() -> list:
    m = D.MINHASH_PRIME
    return [
        f"array_min(transform(ths, h -> ({a}L * (h % {m}L) + {b}L) % {m}L)) "
        f"as s{j}"
        for j, (a, b) in enumerate(D.MINHASH_PERMS)]


def _key_exprs() -> list:
    rows = len(D.MINHASH_PERMS) // D.LSH_BANDS
    out = []
    for band in range(D.LSH_BANDS):
        expr = "0"
        for r in range(rows):
            expr = f"((({expr}) * 1000003L + s{band * rows + r}) % {_MIXM}L)"
        out.append(f"cast({expr} as bigint) as k{band}")
    return out


def _first_band_owner(n_bands: int) -> str:
    """First-colliding-band emission conjunct (the catalog's candidate
    dedup-without-DISTINCT trick): suppress a pair row when any earlier
    band also collides, so each (a, b) pair surfaces exactly once."""
    return " and ".join(
        [f"not (a.band_idx > {j} and a.k{j} = b.k{j})"
         for j in range(n_bands - 1)] or ["true"])


def band_frames(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """docs(doc_id, text) -> (toks_df, bands_df).

    toks_df: doc_id, toks (distinct whitespace tokens — the exact-verify
    side).  bands_df: doc_id, nt, band_idx, band_key, k0..k3 (one row per
    band; the full key signature rides along as scalar columns so both
    first-band-owner and the size-ratio prefilter evaluate inside the
    band join, in whole-stage codegen).  Documents with NULL text carry
    NULL toks/keys; NULL keys match nothing in the equi-join, so such
    rows are never candidates and always annotate as novel.
    """
    d = D.SPARK
    toks_df = docs.selectExpr(
        "doc_id", f"{D.tokens_distinct('text', d)} as toks")
    ths = D.lmap("toks", f"t -> {D.polyhash('t', d)}", d)
    k_cols = [f"k{b}" for b in range(D.LSH_BANDS)]
    band_structs = ", ".join(
        f"named_struct('band_idx', {b}, 'band_key', k{b})"
        for b in range(D.LSH_BANDS))
    bands_df = (toks_df
                .selectExpr("doc_id", "size(toks) as nt", f"{ths} as ths")
                .selectExpr("doc_id", "nt", *_sig_cols())
                .selectExpr("doc_id", "nt", *_key_exprs())
                .selectExpr("doc_id", "nt", *k_cols,
                            f"explode(array({band_structs})) as b")
                .selectExpr("doc_id", "nt", "b.band_idx", "b.band_key",
                            *k_cols))
    return toks_df, bands_df


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "MANIFEST")


def committed_batches(index_dir: str) -> list[dict]:
    try:
        with open(_manifest_path(index_dir), encoding="utf-8") as fh:
            return [json.loads(ln) for ln in fh if ln.strip()]
    except FileNotFoundError:
        return []


def _commit(index_dir: str, entries: list[dict]) -> None:
    tmp = _manifest_path(index_dir) + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        for e in entries:
            fh.write(json.dumps(e, sort_keys=True) + "\n")
    os.replace(tmp, _manifest_path(index_dir))  # atomic on POSIX


def _seen_frames(spark, index_dir: str):
    """(bands, toks) of every committed batch, or (None, None)."""
    batches = committed_batches(index_dir)
    if not batches:
        return None, None
    bands = [os.path.join(index_dir, "bands", f"batch={e['batch_id']}")
             for e in batches]
    toks = [os.path.join(index_dir, "toks", f"batch={e['batch_id']}")
            for e in batches]
    return spark.read.parquet(*bands), spark.read.parquet(*toks)


def incremental_dedup_batch(spark, batch_docs: DataFrame, index_dir: str,
                            batch_id: int, commit: bool = True) -> DataFrame:
    """One incoming batch vs the persisted index -> per-doc annotations.

    Returns (doc_id, is_novel int, dup_of bigint, jaccard double):
    ``dup_of`` is the SMALLEST seen doc_id that verifies (deterministic),
    NULL for novel docs.  The result is materialized (localCheckpoint)
    BEFORE the batch is committed to the index, so the returned frame can
    never observe its own commit.

    Join shape at scale: the batch side is small, the index side is the
    corpus — band collisions are an equi-join on (band_idx, band_key)
    (bucketable by band_key on a real deployment), the verify joins fetch
    token arrays for candidate ids only, and the size-ratio prefilter +
    first-band-owner conjunct run inside the band join exactly as in the
    graded corpus-at-once query.
    """
    num, den = D.MINHASH_JACCARD_NUM, D.MINHASH_JACCARD_DEN
    toks_new, bands_new = band_frames(batch_docs)
    toks_new = toks_new.persist()
    bands_new = bands_new.persist()
    seen_bands, seen_toks = _seen_frames(spark, index_dir)

    owner = _first_band_owner(D.LSH_BANDS)
    ratio = (f"least(a.nt, b.nt) * {den} >= greatest(a.nt, b.nt) * {num}")

    def candidates(a: DataFrame, b: DataFrame) -> DataFrame:
        """Band-collision candidate pairs a->(doc, seen), seen id strictly
        smaller — for the batch self-join that is plain a<b pairing, and
        for the index side the same predicate means a non-monotone feed
        never drops a doc for a LARGER already-committed neighbor."""
        cond = (f"a.band_idx = b.band_idx and a.band_key = b.band_key "
                f"and b.doc_id < a.doc_id and {ratio} and {owner}")
        return (a.alias("a").join(b.alias("b"), F.expr(cond))
                .selectExpr("a.doc_id as doc_id", "b.doc_id as seen_id",
                            "a.nt as nt_a", "b.nt as nt_b"))

    cand = candidates(bands_new, bands_new)
    if seen_bands is not None:
        cand = cand.unionByName(candidates(bands_new, seen_bands))
    # the band self-join's output inherits the skewed band-bucket layout;
    # without an exchange the Jaccard arithmetic runs on the few
    # partitions holding the hot template buckets (the catalog measured
    # 60 s vs 6-7 s for the corpus-at-once twin) — rebalance the narrow
    # pair rows before the verify joins
    cand = cand.hint("rebalance")

    all_toks = toks_new
    if seen_toks is not None:
        all_toks = toks_new.unionByName(seen_toks)

    inter = "size(array_intersect(ta.toks, tb.toks))"
    jac = f"(cast(inter as double) / (nt_a + nt_b - inter))"
    verified = (cand.alias("c")
                .join(toks_new.alias("ta"),
                      F.expr("ta.doc_id = c.doc_id"))
                .join(all_toks.alias("tb"),
                      F.expr("tb.doc_id = c.seen_id"))
                .selectExpr("c.doc_id", "c.seen_id", "c.nt_a", "c.nt_b",
                            f"{inter} as inter")
                .where(F.expr(f"{jac} >= {D.MINHASH_JACCARD}"))
                .selectExpr("doc_id", "seen_id",
                            f"cast(round({jac}, 6) as double) as jaccard"))

    best = (verified.groupBy("doc_id")
            .agg(F.min(F.struct("seen_id", "jaccard")).alias("m"))
            .selectExpr("doc_id", "m.seen_id as dup_of",
                        "m.jaccard as jaccard"))
    ann = (batch_docs.select("doc_id")
           .join(best, "doc_id", "left")
           .selectExpr("doc_id",
                       "cast(dup_of is null as int) as is_novel",
                       "dup_of", "jaccard")
           .localCheckpoint(eager=True))  # pin results pre-commit

    if commit:
        (bands_new.write.mode("overwrite")
         .parquet(os.path.join(index_dir, "bands", f"batch={batch_id}")))
        (toks_new.write.mode("overwrite")
         .parquet(os.path.join(index_dir, "toks", f"batch={batch_id}")))
        entries = [e for e in committed_batches(index_dir)
                   if e["batch_id"] != batch_id]
        entries.append({"batch_id": int(batch_id),
                        "n_docs": batch_docs.count()})
        entries.sort(key=lambda e: e["batch_id"])
        _commit(index_dir, entries)
    toks_new.unpersist()
    bands_new.unpersist()
    return ann


def dedup_sink(docs_stream: DataFrame, index_dir: str, out_dir: str,
               checkpoint_dir: str):
    """foreachBatch incremental dedup: each micro-batch is annotated
    against the index-so-far, the annotations land in a per-batch output
    directory (idempotent on replay — same pattern as
    ``streaming/ingest.scoring_sink``), and the batch is committed to the
    index.  Start with ``.trigger(availableNow=True).start()`` for a
    bounded replay, or unbounded for a live feed."""
    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        ann = incremental_dedup_batch(batch_df.sparkSession, batch_df,
                                      index_dir, batch_id)
        (ann.write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"batch={batch_id}")))

    return (docs_stream.writeStream.foreachBatch(_fb)
            .option("checkpointLocation", checkpoint_dir))
