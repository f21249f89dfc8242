"""Snapshot-checkpointed, lineage-tracked partition runner (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

No Iceberg runtime ships in this sandbox, so snapshots are modeled the way
Iceberg models them — an atomic manifest over immutable data files:

    out_dir/
      part=<pid>/...parquet        immutable per-partition output
      _lineage/part-<pid>.json     one lineage record per completed partition
      _SNAPSHOT.json               atomic commit manifest (rename-committed)

``run_partitioned`` processes logical partitions independently; a rerun
reads ``_lineage`` and skips every partition already committed, so a job
killed at partition k resumes at k (verified by
tests/test_ops_modules.py::test_checkpoint_resume: kill-after-snapshot ->
rerun -> identical final table, no duplicates).
Swapping this for real Iceberg means replacing the manifest writes with
``spark.table(...).writeTo(...).append()`` inside one transaction — the
partition/lineage discipline is unchanged.
"""

from __future__ import annotations

import itertools
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def completed_partitions(out_dir: str) -> dict[str, dict]:
    ldir = _lineage_dir(out_dir)
    done = {}
    if os.path.isdir(ldir):
        for fname in os.listdir(ldir):
            if fname.startswith("part-") and fname.endswith(".json"):
                with open(os.path.join(ldir, fname), encoding="utf-8") as fh:
                    rec = json.load(fh)
                done[rec["partition"]] = rec
    return done


def run_partitioned(spark: SparkSession, out_dir: str,
                    partitions: list[str],
                    job: Callable[[SparkSession, str], DataFrame],
                    input_snapshot: str = "") -> dict:
    """Run `job(spark, pid)` for each not-yet-committed partition.

    Each partition commits atomically: data first, then the lineage record
    (rename), so a crash between the two reprocesses that partition —
    overwriting the same deterministic output, never duplicating.

    A completed partition is skipped only if its lineage record was
    produced from the SAME ``input_snapshot``: Iceberg resume semantics
    are snapshot-scoped, so a lineage record stamped with an older input
    snapshot is stale — its output may not reflect the current input —
    and the partition reprocesses (overwriting in place, still atomic).
    """
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    done = completed_partitions(out_dir)
    ran, skipped = [], []
    for pid in partitions:
        if pid in done and done[pid].get("input_snapshot") == input_snapshot:
            skipped.append(pid)
            continue
        t0 = time.perf_counter()
        df = job(spark, pid)
        pdir = os.path.join(out_dir, f"part={pid}")
        df.write.mode("overwrite").parquet(pdir)
        n_rows = spark.read.parquet(pdir).count()
        rec = {
            "partition": pid,
            "n_rows": n_rows,
            "input_snapshot": input_snapshot,
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        tmp = os.path.join(_lineage_dir(out_dir), f".tmp-part-{pid}.json")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(rec, fh)
        os.replace(tmp, os.path.join(_lineage_dir(out_dir),
                                     f"part-{pid}.json"))
        ran.append(pid)

    # re-read lineage so the manifest records what each partition's data
    # was ACTUALLY produced from: a rerun over a subset at a new input
    # snapshot leaves untouched partitions at their old snapshot, and a
    # single top-level stamp would advertise a snapshot the data does not
    # uniformly reflect (downstream cache invalidation / incremental
    # readers key off it).  `input_snapshot` stays as the uniform value,
    # null when mixed.
    lineage = completed_partitions(out_dir)
    part_snaps = {pid: lineage[pid].get("input_snapshot", "")
                  for pid in sorted(set(list(done) + ran)) if pid in lineage}
    distinct = set(part_snaps.values())
    manifest = {
        "partitions": sorted(set(list(done) + ran)),
        "input_snapshot": distinct.pop() if len(distinct) == 1 else None,
        "partition_snapshots": part_snaps,
        "n_partitions": len(set(list(done) + ran)),
    }
    tmp = os.path.join(out_dir, ".tmp-_SNAPSHOT.json")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(out_dir, "_SNAPSHOT.json"))
    return {"ran": ran, "skipped": skipped, "manifest": manifest}


def read_snapshot(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read exactly the committed snapshot (partitions in the manifest)."""
    with open(os.path.join(out_dir, "_SNAPSHOT.json"),
              encoding="utf-8") as fh:
        manifest = json.load(fh)
    paths = [os.path.join(out_dir, f"part={pid}")
             for pid in manifest["partitions"]]
    return spark.read.parquet(*paths)


_METRICS_SEQ = itertools.count()


def write_metrics(out_dir: str, stage: str, metrics: dict) -> None:
    """Append a metrics record (the `_metrics` table of SURVEY §4.2.6).

    File name carries (pid, per-process sequence) beyond the millisecond
    stamp: two records for the same stage in the same ms (or from two
    driver processes) must append, not silently overwrite each other.
    """
    mdir = os.path.join(out_dir, "_metrics")
    os.makedirs(mdir, exist_ok=True)
    fname = os.path.join(
        mdir, f"{stage}-{int(time.time() * 1000)}"
              f"-{os.getpid()}-{next(_METRICS_SEQ)}.json")
    with open(fname, "x", encoding="utf-8") as fh:
        json.dump({"stage": stage, **metrics}, fh)
