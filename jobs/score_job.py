#!/usr/bin/env python
"""Production entry point: score a documents/pages table end-to-end.

Launch (north_rule launch discipline; the zip is the same artifact
``ship_package`` builds at runtime):

    cd /root/repo && zip -qr /tmp/cqi_engine.zip cqi_engine
    spark-submit --py-files /tmp/cqi_engine.zip jobs/score_job.py \
        --input /root/testdata/sf0.01 --output /tmp/scored \
        [--partitions p0,p1,...]      # checkpointed partition subset

With ``--partitions``, the run is snapshot-checkpointed per partition via
cqi_engine.ops.checkpoint (resume skips committed partitions and the
_SNAPSHOT.json manifest is committed atomically); without it, one plain
overwrite write.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _input_snapshot_id(input_dir: str, n_buckets: int) -> str:
    """Identity of the work a lineage record certifies.

    The bare input PATH is not enough: (a) regenerating the data at the
    same path must invalidate resume (stale output would be served as
    current), and (b) the bucket count defines what rows each partition
    id covers — rerunning with a different --n-buckets under the same
    stamp would skip old partitions and duplicate their rows across the
    new layout.  Stamp = path + n_buckets + a digest of the input files'
    (name, size, mtime) — the parquet-world stand-in for a real Iceberg
    snapshot id, which is what a production caller would pass instead.
    """
    import hashlib
    h = hashlib.sha256()
    root = os.path.join(input_dir, "documents.parquet")
    paths = [root] if os.path.isfile(root) else sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root) for f in fs)
    for p in paths:
        st = os.stat(p)
        h.update(f"{os.path.relpath(p, input_dir)}:"
                 f"{st.st_size}:{st.st_mtime_ns}\n".encode())
    return f"{input_dir}#n={n_buckets}#{h.hexdigest()[:16]}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir with documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", default="",
                    help="comma-separated doc_id%%N partition ids (checkpointed mode)")
    ap.add_argument("--n-buckets", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cqi_engine.operators.pipeline import score_way_table
    from cqi_engine.ops.checkpoint import run_partitioned, write_metrics
    from cqi_engine.session import build_session, ship_package
    from cqi_engine.sources.webways import ways_from_documents

    spark = build_session("cqi-score-job")
    ship_package(spark)
    docs = spark.read.parquet(f"{args.input}/documents.parquet")

    if args.partitions:
        pids = [p for p in args.partitions.split(",") if p]

        def job(s, pid):
            part = docs.filter(F.pmod(F.col("doc_id"),
                                      F.lit(args.n_buckets)) == int(pid))
            return score_way_table(ways_from_documents(part))

        snap = _input_snapshot_id(args.input, args.n_buckets)
        result = run_partitioned(spark, args.output, pids, job,
                                 input_snapshot=snap)
        write_metrics(args.output, "score_job",
                      {"ran": result["ran"], "skipped": result["skipped"]})
        print(f"ran={result['ran']} skipped={result['skipped']}")
    else:
        scored = score_way_table(ways_from_documents(docs))
        scored.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(f"scored_rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
