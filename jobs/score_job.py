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

        result = run_partitioned(spark, args.output, pids, job,
                                 input_snapshot=args.input)
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
