#!/usr/bin/env python
"""Benchmark harness (driver-run per round; also the scaling-evidence tool).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1, ...}

Scaling-efficiency evidence (BASELINE.md north_rule surrogate: N vs 4N
cores on the same input):

    SPARK_GRAFT_CPUS=8 python bench.py
    SPARK_GRAFT_CPUS=32 python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cqi_engine.queries.catalog import CATALOG, run_query  # noqa: E402
from cqi_engine.session import build_session, ship_package  # noqa: E402

# headline set: flagship spatial+scoring pipeline, the shuffle-heavy joins,
# the dedup/ANN scale paths, and two relational anchors.
HEADLINE = [
    "cqi_score_ways",
    "dwithin_join",
    "knn_sites",
    "point_in_polygon",
    "cell_agg",
    "dedup_minhash_lsh",
    "ngram_jaccard",
    "ann_topk_blocked",
    "dedup_simhash",
    "fingerprint",
    "pricing_summary",
    "shipping_priority",
    "events_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    spark = build_session("cqi-bench", master=f"local[{cpus}]",
                          shuffle_partitions=max(cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    # warm the JVM/Arrow path AND the Python UDF workers once so per-query
    # numbers measure the engine, not first-call JIT/codegen or the ~2-4 s
    # one-time worker spawn+import (32 workers x pandas import).
    run_query(spark, sf_dir, CATALOG["cell_agg"]).count()
    from cqi_engine.sources.webways import ways_from_documents
    from cqi_engine.operators.pipeline import score_way_table
    warm_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(256) \
        .repartition(cpus)
    score_way_table(ways_from_documents(warm_docs)).count()

    timings: dict[str, float] = {}
    row_counts: dict[str, int] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        row_counts[name] = run_query(spark, sf_dir, CATALOG[name]).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    n_pages = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    cqi_sec = timings["cqi_score_ways"]
    out = {
        "metric": "headline wall time (spatial-join + scoring + dedup/ANN)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "parallelism": cpus,
        "rows": row_counts,
        "pages_per_sec": round(n_pages / cqi_sec, 1) if cqi_sec else None,
        "way_scores_per_sec": (round(row_counts["cqi_score_ways"] / cqi_sec, 1)
                               if cqi_sec else None),
        # recorded evidence from scripts/scaling_bench.py (see BASELINE.md
        # for the full run table + variance/protocol disclosure)
        "scaling_evidence": {
            "pair": "local[1] vs local[4], 500k pages, same input",
            "t_n_s": 227.2, "t_4n_s": 55.4,
            "efficiency_min_based": 1.02,
            "efficiency_mean_of_pairs": 0.95,
            "source": "BASELINE.md / scripts/scaling_bench.py",
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
