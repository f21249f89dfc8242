#!/usr/bin/env python
"""Shuffle-codec A/B at the query level (VERDICT r4 items 2/5/7).

The round-4 session default moved the shuffle codec to zstd on the
strength of a flagship-only A/B (−44% shuffle bytes, wall parity).  Two
bench entries moved the wrong way or stayed flat in the same round
(`ngram_jaccard` 3.0 → 4.2 s, `dedup_minhash_lsh` flat at 14.2 s despite a
measured candidate diet), and the open question is whether that is the
codec interacting with their packed-relation shuffles or just this VM's
bandwidth flapping.  This script answers it the only way that is valid on
a flapping host: BOTH codecs measured in the SAME window, interleaved
A/B/A/B, min-of-N per codec, with memory-bandwidth bracket probes.

The codec is a startup-static conf, so each codec runs in a child JVM
(this script re-execs itself with --child).

    python scripts/codec_ab.py --queries ngram_jaccard,dedup_minhash_lsh \
        --reps 3 [--cpus 32] [--sf-dir /root/testdata/sf0.1]

Output: one JSON line per (codec, rep) from the children, then a summary
JSON with per-codec min wall per query + the bracket probes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def child(args) -> None:
    from cqi_engine.queries.catalog import CATALOG, run_query
    from cqi_engine.session import build_session, ship_package

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", str(max(args.cpus * 2, 16)))
    spark = build_session("codec-ab", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    # warm: JIT, codegen cache, Python workers
    run_query(spark, args.sf_dir, CATALOG["cell_agg"]).count()
    out = {}
    for name in args.queries.split(","):
        # reps after the first reuse the query's persisted stages (the
        # cache manager matches the identical analyzed plans), so report
        # the COLD first run and the warm min separately — the driver
        # bench's number is the cold one.
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            n = run_query(spark, args.sf_dir, CATALOG[name]).count()
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = {"cold_s": reps[0], "min_s": min(reps),
                     "reps_s": reps, "rows": n}
    print("CHILD " + json.dumps(
        {"codec": spark.conf.get("spark.io.compression.codec"),
         "queries": out}))
    spark.stop()


def probe_gbps() -> float:
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from watch_scaling_window import probe_gbps as p
    return p()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="ngram_jaccard,dedup_minhash_lsh")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=2,
                    help="A/B interleavings (each round runs both codecs)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child:
        child(args)
        return

    pre = probe_gbps()
    results: dict[str, dict[str, float]] = {}
    for rnd in range(args.rounds):
        for codec in ("zstd", "lz4"):
            env = dict(os.environ, SPARK_GRAFT_CODEC=codec)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--queries", args.queries, "--reps", str(args.reps),
                 "--cpus", str(args.cpus), "--sf-dir", args.sf_dir],
                capture_output=True, text=True, env=env, timeout=3600)
            line = next((ln for ln in r.stdout.splitlines()
                         if ln.startswith("CHILD ")), None)
            if line is None:
                print(f"child ({codec}, round {rnd}) failed:\n{r.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            rec = json.loads(line[len("CHILD "):])
            print(json.dumps({"round": rnd, **rec}), flush=True)
            for q, v in rec["queries"].items():
                slot = results.setdefault(q, {}).setdefault(
                    codec, {"cold_s": v["cold_s"], "min_s": v["min_s"]})
                slot["cold_s"] = min(slot["cold_s"], v["cold_s"])
                slot["min_s"] = min(slot["min_s"], v["min_s"])
    post = probe_gbps()
    print(json.dumps({
        "summary": results,
        "host_membw_gbps": [pre, post],
        "cpus": args.cpus, "sf_dir": args.sf_dir,
        "estimator": f"min over {args.rounds} rounds x {args.reps} reps, "
                     f"codecs interleaved in one window"}))


if __name__ == "__main__":
    main()
