#!/usr/bin/env python
"""Per-stage parallelism profile of the flagship job.

Finds WHERE wall-clock goes at a given local[N]: for every stage of one
flagship run it prints stage wall (completionTime - firstTaskLaunchedTime),
task count, summed executor task time, and the achieved parallelism
(task_time / wall).  Stages whose achieved parallelism sits near 1.0 at
local[4+] are the serialized component that caps scaling efficiency on
small inputs (BASELINE.md session-H caveat).

    python scripts/stage_profile.py [--cpus 4] [--replicate 400]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time
import urllib.request

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ["SPARK_GRAFT_UI"] = "true"

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=30) as r:
        return json.load(r)


def _ts(s: str) -> float:
    return datetime.datetime.strptime(
        s, "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--replicate", type=int, default=400)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None,
                    help="artifact path (default: <repo>/STAGEPROF.json)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cqi_engine.operators.pipeline import score_way_table
    from cqi_engine.session import build_session, ship_package
    from cqi_engine.sources.webways import ways_from_documents

    spark = build_session("cqi-stageprof", master=f"local[{args.cpus}]",
                          shuffle_partitions=max(args.cpus * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n_base = docs.count()
    expanded = (docs.select("doc_id").repartition(args.cpus)
                .crossJoin(F.broadcast(spark.range(args.replicate)
                                       .select(F.col("id").alias("rep"))))
                .select((F.col("doc_id") + F.col("rep") * F.lit(n_base))
                        .alias("doc_id"))
                .repartition(args.cpus * 2))
    score_way_table(ways_from_documents(docs.limit(64))).count()

    seen = {s["stageId"] for s in _rest(ui, f"applications/{app_id}/stages")}

    t0 = time.perf_counter()
    n = score_way_table(ways_from_documents(expanded)).count()
    wall = time.perf_counter() - t0

    rows = []
    for s in _rest(ui, f"applications/{app_id}/stages?status=complete"):
        if s["stageId"] in seen:
            continue
        try:
            swall = _ts(s["completionTime"]) - _ts(s["firstTaskLaunchedTime"])
            gap = _ts(s["firstTaskLaunchedTime"]) - _ts(s["submissionTime"])
        except (KeyError, ValueError):
            swall, gap = float("nan"), float("nan")
        rows.append({
            "stage": s["stageId"],
            "name": s.get("name", "")[:60],
            "tasks": s.get("numCompleteTasks", 0),
            "stage_wall_s": round(swall, 2),
            "submit_gap_s": round(gap, 2),
            "task_time_s": round(s.get("executorRunTime", 0) / 1e3, 2),
            "par": round(s.get("executorRunTime", 0) / 1e3 / swall, 2)
            if swall and swall > 0 else None,
            "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
        })
    rows.sort(key=lambda r: -(r["stage_wall_s"] or 0))
    covered = sum(r["stage_wall_s"] for r in rows
                  if r["stage_wall_s"] == r["stage_wall_s"])
    # dominant-stage parallelism: the 3 stages carrying the most executor
    # task time, wall-weighted — THE number that says whether the job
    # still fills the requested cores (a par collapse here is the scaling
    # regression byte metrics can't see)
    dom = sorted(rows, key=lambda r: -(r["task_time_s"] or 0))[:3]
    dom_wall = sum(r["stage_wall_s"] for r in dom
                   if r["stage_wall_s"] == r["stage_wall_s"]) or float("nan")
    dom_par = round(sum(r["task_time_s"] for r in dom) / dom_wall, 2) \
        if dom_wall == dom_wall and dom_wall > 0 else None
    print(json.dumps({"cpus": args.cpus, "replicate": args.replicate,
                      "n_way_scores": n, "wall_s": round(wall, 2),
                      "sum_stage_wall_s": round(covered, 2),
                      "n_stages": len(rows),
                      "dominant_par": dom_par}))
    for r in rows:
        print(f"  stage {r['stage']:>4} wall {r['stage_wall_s']:>7}s "
              f"gap {r['submit_gap_s']:>5}s tasks {r['tasks']:>4} "
              f"par {str(r['par']):>6} in {r['in_mb']:>8}MB "
              f"shR {r['sh_r_mb']:>7}MB shW {r['sh_w_mb']:>7}MB  {r['name']}")

    # per-round committed artifact (VERDICT r4 item 8): the profile that
    # used to run ad hoc, recorded like WORKINV.json so par-degradation
    # regressions are caught round-over-round the way byte regressions
    # are.  tests/test_bench_contract.py parses and sanity-checks it.
    import subprocess
    try:
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True, cwd=ROOT,
                             timeout=30).stdout.strip()
    except (OSError, subprocess.SubprocessError):
        sha = None
    artifact = {
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "git_sha": sha,
        "cpus": args.cpus,
        "replicate": args.replicate,
        "sf_dir": args.sf_dir,
        "wall_s": round(wall, 2),
        "n_way_scores": n,
        "n_stages": len(rows),
        "dominant_par": dom_par,
        "dominant_stages": [
            {k: r[k] for k in ("stage", "name", "tasks", "stage_wall_s",
                               "task_time_s", "par")} for r in dom],
        "stages": rows,
    }
    def _denan(v):
        if isinstance(v, float) and v != v:
            return None
        if isinstance(v, dict):
            return {k: _denan(x) for k, x in v.items()}
        if isinstance(v, list):
            return [_denan(x) for x in v]
        return v

    out_path = args.out or os.path.join(ROOT, "STAGEPROF.json")
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(_denan(artifact), fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
