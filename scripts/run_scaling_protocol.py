#!/usr/bin/env python
"""Full scaling-evidence protocol -> SCALING.json (recorded artifact).

Runs scripts/scaling_bench.py in alternating subprocesses (each parallelism
level gets its own JVM), takes the per-config minimum over ``--reps`` runs
(this VM shows bursty host CPU steal; min-of-N is the documented estimator),
and measures a pure-CPU multiprocessing control to establish the host's own
scaling ceiling for each pair.  Output: one SCALING.json at the repo root,
which bench.py embeds (clearly stamped as a recorded prior measurement, not
a live per-run number — a live pair would double every bench run's cost and
still measure the same host).

Protocol (default): pairs 1->4 (2M pages) and 8->32 (4M pages), min of 3.
"""

from __future__ import annotations

import argparse
import datetime
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "scripts", "scaling_bench.py")


def git_sha() -> str:
    """Code identity of the measured engine: short sha of the last commit
    touching cqi_engine + the bench script (doc-only commits must not
    split the cross-session min-of-N pool), PLUS a content hash of any
    UNCOMMITTED diff to those paths.  Without the dirty suffix, two
    protocol sessions straddling a working-tree edit share a sha and the
    pooled min mixes timings of different code (this happened on
    2026-08-18: a pre-/post-join-rework pair pooled into one summary)."""
    try:
        log = subprocess.run(
            ["git", "-C", ROOT, "log", "-1", "--format=%h", "--",
             "cqi_engine", "scripts/scaling_bench.py"],
            capture_output=True, text=True, timeout=10)
        sha = log.stdout.strip()
        if log.returncode != 0 or not sha:
            # a broken git yields '' for EVERY session — two sessions on
            # different code would then share a label and the
            # cross-session min pool would mix their timings
            return "unknown"
        diff = subprocess.run(
            ["git", "-C", ROOT, "diff", "HEAD", "--",
             "cqi_engine", "scripts/scaling_bench.py"],
            capture_output=True, text=True, timeout=10)
        if diff.returncode != 0:
            return "unknown"
        if diff.stdout:
            import hashlib
            sha += "+" + hashlib.sha256(diff.stdout.encode()).hexdigest()[:8]
        return sha
    except (OSError, subprocess.SubprocessError):
        # SubprocessError covers TimeoutExpired: a hung git must degrade
        # the label, not crash a (possibly watcher-triggered) session
        # before any run starts.
        return "unknown"


def _steal_snapshot() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat — fallback-protected
    like bench.py's twin (a malformed /proc/stat must not kill a run that
    already has timing data)."""
    try:
        with open("/proc/stat", encoding="ascii") as fh:
            vals = [int(x) for x in fh.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 1


def _bracket_membw_gbps(workers: int = 8, tasks: int = 8,
                        n_bytes: int = 64 * 1024 * 1024) -> float:
    """Short aggregate streaming-read probe (~0.5 GB of traffic).  Run
    immediately before and after each engine run, it samples the host
    bandwidth window the run actually saw — the per-SESSION mp.Pool
    controls run minutes later, after the window has often shifted, which
    is why session-level control-vs-engine correlations are noisy."""
    t0 = time.perf_counter()
    with mp.Pool(workers) as pool:
        pool.map(_membw_probe_task, [n_bytes // 8] * tasks)
    return round(tasks * n_bytes / (time.perf_counter() - t0) / 1e9, 2)


def _membw_probe_task(n_floats: int) -> float:
    import numpy as np
    return float(np.add.reduce(np.ones(n_floats, dtype=np.float64)))


def run_once(cpus: int, replicate: int, retries: int = 1) -> dict:
    """One scaling_bench subprocess; retried on failure (this VM's JVMs
    occasionally die under memory pressure / steal bursts — a crashed run
    carries no timing information, so a bounded retry is not cherry-pick).
    Each run records the host steal fraction observed during its window
    plus a bracketing bandwidth probe (before/after) so every wall time
    has an in-window host covariate."""
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_REPLICATE=str(replicate))
    last_err = None
    for attempt in range(retries + 1):
        bw_pre = _bracket_membw_gbps()
        s0, t0 = _steal_snapshot()
        try:
            out = subprocess.run([sys.executable, BENCH], env=env,
                                 capture_output=True, text=True,
                                 timeout=2400)
        except subprocess.TimeoutExpired:
            # a hung JVM is the same failure mode as a crashed one (the
            # retry's whole reason to exist) — it must consume a retry,
            # not abort the protocol and discard the session's runs
            last_err = f"timeout after 2400s (local[{cpus}] R={replicate})"
            print(f"  run local[{cpus}] R={replicate} attempt {attempt} "
                  f"TIMED OUT", flush=True)
            continue
        s1, t1 = _steal_snapshot()
        bw_post = _bracket_membw_gbps()
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith('{"harness"')]
        if out.returncode == 0 and lines:
            rec = json.loads(lines[-1])
            rec["steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 1)
            rec["membw_gbps_pre"] = bw_pre
            rec["membw_gbps_post"] = bw_post
            return rec
        last_err = (out.stderr or out.stdout or "")[-2000:]
        print(f"  run local[{cpus}] R={replicate} attempt {attempt} FAILED "
              f"(rc={out.returncode}); stderr tail:\n{last_err[-600:]}",
              flush=True)
    raise RuntimeError(f"scaling_bench failed after {retries + 1} attempts: "
                       f"{last_err}")


def _spin(args) -> float:
    # fixed-size integer workload per task; returns wall seconds
    n, = args
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + 12345) & 0x7FFFFFFF
    return acc


def _stream(args) -> float:
    # memory-bandwidth-bound workload: repeated large-array traversals
    # (the engine's Arrow/shuffle stages are bandwidth-bound, which the
    # L1-resident int-spin control cannot see)
    import numpy as np
    n, reps = args
    a = np.arange(n, dtype=np.float64)
    s = 0.0
    for _ in range(reps):
        s += float((a * 1.0000001).sum())
    return s


def _pool_time(fn, w: int, tasks: int, payload) -> float:
    t0 = time.perf_counter()
    with mp.Pool(w) as pool:
        pool.map(fn, [payload] * tasks)
    return time.perf_counter() - t0


def host_control(pair: tuple[int, int], tasks: int = 64) -> dict:
    """Host scaling ceilings for the same worker counts, independent of
    Spark: a pure-CPU (L1-resident) control and a memory-bandwidth-bound
    control.  A bandwidth-bound engine stage can legitimately scale no
    better than the bandwidth control on a single box."""
    lo, hi = pair
    out = {"pair": f"{lo}->{hi}"}
    for name, fn, payload in (
            ("cpu", _spin, (4_000_000,)),
            ("membw", _stream, (8_000_000, 6))):
        t_lo = _pool_time(fn, lo, tasks, payload)
        t_hi = _pool_time(fn, hi, tasks, payload)
        speedup = t_lo / t_hi
        out[name] = {"t_lo_s": round(t_lo, 2), "t_hi_s": round(t_hi, 2),
                     "speedup": round(speedup, 2),
                     "ceiling_efficiency": round(speedup / (hi / lo), 3)}
    out["ceiling_efficiency"] = out["cpu"]["ceiling_efficiency"]
    out["workload"] = (f"{tasks} tasks; cpu: 4e6 int ops (L1); "
                       f"membw: 6 x 64MB array traversals")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    # defaults re-sized for the post-speedup engine (see BASELINE.md
    # sessions H-J): R=100/200 now finish so fast that fixed costs and
    # cache effects dominate what the pair is supposed to measure
    ap.add_argument("--pairs", default="1:4:400,8:32:800",
                    help="comma list of lo:hi:replicate")
    args = ap.parse_args()

    pairs = []
    for spec in args.pairs.split(","):
        lo, hi, rep = (int(x) for x in spec.split(":"))
        pairs.append((lo, hi, rep))

    sha = git_sha()
    session = datetime.datetime.now(
        datetime.timezone.utc).strftime("%Y%m%dT%H%M%SZ")

    out = os.path.join(ROOT, "SCALING.json")
    prior = {}
    try:
        with open(out, encoding="utf-8") as fh:
            prior = json.load(fh)
    except (OSError, ValueError):
        pass

    runs = []
    results = {}
    n_pages_by_rep: dict[int, int] = {}
    try:
        for lo, hi, rep in pairs:
            for r in range(args.reps):
                for cpus in (lo, hi):  # alternating: steal bursts hit both
                    rec = run_once(cpus, rep)
                    rec["rep_idx"] = r
                    rec["session"] = session
                    rec["git_sha"] = sha
                    runs.append(rec)
                    key = (cpus, rep)
                    results.setdefault(key, []).append(rec["wall_s"])
                    if rec.get("n_pages"):
                        n_pages_by_rep[rep] = rec["n_pages"]
                    print(f"run local[{cpus}] R={rep} rep{r}: "
                          f"{rec['wall_s']}s (steal {rec.get('steal_pct')}%)",
                          flush=True)
    except Exception:
        # a run that fails past its retries must not discard the hours of
        # completed measurements: persist every finished raw run (prior
        # pairs/summaries untouched) before propagating — the next
        # same-sha session recovers them through the cross-session pool
        if runs:
            salvage = dict(prior)
            salvage["runs"] = prior.get("runs", []) + runs
            salvage["pairs"] = prior.get("pairs", [])
            with open(out, "w", encoding="utf-8") as fh:
                json.dump(salvage, fh, indent=1)
            print(f"protocol aborted; salvaged {len(runs)} raw runs to "
                  f"{out}", flush=True)
        raise

    # cross-session min: prior recorded runs of the SAME code (git sha) and
    # SAME (parallelism, replicate) config extend the min-of-N pool — steal
    # only ever inflates wall time, so the minimum over more observations of
    # identical work is a strictly better estimate of true cost.  Runs from
    # other code versions never mix in.
    n_prior_used = 0
    for rec in prior.get("runs", []):
        if rec.get("git_sha") == sha and "wall_s" in rec:
            key = (rec.get("parallelism"), rec.get("replicate"))
            if key in results:
                results[key].append(rec["wall_s"])
                n_prior_used += 1

    pair_summaries = []
    for lo, hi, rep in pairs:
        t_lo = min(results[(lo, rep)])
        t_hi = min(results[(hi, rep)])
        speedup = t_lo / t_hi
        ctrl = host_control((lo, hi))
        eff = speedup / (hi / lo)
        pair_summaries.append({
            "pair": f"local[{lo}] -> local[{hi}]",
            "replicate": rep,
            # the MEASURED corpus size (rep*5000 only holds for the
            # default sf0.1 documents table; a different SF_DIR would
            # record a fabricated size and mislead the largest-n_pages
            # record selection in bench._scaling_summary)
            "n_pages": n_pages_by_rep.get(rep, rep * 5000),
            "t_n_s": t_lo, "t_4n_s": t_hi,
            "speedup": round(speedup, 2),
            "efficiency": round(eff, 3),
            "host_ceiling": ctrl,
            "efficiency_vs_host_ceiling": round(
                eff / ctrl["ceiling_efficiency"], 3)
            if ctrl["ceiling_efficiency"] else None,
            "estimator": (
                f"min of {args.reps} alternating runs per config"
                + (f" + {n_prior_used} prior same-sha recorded runs"
                   if n_prior_used else "")),
            "git_sha": sha,
        })
        print(f"pair local[{lo}]->local[{hi}]: eff={eff:.3f} "
              f"(host ceiling {ctrl['ceiling_efficiency']})", flush=True)

    # merge: pairs not re-measured stay current; re-measured pairs push the
    # prior summary into pair_history (different days on this VM are
    # different host-steal regimes — superseded measurements stay visible,
    # never silently replaced).  Every raw run is kept.
    # key on (pair, replicate): the same worker pair at a different input
    # size is a different workload (fixed-overhead amortization differs),
    # so an R=800 session must not displace the R=200 summary.
    measured = {(p["pair"], p.get("replicate")) for p in pair_summaries}
    prior_pairs = [p for p in prior.get("pairs", [])
                   if (p["pair"], p.get("replicate")) not in measured]
    superseded = [p for p in prior.get("pairs", [])
                  if (p["pair"], p.get("replicate")) in measured]
    artifact = {
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "protocol": ("alternating min-of-%d per parallelism level, same "
                     "replicated sf0.1 input per pair; pure-CPU + "
                     "memory-bandwidth mp.Pool controls per pair for the "
                     "host ceilings" % args.reps),
        "pairs": prior_pairs + pair_summaries,
        "pair_history": prior.get("pair_history", []) + [
            dict(p, superseded_utc=datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"))
            for p in superseded],
        "runs": prior.get("runs", []) + runs,
    }
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
