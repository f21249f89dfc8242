"""Regression tests for bench.py's driver contract.

Round 2's bench line embedded the full scaling artifact, overflowed the
round driver's bounded stdout-tail window, and was recorded as
``parsed: null`` — which in turn silently disabled the per-query
regression/retry logic for the next round (it reads the latest parseable
record).  These tests pin both halves of the fix: the one-line output
stays under the window with the scaling summary shed first, and the
prior-round timing lookup falls back to BENCH_DETAIL.json instead of
returning nothing.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _base_out() -> dict:
    return {
        "metric": "headline wall time",
        "value": 53.3,
        "unit": "sec",
        "queries": {f"q{i}": 1.0 for i in range(16)},
        "sf": 0.1,
        "scaling": [{"pair": "local[1] -> local[4]", "efficiency": 0.98}],
        "detail": "BENCH_DETAIL.json",
    }


def test_compact_line_keeps_scaling_when_short():
    out = _base_out()
    line = bench.compact_line(out)
    assert len(line) <= 1900
    assert json.loads(line)["scaling"]


def test_compact_line_sheds_scaling_when_oversized():
    out = _base_out()
    out["scaling"] = [{"pair": f"p{i}", "note": "x" * 64} for i in range(40)]
    line = bench.compact_line(out)
    parsed = json.loads(line)
    assert len(line) <= 1900
    assert "scaling" not in parsed
    # the mandatory fields survive the shed
    assert parsed["queries"] and parsed["value"] == 53.3


def test_current_repo_line_fits_with_scaling():
    """The line built from the CURRENT recorded artifacts must not need
    the shed — losing the scaling summary from the driver-recorded line
    is an observability regression even though it is not a parse error."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = bench._scaling_artifact()
    with open(os.path.join(here, "BENCH_DETAIL.json"), encoding="utf-8") as fh:
        detail = json.load(fh)
    out = _base_out()
    out["queries"] = detail["timings"]
    out["scaling"] = bench._scaling_summary(art)
    line = bench.compact_line(out)
    assert len(line) <= 1900
    assert json.loads(line).get("scaling"), (
        "SCALING.json grew enough that bench.py would shed the scaling "
        "summary — trim the per-pair summary fields")


def test_scaling_summary_one_entry_per_pair():
    """The current-record list in SCALING.json grows with every input-size
    re-certification; the one-line summary must stay bounded by keeping
    only the largest-input (adequately-sized) entry per pair name."""
    art = {"pairs": [
        {"pair": "local[1] -> local[4]", "n_pages": 500_000,
         "efficiency": 0.98, "host_ceiling_efficiency": 1.0,
         "host_membw_ceiling": 0.4},
        {"pair": "local[1] -> local[4]", "n_pages": 2_000_000,
         "efficiency": 0.65, "host_ceiling_efficiency": 0.96,
         "host_membw_ceiling": 0.79},
        {"pair": "local[8] -> local[32]", "n_pages": 1_000_000,
         "efficiency": 0.22, "host_ceiling_efficiency": 0.72,
         "host_membw_ceiling": 0.16},
    ]}
    summary = bench._scaling_summary(art)
    assert len(summary) == 2
    one_four = next(s for s in summary
                    if s["pair"] == "local[1] -> local[4]")
    assert one_four["efficiency"] == 0.65  # the 2M-page entry won


def _patch_dir(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "__file__",
                        str(tmp_path / "bench.py"), raising=False)


def test_prior_round_times_skips_unparseable_and_falls_back(
        monkeypatch, tmp_path):
    (tmp_path / "BENCH_r2.json").write_text(
        json.dumps({"parsed": None, "tail": "…mid-JSON garbage"}))
    (tmp_path / "BENCH_DETAIL.json").write_text(
        json.dumps({"timings": {"cqi_score_ways": 7.1}}))
    _patch_dir(monkeypatch, tmp_path)
    name, timings = bench._prior_round_times()
    assert name == "BENCH_DETAIL.json"
    assert timings == {"cqi_score_ways": 7.1}


def test_prior_round_times_prefers_latest_round_numerically(
        monkeypatch, tmp_path):
    (tmp_path / "BENCH_r2.json").write_text(
        json.dumps({"parsed": {"queries": {"q": 2.0}}}))
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"parsed": {"queries": {"q": 10.0}}}))
    _patch_dir(monkeypatch, tmp_path)
    name, timings = bench._prior_round_times()
    assert name == "BENCH_r10.json"
    assert timings == {"q": 10.0}


def test_prior_round_times_nonempty_in_this_repo():
    """Whatever the driver recorded, the retry logic must have SOME
    per-query reference — both recorded sources going unreadable at once
    is exactly the round-2 failure shape."""
    name, timings = bench._prior_round_times()
    assert name is not None and timings


def test_stageprof_artifact_parses_and_is_consistent():
    """STAGEPROF.json (scripts/stage_profile.py) is a per-round committed
    artifact like WORKINV.json: the flagship job's per-stage achieved
    parallelism.  This contract pins the schema the round-over-round
    par-regression comparison reads — if the artifact goes missing or
    loses its dominant-stage summary, the regression check silently dies."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "STAGEPROF.json"), encoding="utf-8") as fh:
        art = json.load(fh)
    for key in ("generated_utc", "git_sha", "cpus", "wall_s",
                "n_way_scores", "dominant_par", "dominant_stages", "stages"):
        assert key in art, key
    assert art["cpus"] >= 1 and art["wall_s"] > 0
    assert art["n_way_scores"] > 0
    assert 1 <= len(art["dominant_stages"]) <= 3
    for s in art["dominant_stages"]:
        assert s["task_time_s"] >= 0 and s["tasks"] >= 1
    # achieved parallelism is bounded by the core count (small slack for
    # clock skew in the UI's per-stage timestamps)
    assert art["dominant_par"] is None or \
        0 < art["dominant_par"] <= art["cpus"] * 1.15
    pars = [s["par"] for s in art["stages"] if s.get("par")]
    assert pars and all(0 < p <= art["cpus"] * 1.15 for p in pars)
