"""Repeat-protocol driver (round-4 verdict item 2): the fault-injection
gates straddled their bounds run-to-run (kidnap ATE residual measured at
17-29% of the offset across four recorded runs), so single-run artifacts
overstate (or understate) the system. This driver runs a long_sequence
protocol N times in FRESH processes (the tunnel's dispatch mode and the
jit caches are per-process), keeps every per-run report, and writes ONE
aggregate artifact whose gates are evaluated on the MEDIAN with the spread
reported — the same honesty protocol bench.py adopted in round 4.

Usage:
  python benchmarks/repeat_protocol.py --out benchmarks/foo_report.json \
      --repeats 3 -- --kidnap 0.6 --pipelined --concurrent_ba --prewarm

Everything after `--` is passed to benchmarks/long_sequence.py verbatim;
per-run reports land next to the aggregate as <out>.run<i>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--repeats", type=int, default=3)
  p.add_argument("--out", required=True)
  p.add_argument("--timeout_s", type=float, default=4800.0,
                 help="per-run timeout (the tunnel finalize can take "
                      "~20 min at 500 frames)")
  p.add_argument("run_args", nargs=argparse.REMAINDER,
                 help="arguments for long_sequence.py (after --)")
  args = p.parse_args()
  run_args = [a for a in args.run_args if a != "--"]

  runs = []
  for i in range(args.repeats):
    run_out = f"{args.out}.run{i}.json"
    cmd = [sys.executable, os.path.join(ROOT, "benchmarks",
                                        "long_sequence.py"),
           "--out", run_out] + run_args
    print(f"[repeat {i + 1}/{args.repeats}] {' '.join(cmd)}", flush=True)
    try:
      proc = subprocess.run(cmd, cwd=ROOT, timeout=args.timeout_s)
      rc = proc.returncode
    except subprocess.TimeoutExpired:
      rc = "timeout"
    # A failing gate still writes the report; a crash/timeout may leave
    # only the .partial. Record whatever evidence exists.
    src = run_out if os.path.exists(run_out) else (
        run_out + ".partial" if os.path.exists(run_out + ".partial")
        else None)
    if src is None:
      runs.append({"rc": rc, "report": None})
      continue
    with open(src) as f:
      rep = json.load(f)
    rep["_rc"] = rc
    rep["_partial_only"] = src.endswith(".partial")
    runs.append({"rc": rc, "report": rep, "artifact": os.path.relpath(
        src, ROOT)})

  complete = [r["report"] for r in runs
              if r["report"] and not r["report"].get("_partial_only")]
  agg = {
      "protocol": " ".join(run_args),
      "repeats": len(runs),
      "complete_runs": len(complete),
      "per_run_artifacts": [r.get("artifact") for r in runs],
  }

  def collect(key):
    vals = [r[key] for r in complete if r.get(key) is not None]
    return vals

  for key in ("steady_state_fps", "fps", "ate_rmse_m",
              "ate_rmse_excl_blackout_m", "kidnap_offset_m",
              "surviving_outlier_surfels_gt_2cm", "loops_closed",
              "false_applied_closures", "prewarm_s", "finalize_s"):
    vals = collect(key)
    if vals:
      agg[key + "_runs"] = [round(float(v), 6) for v in vals]
      agg[key + "_median"] = round(float(np.median(vals)), 6)
  for r in complete:
    pf = r.get("per_frame") or {}
    agg.setdefault("p99_ms_runs", []).append(pf.get("p99_ms"))

  # Gates on the MEDIAN (not the best run): every per-run gate key that
  # long_sequence computed must hold for the median-ratio run's class.
  if collect("ate_rmse_excl_blackout_m") and collect("kidnap_offset_m"):
    ratios = [r["ate_rmse_excl_blackout_m"] / r["kidnap_offset_m"]
              for r in complete]
    agg["ate_ratio_runs"] = [round(float(v), 4) for v in ratios]
    agg["ate_ratio_median"] = round(float(np.median(ratios)), 4)
    agg["ate_ratio_spread_pct"] = round(
        100.0 * (max(ratios) - min(ratios)) / max(1e-9, np.median(ratios)),
        1)
    agg["ate_pass"] = bool(np.median(ratios) < 0.25)
  else:
    agg["ate_pass"] = bool(complete and all(
        r.get("ate_pass", False) for r in complete))
  agg["map_pass"] = bool(complete and np.median(
      [1.0 if r.get("map_pass") else 0.0 for r in complete]) >= 0.5)
  closure_keys = ("counters_consistent", "loop_path_exercised")
  agg["all_runs_consistent"] = bool(complete and all(
      all(r.get(k, True) for k in closure_keys) for r in complete))
  closures = collect("loops_closed")
  n_required = (len(complete[0].get("blackout_windows", []) or [None])
                if complete and "kidnap_offset_m" in complete[0] else 0)
  agg["closures_required"] = n_required
  agg["closures_pass"] = bool(
      n_required == 0 or (closures and np.median(closures) >= n_required))
  # Aliasing protocol: zero false applied closures in EVERY run.
  fac = collect("false_applied_closures")
  if "--alias_period" in run_args:
    agg["false_closure_pass"] = bool(complete and fac and max(fac) == 0)
  else:
    agg["false_closure_pass"] = True
  agg["pass"] = bool(
      len(complete) == len(runs) and len(complete) >= 3
      and agg["ate_pass"] and agg["map_pass"]
      and agg["all_runs_consistent"] and agg["closures_pass"]
      and agg["false_closure_pass"])
  with open(args.out, "w") as f:
    json.dump(agg, f, indent=2)
  print(json.dumps(agg, indent=2), flush=True)
  return 0 if agg["pass"] else 1


if __name__ == "__main__":
  sys.exit(main())
