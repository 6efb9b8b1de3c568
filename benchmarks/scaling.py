"""Multi-device weak-scaling benchmark for the sharded BA step.

Measures the BASELINE.md scaling-efficiency target (>= 0.7 weak-scaling
efficiency): per-device surfel load is held constant while the device count
grows, so ideal scaling keeps the per-iteration wall time flat. Efficiency
at n devices = t(1 device) / t(n devices).

The per-iteration work model matches the framework's masked dense design:
compute cost is proportional to surfel CAPACITY (all lanes are processed and
masked), so weak-scaling the capacity scales the real per-device load even
though the live-surfel count stays fixed.

On real multi-chip TPU hardware this reports true ICI scaling. On a virtual
CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N) all "devices"
share the same host cores, so wall-clock efficiency is NOT meaningful there
— virtual-mesh runs only validate that the harness and the collectives
execute; the report marks them `virtual: true`.

Usage:
  python benchmarks/scaling.py [--devices 1,2,4,8] [--per_device 16384]
                               [--iters 20] [--out scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_scale(n_devices: int, per_device_surfels: int, width: int,
              height: int, n_kf: int, iters: int) -> dict:
  import jax
  from jax.sharding import Mesh
  import __graft_entry__ as ge
  from badslam_tpu.parallel import sharded_ba

  devices = jax.devices()[:n_devices]
  if len(devices) < n_devices:
    return {"skipped": f"need {n_devices} devices, have {len(jax.devices())}"}
  mesh = Mesh(np.asarray(devices), (sharded_ba.SURFEL_AXIS,))

  cap = per_device_surfels * n_devices
  ba, cam = ge._tiny_problem(n_surfels=cap, n_kf=n_kf, width=width,
                             height=height)
  step = sharded_ba.make_sharded_ba_iteration(
      mesh, cam, cam, cell_size=ba.cell_size, max_pose_iterations=10)
  surfels = sharded_ba.shard_surfels(ba.surfels, mesh)
  kf = ba.kf

  # Warmup: compile + first collective.
  s, k, _ = step(surfels, kf, ba.a, ba.cfactor, ba.baseline_fx)
  jax.block_until_ready((s, k))

  t0 = time.perf_counter()
  for _ in range(iters):
    s, k, _ = step(s, k, ba.a, ba.cfactor, ba.baseline_fx)
  jax.block_until_ready((s, k))
  dt = (time.perf_counter() - t0) / iters
  return {
      "devices": n_devices,
      "surfel_capacity": cap,
      "per_device_surfels": per_device_surfels,
      "keyframes": n_kf,
      "iter_ms": round(dt * 1e3, 3),
  }


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--devices", default="1,2,4,8")
  p.add_argument("--per_device", type=int, default=16384)
  p.add_argument("--iters", type=int, default=20)
  p.add_argument("--kf", type=int, default=8)
  p.add_argument("--size", default="160x120")
  p.add_argument("--out", default=None)
  args = p.parse_args()
  w, h = (int(v) for v in args.size.split("x"))

  import jax
  platform = jax.devices()[0].platform
  virtual = platform == "cpu"

  results = []
  for n in (int(v) for v in args.devices.split(",")):
    r = run_scale(n, args.per_device, w, h, args.kf, args.iters)
    results.append(r)
    print(json.dumps(r), flush=True)

  timed = [r for r in results if "iter_ms" in r]
  report = {"platform": platform, "virtual": virtual, "results": results}
  if len(timed) >= 2:
    base = timed[0]["iter_ms"]
    for r in timed:
      r["weak_scaling_efficiency"] = round(base / r["iter_ms"], 3)
    report["summary"] = {
        "max_devices": timed[-1]["devices"],
        "efficiency_at_max": timed[-1]["weak_scaling_efficiency"],
        "target": 0.7,
        "meets_target": (timed[-1]["weak_scaling_efficiency"] >= 0.7
                         if not virtual else None),
    }
    print(json.dumps(report["summary"]), flush=True)
  if args.out:
    with open(args.out, "w") as f:
      json.dump(report, f, indent=2)


if __name__ == "__main__":
  main()
