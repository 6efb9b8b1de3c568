"""Long-sequence end-to-end integration run (VERDICT round-1 item 3).

Drives the FULL real-time pipeline — parallel BA thread, parallel loop
detection, memory watchdog, BoW retrieval — over a 500-frame 640x480
TUM-format synthetic dataset with a genuine revisit (tum_synth loop
trajectory), then self-judges:

  * ATE RMSE of the exported trajectory against ground truth;
  * threading invariants: no orphaned loop-detector entries, finite poses
    everywhere, clean BA/detector shutdown;
  * loop-closure bookkeeping consistency (events paired with counters).

This replaces toy-scale config2 as the system-level gate: nothing below
hundreds of frames at full resolution surfaces threading, drift, or
retrieval failures. Protocol mirrors the reference's benchmark usage
(main.cc:610-793: frame loop + --export_poses + external ATE evaluation).

Usage: python benchmarks/long_sequence.py [--dataset DIR] [--frames 500]
           [--size 640x480] [--out report.json] [--sequential]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ensure_dataset(path, frames, size, noise=False):
  from badslam_tpu.utils import tum_synth
  w, h = (int(v) for v in size.split("x"))
  # TWO full circles: the entire second circle continuously revisits the
  # first, so the loop-detection path is exercised throughout (one circle
  # gives a ~1-keyframe revisit window at the very end, which the k=1
  # temporal-consistency warm-up legitimately rejects — measured round 2).
  traj = tum_synth.loop_trajectory(frames, loops=2.0)
  return tum_synth.write_tum_dataset(path, traj, width=w, height=h,
                                     sensor_noise=noise)


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--dataset", default="/tmp/badslam_long_seq")
  p.add_argument("--frames", type=int, default=500)
  p.add_argument("--size", default="640x480")
  p.add_argument("--keyframe_interval", type=int, default=10)
  p.add_argument("--sequential", action="store_true",
                 help="sequential BA + detection (deterministic baseline)")
  p.add_argument("--noise", action="store_true",
                 help="apply the Kinect-class sensor-noise model")
  p.add_argument("--out", default=None)
  args = p.parse_args()

  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.eval import ate_rmse
  from badslam_tpu.io import dataset as dataset_io
  from badslam_tpu.slam.system import BadSlam

  ensure_dataset(args.dataset, args.frames, args.size, noise=args.noise)
  video = dataset_io.load_tum_dataset(args.dataset, None)
  video.enable_native_prefetch()
  n = min(args.frames, video.frame_count())

  cfg = BadSlamConfig(
      keyframe_interval=args.keyframe_interval,
      max_depth=5.0,
      parallel_ba=not args.sequential,
      parallel_loop_detection=not args.sequential,
      enable_loop_detection=True,
  )
  slam = BadSlam(cfg, video)
  report = {"frames": n, "parallel": not args.sequential,
            "noise": args.noise}

  t0 = time.perf_counter()
  for i in range(n):
    slam.process_frame(i)
    video.frames[i].clear_cache()
    if (i + 1) % 100 == 0:
      print(f"frame {i + 1}/{n}: {(i + 1) / (time.perf_counter() - t0):.2f} "
            f"FPS, {slam.direct_ba.keyframe_count} keyframes, "
            f"{slam.direct_ba.surfel_count} surfels", flush=True)
  slam.stop_ba_thread_and_wait()
  if slam.loop_detector is not None:
    slam.loop_detector.request_exit_and_wait()
  elapsed = time.perf_counter() - t0
  report["fps"] = round(n / elapsed, 2)
  report["keyframes"] = slam.direct_ba.keyframe_count
  report["surfels"] = slam.direct_ba.surfel_count

  # --- trajectory accuracy ---
  ts, poses = slam.trajectory()
  est = np.stack([T[:3, 3] for T in poses])
  gt_raw = {}
  for line in open(os.path.join(args.dataset, "groundtruth.txt")):
    v = line.split()
    gt_raw[round(float(v[0]), 4)] = np.array(
        [float(v[1]), float(v[2]), float(v[3])])
  gt = np.stack([gt_raw[round(t, 4)] for t in ts])
  rmse, _ = ate_rmse(est, gt)
  report["ate_rmse_m"] = rmse
  # Bound: interpolation-bias drift (~0.02 mm/frame at 640x480) is partially
  # absorbed by BA + loop closure; 2 mm leaves ~4x margin over measured runs
  # while still flagging any divergence-class regression instantly.
  report["ate_pass"] = bool(rmse < 2e-3)

  # --- loop-closure bookkeeping ---
  det = slam.loop_detector
  if det is not None:
    report["loop_events"] = len(det.events)
    report["loops_closed"] = det.num_loops_closed
    report["loops_ignored"] = det.num_loops_ignored
    report["vocab_trained"] = det.vocab is not None
    report["counters_consistent"] = (
        det.num_loops_closed + det.num_loops_ignored == len(det.events))

  # --- threading / store invariants ---
  valid = np.asarray(slam.direct_ba.kf.valid)
  invariants = {
      "poses_finite": bool(np.isfinite(est).all()),
      "kf_poses_finite": bool(np.isfinite(
          np.asarray(slam.direct_ba.kf.global_T_frame)[valid]).all()),
      "no_orphaned_detector_entries": (det is None or all(
          e is None or (0 <= e.kf_slot < len(valid) and valid[e.kf_slot])
          for e in det.entries)),
      "ba_thread_stopped": slam._ba_thread is None or
          not slam._ba_thread.is_alive(),
      "queue_drained": len(slam._queued_keyframes) == 0,
  }
  report["invariants"] = invariants
  # The loop-detection path must actually have been EXERCISED (events may
  # all be rejected as "BA will absorb it" on drift-free synthetic data, but
  # zero events means the gate silently lost coverage).
  loop_exercised = det is None or len(det.events) > 0
  report["loop_path_exercised"] = bool(loop_exercised)
  report["pass"] = bool(report["ate_pass"] and all(invariants.values())
                        and report.get("counters_consistent", True)
                        and loop_exercised)
  print(json.dumps(report, indent=2), flush=True)
  if args.out:
    with open(args.out, "w") as f:
      json.dump(report, f, indent=2)
  return 0 if report["pass"] else 1


if __name__ == "__main__":
  sys.exit(main())
