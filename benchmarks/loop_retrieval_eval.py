"""Loop-closure retrieval precision/recall at scale (VERDICT round-1 item 5).

Builds a 2-revisit loop trajectory over the synthetic heightmap world,
extracts a keyframe every Nth frame (200+ database entries), and measures the
retrieval layer alone (place recognition, no geometric verification):

  ground-truth positive: an earlier, non-recent keyframe exists within
  0.08 m translation and 15 deg viewing angle;
  a detection is correct if the matched keyframe is within those bounds.

Reports precision/recall for both retrieval modes:
  signature  — 256-bit majority-vote prefilter (round-1 mechanism)
  bow        — online hierarchical BoW vocabulary (loop/bow.py)

Usage: python benchmarks/loop_retrieval_eval.py [--frames 400] [--size WxH]
       [--every 2] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Ground-truth criteria on the heightmap world (surface at z ~= 1):
#   correctness of a match  = the two views image the same surface region
#     (central-ray ground intersections within OVERLAP_THRESH — the camera
#     footprint at 1 m is ~1 m wide, so 0.35 m center distance keeps >50%
#     overlap; geometric verification handles the relative pose from there);
#   existence of a revisit  = an earlier, non-recent keyframe whose ground
#     point is within REVISIT_THRESH (a clear same-place pair).
OVERLAP_THRESH = 0.35
REVISIT_THRESH = 0.10


def ground_point(T):
  """Intersection of the camera's central ray with the z=1 surface plane."""
  p = T[:3, 3]
  d = T[:3, 2]
  t = (1.0 - p[2]) / max(float(d[2]), 1e-6)
  return p + t * d


def views_overlap(Ta, Tb):
  return np.linalg.norm(ground_point(Ta) - ground_point(Tb)) < OVERLAP_THRESH


def is_revisit(Ta, Tb):
  return np.linalg.norm(ground_point(Ta) - ground_point(Tb)) < REVISIT_THRESH


def run_mode(mode, frames, poses, cam):
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.loop.detector import LoopDetector

  cfg = BadSlamConfig()
  det = LoopDetector(cfg, cam,
                     vocab_train_size=(30 if mode == "bow" else 10 ** 9))
  tp = fp = fn = 0
  detections = []
  t0 = time.perf_counter()
  for i, (inten, depth) in enumerate(frames):
    entry = det._extract(i, inten, depth)
    matched_db, count, _ = det._detect(entry)
    det.entries.append(entry)
    has_gt = any(
        is_revisit(poses[i], poses[j])
        for j in range(max(0, i - det.recent_exclude)))
    if matched_db is not None:
      ok = views_overlap(poses[i], poses[matched_db])
      detections.append((i, matched_db, ok))
      if ok:
        tp += 1
      else:
        fp += 1
    elif has_gt:
      fn += 1
  elapsed = time.perf_counter() - t0
  precision = tp / max(1, tp + fp)
  recall = tp / max(1, tp + fn)
  return {"mode": mode, "database_size": len(frames),
          "tp": tp, "fp": fp, "fn": fn,
          "precision": round(precision, 4), "recall": round(recall, 4),
          "query_ms": round(1000.0 * elapsed / len(frames), 2),
          "pass": bool(precision >= 0.95 and recall >= 0.3)}


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--frames", type=int, default=400)
  p.add_argument("--size", default="320x240")
  p.add_argument("--every", type=int, default=2)
  p.add_argument("--loops", type=float, default=2.0)
  p.add_argument("--out", default=None)
  args = p.parse_args()
  w, h = (int(v) for v in args.size.split("x"))

  from badslam_tpu.utils import synthetic, tum_synth

  cam = synthetic.default_test_camera(w, h)
  traj = tum_synth.loop_trajectory(args.frames, loops=args.loops)
  print(f"rendering {args.frames // args.every} keyframes at {w}x{h}...",
        flush=True)
  frames = []
  poses = []
  for i in range(0, args.frames, args.every):
    depth, inten = synthetic.render_heightmap(cam, traj[i])
    frames.append((inten, depth))
    poses.append(traj[i])

  report = {}
  for mode in ("signature", "bow"):
    report[mode] = run_mode(mode, frames, poses, cam)
    print(json.dumps(report[mode]), flush=True)
  if args.out:
    with open(args.out, "w") as f:
      json.dump(report, f, indent=2)


if __name__ == "__main__":
  main()
