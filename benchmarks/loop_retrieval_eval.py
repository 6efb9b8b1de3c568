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


def sweep_trajectory(num_frames, length):
  """Back-and-forth sweep along +x at look-down attitude: the return pass
  revisits every outbound position. With a periodic texture the outbound
  pass itself contains DISTINCT places that look identical (x and x + nP)
  — the perceptual-aliasing stress case."""
  out = []
  half = num_frames // 2
  for i in range(num_frames):
    x = length * (i / half if i < half else (num_frames - i) / half)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = x
    T[1, 3] = 0.02 * np.sin(7.0 * x)  # slight lateral wobble
    out.append(T)
  return out


def run_mode(mode, frames, poses, cam):
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.loop.detector import LoopDetector

  from badslam_tpu.loop.ransac import ransac_3d3d
  from badslam_tpu.loop.detector import (RANSAC_MIN_INLIERS,
                                         RANSAC_THRESHOLD)

  cfg = BadSlamConfig()
  det = LoopDetector(cfg, cam,
                     vocab_train_size=(30 if mode == "bow" else 10 ** 9))
  tp = fp = fn = 0
  # Post-RANSAC numbers: the retrieval layer is appearance-only and MUST
  # degrade under perceptual aliasing (identical texture at distinct
  # places); the system's defense is that the GEOMETRY stays unique, so the
  # 3D-3D RANSAC verification stage (detector._verify_and_close) rejects
  # inter-tile matches. tp_v/fp_v count detections surviving RANSAC.
  tp_v = fp_v = 0
  detections = []
  t0 = time.perf_counter()
  for i, (inten, depth) in enumerate(frames):
    entry = det._extract(i, inten, depth)
    matched_db, count, matches = det._detect(entry)
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
      # Geometric verification (detector._verify_and_close stage 1).
      old = det.entries[matched_db]
      ci = np.asarray([m.queryIdx for m in matches], np.int32)
      oi = np.asarray([m.trainIdx for m in matches], np.int32)
      okd = (entry.depths[ci] > 0) & (old.depths[oi] > 0)
      verified = False
      if okd.sum() >= RANSAC_MIN_INLIERS:
        cur_pts = det._unproject(entry.keypoints[ci[okd]],
                                 entry.depths[ci[okd]])
        old_pts = det._unproject(old.keypoints[oi[okd]],
                                 old.depths[oi[okd]])
        T, inl = ransac_3d3d(cur_pts, old_pts, RANSAC_THRESHOLD, 500,
                             RANSAC_MIN_INLIERS)
        verified = T is not None
      if verified:
        if ok:
          tp_v += 1
        else:
          fp_v += 1
    elif has_gt:
      fn += 1
  elapsed = time.perf_counter() - t0
  precision = tp / max(1, tp + fp)
  recall = tp / max(1, tp + fn)
  return {"mode": mode, "database_size": len(frames),
          "tp": tp, "fp": fp, "fn": fn,
          "precision": round(precision, 4), "recall": round(recall, 4),
          "verified_tp": tp_v, "verified_fp": fp_v,
          "verified_precision": round(tp_v / max(1, tp_v + fp_v), 4),
          "verified_recall": round(tp_v / max(1, tp_v + fn), 4),
          "query_ms": round(1000.0 * elapsed / len(frames), 2),
          "pass": bool(precision >= 0.95 and recall >= 0.3)}


def run_full_verify(frames, poses, cam, width, height):
  """Drive the FULL closure chain (detector.add_keyframe: retrieval ->
  RANSAC -> dense refinement x3 -> mutual-consistency gates -> is-BA-enough
  -> pose graph) on a mapping-only BadSlam whose keyframes carry the
  ground-truth poses. Under perceptual aliasing the retrieval + RANSAC
  stages pass inter-tile candidates (geometry z-variation fits inside the
  0.06 m RANSAC threshold — measured); the system's actual defense is the
  refinement-consistency and is-BA-enough gates. With GT poses, NO event
  may be applied: true revisits are correctly "absorbable" (zero drift) and
  inter-tile matches must be rejected by the gates; any APPLIED event is a
  false closure corrupting the map."""
  import jax.numpy as jnp
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.io.dataset import Frame, RGBDVideo
  from badslam_tpu.loop.detector import LoopDetector
  from badslam_tpu.slam.system import BadSlam

  vid_frames = []
  for i, ((inten, depth), T) in enumerate(zip(frames, poses)):
    u8 = np.clip(np.floor(inten * 255.0 + 0.5), 0, 255).astype(np.uint8)
    f = Frame(rgb_path="", depth_path="", rgb_timestamp=i / 30.0,
              depth_timestamp=i / 30.0,
              global_T_frame=np.asarray(T, np.float32))
    f._rgb = np.stack([u8, u8, u8], axis=-1)
    f._depth = np.floor(depth * 5000.0 + 0.5).astype(np.uint16)
    vid_frames.append(f)
  video = RGBDVideo(frames=vid_frames, color_camera=cam, depth_camera=cam)

  cfg = BadSlamConfig(
      keyframe_interval=1, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=4,
      estimate_poses=False,            # GT poses; mapping-only
      max_num_ba_iterations_per_keyframe=0,
      do_surfel_updates=False,
      enable_loop_detection=False,     # the detector is driven manually
      initial_keyframe_capacity=len(frames),
      initial_surfel_capacity=1 << 15,
      parallel_ba=False)
  det = LoopDetector(cfg, cam, vocab_train_size=30)
  slam = BadSlam(cfg, video, loop_detector=det)
  t0 = time.perf_counter()
  for i, (inten, depth) in enumerate(frames):
    slam.process_frame(i)
    idx = slam.direct_ba.keyframe_count - 1
    det.add_keyframe(idx, inten, depth, slam)
  elapsed = time.perf_counter() - t0
  applied = [e for e in det.events if e.applied]
  false_applied = []
  for e in applied:
    if not views_overlap(poses[e.current_slot], poses[e.matched_slot]):
      false_applied.append((e.current_slot, e.matched_slot))
  rejected = [e.reason for e in det.events if not e.applied]
  from collections import Counter
  return {"events": len(det.events),
          "applied": len(applied),
          "false_applied": len(false_applied),
          "reject_reasons": dict(Counter(
              r.split("(")[0].strip() for r in rejected)),
          "wall_s": round(elapsed, 1),
          "pass": bool(len(false_applied) == 0)}


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--frames", type=int, default=400)
  p.add_argument("--size", default="320x240")
  p.add_argument("--every", type=int, default=2)
  p.add_argument("--loops", type=float, default=2.0)
  p.add_argument("--full_verify", action="store_true",
                 help="also drive the FULL closure chain (refinement + "
                      "consistency + is-BA-enough gates) on a mapping-only "
                      "system and require zero falsely-applied closures")
  p.add_argument("--alias_period", type=float, default=0.0,
                 help="perceptual-aliasing stress: repeat the world texture "
                      "with this period (meters) and drive a linear sweep "
                      "over several periods instead of the orbit")
  p.add_argument("--out", default=None)
  args = p.parse_args()
  w, h = (int(v) for v in args.size.split("x"))

  from badslam_tpu.utils import synthetic, tum_synth

  cam = synthetic.default_test_camera(w, h)
  period = args.alias_period if args.alias_period > 0 else None
  if period is not None:
    traj = sweep_trajectory(args.frames, length=6.0 * period)
  else:
    traj = tum_synth.loop_trajectory(args.frames, loops=args.loops)
  print(f"rendering {args.frames // args.every} keyframes at {w}x{h}"
        f"{f' (aliasing period {period} m)' if period else ''}...",
        flush=True)
  frames = []
  poses = []
  for i in range(0, args.frames, args.every):
    depth, inten = synthetic.render_heightmap(cam, traj[i],
                                              texture_period=period)
    frames.append((inten, depth))
    poses.append(traj[i])

  report = {"aliasing_period_m": args.alias_period or None}
  for mode in ("signature", "bow"):
    report[mode] = run_mode(mode, frames, poses, cam)
    print(json.dumps(report[mode]), flush=True)
  if args.full_verify:
    report["full_verify"] = run_full_verify(frames, poses, cam, w, h)
    print(json.dumps(report["full_verify"]), flush=True)
  if args.out:
    with open(args.out, "w") as f:
      json.dump(report, f, indent=2)


if __name__ == "__main__":
  main()
