"""Loop-closure verification + application as ONE device program.

The host verification chain (loop/detector.py::_verify_and_close, mirroring
loop_detector.cc:284-705) reads keyframe poses back for the refinement
inits, the consistency gates, the is-BA-enough test, and the pose graph —
four device->host crossings per candidate. For the pipelined front-end
(slam/pipelined.py) that is unacceptable: ONE readback permanently drops
the TPU tunnel out of speculative dispatch.

This module runs everything after RANSAC on device, conditionally:

  refinement x3 (matched / next / prev keyframes, direct multi-scale
  tracking on the stored keyframe stacks, loop_detector.cc:436-548)
  -> mutual-consistency gates (<=10 deg, <=2 cm, :575-604)
  -> pose averaging (:606-609)
  -> is-BA-enough reprojection test (<=1 px mean keypoint motion, :624-666)
  -> pose-graph LM over the whole keyframe store with the loop edge
     (:670-705, loop/pose_graph.py's jitted core)
  -> poses' = where(applied, optimized, original)

Inputs that must come from the host are host-resident already in pipelined
mode: the RANSAC initial estimate (computed from the detector's HOST
keypoints/depths) and the static odometry-edge list (from DirectBA's host
valid mirror). The outcome flag and diagnostics stay ON DEVICE; the
detector stashes them as pending events that finalize_pipelined() resolves
with the run's final readback.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.loop.pose_graph import _optimize_jit

# Keypoint clouds are padded to this bucket so every candidate (and the
# prewarm pass) shares one executable.
KEYPOINT_BUCKET = 512

MAX_ANGLE_DIFFERENCE = 3.14159265 / 180.0 * 10.0  # loop_detector.cc:577
MAX_EUCLIDEAN_DISTANCE = 0.02                     # loop_detector.cc:578
AVERAGE_PIXEL_DISTANCE_THRESHOLD = 1.0            # loop_detector.cc:655

# Closure depth-sanity gate (beyond the reference): mean |depth mismatch| of
# the refined alignment, normalized by the propagated-stddev model
# sigma(z) = z^2 / (baseline*fx) (cost_function.cuh:81-88). A TRUE closure
# refines to mm-cm alignment (ratio <= ~0.2); a perceptual-aliasing false
# match (identical texture, different geometry) converges onto incompatible
# depth fields whose residual mismatch is the scene's structure scale
# (measured ~1.3-1.5 on the aliasing stress world, where 10 of 388 aliased
# candidates otherwise survived RANSAC + the three-way refinement
# consistency gates — benchmarks/loop_retrieval_eval.py --full_verify).
DEPTH_SANITY_RATIO = 0.5
DEPTH_SANITY_MIN_OVERLAP = 200


@functools.partial(jax.jit, static_argnames=("max_depth",))
def alignment_depth_sanity(cur_depth, old_depth, old_T_cur, depth_intr,
                           baseline_fx, max_depth: float = 100.0):
  """(mean |dz| / sigma(z), overlap count) of warping cur's depth into the
  old keyframe under the refined relative pose. Nearest-neighbor sampling —
  a sanity gate, not a residual term.

  Statistic choice (ADVICE round 4, re-measured round 5 and kept as the
  MEAN): the ADVICE concern was that nearest-neighbor warping has no
  occlusion handling, so disoccluded pixels could push an untrimmed mean
  past the threshold and falsely reject true closures in occlusion-rich
  scenes. Both suggested robust alternatives were implemented and measured
  on the perceptual-aliasing stress eval (loop_retrieval_eval
  --alias_period 0.8 --full_verify, 388 aliased candidates): a masked
  MEDIAN applied 14 false closures and a lowest-80% trimmed mean still
  applied several — aliased heightmap tiles coincide in depth over most of
  the image, so any statistic that sheds the high tail also sheds exactly
  the structural-mismatch signal this gate exists to detect. The untrimmed
  mean admits 0 of 388. The occlusion risk, by contrast, has no measured
  instance (the occlusion-world protocols pass with the mean: ~30% of a
  frame behind boxes never enters the overlap because the warped depths
  differ beyond max_depth gating and RANSAC anchors the alignment), so the
  mean stays."""
  h, w = cur_depth.shape
  fx, fy, cx, cy = (depth_intr[0], depth_intr[1], depth_intr[2],
                    depth_intr[3])
  ys, xs = jnp.mgrid[0:h, 0:w]
  z = cur_depth
  valid = (z > 0) & (z < max_depth)
  px = (xs + 0.5 - cx) / fx * z
  py = (ys + 0.5 - cy) / fy * z
  p = jnp.stack([px, py, z], axis=-1)
  q = p @ old_T_cur[:3, :3].T + old_T_cur[:3, 3]
  qz = q[..., 2]
  front = qz > 1e-3
  qzs = jnp.where(front, qz, 1.0)
  u = q[..., 0] / qzs * fx + cx - 0.5
  v = q[..., 1] / qzs * fy + cy - 0.5
  ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, w - 1)
  vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, h - 1)
  inb = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
  sampled = old_depth[vi, ui]
  ok = valid & front & inb & (sampled > 0) & (sampled < max_depth)
  sigma = jnp.maximum(sampled * sampled / baseline_fx, 1e-4)
  ratio = jnp.abs(qz - sampled) / sigma
  n = jnp.sum(ok)
  mean_ratio = jnp.sum(jnp.where(ok, ratio, 0.0)) / jnp.maximum(n, 1)
  return mean_ratio, n


class DeviceClosureResult(NamedTuple):
  global_T_frame: jax.Array  # (K, 4, 4) new keyframe poses
  applied: jax.Array         # () bool
  ba_enough: jax.Array       # () bool — candidate rejected as absorbable
  consistent: jax.Array      # () bool — refinements mutually consistent
  avg_px: jax.Array          # () float — mean keypoint reprojection motion
  depth_sane: jax.Array      # () bool — aligned depth fields agree
  t_norm: jax.Array          # () float — |t| of the averaged constraint
                             # (measured camera-center distance; used by the
                             # harnesses' false-closure accounting)
  loop_ei: jax.Array         # (L,) accumulated applied-loop-edge buffer
  loop_ej: jax.Array         # (L,)
  loop_Z: jax.Array          # (L, 4, 4)
  loop_w: jax.Array          # (L,) 0 = unused slot
  loop_count: jax.Array      # () int32


# Capacity of the accumulated applied-loop-edge buffer (device side; the
# host path keeps an unbounded list, detector.applied_loop_edges).
LOOP_EDGE_BUCKET = 32


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cell_size", "num_scales",
                     "use_depth_residuals", "use_descriptor_residuals",
                     "convergence_threshold", "residual_type"))
def verify_and_close(
    kf,                      # KeyframeStore
    depth_intr, a, cfactor, baseline_fx,
    cur_slot, old_slot, nxt_slot, prv_slot,   # () int32
    old_T_cur_init,          # (4,4) RANSAC estimate (host keypoints)
    cur_pts, cur_pts_mask,   # (N,3) keypoint unprojections + (N,) mask
    proj_intr,               # (4,) detector-camera fx,fy,cx,cy (is-BA-enough)
    edges_i, edges_j, edge_weight,  # (E,) padded odometry-edge list
    kf_edge_weight,          # (capacity,) per-keyframe odometry confidence
                             # (device twin of system.keyframe_edge_weight:
                             # weak where the tracking-failure gate fired)
    loop_ei, loop_ej, loop_Z, loop_w, loop_count,  # accumulated loop edges
    *, width: int, height: int, cell_size: int, num_scales: int,
    use_depth_residuals: bool, use_descriptor_residuals: bool,
    convergence_threshold: float, residual_type: str) -> DeviceClosureResult:
  from badslam_tpu.slam.system import _odometry_jit  # late: avoids cycle

  poses = kf.global_T_frame
  g = lambda arr, i: jax.lax.dynamic_index_in_dim(arr, i, 0, keepdims=False)
  matched_frame_T_global = se3.inverse(g(poses, old_slot))

  def refine(slot):
    """cur_T_old estimate via direct tracking of keyframe `slot` against the
    current keyframe (loop_detector.cc:498-548)."""
    matched_T_this = jnp.where(slot == old_slot,
                               jnp.eye(4, dtype=jnp.float32),
                               matched_frame_T_global @ g(poses, slot))
    init = se3.inverse(old_T_cur_init) @ matched_T_this
    cur_T_tracked, _ = _odometry_jit(
        g(kf.depth, cur_slot), g(kf.normals, cur_slot),
        g(kf.intensity, cur_slot),
        g(kf.depth, slot), g(kf.normals, slot), g(kf.intensity, slot),
        depth_intr, a, cfactor, baseline_fx, init, init,
        width, height, cell_size, num_scales,
        use_depth_residuals, use_descriptor_residuals,
        True, convergence_threshold, residual_type)
    old_T_cur_ref = matched_T_this @ se3.inverse(cur_T_tracked)
    return se3.inverse(old_T_cur_ref)

  refined = jnp.stack([refine(old_slot), refine(nxt_slot), refine(prv_slot)])

  # Mutual-consistency gates over the three estimates.
  consistent = jnp.asarray(True)
  for i in range(2):
    for j in range(i + 1, 3):
      zi, zj = refined[i, :3, 2], refined[j, :3, 2]
      ang = jnp.arccos(jnp.clip(zi @ zj, -1.0, 1.0))
      dt = jnp.linalg.norm(refined[i, :3, 3] - refined[j, :3, 3])
      consistent &= (ang <= MAX_ANGLE_DIFFERENCE)
      consistent &= (dt <= MAX_EUCLIDEAN_DISTANCE)
  consistent &= jnp.all(jnp.isfinite(refined))

  cur_T_old_avg = se3.average_poses(refined)

  # Is-BA-enough reprojection test on the (host-provided) keypoint cloud.
  cur_T_global_est = cur_T_old_avg @ matched_frame_T_global
  delta = cur_T_global_est @ g(poses, cur_slot)
  moved = cur_pts @ delta[:3, :3].T + delta[:3, 3]
  fx, fy, cx, cy = proj_intr[0], proj_intr[1], proj_intr[2], proj_intr[3]

  def project(p):
    z = p[:, 2]
    okz = z > 0
    zsafe = jnp.where(okz, z, 1.0)
    return jnp.stack([fx * p[:, 0] / zsafe + cx,
                      fy * p[:, 1] / zsafe + cy], axis=-1), okz

  pe, oke = project(moved)
  pc, okc = project(cur_pts)
  both = oke & okc & cur_pts_mask
  n_both = jnp.sum(both)
  dist = jnp.linalg.norm(pe - pc, axis=1)
  avg_px = jnp.sum(jnp.where(both, dist, 0.0)) / jnp.maximum(n_both, 1)
  ba_enough = (n_both >= 5) & (avg_px <= AVERAGE_PIXEL_DISTANCE_THRESHOLD)

  # Depth-sanity gate: the refined alignment's depth fields must agree
  # (rejects perceptual-aliasing matches that survive the pose-consistency
  # gates; see DEPTH_SANITY_RATIO above).
  sanity_ratio, overlap = alignment_depth_sanity(
      g(kf.depth, cur_slot), g(kf.depth, old_slot),
      se3.inverse(cur_T_old_avg), depth_intr, baseline_fx)
  depth_sane = ((overlap >= DEPTH_SANITY_MIN_OVERLAP)
                & (sanity_ratio <= DEPTH_SANITY_RATIO))

  applied = consistent & depth_sane & jnp.logical_not(ba_enough)

  # Pose graph: odometry edges (current relative poses => zero residual)
  # weighted by the front-end's per-edge tracking confidence, every
  # previously APPLIED loop edge (accumulated below), plus the new loop
  # edge cur -> old with measurement cur_T_old_avg.
  ei = jnp.concatenate([edges_i, loop_ei, cur_slot[None]])
  ej = jnp.concatenate([edges_j, loop_ej, old_slot[None]])
  odo_Z = se3.inverse(poses[edges_i]) @ poses[edges_j]
  Z = jnp.concatenate([odo_Z, loop_Z, cur_T_old_avg[None]], axis=0)
  w = jnp.concatenate([edge_weight * kf_edge_weight[edges_j], loop_w,
                       jnp.ones((1,), jnp.float32)])
  optimized = _optimize_jit(poses, ei, ej, Z, w)
  new_poses = jnp.where(applied, optimized, poses)

  # Remember this loop edge when applied. True ring: past the bucket, new
  # closures overwrite the OLDEST slot, so recent constraints are always
  # retained (ADVICE round 4 — an append-and-stop would silently drop the
  # newest closures on long runs).
  idx = loop_count % LOOP_EDGE_BUCKET
  record = applied
  loop_ei = loop_ei.at[idx].set(jnp.where(record, cur_slot, loop_ei[idx]))
  loop_ej = loop_ej.at[idx].set(jnp.where(record, old_slot, loop_ej[idx]))
  loop_Z = loop_Z.at[idx].set(
      jnp.where(record, cur_T_old_avg, loop_Z[idx]))
  loop_w = loop_w.at[idx].set(jnp.where(record, 1.0, loop_w[idx]))
  loop_count = loop_count + record.astype(jnp.int32)

  return DeviceClosureResult(
      global_T_frame=new_poses, applied=applied, ba_enough=ba_enough,
      consistent=consistent, avg_px=avg_px, depth_sane=depth_sane,
      t_norm=jnp.linalg.norm(cur_T_old_avg[:3, 3]),
      loop_ei=loop_ei, loop_ej=loop_ej, loop_Z=loop_Z, loop_w=loop_w,
      loop_count=loop_count)
