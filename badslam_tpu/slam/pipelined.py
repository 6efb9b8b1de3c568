"""Transfer-free pipelined front-end: the per-frame state machine on device.

Why this exists (PERF.md "tunnel dispatch modes"): the axon TPU tunnel
speculatively streams dispatches until the process's FIRST device->host
transfer, after which every call pays ~1.5-1.9 ms round trips and
multi-kernel programs degrade up to 640x. The normal front-end reads the
tracked pose back every frame (motion-model history, keyframe bookkeeping,
bad_slam.cc:937-942), so end-to-end runs through the tunnel sit in the sync
mode even though the device math supports >1000 FPS (PERF.md front-end
table). On direct-attached TPU the same restructuring removes one host sync
per frame from the critical path.

What moves on device (vs system.BadSlam's host equivalents):
  - the constant-velocity motion-model history (<= 3 relative poses,
    bad_slam.cc:763-825) lives in a (3, 4, 4) device array, most recent
    LAST; the two-hypothesis prediction, prediction sanity guard,
    tracking-failure gate, and SO(3) renormalization (system.py
    run_odometry/predict_frame_pose) run inside the per-frame program;
  - per-frame poses are recorded RELATIVE to the base keyframe in a
    preallocated (N, 4, 4) device trajectory, updated in place (donated);
  - keyframe poses enter the store as device values:
    store_pose[base_slot] @ relative — never read back;
  - BA runs in DirectBA's transfer_free mode (host activation mirrors, no
    convergence-scalar reads), one iteration per frame while budget
    remains — the parallel-BA thread's schedule (bad_slam.cc:1268-1289);
  - loop-detection features come from the HOST image copies (the reference
    also extracts detection features on the CPU, bad_slam.cc:1014-1024);
    only an actual closure application touches device state (rare, and
    free on direct-attached hardware).

finalize() performs the run's only mandatory transfers — the relative
trajectory and the final keyframe poses — and composes global poses per
frame, re-anchoring each frame to its base keyframe's FINAL pose (the
trajectory-deformation analog for a pipelined run: the reference
interpolates keyframe pose changes onto interior frames,
trajectory_deformation.cc:45-130; anchoring to the tracking base keyframe
applies exactly the base's change).

The transfer-free property is proven by tests/test_pipelined.py, which runs
the frame loop under jax.transfer_guard_device_to_host("disallow").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry import se3


class PipelinedState:
  """Device-resident front-end state + its host-side static bookkeeping."""

  def __init__(self, num_frames: int):
    eye = jnp.eye(4, dtype=jnp.float32)
    self.hist = jnp.tile(eye, (3, 1, 1))     # base_kf_T_frame, recent last
    self.hist_n = 0                          # valid entries (from the end)
    self.traj_rel = jnp.tile(eye, (num_frames, 1, 1))
    # Base keyframe slot per frame at track time; -1 = untracked.
    self.traj_slot = np.full(num_frames, -1, np.int32)
    self.base_slot = -1
    # Tracking-failure accumulator since the last keyframe (device scalar;
    # the gate fires ON DEVICE, so the host never reads it): feeds the
    # keyframe odometry-edge confidence below.
    self.fail_acc = jnp.zeros((), jnp.float32)
    # Per-keyframe odometry-edge confidence (device, sized to the keyframe
    # store capacity; grown alongside it): weight of the pose-graph edge
    # from the previous keyframe to this one. An edge formed while the
    # tracking-failure gate fired (constant-position fallback — the pose is
    # a GUESS, not a measurement) gets WEAK_EDGE_WEIGHT, so a loop-closure
    # pose graph localizes its correction at the kidnap/blackout edge
    # instead of spreading it along the whole trajectory.
    self.edge_weight = None  # lazily sized to kf capacity

  def ensure_edge_capacity(self, capacity: int, mesh=None):
    if self.edge_weight is None:
      self.edge_weight = jnp.ones((capacity,), jnp.float32)
    elif self.edge_weight.shape[0] < capacity:
      self.edge_weight = jnp.concatenate(
          [self.edge_weight,
           jnp.ones((capacity - self.edge_weight.shape[0],), jnp.float32)])
    if mesh is not None:
      # Distributed back-end: this array feeds SPMD programs whose other
      # inputs are placed over the mesh; a device-0-committed array there
      # deadlocks the collective rendezvous (7-of-8 threads arrive).
      from badslam_tpu.parallel import sharded_ba
      self.edge_weight = jax.device_put(self.edge_weight,
                                        sharded_ba.replicated(mesh))


# Pose-graph weight of an odometry edge whose tracking failed (see
# PipelinedState.edge_weight). Non-zero: the edge still connects the graph,
# but contributes ~nothing — the verified loop edge dominates it.
WEAK_EDGE_WEIGHT = 0.05


def _sane_prediction(est: jax.Array, fallback: jax.Array) -> jax.Array:
  """predict_frame_pose's divergence guard, on device: non-finite or absurd
  predictions fall back; sane ones are re-orthonormalized (the motion model
  squares relative poses, doubling any rotation-block defect)."""
  bad = jnp.logical_or(~jnp.all(jnp.isfinite(est)),
                       jnp.linalg.norm(est[:3, 3]) > 10.0)
  return jnp.where(bad, fallback, se3.orthonormalize(est))


def _predict(hist: jax.Array, hist_n: int, use_motion_model: bool):
  """Two constant-velocity hypotheses from the device history
  (bad_slam.cc:763-825; hist[2] = most recent relative pose)."""
  last = hist[2]
  if use_motion_model and hist_n >= 2:
    est1 = last @ se3.inverse(hist[1]) @ last
  else:
    est1 = last
  if use_motion_model and hist_n >= 3:
    prev_T_last = se3.inverse(hist[0]) @ hist[1]
    est2 = hist[1] @ prev_T_last @ prev_T_last
  else:
    est2 = est1
  fallback = jnp.where(jnp.all(jnp.isfinite(last)), last,
                       jnp.eye(4, dtype=last.dtype))
  return _sane_prediction(est1, fallback), _sane_prediction(est2, fallback)


@functools.partial(
    jax.jit,
    donate_argnums=(11,),  # traj_rel is updated in place
    static_argnames=(
        "hist_n", "width", "height", "cell_size", "num_scales",
        "use_depth_residuals", "use_descriptor_residuals",
        "use_motion_model", "convergence_threshold", "residual_type",
        "min_resid", "max_speed"))
def track_frame(
    base_depth, base_normals, base_intensity,
    tracked_raw_depth, tracked_normals, tracked_intensity,
    depth_intr, a, cfactor, baseline_fx,
    hist, traj_rel, frame_index, fail_acc, force_fail,
    *, hist_n: int, width: int, height: int, cell_size: int,
    num_scales: int, use_depth_residuals: bool,
    use_descriptor_residuals: bool, use_motion_model: bool,
    convergence_threshold: float, residual_type: str,
    min_resid: int, max_speed: float):
  """One frame of tracking, fully on device: prediction -> multi-scale
  pairwise GN -> renormalization -> failure gate -> history/trajectory
  update. fail_acc accumulates gate firings since the last keyframe (feeds
  the odometry-edge confidence); force_fail (0/1 scalar) injects a failure
  — the fault-injection seam for kidnap/blackout protocols (a covered lens
  manifests exactly as the gate firing). Returns
  (hist', traj_rel', fail_acc')."""
  from badslam_tpu.slam.system import _odometry_jit  # late: avoids cycle
  est1, est2 = _predict(hist, hist_n, use_motion_model)
  pose, n_resid = _odometry_jit(
      base_depth, base_normals, base_intensity,
      tracked_raw_depth, tracked_normals, tracked_intensity,
      depth_intr, a, cfactor, baseline_fx, est1, est2,
      width, height, cell_size, num_scales,
      use_depth_residuals, use_descriptor_residuals,
      True, convergence_threshold, residual_type)
  pose = se3.orthonormalize(pose)
  # Tracking-failure gate (system.py run_odometry): too few associated
  # pixels or an absurd inter-frame speed -> constant-position fallback.
  prev_rel = hist[2]
  speed = jnp.linalg.norm(pose[:3, 3] - prev_rel[:3, 3])
  bad = jnp.logical_or(
      jnp.logical_or(~jnp.all(jnp.isfinite(pose)), n_resid < min_resid),
      speed > max_speed)
  bad = jnp.logical_or(bad, force_fail > 0)
  pose = jnp.where(bad, prev_rel, pose)
  hist = jnp.concatenate([hist[1:], pose[None]], axis=0)
  traj_rel = traj_rel.at[frame_index].set(pose)
  fail_acc = jnp.maximum(fail_acc, bad.astype(jnp.float32))
  return hist, traj_rel, fail_acc


@jax.jit
def keyframe_pose(kf_global_T_frame, base_slot, hist):
  """New keyframe's global pose: base keyframe's CURRENT store pose composed
  with the tracked relative pose (bad_slam.cc:1029-1037 semantics, without
  the host round trip)."""
  return se3.orthonormalize(kf_global_T_frame[base_slot] @ hist[2])


@jax.jit
def record_edge_weight(edge_weight, slot, fail_acc):
  """Write the new keyframe's odometry-edge confidence from the device
  failure accumulator (WEAK_EDGE_WEIGHT if the tracking-failure gate fired
  anywhere since the last keyframe — the edge is a constant-position guess,
  not a measurement) and reset the accumulator. Returns
  (edge_weight', fail_acc')."""
  w = jnp.where(fail_acc > 0, WEAK_EDGE_WEIGHT, 1.0)
  return edge_weight.at[slot].set(w), jnp.zeros((), jnp.float32)


@jax.jit
def rebase_history(hist):
  """Rebase the motion-model history onto a new base keyframe
  (bad_slam.cc:1062-1075): every entry becomes relative to the latest
  frame (= the new keyframe), whose own entry becomes identity."""
  last_inv = se3.inverse(hist[2])
  rebased = jax.vmap(lambda T: se3.orthonormalize(last_inv @ T))(hist)
  return rebased.at[2].set(jnp.eye(4, dtype=hist.dtype))


def finalize(state: PipelinedState, kf_global_T_frame,
             keyframe_frame_indices, last_frame_index: int):
  """The run's only mandatory device->host transfers: read the relative
  trajectory and the final keyframe poses, compose global poses. Returns
  {frame_index: (4,4) np.ndarray} for every tracked frame."""
  from badslam_tpu.geometry import se3_np
  rel = np.asarray(state.traj_rel)
  kf_poses = np.asarray(kf_global_T_frame)
  out = {}
  for i in range(last_frame_index + 1):
    s = state.traj_slot[i]
    if s >= 0:
      out[i] = se3_np.orthonormalize(
          (kf_poses[s] @ rel[i]).astype(np.float32))
  # Keyframe frames re-anchor to their own (BA-optimized) store pose.
  for slot, fi in enumerate(keyframe_frame_indices):
    if fi <= last_frame_index:
      out[fi] = kf_poses[slot].astype(np.float32)
  return out
