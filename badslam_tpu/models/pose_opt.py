"""Frame-to-model pose estimation: Gauss-Newton on the direct cost.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
direct_ba_alternating.cc:42-283 (``EstimateFramePose``): up to 30 GN
iterations; per iteration accumulate 6x6 H and 6-vector b over all surfels
(depth point-to-plane + two descriptor residuals), solve H x = b, apply
``T <- T * exp(-x)``, stop on IsScale1PoseEstimationConverged
(convergence_analysis.h:45-52).

TPU-native design: the reference pays one device->host transfer + CPU LDLT per
iteration (SURVEY.md hot loop 1); here the whole GN loop — including the 6x6
solve and the convergence test — runs on-device inside one
``lax.while_loop``, with the H/b reduction as (6,N)x(N,6) matmuls.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import DepthToColorTransform, PinholeCamera
from badslam_tpu.models import association, cost
from badslam_tpu.models.association import DepthParamsArrays
from badslam_tpu.models.surfels import SurfelStore

# convergence_analysis.h:45-52
_TRANSLATION_CONVERGENCE_THRESHOLD = 1e-6
_ROTATION_SCALE = 10.0  # translation_threshold / rotation_threshold


def is_scale1_converged(x: jax.Array) -> jax.Array:
  scaled = x.at[3:6].multiply(_ROTATION_SCALE)
  return jnp.sum(scaled * scaled) < _TRANSLATION_CONVERGENCE_THRESHOLD


def solve_6x6(H: jax.Array, b: jax.Array) -> jax.Array:
  """6x6 GN solve in f32 with Jacobi equilibration + iterative refinement.

  The reference solves in double precision (direct_ba_alternating.cc:206,
  pairwise_frame_tracking.cc:561); a plain f32 solve loses the weak
  direction of ill-conditioned H entirely (translation and rotation columns
  differ by the scene scale, squaring into cond(H) ~ 1e6-1e10; measured
  5.27 relative error at cond 5.6e9 vs 0.08 equilibrated, 0.02 for f64).
  Un-equilibrated solving made long odometry-only runs crawl along the
  weak direction and diverge."""
  d = jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-30))
  s = 1.0 / d
  Hs = H * s[:, None] * s[None, :]
  bs = b * s
  y = jnp.linalg.solve(Hs, bs)
  for _ in range(2):
    r = bs - Hs @ y
    y = y + jnp.linalg.solve(Hs, r)
  return y * s


def accumulate_pose_h_b(
    global_T_frame: jax.Array,
    surfels: SurfelStore,
    kf_depth: jax.Array,
    kf_normals: jax.Array,
    kf_intensity: jax.Array,
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    dp: DepthParamsArrays,
    use_depth_residuals: bool = True,
    use_descriptor_residuals: bool = True,
    compute_cost: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
  """One evaluation of (H, b[, cost, residual_count]) at the given pose
  (AccumulatePoseEstimationCoeffsCUDAKernel, kernel_opt_pose.cu:252-383)."""
  frame_T_global = se3.inverse(global_T_frame)
  assoc = association.associate_surfels(
      surfels.pos, surfels.normal, surfels.valid, frame_T_global,
      kf_depth, kf_normals, depth_cam, dp,
  )

  H = jnp.zeros((6, 6), jnp.float32)
  b = jnp.zeros((6,), jnp.float32)
  total_cost = jnp.zeros((), jnp.float32)
  res_count = jnp.zeros((), jnp.int32)

  if use_depth_residuals:
    unproj = depth_cam.unproject_center(
        assoc.px.astype(jnp.float32), assoc.py.astype(jnp.float32),
        assoc.calibrated_depth,
    )
    r = cost.raw_depth_residual(
        unproj, assoc.local_pos, assoc.local_normal, assoc.inv_stddev
    )
    J = cost.depth_residual_pose_jacobian(unproj, assoc.local_normal, assoc.inv_stddev)
    w = cost.depth_weight(r)
    Hd, bd = cost.accumulate_h_b(J, r, w, assoc.mask)
    H = H + Hd
    b = b + bd
    if compute_cost:
      total_cost = total_cost + jnp.sum(
          jnp.where(assoc.mask, cost.weighted_depth_cost(r), 0.0))
      res_count = res_count + jnp.sum(assoc.mask.astype(jnp.int32))

  if use_descriptor_residuals:
    d2c = DepthToColorTransform.between(depth_cam, color_cam)
    color_pxy, in_color = d2c.apply(assoc.pxy)
    dmask = assoc.mask & in_color
    t1_pxy, t2_pxy = cost.tangent_projections(
        surfels.pos, surfels.normal, surfels.radius_sq,
        frame_T_global[0:3, 0:3], frame_T_global[0:3, 3], color_cam,
    )
    r1, r2, gx1, gy1, gx2, gy2 = cost.descriptor_terms_fused(
        kf_intensity, color_pxy, t1_pxy, t2_pxy, surfels.desc)
    # Scale gradients by the *center-convention* focal lengths
    # (kernel_opt_pose.cu:117-120; fx is identical in both conventions).
    J1 = cost.projected_position_pose_jacobian(
        gx1 * color_cam.fx, gy1 * color_cam.fy, assoc.local_pos)
    J2 = cost.projected_position_pose_jacobian(
        gx2 * color_cam.fx, gy2 * color_cam.fy, assoc.local_pos)
    w1 = cost.descriptor_weight(r1)
    w2 = cost.descriptor_weight(r2)
    H1, b1 = cost.accumulate_h_b(J1, r1, w1, dmask)
    H2, b2 = cost.accumulate_h_b(J2, r2, w2, dmask)
    H = H + H1 + H2
    b = b + b1 + b2
    if compute_cost:
      total_cost = total_cost + jnp.sum(
          jnp.where(dmask, cost.weighted_descriptor_cost(r1), 0.0))
      res_count = res_count + jnp.sum(dmask.astype(jnp.int32))

  return H, b, total_cost, res_count


def estimate_frame_pose(
    global_T_frame_init: jax.Array,
    surfels: SurfelStore,
    kf_depth: jax.Array,
    kf_normals: jax.Array,
    kf_intensity: jax.Array,
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    dp: DepthParamsArrays,
    use_depth_residuals: bool = True,
    use_descriptor_residuals: bool = True,
    max_iterations: int = 30,
) -> Tuple[jax.Array, jax.Array]:
  """Returns (global_T_frame_estimate, converged)."""

  def cond(state):
    _, it, converged = state
    return (it < max_iterations) & jnp.logical_not(converged)

  def body(state):
    T, it, _ = state
    H, b, _, _ = accumulate_pose_h_b(
        T, surfels, kf_depth, kf_normals, kf_intensity,
        depth_cam, color_cam, dp,
        use_depth_residuals, use_descriptor_residuals,
    )
    x = solve_6x6(H, b)
    # Guard: a singular H (no associations) must not poison the pose.
    x = jnp.where(jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))
    T_new = T @ se3.exp(-x)
    return (T_new, it + 1, is_scale1_converged(x))

  init = (global_T_frame_init, jnp.zeros((), jnp.int32), jnp.zeros((), bool))
  T, _, converged = jax.lax.while_loop(cond, body, init)
  return T, converged


def estimate_frame_poses_batched(
    global_T_frame_init: jax.Array,  # (K, 4, 4)
    optimize_mask: jax.Array,        # (K,) bool — keyframes to optimize
    surfels: SurfelStore,
    kf_depth: jax.Array,             # (K, H, W)
    kf_normals: jax.Array,           # (K, H, W, 2)
    kf_intensity: jax.Array,         # (K, H, W)
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    dp: DepthParamsArrays,
    use_depth_residuals: bool = True,
    use_descriptor_residuals: bool = True,
    max_iterations: int = 30,
    kf_chunk: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
  """All keyframes' frame-to-model pose GN at once.

  The reference's BA pose step loops keyframes sequentially on the host
  (direct_ba_alternating.cc:543-577) — but within one alternation iteration
  each keyframe's pose problem is independent (the surfel map is fixed), so
  on TPU we vmap the whole GN over the keyframe axis and run one shared
  ``lax.while_loop`` with per-keyframe convergence lanes.

  ``kf_chunk`` bounds the H/b accumulation's live intermediates: the full
  vmap materializes (K x surfel_capacity)-proportional temporaries, which
  at production scale (256 KF x 2M surfels) needs ~80 GB of HBM — 5x a v5e
  chip. Chunking runs the vmap ``kf_chunk`` keyframes at a time under
  ``lax.map`` (sequential chunks, parallel within a chunk), trading a
  K/kf_chunk-deep loop for a K/kf_chunk memory reduction. None (default)
  keeps the single full-width vmap.

  Returns (global_T_frame (K,4,4), moved (K,) bool). ``moved`` mirrors the
  reference's frame_moved = !IsScale1PoseEstimationConverged(diff.log()):
  True iff the final GN update was still above the convergence threshold.
  """

  def h_b_one(T, depth, normals, intensity):
    H, b, _, _ = accumulate_pose_h_b(
        T, surfels, depth, normals, intensity, depth_cam, color_cam, dp,
        use_depth_residuals, use_descriptor_residuals)
    return H, b

  K = global_T_frame_init.shape[0]
  if kf_chunk is not None and 0 < kf_chunk < K:
    C = int(kf_chunk)
    n_chunks = -(-K // C)
    pad = n_chunks * C - K

    def h_b_all(T, depth, normals, intensity):
      def chunked(x):
        if pad:
          x = jnp.concatenate(
              [x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
        return x.reshape((n_chunks, C) + x.shape[1:])

      H, b = jax.lax.map(
          lambda a: jax.vmap(h_b_one, in_axes=(0, 0, 0, 0))(*a),
          (chunked(T), chunked(depth), chunked(normals), chunked(intensity)))
      return (H.reshape((n_chunks * C, 6, 6))[:K],
              b.reshape((n_chunks * C, 6))[:K])
  else:
    h_b_all = jax.vmap(h_b_one, in_axes=(0, 0, 0, 0))

  def cond(state):
    _, it, done = state
    return (it < max_iterations) & jnp.logical_not(jnp.all(done))

  def body(state):
    T, it, done = state
    H, b = h_b_all(T, kf_depth, kf_normals, kf_intensity)
    x = jax.vmap(solve_6x6)(H, b)
    x = jnp.where(
        jnp.all(jnp.isfinite(x), axis=-1, keepdims=True), x, jnp.zeros_like(x))
    step = jnp.where(done[:, None], 0.0, x)
    T_new = T @ se3.exp(-step)
    converged_now = jax.vmap(is_scale1_converged)(x)
    return (T_new, it + 1, done | converged_now)

  # Lanes not selected for optimization start "done" and never move.
  init = (global_T_frame_init, jnp.zeros((), jnp.int32), ~optimize_mask)
  T, _, _ = jax.lax.while_loop(cond, body, init)
  # frame_moved test on the TOTAL pose change, exactly as the reference:
  # pose_difference = frame_T_global_old * global_T_frame_new
  # (direct_ba_alternating.cc:564-566).
  diff = se3.inverse(global_T_frame_init) @ T
  moved = optimize_mask & ~jax.vmap(is_scale1_converged)(jax.vmap(se3.log)(diff))
  return T, moved
