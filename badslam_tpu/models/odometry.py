"""Pairwise (frame-to-frame) direct tracking: multi-scale Gauss-Newton.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
pairwise_frame_tracking.cc:153-676 (``TrackFramePairwise``) and
kernel_opt_pose.cu:422-711 (``..._FromImagesCUDAKernel_GradientXY``):

  * coarse-to-fine over ``num_scales`` pyramid levels (finest used level is 1
    unless ``use_pyramid_level_0``), scaling_factor = 2^scale;
  * per-scale GN: <= 30 iterations, update ``T <- T * exp(-damping * x)`` with
    damping 0.25 / 0.5 on the two coarsest scales (:576-585);
  * per-scale two-hypothesis selection by residual count (2x margin) then cost
    (:428-511);
  * convergence on IsScaleNPoseEstimationConverged (convergence_analysis.h:56-63);
  * residuals per *base*-frame pixel projected into the tracked frame:
    point-to-plane depth residual + two "gradient x/y" descriptor residuals
    whose base-side descriptor compares the pixel with its right/bottom
    neighbors, the neighbors' depths induced by the center pixel's plane
    (kernel_opt_pose.cu:502-570);
  * depth Tukey parameter and descriptor weights are scaled by
    ``threshold_factor = scaling_factor`` per scale.

TPU design: each pyramid level is a statically-shaped dense pass (one fused
elementwise+gather program per GN iteration); the GN loop with convergence
break is a ``lax.while_loop``; the whole coarse-to-fine schedule compiles into
a single jitted function. The reference's per-iteration device->host H/b
download + CPU solve (SURVEY.md HOT LOOP 1) is replaced by an on-device 6x6
solve.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.models import cost
from badslam_tpu.models.association import (
    COS_NORMAL_COMPATIBILITY_THRESHOLD,
    DEPTH_TUKEY_PARAMETER,
    depth_residual_inv_stddev,
)
from badslam_tpu.models.pose_opt import solve_6x6
from badslam_tpu.ops import interp
from badslam_tpu.ops.depth_proc import normals_3d
from badslam_tpu.ops.pyramid import FramePyramidLevel, build_pyramid

# convergence_analysis.h:56-63. The reference's constant was tuned for
# 640x480 cameras via its convergence-analysis mode; at lower resolutions
# the photometric cost plateau produces sub-threshold steps far from the
# optimum, so the threshold is a parameter (default = reference value).
_SCALE_N_THRESHOLD = 1e-8


def is_scale_n_converged(x: jax.Array, scaling_factor: float,
                         threshold: float = _SCALE_N_THRESHOLD) -> jax.Array:
  # rotation_threshold == translation_threshold at scale N -> no rescale.
  return jnp.sum(x * x) < (scaling_factor * scaling_factor) * threshold


class FrameToFrameResiduals(NamedTuple):
  mask: jax.Array        # (P,) fully-visible pixels
  depth_r: jax.Array     # (P,)
  depth_J: jax.Array     # (P, 6)
  desc_r1: jax.Array     # (P,)
  desc_r2: jax.Array     # (P,)
  desc_J1: jax.Array     # (P, 6)
  desc_J2: jax.Array     # (P, 6)


def _frame_to_frame_terms(
    tracked_T_base: jax.Array,
    base: FramePyramidLevel,
    tracked: FramePyramidLevel,
    depth_cam: PinholeCamera,
    baseline_fx,
    threshold_factor: float,
    use_descriptor_residuals: bool,
    residual_type: str = "gradient_xy",
) -> FrameToFrameResiduals:
  """All residuals/Jacobians for one pyramid level at the given relative pose.

  Both frames' intensity images live in the depth-camera intrinsics (the
  reference resamples the base color there and we do the same for the tracked
  frame; for identical depth/color cameras this matches exactly).

  ``residual_type``: "gradient_xy" (paper default; two x/y-gradient
  descriptor residuals, kernel_opt_pose.cu:423-711) or "gradmag" (one
  photometric residual on precomputed Sobel gradient-magnitude images,
  kernel_opt_pose.cu:714-938 + cost_function.cuh:322-352). In gradmag mode
  the pyramid levels' ``intensity`` field must hold the gradient-magnitude
  image (the reference likewise builds its pyramid from the gradmag image,
  pairwise_frame_tracking.cc:119-150).
  """
  h, w = base.depth.shape
  ys, xs = jnp.meshgrid(
      jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
      indexing="ij",
  )
  xs = xs.ravel()
  ys = ys.ravel()
  base_depth = base.depth.ravel()
  d_ok = base_depth > 0.0

  R = tracked_T_base[0:3, 0:3]
  t = tracked_T_base[0:3, 3]

  base_pts = depth_cam.unproject_center(xs, ys, jnp.where(d_ok, base_depth, 1.0))
  local = base_pts @ R.T + t
  z_ok = local[:, 2] > 0.0
  pxy = depth_cam.project_corner(jnp.where(z_ok[:, None], local, jnp.asarray([0.0, 0.0, 1.0])))
  in_img = depth_cam.in_image(pxy) & z_ok
  px = jnp.clip(pxy[:, 0].astype(jnp.int32), 0, w - 1)
  py = jnp.clip(pxy[:, 1].astype(jnp.int32), 0, h - 1)

  # One combined gather for tracked depth + normals (channel-concat rows
  # cost the same as a single-channel gather on TPU).
  tracked_combo = jnp.concatenate(
      [tracked.depth[..., None], tracked.normals], axis=-1)
  g_combo = interp.gather_image(tracked_combo, py, px)
  frame_depth = g_combo[..., 0]
  fd_ok = frame_depth > 0.0

  # Association test with the base pixel as the implicit surfel
  # (IsAssociatedWithPixel pixel variant, surfel_projection_nvcc_only.cuh:177-236).
  base_n = normals_3d(base.normals.reshape(-1, 2))
  local_n = base_n @ R.T
  nx = depth_cam.nx(px.astype(jnp.float32))
  ny = depth_cam.ny(py.astype(jnp.float32))
  inv_stddev = depth_residual_inv_stddev(nx, ny, frame_depth, local_n, baseline_fx)
  thresh = (threshold_factor * DEPTH_TUKEY_PARAMETER) / inv_stddev
  band_ok = jnp.abs(local[:, 2] - frame_depth) <= thresh
  facing = jnp.sum(local * local_n, axis=-1) <= 0.0
  tracked_n = normals_3d(g_combo[..., 1:3])
  compat = jnp.sum(local_n * tracked_n, axis=-1) >= COS_NORMAL_COMPATIBILITY_THRESHOLD
  mask = d_ok & in_img & fd_ok & band_ok & facing & compat

  # Depth residual + Jacobian (in the tracked frame).
  unproj = depth_cam.unproject_center(
      px.astype(jnp.float32), py.astype(jnp.float32), frame_depth)
  depth_r = cost.raw_depth_residual(unproj, local, local_n, inv_stddev)
  depth_J = cost.depth_residual_pose_jacobian(unproj, local_n, inv_stddev)

  if not use_descriptor_residuals:
    z = jnp.zeros_like(depth_r)
    z6 = jnp.zeros_like(depth_J)
    return FrameToFrameResiduals(mask, depth_r, depth_J, z, z, z6, z6)

  if residual_type == "gradmag":
    # One photometric residual on gradient-magnitude images:
    # r = 255*bilinear(tracked_gm, pxy) - 255*base_gm[y,x]
    # (ComputeRawColorResidualAndJacobian, kernel_opt_pose.cu:192-221).
    ref_val = 255.0 * base.intensity.ravel()
    r1 = cost.raw_color_residual(tracked.intensity, pxy, ref_val)
    gx, gy = cost.color_grads(tracked.intensity, pxy)
    desc_J1 = cost.projected_position_pose_jacobian(
        gx * depth_cam.fx, gy * depth_cam.fy, local)
    z = jnp.zeros_like(r1)
    z6 = jnp.zeros_like(desc_J1)
    return FrameToFrameResiduals(mask, depth_r, depth_J, r1, z, desc_J1, z6)

  # Base-side descriptor from right/bottom neighbors (kernel_opt_pose.cu:507-512).
  inten = base.intensity
  i_c = inten.ravel()
  i_r = jnp.roll(inten, -1, axis=1).ravel()
  i_b = jnp.roll(inten, -1, axis=0).ravel()
  desc1 = 180.0 * (i_r - i_c)
  desc2 = 180.0 * (i_b - i_c)
  has_nbr = (xs < w - 1) & (ys < h - 1)

  # Neighbor depths induced by the center pixel's plane (:517-534).
  n_b = base_n
  plane_d = (
      depth_cam.nx(xs) * base_depth * n_b[:, 0]
      + depth_cam.ny(ys) * base_depth * n_b[:, 1]
      + base_depth * n_b[:, 2]
  )
  denom_x = depth_cam.nx(xs + 1.0) * n_b[:, 0] + depth_cam.ny(ys) * n_b[:, 1] + n_b[:, 2]
  denom_y = depth_cam.nx(xs) * n_b[:, 0] + depth_cam.ny(ys + 1.0) * n_b[:, 1] + n_b[:, 2]
  dx_depth = plane_d / jnp.where(jnp.abs(denom_x) > 1e-12, denom_x, 1e-12)
  dy_depth = plane_d / jnp.where(jnp.abs(denom_y) > 1e-12, denom_y, 1e-12)

  p_t1 = depth_cam.unproject_center(xs + 1.0, ys, dx_depth) @ R.T + t
  p_t2 = depth_cam.unproject_center(xs, ys + 1.0, dy_depth) @ R.T + t
  t1_ok = p_t1[:, 2] > 0.0
  t2_ok = p_t2[:, 2] > 0.0
  t1_pxy = depth_cam.project_corner(jnp.where(t1_ok[:, None], p_t1, jnp.asarray([0.0, 0.0, 1.0])))
  t2_pxy = depth_cam.project_corner(jnp.where(t2_ok[:, None], p_t2, jnp.asarray([0.0, 0.0, 1.0])))
  t_in = depth_cam.in_image(t1_pxy) & depth_cam.in_image(t2_pxy) & t1_ok & t2_ok

  dmask = mask & has_nbr & t_in

  tr_int = tracked.intensity
  r1, r2, gx1, gy1, gx2, gy2 = cost.descriptor_terms_fused(
      tr_int, pxy, t1_pxy, t2_pxy, jnp.stack([desc1, desc2], axis=-1))
  desc_J1 = cost.projected_position_pose_jacobian(
      gx1 * depth_cam.fx, gy1 * depth_cam.fy, local)
  desc_J2 = cost.projected_position_pose_jacobian(
      gx2 * depth_cam.fx, gy2 * depth_cam.fy, local)

  # Descriptor visibility also gates the depth residual in the reference
  # kernel (`visible = false` is shared state): replicate exactly.
  return FrameToFrameResiduals(dmask, depth_r, depth_J, r1, r2, desc_J1, desc_J2)


def frame_to_frame_h_b(
    tracked_T_base, base, tracked, depth_cam, baseline_fx, threshold_factor,
    use_depth_residuals=True, use_descriptor_residuals=True,
    residual_type="gradient_xy",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """Returns (H, b, residual_count). The count of associated pixels is a
  byproduct of the accumulation and feeds the tracking-failure gate in
  BadSlam.run_odometry."""
  terms = _frame_to_frame_terms(
      tracked_T_base, base, tracked, depth_cam, baseline_fx, threshold_factor,
      use_descriptor_residuals, residual_type)
  H = jnp.zeros((6, 6), jnp.float32)
  b = jnp.zeros((6,), jnp.float32)
  if use_depth_residuals:
    w = cost.depth_weight(terms.depth_r, threshold_factor)
    Hd, bd = cost.accumulate_h_b(terms.depth_J, terms.depth_r, w, terms.mask)
    H, b = H + Hd, b + bd
  if use_descriptor_residuals:
    w1 = cost.descriptor_weight(terms.desc_r1, threshold_factor)
    H1, b1 = cost.accumulate_h_b(terms.desc_J1, terms.desc_r1, w1, terms.mask)
    H, b = H + H1, b + b1
    if residual_type == "gradient_xy":
      w2 = cost.descriptor_weight(terms.desc_r2, threshold_factor)
      H2, b2 = cost.accumulate_h_b(terms.desc_J2, terms.desc_r2, w2,
                                   terms.mask)
      H, b = H + H2, b + b2
  return H, b, jnp.sum(terms.mask.astype(jnp.int32))


def frame_to_frame_cost(
    tracked_T_base, base, tracked, depth_cam, baseline_fx, threshold_factor,
    use_depth_residuals=True, use_descriptor_residuals=True,
    residual_type="gradient_xy",
) -> Tuple[jax.Array, jax.Array]:
  """(cost, residual_count) for the hypothesis-selection heuristic
  (ComputeCostAndResidualCountFromImagesCUDA, kernel_opt_pose.cu:940+)."""
  terms = _frame_to_frame_terms(
      tracked_T_base, base, tracked, depth_cam, baseline_fx, threshold_factor,
      use_descriptor_residuals, residual_type)
  total = jnp.zeros((), jnp.float32)
  count = jnp.zeros((), jnp.int32)
  m = terms.mask
  if use_depth_residuals:
    total = total + jnp.sum(jnp.where(m, cost.weighted_depth_cost(terms.depth_r, threshold_factor), 0.0))
    count = count + jnp.sum(m.astype(jnp.int32))
  if use_descriptor_residuals:
    total = total + jnp.sum(jnp.where(m, cost.weighted_descriptor_cost(terms.desc_r1, threshold_factor), 0.0))
    count = count + jnp.sum(m.astype(jnp.int32))
    if residual_type == "gradient_xy":
      total = total + jnp.sum(jnp.where(m, cost.weighted_descriptor_cost(terms.desc_r2, threshold_factor), 0.0))
      count = count + jnp.sum(m.astype(jnp.int32))
  return total, count


def track_frame_pairwise(
    base_pyramid: Sequence[FramePyramidLevel],
    tracked_pyramid: Sequence[FramePyramidLevel],
    depth_cam: PinholeCamera,
    baseline_fx,
    base_T_frame_initial_1: jax.Array,
    base_T_frame_initial_2: jax.Array,
    test_different_initial_estimates: bool = True,
    use_depth_residuals: bool = True,
    use_descriptor_residuals: bool = True,
    use_pyramid_level_0: bool = False,
    max_iterations_per_scale: int = 30,
    convergence_threshold: float = _SCALE_N_THRESHOLD,
    disable_reselection: bool = False,
    residual_type: str = "gradient_xy",
) -> Tuple[jax.Array, jax.Array]:
  """Full coarse-to-fine tracking; returns (base_T_frame, residual_count).

  ``base_pyramid``/``tracked_pyramid`` are lists of FramePyramidLevel with
  *calibrated* depth, level 0 = full resolution. ``residual_count`` is the
  number of associated pixels in the finest tracked scale's last GN
  iteration — near-zero means the estimate left the association basin
  entirely and the result is an untrusted no-op (the caller treats that as
  tracking failure; the reference has no such signal and silently accepts,
  which its README acknowledges as "potentially unstable").
  """
  num_scales = len(base_pyramid)
  finest = 0 if use_pyramid_level_0 else 1
  estimate = base_T_frame_initial_1
  chosen_initial = base_T_frame_initial_1

  for scale in range(num_scales - 1, finest - 1, -1):
    scaling_factor = float(2 ** scale)
    threshold_factor = scaling_factor
    cam_s = depth_cam.scaled(1.0 / scaling_factor)
    base_l = base_pyramid[scale]
    tracked_l = tracked_pyramid[scale]

    def eval_cost(T):
      return frame_to_frame_cost(
          se3.inverse(T), base_l, tracked_l, cam_s, baseline_fx,
          threshold_factor, use_depth_residuals, use_descriptor_residuals,
          residual_type)

    if scale == num_scales - 1:
      if test_different_initial_estimates:
        c1, n1 = eval_cost(base_T_frame_initial_1)
        c2, n2 = eval_cost(base_T_frame_initial_2)
        pick_first = jnp.where(
            n1 > 2 * n2, True,
            jnp.where(n2 > 2 * n1, False, c1 < c2))
        estimate = jnp.where(pick_first, base_T_frame_initial_1, base_T_frame_initial_2)
        chosen_initial = estimate
    elif not disable_reselection:
      c1, n1 = eval_cost(estimate)
      c2, n2 = eval_cost(chosen_initial)
      pick_first = jnp.where(
          n1 > 2 * n2, True,
          jnp.where(n2 > 2 * n1, False, c1 < c2))
      estimate = jnp.where(pick_first, estimate, chosen_initial)

    if scale == num_scales - 1:
      damping = 0.25
    elif scale == num_scales - 2:
      damping = 0.5
    else:
      damping = 1.0

    def cond(state):
      _, it, converged, _ = state
      return (it < max_iterations_per_scale) & jnp.logical_not(converged)

    def body(state):
      T, it, _, _ = state
      H, b, n = frame_to_frame_h_b(
          se3.inverse(T), base_l, tracked_l, cam_s, baseline_fx,
          threshold_factor, use_depth_residuals, use_descriptor_residuals,
          residual_type)
      x = solve_6x6(H, b)
      x = jnp.where(jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))
      T_new = T @ se3.exp(-damping * x)
      return (T_new, it + 1,
              is_scale_n_converged(x, scaling_factor, convergence_threshold),
              n)

    estimate, _, _, residual_count = jax.lax.while_loop(
        cond, body, (estimate, jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                     jnp.zeros((), jnp.int32)))

  return estimate, residual_count
