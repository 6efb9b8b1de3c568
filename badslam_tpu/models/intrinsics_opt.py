"""Intrinsics self-calibration: one Gauss-Newton step on depth intrinsics
(fx, fy, cx, cy via their inverse parameters), the global depth-deformation
factor a, the per-cell cfactor field, and color intrinsics (fx, fy, cx, cy).

Behavioral spec: /root/reference/applications/badslam/src/badslam/
kernel_opt_intrinsics.{cc,cu}:
  * residual structure + Jacobians  kernel_opt_intrinsics.cu:47-200
    (depth residual wrt [fx_inv, fy_inv, cx_inv, cy_inv, a] + cfactor;
    descriptor residual wrt [fx, fy, cx, cy] via the approximation
    J = [gx*nx, gy*ny, gx, gy]);
  * Schur complement over the cfactor block (A - B D^-1 B^T) x1 = b1 - B D^-1 b2
    kernel_opt_intrinsics.cu:270-345;
  * weak prior on a: weight 10 pulling toward the previous value
    kernel_opt_intrinsics.cc:146-155;
  * camera update via inverse parameters and +0.5 corner-convention shift
    kernel_opt_intrinsics.cc:183-196;
  * cfactor back-substitution, resetting unobserved cells to 0
    kernel_opt_intrinsics.cu:375-425.

TPU-native design: dense over surfels x scan over keyframes; per-cell B, D,
b2 accumulate via segment_sum on the flattened cell id; the 5x5 solve uses
Jacobi equilibration + one iterative-refinement step (replacing the
reference's double-precision LDLT, which f32 cannot match directly —
kernel_opt_intrinsics.cc:173-176 notes the scale disparity).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import DepthToColorTransform, PinholeCamera
from badslam_tpu.models import association, cost
from badslam_tpu.models.association import DepthParamsArrays
from badslam_tpu.models.keyframes import KeyframeStore
from badslam_tpu.models.surfels import SurfelStore

A_PRIOR_WEIGHT = 10.0  # kAPriorWeight (kernel_opt_intrinsics.cc:146)
A_ROWS = 5             # fx_inv, fy_inv, cx_inv, cy_inv, a


def _equilibrated_solve(A: jax.Array, b: jax.Array) -> jax.Array:
  """Solve A x = b in f32 with Jacobi equilibration + iterative refinement."""
  d = jnp.sqrt(jnp.maximum(jnp.diag(A), 1e-12))
  s = 1.0 / d
  As = A * s[:, None] * s[None, :]
  bs = b * s
  y = jnp.linalg.solve(As, bs)
  r = bs - As @ y
  y = y + jnp.linalg.solve(As, r)
  r = bs - As @ y
  y = y + jnp.linalg.solve(As, r)
  return y * s


def _accumulate(
    surfels: SurfelStore,
    kf: KeyframeStore,
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    dp: DepthParamsArrays,
    raw_depth_img_stack: jax.Array,   # == kf.depth (raw metric depth)
    optimize_depth: bool,
    optimize_color: bool,
):
  """Scan over keyframes accumulating the depth Schur blocks and color H/b."""
  n = surfels.capacity
  hc, wc = dp.cfactor.shape
  num_cells = hc * wc

  def scan_body(carry, inputs):
    (A, b1, B, D, b2, obs, cH, cb) = carry
    depth_img, normals_img, intensity_img, T, kf_valid = inputs
    frame_T_global = se3.inverse(T)
    assoc = association.associate_surfels(
        surfels.pos, surfels.normal, surfels.valid, frame_T_global,
        depth_img, normals_img, depth_cam, dp)
    m = assoc.mask & kf_valid

    px_f = assoc.px.astype(jnp.float32)
    py_f = assoc.py.astype(jnp.float32)
    nx = depth_cam.nx(px_f)
    ny = depth_cam.ny(py_f)
    cell_x = assoc.px // dp.cell_size
    cell_y = assoc.py // dp.cell_size
    cell_id = cell_y * wc + cell_x

    if optimize_depth:
      from badslam_tpu.ops.interp import gather_image as _gi
      raw_depth = _gi(depth_img, assoc.py, assoc.px)
      raw_inv = 1.0 / jnp.maximum(raw_depth, 1e-12)
      cfac = _gi(dp.cfactor, cell_y, cell_x)
      exp_inv = jnp.exp(-dp.a * raw_inv)
      corrected_inv = cfac * exp_inv + raw_inv
      dm = m & (jnp.abs(corrected_inv) > 1e-4)

      ln = assoc.local_normal
      dot = ln[:, 0] * nx + ln[:, 1] * ny + ln[:, 2]
      inv_stddev = assoc.inv_stddev
      jac_base = inv_stddev * dot * exp_inv / jnp.maximum(
          corrected_inv * corrected_inv, 1e-20)

      R = frame_T_global[0:3, 0:3]
      gn = surfels.normal
      j_cx = inv_stddev * assoc.calibrated_depth * (gn @ R[0, :])
      j_cy = inv_stddev * assoc.calibrated_depth * (gn @ R[1, :])
      j_fx = px_f * j_cx
      j_fy = py_f * j_cy
      j_a = cfac * raw_inv * jac_base
      j_c = -jac_base  # cfactor column

      unproj = depth_cam.unproject_center(px_f, py_f, assoc.calibrated_depth)
      r = cost.raw_depth_residual(
          unproj, assoc.local_pos, assoc.local_normal, inv_stddev)
      w = cost.depth_weight(r)

      Jg = jnp.stack([j_fx, j_fy, j_cx, j_cy, j_a], axis=-1)  # (N, 5)
      Jg = jnp.where(dm[:, None], Jg, 0.0)
      rr = jnp.where(dm, r, 0.0)
      ww = jnp.where(dm, w, 0.0)
      jc = jnp.where(dm, j_c, 0.0)

      Jw = Jg * ww[:, None]
      A = A + Jw.T @ Jg
      b1 = b1 + Jw.T @ rr
      seg = jnp.where(dm, cell_id, num_cells)
      B = B + jax.ops.segment_sum(Jw * jc[:, None], seg,
                                  num_segments=num_cells + 1)[:num_cells]
      D = D + jax.ops.segment_sum(ww * jc * jc, seg,
                                  num_segments=num_cells + 1)[:num_cells]
      b2 = b2 + jax.ops.segment_sum(ww * jc * rr, seg,
                                    num_segments=num_cells + 1)[:num_cells]
      obs = obs + jax.ops.segment_sum(dm.astype(jnp.int32), seg,
                                      num_segments=num_cells + 1)[:num_cells]

    if optimize_color:
      d2c = DepthToColorTransform.between(depth_cam, color_cam)
      color_pxy, in_color = d2c.apply(assoc.pxy)
      cm = m & in_color
      t1_pxy, t2_pxy = cost.tangent_projections(
          surfels.pos, surfels.normal, surfels.radius_sq,
          frame_T_global[0:3, 0:3], frame_T_global[0:3, 3], color_cam)
      r1, r2, gx1, gy1, gx2, gy2 = cost.descriptor_terms_fused(
          intensity_img, color_pxy, t1_pxy, t2_pxy, surfels.desc)
      for (gx, gy, rr_) in ((gx1, gy1, r1), (gx2, gy2, r2)):
        J = jnp.stack([gx * nx, gy * ny, gx, gy], axis=-1)
        w_ = cost.descriptor_weight(rr_)
        Hd, bd = cost.accumulate_h_b(J, rr_, w_, cm)
        cH = cH + Hd
        cb = cb + bd

    return (A, b1, B, D, b2, obs, cH, cb), None

  init = (
      jnp.zeros((A_ROWS, A_ROWS), jnp.float32),
      jnp.zeros((A_ROWS,), jnp.float32),
      jnp.zeros((num_cells, A_ROWS), jnp.float32),
      jnp.zeros((num_cells,), jnp.float32),
      jnp.zeros((num_cells,), jnp.float32),
      jnp.zeros((num_cells,), jnp.int32),
      jnp.zeros((4, 4), jnp.float32),
      jnp.zeros((4,), jnp.float32),
  )
  (A, b1, B, D, b2, obs, cH, cb), _ = jax.lax.scan(
      scan_body, init,
      (kf.depth, kf.normals, kf.intensity, kf.global_T_frame, kf.valid))
  return A, b1, B, D, b2, obs, cH, cb


@functools.partial(
    jax.jit,
    static_argnames=("dwidth", "dheight", "cwidth", "cheight", "cell_size",
                     "optimize_depth", "optimize_color"))
def _optimize_intrinsics_jit(
    surfels: SurfelStore, kf: KeyframeStore,
    depth_intr, color_intr, a, cfactor, baseline_fx,
    dwidth: int, dheight: int, cwidth: int, cheight: int, cell_size: int,
    optimize_depth: bool, optimize_color: bool,
):
  depth_cam = PinholeCamera(dwidth, dheight, depth_intr[0], depth_intr[1],
                            depth_intr[2], depth_intr[3])
  color_cam = PinholeCamera(cwidth, cheight, color_intr[0], color_intr[1],
                            color_intr[2], color_intr[3])
  dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                         cell_size=cell_size)
  A, b1, B, D, b2, obs, cH, cb = _accumulate(
      surfels, kf, depth_cam, color_cam, dp, kf.depth,
      optimize_depth, optimize_color)

  new_depth_intr = depth_intr
  new_a = a
  new_cfactor = cfactor
  if optimize_depth:
    hc, wc = cfactor.shape
    # Schur complement over the cfactor block; unconstrained cells (tiny D)
    # are skipped exactly as the CUDA kernel's 1e12 inverse test.
    D_inv = 1.0 / D
    cell_ok = D_inv < 1e12
    D_inv = jnp.where(cell_ok, D_inv, 0.0)
    A_s = A - (B * D_inv[:, None]).T @ B
    b1_s = b1 - B.T @ (D_inv * b2)
    # Weak prior pulling a toward its previous value.
    A_s = A_s.at[4, 4].add(A_PRIOR_WEIGHT * A_PRIOR_WEIGHT)
    # The reference adds w^2 * a to the rhs; combined with the x -= update
    # this implements a prior residual w * (a_new - a_old)... the rhs uses the
    # *current* a, so the prior pulls the UPDATE toward zero plus a decay of a
    # itself toward zero with rate w^2/H44 (kernel_opt_intrinsics.cc:146-155).
    b1_s = b1_s.at[4].add(A_PRIOR_WEIGHT * A_PRIOR_WEIGHT * a)
    x1 = _equilibrated_solve(A_s, b1_s)
    x1 = jnp.where(jnp.all(jnp.isfinite(x1)), x1, jnp.zeros_like(x1))

    fx_inv = 1.0 / depth_intr[0]
    fy_inv = 1.0 / depth_intr[1]
    cx_inv = -(depth_intr[2] - 0.5) / depth_intr[0]
    cy_inv = -(depth_intr[3] - 0.5) / depth_intr[1]
    new_fx = 1.0 / (fx_inv - x1[0])
    new_fy = 1.0 / (fy_inv - x1[1])
    new_cx = -(new_fx * (cx_inv - x1[2])) + 0.5
    new_cy = -(new_fy * (cy_inv - x1[3])) + 0.5
    new_depth_intr = jnp.stack([new_fx, new_fy, new_cx, new_cy])
    new_a = a - x1[4]

    # Back-substitute the per-cell update; reset unobserved cells to 0.
    x2 = D_inv * b2 - (B * D_inv[:, None]) @ x1
    x2 = jnp.where(cell_ok, x2, 0.0)
    cf_flat = cfactor.reshape(-1) - x2
    cf_flat = jnp.where(obs > 0, cf_flat, 0.0)
    new_cfactor = cf_flat.reshape(hc, wc)

  new_color_intr = color_intr
  if optimize_color:
    x = _equilibrated_solve(cH, cb)
    x = jnp.where(jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))
    new_color_intr = color_intr - x

  return new_depth_intr, new_color_intr, new_a, new_cfactor


def optimize_intrinsics(
    surfels: SurfelStore, kf: KeyframeStore,
    depth_intr, color_intr, a, cfactor, baseline_fx,
    depth_size: Tuple[int, int], color_size: Tuple[int, int], cell_size: int,
    optimize_depth: bool, optimize_color: bool,
    use_depth_residuals: bool = True, use_descriptor_residuals: bool = True,
):
  """OptimizeIntrinsicsCUDA equivalent (kernel_opt_intrinsics.cc:39-281)."""
  optimize_depth = optimize_depth and use_depth_residuals
  optimize_color = optimize_color and use_descriptor_residuals
  if not (optimize_depth or optimize_color):
    return depth_intr, color_intr, a, cfactor
  dw, dh = depth_size
  cw, ch = color_size
  return _optimize_intrinsics_jit(
      surfels, kf, depth_intr, color_intr, a, cfactor, baseline_fx,
      dw, dh, cw, ch, cell_size, optimize_depth, optimize_color)
