"""Residuals and analytic Jacobians of the direct BA cost.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
cost_function.cuh (depth residual :56-98, descriptor residual :115-185,
gradient Jacobians :191-319, frame-to-frame color residual :322-352) and
kernel_opt_pose.cu:45-222 (pose Jacobians, derived in the local frame for the
``T * exp(hat(x))`` update).

All functions are dense over (N,) surfels/pixels; invalid lanes are masked by
the caller. H/b accumulation happens as (6,N)@(N,6) matmuls — MXU work —
instead of the reference's CUB tree reductions.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.ops import interp, robust

# cost_function.cuh:44-52
DEPTH_RESIDUAL_WEIGHT = 1.0
DEPTH_TUKEY_PARAMETER = 10.0
# cost_function.cuh:105-109
DESCRIPTOR_RESIDUAL_WEIGHT = 1e-2
DESCRIPTOR_HUBER_PARAMETER = 10.0
# cost_function.cuh:126
TANGENT_SCALING = 2.0


# --- Depth (geometric) residual ---


def raw_depth_residual(
    unproj: jax.Array,        # (N, 3) unprojection of the hit pixel
    local_pos: jax.Array,     # (N, 3) surfel position in frame
    local_normal: jax.Array,  # (N, 3) surfel normal in frame
    inv_stddev: jax.Array,    # (N,)
) -> jax.Array:
  """r = sigma^-1 * n . (unproj - p)   (cost_function.cuh:56-78)."""
  return inv_stddev * jnp.sum(local_normal * (unproj - local_pos), axis=-1)


def depth_residual_pose_jacobian(
    unproj: jax.Array, local_normal: jax.Array, inv_stddev: jax.Array
) -> jax.Array:
  """(N, 6) Jacobian wrt the se3 tangent [upsilon, omega] of the update
  global_T_frame * exp(hat(x)) — kernel_opt_pose.cu:88-93."""
  n = local_normal
  u = unproj
  jt = inv_stddev[..., None] * n
  jr = inv_stddev[..., None] * jnp.stack(
      [
          -n[..., 1] * u[..., 2] + n[..., 2] * u[..., 1],
          n[..., 0] * u[..., 2] - n[..., 2] * u[..., 0],
          -n[..., 0] * u[..., 1] + n[..., 1] * u[..., 0],
      ],
      axis=-1,
  )
  return jnp.concatenate([jt, jr], axis=-1)


def depth_weight(raw_residual: jax.Array, scaling: float = 1.0) -> jax.Array:
  return DEPTH_RESIDUAL_WEIGHT * robust.tukey_weight(
      raw_residual, scaling * DEPTH_TUKEY_PARAMETER
  )


def weighted_depth_cost(raw_residual: jax.Array, scaling: float = 1.0) -> jax.Array:
  return DEPTH_RESIDUAL_WEIGHT * robust.tukey_residual(
      raw_residual, scaling * DEPTH_TUKEY_PARAMETER
  )


# --- Descriptor (photometric) residual ---


def tangent_projections(
    global_pos: jax.Array,     # (N, 3)
    global_normal: jax.Array,  # (N, 3)
    radius_sq: jax.Array,      # (N,)
    frame_T_global_R: jax.Array,  # (3, 3)
    frame_T_global_t: jax.Array,  # (3,)
    color_cam: PinholeCamera,
) -> Tuple[jax.Array, jax.Array]:
  """Projections of two surfel-border tangent points (cost_function.cuh:115-136).

  t1 = normal x (|nx|>0.9 ? ey : ex), scaled to 2*radius; t2 = normal x t1.
  """
  n = global_normal
  pick_ey = jnp.abs(n[..., 0]) > 0.9
  axis = jnp.where(
      pick_ey[..., None],
      jnp.asarray([0.0, 1.0, 0.0], dtype=n.dtype),
      jnp.asarray([1.0, 0.0, 0.0], dtype=n.dtype),
  )
  t1 = jnp.cross(n, axis)
  t1 = t1 * (TANGENT_SCALING * jnp.sqrt(
      radius_sq / jnp.maximum(1e-12, jnp.sum(t1 * t1, axis=-1))))[..., None]
  t2 = jnp.cross(n, t1)
  t2 = t2 * (TANGENT_SCALING * jnp.sqrt(
      radius_sq / jnp.maximum(1e-12, jnp.sum(t2 * t2, axis=-1))))[..., None]

  def proj(p_global):
    local = p_global @ frame_T_global_R.T + frame_T_global_t
    return color_cam.project_corner(local)

  return proj(global_pos + t1), proj(global_pos + t2)


def raw_descriptor_residual(
    intensity: jax.Array,   # (H, W) in [0, 1]
    pxy: jax.Array,         # (N, 2) center projection (corner conv)
    t1_pxy: jax.Array,      # (N, 2)
    t2_pxy: jax.Array,      # (N, 2)
    desc: jax.Array,        # (N, 2) stored surfel descriptor
) -> Tuple[jax.Array, jax.Array]:
  """r_i = 180*(I(t_i) - I(c)) - d_i   (cost_function.cuh:140-156)."""
  c = interp.sample_bilinear(intensity, pxy[..., 0], pxy[..., 1])
  i1 = interp.sample_bilinear(intensity, t1_pxy[..., 0], t1_pxy[..., 1])
  i2 = interp.sample_bilinear(intensity, t2_pxy[..., 0], t2_pxy[..., 1])
  r1 = 180.0 * (i1 - c) - desc[..., 0]
  r2 = 180.0 * (i2 - c) - desc[..., 1]
  return r1, r2


def descriptor_grads(
    intensity: jax.Array,
    pxy: jax.Array,
    t1_pxy: jax.Array,
    t2_pxy: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
  """d(180*(I(t_i)-I(c)))/d(projected position), the approximation that all
  three sample points move together (cost_function.cuh:191-254).

  Returns (grad_x_1, grad_y_1, grad_x_2, grad_y_2), each (N,).
  """
  c_dx, c_dy = interp.sample_bilinear_grad(intensity, pxy[..., 0], pxy[..., 1])
  t1_dx, t1_dy = interp.sample_bilinear_grad(intensity, t1_pxy[..., 0], t1_pxy[..., 1])
  t2_dx, t2_dy = interp.sample_bilinear_grad(intensity, t2_pxy[..., 0], t2_pxy[..., 1])
  return (
      180.0 * (t1_dx - c_dx),
      180.0 * (t1_dy - c_dy),
      180.0 * (t2_dx - c_dx),
      180.0 * (t2_dy - c_dy),
  )


def projected_position_pose_jacobian(
    grad_x_fx: jax.Array,  # (N,) image gradient * fx
    grad_y_fy: jax.Array,  # (N,) image gradient * fy
    local_pos: jax.Array,  # (N, 3)
) -> jax.Array:
  """(N, 6) chain rule of an intensity-like residual through the projection,
  wrt [upsilon, omega] (kernel_opt_pose.cu:122-141)."""
  ls = local_pos
  inv_z = 1.0 / ls[..., 2]
  z_sq = ls[..., 2] * ls[..., 2]
  inv_z_sq = inv_z * inv_z
  xy = ls[..., 0] * ls[..., 1]
  j0 = -grad_x_fx * inv_z
  j1 = -grad_y_fy * inv_z
  j2 = (ls[..., 0] * grad_x_fx + ls[..., 1] * grad_y_fy) * inv_z_sq
  j3 = ((ls[..., 1] * ls[..., 1] + z_sq) * grad_y_fy + xy * grad_x_fx) * inv_z_sq
  j4 = -((ls[..., 0] * ls[..., 0] + z_sq) * grad_x_fx + xy * grad_y_fy) * inv_z_sq
  j5 = -(ls[..., 0] * grad_y_fy - ls[..., 1] * grad_x_fx) * inv_z
  return jnp.stack([j0, j1, j2, j3, j4, j5], axis=-1)


def descriptor_terms_fused(
    intensity: jax.Array,
    pxy: jax.Array,
    t1_pxy: jax.Array,
    t2_pxy: jax.Array,
    desc: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
  """Fused (r1, r2, grad_x_1, grad_y_1, grad_x_2, grad_y_2).

  raw_descriptor_residual + descriptor_grads share all 12 bilinear taps; the
  unfused pair costs 24 gathers per surfel. Gathers are the hot-path
  bottleneck on TPU (random access runs at ~VPU scalar rate), so this path
  (a) fuses value+gradient and (b) packs each 2x2 neighborhood into one
  uint32 (pack_bilinear_u32) — 3 gathers total instead of 24. The u8
  quantization is exact: intensity images carry u8-step values, like the
  reference's uchar color texture.
  """
  packed = interp.pack_bilinear_u32(intensity)
  c, c_dx, c_dy = interp.sample_bilinear_packed_with_grad(
      packed, pxy[..., 0], pxy[..., 1])
  i1, t1_dx, t1_dy = interp.sample_bilinear_packed_with_grad(
      packed, t1_pxy[..., 0], t1_pxy[..., 1])
  i2, t2_dx, t2_dy = interp.sample_bilinear_packed_with_grad(
      packed, t2_pxy[..., 0], t2_pxy[..., 1])
  r1 = 180.0 * (i1 - c) - desc[..., 0]
  r2 = 180.0 * (i2 - c) - desc[..., 1]
  return (r1, r2,
          180.0 * (t1_dx - c_dx), 180.0 * (t1_dy - c_dy),
          180.0 * (t2_dx - c_dx), 180.0 * (t2_dy - c_dy))


def descriptor_weight(raw_residual: jax.Array, scaling: float = 1.0) -> jax.Array:
  return scaling * DESCRIPTOR_RESIDUAL_WEIGHT * robust.huber_weight(
      raw_residual, DESCRIPTOR_HUBER_PARAMETER
  )


def weighted_descriptor_cost(raw_residual: jax.Array, scaling: float = 1.0) -> jax.Array:
  return scaling * DESCRIPTOR_RESIDUAL_WEIGHT * robust.huber_residual(
      raw_residual, DESCRIPTOR_HUBER_PARAMETER
  )


# --- Frame-to-frame color residual (odometry; cost_function.cuh:322-352) ---


def raw_color_residual(
    image: jax.Array,       # (H, W) in [0, 1] (gradmag or intensity channel)
    pxy: jax.Array,         # (N, 2)
    reference_value: jax.Array,  # (N,) 255-scaled value from the other frame
) -> jax.Array:
  return 255.0 * interp.sample_bilinear(image, pxy[..., 0], pxy[..., 1]) - reference_value


def color_grads(image: jax.Array, pxy: jax.Array) -> Tuple[jax.Array, jax.Array]:
  dx, dy = interp.sample_bilinear_grad(image, pxy[..., 0], pxy[..., 1])
  return 255.0 * dx, 255.0 * dy


# --- Masked H/b accumulation (MXU path) ---


def accumulate_h_b(
    J: jax.Array,      # (N, D) Jacobians
    r: jax.Array,      # (N,) raw residuals
    w: jax.Array,      # (N,) robust weights
    mask: jax.Array,   # (N,) bool
) -> Tuple[jax.Array, jax.Array]:
  """H = J^T W J, b = J^T W r over masked lanes, as one matmul each
  (replaces gauss_newton.cuh:46-93 CUB block reductions + atomics).

  Masked lanes may carry inf/NaN (e.g. z=0 divisions on invalid surfel slots),
  and 0 * inf = NaN — so J and r are hard-zeroed with where(), not just
  weight-zeroed.
  """
  wm = jnp.where(mask, w, 0.0)
  Jm = jnp.where(mask[:, None], J, 0.0)
  rm = jnp.where(mask, r, 0.0)
  Jw = Jm * wm[:, None]
  H = jnp.dot(Jw.T, Jm, preferred_element_type=jnp.float32)
  b = jnp.dot(Jw.T, rm, preferred_element_type=jnp.float32)
  return H, b
