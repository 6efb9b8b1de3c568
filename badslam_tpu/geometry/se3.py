"""SE(3) Lie-group operations in pure JAX.

TPU-native replacement for the reference's Sophus usage (libvis/sophus.h;
see /root/reference: applications/badslam/src/badslam/direct_ba_alternating.cc:214
``global_T_frame * exp(-x)`` update convention).

Conventions (matching Sophus SE3f, which the reference uses everywhere):
  * A transform is stored as a 4x4 (or (...,4,4)) homogeneous matrix
    ``T = [[R, t], [0, 1]]``.
  * The tangent vector is ``[upsilon(3), omega(3)]`` — translation part first,
    rotation part last. This matters: the reference's pose Jacobians
    (kernel_opt_pose.cu:88-93) use jacobian[0:3] = translation, [3:6] = rotation,
    and its convergence tests scale the *bottom* (rotation) rows.
  * ``exp``/``log`` use the full SE(3) exponential with the V matrix, exactly as
    Sophus does (not the SO(3)+t approximation).

All functions are batched over leading dimensions and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat_so3(omega: jax.Array) -> jax.Array:
  """Skew-symmetric matrix of (...,3) -> (...,3,3)."""
  ox, oy, oz = omega[..., 0], omega[..., 1], omega[..., 2]
  zeros = jnp.zeros_like(ox)
  return jnp.stack(
      [
          jnp.stack([zeros, -oz, oy], axis=-1),
          jnp.stack([oz, zeros, -ox], axis=-1),
          jnp.stack([-oy, ox, zeros], axis=-1),
      ],
      axis=-2,
  )


def exp_so3(omega: jax.Array) -> jax.Array:
  """SO(3) exponential map: (...,3) -> (...,3,3) via Rodrigues' formula."""
  theta_sq = jnp.sum(omega * omega, axis=-1)
  theta = jnp.sqrt(theta_sq + _EPS * _EPS)  # guarded; corrected by series below
  # Series expansions below theta = 0.1: in float32, (1-cos)/theta^2 suffers
  # catastrophic cancellation well before the series stops being accurate
  # (series truncation error at 0.1 is ~1e-10).
  small = theta_sq < 1e-2
  sin_t = jnp.sin(theta)
  cos_t = jnp.cos(theta)
  a = jnp.where(small, 1.0 - theta_sq / 6.0 + theta_sq * theta_sq / 120.0,
                sin_t / theta)
  b = jnp.where(small, 0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0,
                (1.0 - cos_t) / theta_sq)
  K = hat_so3(omega)
  KK = K @ K
  eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
  return eye + a[..., None, None] * K + b[..., None, None] * KK


def log_so3(R: jax.Array) -> jax.Array:
  """SO(3) logarithm: (...,3,3) -> (...,3).

  Goes through the quaternion (stable max-diagonal extraction) and
  ``theta = 2 atan2(|v|, w)`` — well-conditioned in float32 over the whole
  rotation range, unlike the arccos-of-trace formula.
  """
  q = matrix_to_quaternion(R)  # (x, y, z, w), unit norm
  v = q[..., 0:3]
  w = q[..., 3]
  # Force w >= 0 so theta in [0, pi].
  sign = jnp.where(w < 0, -1.0, 1.0)
  v = v * sign[..., None]
  w = w * sign
  v_norm = jnp.linalg.norm(v, axis=-1)
  theta = 2.0 * jnp.arctan2(v_norm, w)
  small = v_norm < 1e-6
  # omega = theta * v / |v|; for small angles theta ~ 2|v|/w so omega ~ 2 v / w.
  scale = jnp.where(
      small,
      2.0 / jnp.maximum(w, 0.5),
      theta / jnp.where(small, 1.0, v_norm),
  )
  return scale[..., None] * v


def _so3_left_jacobian_terms(omega: jax.Array):
  """Common terms for the SE(3) V matrix and its inverse."""
  theta_sq = jnp.sum(omega * omega, axis=-1)
  theta = jnp.sqrt(theta_sq + _EPS * _EPS)
  small = theta_sq < 1e-2  # see exp_so3 for the float32 rationale
  sin_t = jnp.sin(theta)
  cos_t = jnp.cos(theta)
  # V = I + (1-cos)/theta^2 K + (theta - sin)/theta^3 K^2
  b = jnp.where(small, 0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0,
                (1.0 - cos_t) / theta_sq)
  c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0,
                (theta - sin_t) / (theta_sq * theta))
  return theta, theta_sq, small, sin_t, cos_t, b, c


def exp(tangent: jax.Array) -> jax.Array:
  """SE(3) exponential: (...,6) [upsilon, omega] -> (...,4,4)."""
  upsilon = tangent[..., 0:3]
  omega = tangent[..., 3:6]
  R = exp_so3(omega)
  _, _, _, _, _, b, c = _so3_left_jacobian_terms(omega)
  K = hat_so3(omega)
  KK = K @ K
  eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), K.shape)
  V = eye + b[..., None, None] * K + c[..., None, None] * KK
  t = jnp.einsum("...ij,...j->...i", V, upsilon)
  return make(R, t)


def log(T: jax.Array) -> jax.Array:
  """SE(3) logarithm: (...,4,4) -> (...,6) [upsilon, omega]."""
  R = T[..., 0:3, 0:3]
  t = T[..., 0:3, 3]
  omega = log_so3(R)
  theta, theta_sq, small, sin_t, cos_t, b, c = _so3_left_jacobian_terms(omega)
  K = hat_so3(omega)
  KK = K @ K
  eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), K.shape)
  # V^{-1} = I - 1/2 K + 1/theta^2 (1 - (theta sin)/(2(1-cos))) K^2
  denom = 2.0 * (1.0 - cos_t)
  coef = jnp.where(
      small,
      1.0 / 12.0 + theta_sq / 720.0 + theta_sq * theta_sq / 30240.0,
      (1.0 - (theta * sin_t) / jnp.where(small, jnp.ones_like(denom), denom)) /
      jnp.where(small, jnp.ones_like(theta_sq), theta_sq),
  )
  V_inv = eye - 0.5 * K + coef[..., None, None] * KK
  upsilon = jnp.einsum("...ij,...j->...i", V_inv, t)
  return jnp.concatenate([upsilon, omega], axis=-1)


def make(R: jax.Array, t: jax.Array) -> jax.Array:
  """Assemble (...,4,4) from rotation (...,3,3) and translation (...,3)."""
  batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
  R = jnp.broadcast_to(R, batch + (3, 3))
  t = jnp.broadcast_to(t, batch + (3,))
  top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (...,3,4)
  bottom = jnp.broadcast_to(
      jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
  )
  return jnp.concatenate([top, bottom], axis=-2)


def identity(dtype=jnp.float32) -> jax.Array:
  return jnp.eye(4, dtype=dtype)


def inverse(T: jax.Array) -> jax.Array:
  R = T[..., 0:3, 0:3]
  t = T[..., 0:3, 3]
  Rt = jnp.swapaxes(R, -1, -2)
  return make(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A: jax.Array, B: jax.Array) -> jax.Array:
  return A @ B


def transform_points(T: jax.Array, points: jax.Array) -> jax.Array:
  """Apply (...,4,4) to points (...,N,3) or (...,3)."""
  R = T[..., 0:3, 0:3]
  t = T[..., 0:3, 3]
  if points.ndim == T.ndim - 1:  # single point per transform
    return jnp.einsum("...ij,...j->...i", R, points) + t
  return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


def rotate(T: jax.Array, vectors: jax.Array) -> jax.Array:
  """Apply only the rotation of (...,4,4) to vectors."""
  R = T[..., 0:3, 0:3]
  if vectors.ndim == T.ndim - 1:
    return jnp.einsum("...ij,...j->...i", R, vectors)
  return jnp.einsum("...ij,...nj->...ni", R, vectors)


def right_multiply_exp(T: jax.Array, tangent: jax.Array) -> jax.Array:
  """``T * exp(tangent)`` — the reference's pose-update convention
  (direct_ba_alternating.cc:214)."""
  return T @ exp(tangent)


def orthonormalize(T: jax.Array) -> jax.Array:
  """Re-project the rotation block onto SO(3) via SVD (drift control after
  many compositions)."""
  R = T[..., 0:3, 0:3]
  u, _, vt = jnp.linalg.svd(R)
  det = jnp.linalg.det(u @ vt)
  d = jnp.ones_like(det)
  diag = jnp.stack([d, d, det], axis=-1)
  R_fixed = u @ (diag[..., :, None] * vt)
  return make(R_fixed, T[..., 0:3, 3])


# --- Quaternion helpers (for trajectory I/O in TUM format and interpolation) ---


def matrix_to_quaternion(R: jax.Array) -> jax.Array:
  """(...,3,3) -> (...,4) quaternion (x, y, z, w), TUM export order."""
  m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
  m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
  m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
  trace = m00 + m11 + m22

  def case0():
    s = jnp.sqrt(jnp.maximum(trace + 1.0, _EPS)) * 2.0
    return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], axis=-1)

  def case1():
    s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
    return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], axis=-1)

  def case2():
    s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2.0
    return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], axis=-1)

  def case3():
    s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2.0
    return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], axis=-1)

  q0, q1, q2, q3 = case0(), case1(), case2(), case3()
  cond1 = (trace > 0.0)[..., None]
  cond2 = ((m00 >= m11) & (m00 >= m22))[..., None]
  cond3 = (m11 >= m22)[..., None]
  q = jnp.where(cond1, q0, jnp.where(cond2, q1, jnp.where(cond3, q2, q3)))
  return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
  """(...,4) quaternion (x, y, z, w) -> (...,3,3)."""
  q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
  x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  return jnp.stack(
      [
          jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
          jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
          jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
      ],
      axis=-2,
  )


def slerp(q0: jax.Array, q1: jax.Array, alpha) -> jax.Array:
  """Spherical interpolation between two quaternions (used by trajectory
  deformation, trajectory_deformation.cc:45-130)."""
  dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
  q1 = jnp.where(dot < 0, -q1, q1)
  dot = jnp.abs(dot)
  theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
  sin_theta = jnp.sin(theta)
  small = sin_theta < 1e-6
  w0 = jnp.where(small, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / jnp.where(small, 1.0, sin_theta))
  w1 = jnp.where(small, alpha, jnp.sin(alpha * theta) / jnp.where(small, 1.0, sin_theta))
  q = w0 * q0 + w1 * q1
  return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def interpolate(T0: jax.Array, T1: jax.Array, alpha) -> jax.Array:
  """Pose interpolation: slerp on rotation + lerp on translation."""
  q0 = matrix_to_quaternion(T0[..., 0:3, 0:3])
  q1 = matrix_to_quaternion(T1[..., 0:3, 0:3])
  q = slerp(q0, q1, alpha)
  t = (1.0 - alpha) * T0[..., 0:3, 3] + alpha * T1[..., 0:3, 3]
  return make(quaternion_to_matrix(q), t)


def average_poses(T_list: jax.Array) -> jax.Array:
  """Average of (K,4,4) poses: mean translation + chordal-mean rotation via
  quaternion averaging (replacement for util.cc:110 AveragePose)."""
  t = jnp.mean(T_list[..., 0:3, 3], axis=0)
  qs = matrix_to_quaternion(T_list[..., 0:3, 0:3])
  # Align hemispheres to the first quaternion before averaging.
  ref = qs[0]
  signs = jnp.where(jnp.sum(qs * ref, axis=-1, keepdims=True) < 0, -1.0, 1.0)
  q = jnp.mean(qs * signs, axis=0)
  q = q / jnp.linalg.norm(q)
  return make(quaternion_to_matrix(q), t)
