"""SE(3) unit tests: exp/log round trips, composition, Sophus conventions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.geometry import se3


def random_tangents(n, scale_t=1.0, scale_r=1.0, seed=0):
  rng = np.random.RandomState(seed)
  t = rng.uniform(-scale_t, scale_t, size=(n, 3))
  r = rng.uniform(-scale_r, scale_r, size=(n, 3))
  return jnp.asarray(np.concatenate([t, r], axis=1), dtype=jnp.float32)


def test_exp_identity():
  T = se3.exp(jnp.zeros(6))
  np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)


def test_exp_log_roundtrip():
  tangents = random_tangents(64, scale_t=2.0, scale_r=1.5)
  T = se3.exp(tangents)
  back = se3.log(T)
  np.testing.assert_allclose(np.asarray(back), np.asarray(tangents), atol=2e-4)


def test_log_exp_small_angles():
  tangents = random_tangents(32, scale_t=0.01, scale_r=1e-4, seed=1)
  T = se3.exp(tangents)
  back = se3.log(T)
  np.testing.assert_allclose(np.asarray(back), np.asarray(tangents), atol=1e-6)


def test_pure_translation():
  tangent = jnp.asarray([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
  T = se3.exp(tangent)
  np.testing.assert_allclose(np.asarray(T[0:3, 3]), [1.0, 2.0, 3.0], atol=1e-6)
  np.testing.assert_allclose(np.asarray(T[0:3, 0:3]), np.eye(3), atol=1e-6)


def test_rotation_about_z():
  theta = 0.3
  tangent = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, theta])
  T = se3.exp(tangent)
  expected = np.array(
      [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
  )
  np.testing.assert_allclose(np.asarray(T[0:3, 0:3]), expected, atol=1e-6)


def test_inverse():
  T = se3.exp(random_tangents(8, seed=2))
  prod = T @ se3.inverse(T)
  np.testing.assert_allclose(
      np.asarray(prod), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5
  )


def test_transform_points():
  T = se3.exp(jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2], dtype=jnp.float32))
  p = jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32)
  out = se3.transform_points(T, p)
  # Rotation by 90 deg about z maps (1,0,0)->(0,1,0); V matrix mixes translation.
  R = np.asarray(T[0:3, 0:3])
  t = np.asarray(T[0:3, 3])
  np.testing.assert_allclose(np.asarray(out), R @ np.asarray(p) + t, atol=1e-6)


def test_quaternion_roundtrip():
  T = se3.exp(random_tangents(16, seed=3))
  q = se3.matrix_to_quaternion(T[..., 0:3, 0:3])
  R = se3.quaternion_to_matrix(q)
  np.testing.assert_allclose(np.asarray(R), np.asarray(T[..., 0:3, 0:3]), atol=1e-5)


def test_interpolate_endpoints():
  T0 = se3.exp(random_tangents(1, seed=4))[0]
  T1 = se3.exp(random_tangents(1, seed=5))[0]
  np.testing.assert_allclose(np.asarray(se3.interpolate(T0, T1, 0.0)), np.asarray(T0), atol=1e-5)
  np.testing.assert_allclose(np.asarray(se3.interpolate(T0, T1, 1.0)), np.asarray(T1), atol=1e-5)


def test_update_convention_matches_reference():
  # The reference applies updates as T * exp(-x) (direct_ba_alternating.cc:214).
  T = se3.exp(random_tangents(1, seed=6))[0]
  x = jnp.asarray([0.001, -0.002, 0.0005, 0.0001, 0.0, -0.0002], dtype=jnp.float32)
  updated = se3.right_multiply_exp(T, -x)
  # log(T^-1 * updated) == -x
  delta = se3.log(se3.inverse(T) @ updated)
  np.testing.assert_allclose(np.asarray(delta), np.asarray(-x), atol=1e-6)


def test_jit_and_vmap():
  tangents = random_tangents(32, seed=7)
  T_jit = jax.jit(se3.exp)(tangents)
  T_vmap = jax.vmap(se3.exp)(tangents)
  np.testing.assert_allclose(np.asarray(T_jit), np.asarray(T_vmap), atol=1e-6)


def test_average_poses():
  T = jnp.stack([se3.identity(), se3.identity()])
  avg = se3.average_poses(T)
  np.testing.assert_allclose(np.asarray(avg), np.eye(4), atol=1e-6)
