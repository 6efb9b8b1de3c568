"""Analytic-Jacobian verification against JAX autodiff.

The reference derives its hand-written CUDA Jacobians symbolically with
sympy (scripts/jacobians_derivation.py, README.md:297-308); here every
analytic Jacobian in models/cost.py is checked directly against
forward-mode autodiff of the residual it belongs to — a live test instead of
one-time code generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.models import cost
from badslam_tpu.utils import synthetic


@pytest.fixture
def setup():
  rng = np.random.default_rng(0)
  n = 64
  cam = synthetic.default_test_camera(160, 120)
  # Random surfels in front of the camera.
  pos = np.stack([rng.uniform(-0.8, 0.8, n), rng.uniform(-0.6, 0.6, n),
                  rng.uniform(1.5, 3.0, n)], axis=-1).astype(np.float32)
  nrm = rng.normal(size=(n, 3)).astype(np.float32)
  nrm[:, 2] = -np.abs(nrm[:, 2]) - 0.5
  nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
  T = np.asarray(se3.exp(jnp.asarray(
      [0.01, -0.02, 0.03, 0.004, 0.005, -0.006], jnp.float32)))
  return cam, jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(T), rng


def test_depth_residual_pose_jacobian_matches_autodiff(setup):
  """d r / d eps of r(T*exp(eps)) at eps=0 == depth_residual_pose_jacobian."""
  cam, pos, nrm, T_gf, rng = setup
  inv_stddev = jnp.asarray(rng.uniform(50.0, 200.0, pos.shape[0]), jnp.float32)
  # Fixed measurement point (unprojection of a hit pixel) per surfel.
  unproj = pos + jnp.asarray(rng.normal(0, 0.005, pos.shape), jnp.float32)

  def residuals(eps):
    # global_T_frame = T_gf @ exp(eps); residual computed in frame coords:
    # local = (T_gf exp(eps))^-1 applied to global quantities.
    T = T_gf @ se3.exp(eps)
    fTg = se3.inverse(T)
    local_pos = se3.transform_points(fTg, pos)
    local_normal = se3.rotate(fTg, nrm)
    return cost.raw_depth_residual(unproj, local_pos, local_normal,
                                   inv_stddev)

  J_auto = jax.jacfwd(residuals)(jnp.zeros(6))
  fTg = se3.inverse(T_gf)
  local_pos = se3.transform_points(fTg, pos)
  local_normal = se3.rotate(fTg, nrm)
  J_analytic = cost.depth_residual_pose_jacobian(unproj, local_normal,
                                                 inv_stddev)
  # Sign convention: the analytic J is exactly d r / d eps of
  # r(T*exp(eps)) at eps=0 (the GN update is then applied as T*exp(-x)).
  np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_analytic),
                             atol=2e-3, rtol=2e-3)


def test_projected_position_pose_jacobian_matches_autodiff(setup):
  """Chain rule of an image-plane residual through the projection."""
  cam, pos, nrm, T_gf, rng = setup
  gx = jnp.asarray(rng.normal(size=pos.shape[0]), jnp.float32)
  gy = jnp.asarray(rng.normal(size=pos.shape[0]), jnp.float32)

  def residuals(eps):
    T = T_gf @ se3.exp(eps)
    fTg = se3.inverse(T)
    local = se3.transform_points(fTg, pos)
    pxy = cam.project_corner(local)
    # Linear "intensity" in pixel coordinates with gradient (gx, gy).
    return gx * pxy[..., 0] + gy * pxy[..., 1]

  J_auto = jax.jacfwd(residuals)(jnp.zeros(6))
  fTg = se3.inverse(T_gf)
  local = se3.transform_points(fTg, pos)
  J_analytic = cost.projected_position_pose_jacobian(
      gx * cam.fx, gy * cam.fy, local)
  np.testing.assert_allclose(np.asarray(J_auto), np.asarray(J_analytic),
                             atol=2e-3, rtol=2e-3)


def test_geometry_offset_jacobian_matches_autodiff(setup):
  """d r_depth / d (position offset along normal) == -inv_stddev."""
  cam, pos, nrm, T_gf, rng = setup
  inv_stddev = jnp.asarray(rng.uniform(50.0, 200.0, pos.shape[0]), jnp.float32)
  unproj = pos + jnp.asarray(rng.normal(0, 0.005, pos.shape), jnp.float32)
  fTg = se3.inverse(T_gf)
  local_normal = se3.rotate(fTg, nrm)

  def residuals(t):
    p = pos + t[:, None] * nrm
    local_pos = se3.transform_points(fTg, p)
    return cost.raw_depth_residual(unproj, local_pos, local_normal,
                                   inv_stddev)

  J_auto = jnp.diagonal(jax.jacfwd(residuals)(jnp.zeros(pos.shape[0])))
  np.testing.assert_allclose(np.asarray(J_auto), -np.asarray(inv_stddev),
                             atol=1e-2, rtol=1e-3)


def test_lm_optimizer_curve_fit():
  """libvis test/lm_optimizer.cc analog: fit y = a*exp(b*x) from noisy
  samples with the generic LM."""
  from badslam_tpu.utils.lm_optimizer import lm_minimize
  rng = np.random.default_rng(1)
  a_gt, b_gt = 2.0, -0.7
  xs = jnp.asarray(np.linspace(0, 3, 40), jnp.float32)
  ys = jnp.asarray(a_gt * np.exp(b_gt * np.asarray(xs))
                   + rng.normal(0, 1e-3, 40), jnp.float32)

  def residual_fn(p):
    return p[0] * jnp.exp(p[1] * xs) - ys

  result = lm_minimize(residual_fn, jnp.asarray([1.0, 0.0]),
                       max_iterations=100)
  assert abs(float(result.params[0]) - a_gt) < 5e-3
  assert abs(float(result.params[1]) - b_gt) < 5e-3


def test_radtan_distortion_roundtrip():
  from badslam_tpu.geometry.distortion import RadTanCamera
  cam = RadTanCamera(width=160, height=120, fx=jnp.float32(80.0),
                     fy=jnp.float32(80.0), cx=jnp.float32(80.0),
                     cy=jnp.float32(60.0), k1=jnp.float32(-0.2),
                     k2=jnp.float32(0.05), p1=jnp.float32(1e-3),
                     p2=jnp.float32(-5e-4), k3=jnp.float32(0.0))
  rng = np.random.default_rng(2)
  nxy = jnp.asarray(rng.uniform(-0.4, 0.4, (128, 2)), jnp.float32)
  d = cam.distort(nxy)
  u = cam.undistort(d)
  np.testing.assert_allclose(np.asarray(u), np.asarray(nxy), atol=1e-5)


def test_undistortion_maps_produce_pinhole_geometry():
  """Project/unproject consistency: a 3D point projected through the
  distorted camera, remapped through the undistortion maps, must land where
  the pinhole camera projects it."""
  from badslam_tpu.geometry import distortion as dist
  cam = dist.RadTanCamera(width=160, height=120, fx=jnp.float32(90.0),
                          fy=jnp.float32(90.0), cx=jnp.float32(80.0),
                          cy=jnp.float32(60.0), k1=jnp.float32(-0.15),
                          k2=jnp.float32(0.03), p1=jnp.float32(0.0),
                          p2=jnp.float32(0.0), k3=jnp.float32(0.0))
  pin = dist.pinhole_from_distorted(cam)
  map_x, map_y = dist.build_undistortion_maps(cam, pin)
  # For pinhole pixel (px, py): map gives distorted source pixel s. The ray
  # of (px, py) through the pinhole must project (via the distorted model)
  # exactly to s — that is build_undistortion_maps' definition; verify a
  # central block against independent math.
  rng = np.random.default_rng(3)
  px = jnp.asarray(rng.uniform(40, 120, 64), jnp.float32)
  py = jnp.asarray(rng.uniform(30, 90, 64), jnp.float32)
  rays = pin.unproject_center(px, py, jnp.ones(64))
  expected = cam.project_corner(rays)
  from badslam_tpu.ops.interp import sample_bilinear
  got_x = sample_bilinear(map_x, px + 0.5, py + 0.5)
  got_y = sample_bilinear(map_y, px + 0.5, py + 0.5)
  np.testing.assert_allclose(np.asarray(got_x), np.asarray(expected[..., 0]),
                             atol=0.1)
  np.testing.assert_allclose(np.asarray(got_y), np.asarray(expected[..., 1]),
                             atol=0.1)
