"""Convergence tests for frame-to-model pose optimization, per-surfel geometry
optimization, and the full alternating BA.

Replicates the reference's synthetic-plane convergence tests:
  test/test_pose_optimization_geometric_residual.cc (12 perturbation axes,
  tol 1.1e-6), test/test_pose_optimization_photometric_residual.cc,
  test/test_geometry_optimization_geometric_residual.cc.
Scene sizes are reduced (320x240 vs 640x480) to keep CPU test time sane; the
math is resolution-independent.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.models import pose_opt
from badslam_tpu.models.association import DepthParamsArrays
from badslam_tpu.slam.direct_ba import DirectBA
from badslam_tpu.utils import synthetic

W, H = 320, 240

TRANSLATION_OFFSET = 0.005
ROTATION_OFFSET = 0.001


def perturbations():
  offs = [np.zeros(6)]
  for i in range(3):
    for sign in (1.0, -1.0):
      v = np.zeros(6)
      v[i] = sign * TRANSLATION_OFFSET
      offs.append(v)
  for i in range(3, 6):
    for sign in (1.0, -1.0):
      v = np.zeros(6)
      v[i] = sign * ROTATION_OFFSET
      offs.append(v)
  return offs


def build_scene(use_descriptors: bool, seed: int = 0):
  cam = synthetic.default_test_camera(W, H)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=1,
      min_observation_count_while_bootstrapping_1=2,
      min_observation_count_while_bootstrapping_2=2,
      min_observation_count=2,
      initial_keyframe_capacity=4,
      initial_surfel_capacity=1 << 17,
      baseline_fx=40.0,
  )
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=seed)
  intensity = synthetic.intensity_function_image(cam) if use_descriptors else None
  kf = synthetic.preprocess_like_test_keyframe(
      depth, cam, intensity=intensity, cell=1)
  T = jnp.eye(4, dtype=jnp.float32)
  idx = ba.add_keyframe(
      kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb, T, 0)
  ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)
  assert ba.surfel_count > 1000
  return ba, cam, kf, T


@pytest.mark.parametrize("use_descriptors", [False, True],
                         ids=["geometric", "photometric"])
def test_pose_optimization_recovers_pose(use_descriptors):
  """EstimateFramePose pulls a perturbed pose back to ground truth
  (test_pose_optimization_{geometric,photometric}_residual.cc)."""
  ba, cam, kf, T_gt = build_scene(use_descriptors)
  dp = ba.depth_params()

  use_depth = not use_descriptors
  # Geometric matches the reference tolerance (1.1e-6). Photometric: the
  # reference asserts 8e-5 at 640x480 (~290k surfels); at our 320x240 the
  # residual count is 4x smaller, so the f32 solution noise floor is ~2x
  # higher — 4e-4 bounds it with margin while still catching real breakage
  # (the initial perturbations are 5e-3 / 1e-3).
  tol = 1.1e-6 if not use_descriptors else 4e-4

  for i, off in enumerate(perturbations()):
    T_init = se3.exp(jnp.asarray(off, jnp.float32)) @ T_gt
    T_est, _ = pose_opt.estimate_frame_pose(
        T_init, ba.surfels, kf.depth, kf.normals, kf.intensity,
        cam, cam, dp,
        use_depth_residuals=use_depth,
        use_descriptor_residuals=use_descriptors,
    )
    err = np.asarray(se3.log(se3.inverse(T_est) @ T_gt))
    assert np.abs(err).max() < tol, f"case {i}: error {err}"


def test_geometry_optimization_pulls_surfels_to_surface():
  """Perturb surfels along their normals; one geometry GN step against the
  clean keyframe must pull them (nearly) back
  (test_geometry_optimization_geometric_residual.cc)."""
  ba, cam, kf, T_gt = build_scene(use_descriptors=False)
  from badslam_tpu.models import geometry_opt
  from badslam_tpu.models.keyframes import ACTIVE

  dp = ba.depth_params()
  s0 = ba.surfels
  rng = np.random.default_rng(0)
  offsets = rng.uniform(-0.01, 0.01, size=(s0.capacity,)).astype(np.float32)
  perturbed = s0._replace(
      pos=s0.pos + jnp.asarray(offsets)[:, None] * s0.normal,
      active=s0.valid,
  )

  out = perturbed
  for _ in range(10):
    out = geometry_opt.optimize_geometry_iteration(
        out, ba.kf, cam, cam, dp,
        use_depth_residuals=True, use_descriptor_residuals=False)

  valid = np.asarray(s0.valid)
  d_before = np.abs(np.asarray(
      jnp.sum((perturbed.pos - s0.pos) * s0.normal, axis=-1)))[valid]
  d_after = np.abs(np.asarray(
      jnp.sum((out.pos - s0.pos) * s0.normal, axis=-1)))[valid]
  # Typical recovery must be near-exact.
  assert np.median(d_after) < 5e-4
  assert np.median(d_after) < 0.2 * np.median(d_before)


def test_geometry_optimization_recovers_descriptors():
  """Perturb surfel descriptors; geometry iterations against the clean
  keyframe must pull them back to the image's values
  (test_geometry_optimization_photometric_residual.cc)."""
  ba, cam, kf, T_gt = build_scene(use_descriptors=True)
  from badslam_tpu.models import geometry_opt

  dp = ba.depth_params()
  s0 = ba.surfels
  rng = np.random.default_rng(1)
  offsets = rng.uniform(-30.0, 30.0,
                        size=(s0.capacity, 2)).astype(np.float32)
  perturbed = s0._replace(
      desc=jnp.where(s0.valid[:, None], s0.desc + jnp.asarray(offsets),
                     s0.desc),
      active=s0.valid,
  )

  out = perturbed
  for _ in range(10):
    out = geometry_opt.optimize_geometry_iteration(
        out, ba.kf, cam, cam, dp,
        use_depth_residuals=True, use_descriptor_residuals=True)

  valid = np.asarray(s0.valid)
  d_before = np.abs(np.asarray(perturbed.desc - s0.desc))[valid]
  d_after = np.abs(np.asarray(out.desc - s0.desc))[valid]
  assert np.median(d_after) < 0.5          # descriptor units (~[-180, 180])
  assert np.median(d_after) < 0.05 * np.median(d_before)


def test_alternating_ba_recovers_keyframe_pose():
  """Two keyframes of the same scene, the 2nd with a perturbed pose; the
  alternating BA (pose steps vs. fixed first keyframe's surfels) must pull it
  back (integration test of the BundleAdjustmentAlternating scheme)."""
  ba, cam, kf, T_gt = build_scene(use_descriptors=False)

  # Second keyframe: identical images, perturbed pose.
  off = jnp.asarray([0.004, -0.003, 0.002, 0.0008, -0.0005, 0.0008], jnp.float32)
  T2_init = se3.exp(off) @ T_gt
  idx2 = ba.add_keyframe(
      kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb, T2_init, 10)

  iters, converged = ba.bundle_adjustment(
      do_surfel_updates=False, optimize_geometry=False,
      max_iterations=10)
  T2 = np.asarray(ba.kf.global_T_frame)[idx2]
  err = np.asarray(se3.log(se3.inverse(jnp.asarray(T2)) @ T_gt))
  assert np.abs(err).max() < 1e-4, f"error {err} after {iters} iterations"


def test_pcg_ba_scheme_recovers_keyframe_pose():
  """Same as the alternating test, via the use_pcg joint-solver branch of
  BundleAdjustmentAlternating's dispatcher (direct_ba.cc:407-454)."""
  ba, cam, kf, T_gt = build_scene(use_descriptors=False)
  ba.config.use_pcg = True
  off = jnp.asarray([0.004, -0.003, 0.002, 0.0008, -0.0005, 0.0008], jnp.float32)
  T2_init = T_gt @ se3.exp(off)
  idx2 = ba.add_keyframe(
      kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb, T2_init, 10)

  iters, converged = ba.bundle_adjustment(
      do_surfel_updates=False, max_iterations=8)
  T2 = np.asarray(ba.kf.global_T_frame)[idx2]
  err = np.asarray(se3.log(se3.inverse(jnp.asarray(T2)) @ T_gt))
  assert np.abs(err).max() < 5e-4, f"error {err} after {iters} iterations"
