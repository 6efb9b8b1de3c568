"""PCG joint-solver tests: the matrix-free GN must recover a perturbed
keyframe pose (gauge fixed at keyframe 0) like the alternating path, while
jointly updating surfel geometry (direct_ba_pcg.cc semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.models import pcg
from badslam_tpu.models.association import DepthParamsArrays
from badslam_tpu.slam.direct_ba import DirectBA
from badslam_tpu.utils import synthetic

W, H = 160, 120


def build(perturb, use_desc=True):
  cam = synthetic.default_test_camera(W, H)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=2,
      initial_surfel_capacity=1 << 13,
  )
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  inten = synthetic.intensity_function_image(cam) if use_desc else None
  kf = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                               cell=2)
  T_gt = jnp.eye(4, dtype=jnp.float32)
  ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb,
                  T_gt, 0)
  T2 = T_gt @ se3.exp(jnp.asarray(perturb, jnp.float32))
  ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb,
                  T2, 10)
  ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
  ba.kf = ba.kf._replace(
      activation=jnp.where(ba.kf.valid, 2, 0).astype(jnp.int32))
  ba.surfels = ba.surfels._replace(active=ba.surfels.valid)
  return ba, cam, T_gt


@pytest.mark.parametrize("use_desc", [False, True],
                         ids=["geometric", "with_photometric"])
def test_pcg_recovers_perturbed_pose(use_desc):
  perturb = [0.004, -0.003, 0.002, 0.0008, -0.0005, 0.0008]
  ba, cam, T_gt = build(perturb, use_desc)
  dp = ba.depth_params()

  kf = ba.kf
  surfels = ba.surfels
  errs = []
  for _ in range(8):
    delta = pcg.pcg_solve(surfels, kf, cam, cam, dp,
                          gauge_index=jnp.asarray(0, jnp.int32),
                          max_inner_iterations=30,
                          use_depth=True, use_desc=use_desc)
    surfels, kf = pcg.apply_pcg_delta(surfels, kf, delta)
    errs.append(float(np.abs(np.asarray(se3.log(
        se3.inverse(kf.global_T_frame[1]) @ T_gt))).max()))

  err0 = np.abs(np.asarray(se3.log(
      se3.inverse(kf.global_T_frame[0]) @ T_gt))).max()
  # Gauge keyframe must not move; perturbed keyframe must recover. The
  # joint photometric system oscillates near the optimum in f32 (the step
  # direction/magnitude were verified against the cost surface), so for it
  # we assert on the best iterate and bound the oscillation band.
  assert err0 < 1e-6
  if not use_desc:
    assert errs[-1] < 2e-4, f"errors {errs} (perturbation was 4e-3)"
  else:
    assert min(errs) < 5e-4, f"errors {errs}"
    assert errs[-1] < 3e-3, f"errors {errs}"
  # Surfels must stay finite and near the planes.
  pos = np.asarray(surfels.pos)[np.asarray(surfels.valid)]
  assert np.isfinite(pos).all()


def test_pcg_hessian_is_consistent_with_init():
  """alpha_d = p^T H p must be positive for the initial direction, and the
  Hessian-vector product must be symmetric: p1.H p2 == p2.H p1."""
  ba, cam, T_gt = build([0.002, 0, 0, 0, 0, 0], use_desc=False)
  dp = ba.depth_params()
  g = jnp.asarray(0, jnp.int32)

  r0, M = pcg.pcg_init(ba.surfels, ba.kf, cam, cam, dp, g,
                       use_depth=True, use_desc=False)
  h = pcg.apply_hessian(r0, ba.surfels, ba.kf, cam, cam, dp, g,
                        use_depth=True, use_desc=False)
  alpha_d = float(r0.dot(h))
  assert alpha_d > 0

  rng = np.random.default_rng(0)
  def rand_vec(num_cells):
    return pcg.PCGVector(
        jnp.asarray(rng.normal(size=(ba.kf.capacity, 6)), jnp.float32),
        jnp.asarray(rng.normal(size=(ba.surfels.capacity,)), jnp.float32),
        jnp.asarray(rng.normal(size=(ba.surfels.capacity, 2)), jnp.float32),
        jnp.asarray(rng.normal(size=(pcg.N_DINTR,)), jnp.float32),
        jnp.asarray(rng.normal(size=(num_cells,)), jnp.float32),
        jnp.asarray(rng.normal(size=(pcg.N_CINTR,)), jnp.float32))
  c = dp.cfactor.size
  p1, p2 = rand_vec(c), rand_vec(c)
  h1 = pcg.apply_hessian(p1, ba.surfels, ba.kf, cam, cam, dp, g,
                         use_depth=True, use_desc=False)
  h2 = pcg.apply_hessian(p2, ba.surfels, ba.kf, cam, cam, dp, g,
                         use_depth=True, use_desc=False)
  a = float(p2.dot(h1))
  b = float(p1.dot(h2))
  assert a == pytest.approx(b, rel=1e-3)


def test_pcg_hessian_symmetric_with_intrinsics_blocks():
  """With the intrinsics unknowns folded into the joint vector
  (direct_ba_pcg.cc:240-307), the Hessian-vector product must remain
  symmetric across ALL blocks (pose x intrinsics cross terms included)."""
  ba, cam, T_gt = build([0.002, 0, 0, 0.0005, 0, 0], use_desc=True)
  dp = ba.depth_params()
  g = jnp.asarray(0, jnp.int32)
  rng = np.random.default_rng(1)
  c = dp.cfactor.size

  def rand_vec():
    return pcg.PCGVector(
        jnp.asarray(rng.normal(size=(ba.kf.capacity, 6)), jnp.float32),
        jnp.asarray(rng.normal(size=(ba.surfels.capacity,)), jnp.float32),
        jnp.asarray(rng.normal(size=(ba.surfels.capacity, 2)), jnp.float32),
        jnp.asarray(rng.normal(size=(pcg.N_DINTR,)), jnp.float32),
        jnp.asarray(rng.normal(size=(c,)), jnp.float32),
        jnp.asarray(rng.normal(size=(pcg.N_CINTR,)), jnp.float32))

  p1, p2 = rand_vec(), rand_vec()
  kwargs = dict(use_depth=True, use_desc=True, opt_dintr=True, opt_cintr=True)
  h1 = pcg.apply_hessian(p1, ba.surfels, ba.kf, cam, cam, dp, g, **kwargs)
  h2 = pcg.apply_hessian(p2, ba.surfels, ba.kf, cam, cam, dp, g, **kwargs)
  a = float(p2.dot(h1))
  b = float(p1.dot(h2))
  assert a == pytest.approx(b, rel=1e-3)
  # And alpha_d > 0 on the preconditioned initial direction.
  r0, M = pcg.pcg_init(ba.surfels, ba.kf, cam, cam, dp, g, **kwargs)
  g0 = pcg.PCGVector(*(r / m for r, m in zip(r0, M)))
  h = pcg.apply_hessian(g0, ba.surfels, ba.kf, cam, cam, dp, g, **kwargs)
  assert float(g0.dot(h)) > 0


def test_pcg_debug_verify_result():
  """kDebugVerifyResult parity (direct_ba_pcg.cc:476-550): after the solve,
  (J^T W J + eps I) delta must match r0 to a tolerance small relative to
  ||r0||_inf."""
  ba, cam, T_gt = build([0.003, -0.002, 0.001, 0.0005, 0, -0.0004],
                        use_desc=False)
  dp = ba.depth_params()
  g = jnp.asarray(0, jnp.int32)
  delta = pcg.pcg_solve(ba.surfels, ba.kf, cam, cam, dp, g,
                        max_inner_iterations=60,
                        use_depth=True, use_desc=False)
  err, scale = pcg.debug_verify_result(
      delta, ba.surfels, ba.kf, cam, cam, dp, g,
      use_depth=True, use_desc=False)
  assert float(err) < 1e-2 * float(scale), (float(err), float(scale))


def test_pcg_joint_intrinsics_recovery():
  """Perturbing the depth-deformation a and the color intrinsics must be
  (partially) corrected by the JOINT PCG step — the intrinsics rows of the
  delta move toward the truth (direct_ba_pcg.cc:588-645 update rules)."""
  ba, cam, T_gt = build([0.0, 0, 0, 0, 0, 0], use_desc=True)
  # Ground truth: the map was built with a=0, color intr = cam.
  a_true = 0.0
  a_perturbed = 0.02
  dp = DepthParamsArrays(a=jnp.asarray(a_perturbed, jnp.float32),
                         cfactor=ba.cfactor, baseline_fx=ba.baseline_fx,
                         cell_size=ba.cell_size)
  g = jnp.asarray(0, jnp.int32)
  delta = pcg.pcg_solve(ba.surfels, ba.kf, cam, cam, dp, g,
                        max_inner_iterations=40,
                        use_depth=True, use_desc=True,
                        opt_dintr=True, opt_cintr=True)
  depth_intr = jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32)
  new_dintr, new_cintr, new_a, new_cf = pcg.apply_pcg_delta_intrinsics(
      depth_intr, depth_intr, dp.a, dp.cfactor, delta,
      opt_dintr=True, opt_cintr=True)
  # a must move toward the truth (0), not away.
  assert abs(float(new_a) - a_true) < abs(a_perturbed - a_true)
  assert np.isfinite(np.asarray(new_dintr)).all()
  assert np.isfinite(np.asarray(new_cintr)).all()
  assert np.isfinite(np.asarray(new_cf)).all()
