"""ATE evaluation tool and keyframe merge/delete tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu import eval as eval_mod
from badslam_tpu.geometry import se3


def test_ate_rmse_zero_for_identical():
  rng = np.random.default_rng(0)
  p = rng.uniform(-1, 1, (30, 3))
  rmse, aligned = eval_mod.ate_rmse(p, p)
  assert rmse < 1e-6


def test_ate_alignment_removes_rigid_offset():
  rng = np.random.default_rng(1)
  gt = rng.uniform(-1, 1, (40, 3))
  T = np.asarray(se3.exp(jnp.asarray([0.5, -0.2, 0.1, 0.3, 0.2, -0.4])))
  est = gt @ T[:3, :3].T + T[:3, 3]
  rmse, _ = eval_mod.ate_rmse(est, gt)
  assert rmse < 1e-5
  # With noise, RMSE ~ noise level.
  est_noisy = est + rng.normal(0, 0.01, est.shape)
  rmse2, _ = eval_mod.ate_rmse(est_noisy, gt)
  assert 0.005 < rmse2 < 0.03


def test_evaluate_ate_files(tmp_path):
  from badslam_tpu.io.dataset import save_tum_trajectory
  rng = np.random.default_rng(2)
  poses = []
  for i in range(20):
    T = np.asarray(se3.exp(jnp.asarray(
        [0.1 * i, 0.01 * i, 0, 0, 0.01 * i, 0], jnp.float32)))
    poses.append(T)
  ts = [i / 30.0 for i in range(20)]
  gt_path = str(tmp_path / "gt.txt")
  est_path = str(tmp_path / "est.txt")
  save_tum_trajectory(gt_path, ts, poses)
  noisy = [p.copy() for p in poses]
  for p in noisy:
    p[:3, 3] += rng.normal(0, 0.005, 3)
  save_tum_trajectory(est_path, ts, noisy)
  result = eval_mod.evaluate_ate(est_path, gt_path)
  assert result["pairs"] == 20
  assert result["ate_rmse"] < 0.02


def test_keyframe_merge_deletes_redundant():
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.slam.direct_ba import DirectBA
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(160, 120)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1, min_observation_count=1,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 12)
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=0)
  kf = synthetic.preprocess_like_test_keyframe(depth, cam, cell=2)
  # 4 nearly-identical keyframes -> prime merge candidates.
  for i in range(4):
    T = jnp.asarray(np.asarray(se3.exp(jnp.asarray(
        [0.001 * i, 0, 0, 0, 0, 0], jnp.float32))))
    ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb,
                    T, i * 10)
  assert int(np.asarray(ba.kf.valid).sum()) == 4

  deleted = ba.merge_keyframes(approx_merge_count=2)
  assert deleted >= 1
  valid = np.asarray(ba.kf.valid)
  assert valid[0]  # anchor keyframe never deleted
  assert int(valid.sum()) == 4 - deleted
  # Covisibility rows of deleted keyframes are cleared.
  covis = np.asarray(ba.kf.covis)
  for i in range(4):
    if not valid[i]:
      assert not covis[i].any() and not covis[:, i].any()


@pytest.mark.parametrize("use_pcg", [False, True],
                         ids=["alternating", "pcg"])
def test_ba_scheme_with_deleted_slot_inside_watermark(use_pcg):
  """A keyframe deleted BEFORE a BA scheme leaves an invalid slot inside the
  watermark; the scheme's convergence accounting must count that slot as
  converged (direct_ba_alternating.cc:548-551,692-701 treats null keyframes
  as converged) so BA can terminate, and the live poses must still recover."""
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.slam.direct_ba import DirectBA
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(160, 120)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1, min_observation_count=1,
      initial_keyframe_capacity=4, initial_surfel_capacity=1 << 13,
      use_pcg=use_pcg)
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  kf = synthetic.preprocess_like_test_keyframe(
      depth, cam, intensity=synthetic.intensity_function_image(cam), cell=2)
  # Identical images => ground-truth poses all identity; perturb inits.
  perturbs = [
      [0, 0, 0, 0, 0, 0],
      [0.002, -0.001, 0.001, 0.0004, 0, -0.0003],
      [0.05, 0.05, 0.05, 0.01, 0.01, 0.01],   # slot to delete (poison pose)
      [-0.001, 0.002, -0.002, 0, 0.0004, 0.0002],
  ]
  for i, p in enumerate(perturbs):
    ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb,
                    se3.exp(jnp.asarray(p, jnp.float32)), i * 10)
  ba.create_surfels_for_keyframe(0, filter_new_surfels=False)

  deleted_pose_before = np.asarray(ba.kf.global_T_frame[2])
  ba.delete_keyframe(2)
  assert not bool(np.asarray(ba.kf.valid)[2])
  assert ba.keyframe_count == 4  # watermark unchanged: slot 2 is a hole

  iters, converged = ba.bundle_adjustment(max_iterations=12)
  # Convergence accounting must allow termination despite the hole.
  assert converged, f"BA did not converge in {iters} iterations"
  assert iters < 12

  # Live keyframes recover to (gauge-shared) identity relative poses.
  T = ba.kf.global_T_frame
  for i in (1, 3):
    rel = np.abs(np.asarray(se3.log(se3.inverse(T[0]) @ T[i]))).max()
    assert rel < 5e-4, (i, rel)
  # The deleted slot's pose is untouched (masked out of every phase).
  np.testing.assert_allclose(np.asarray(T[2]), deleted_pose_before,
                             rtol=0, atol=1e-6)


def test_rpe_zero_for_identical_and_detects_drift(tmp_path):
  """RPE (TUM evaluate_rpe.py semantics): zero for identical trajectories;
  a constant per-frame translational bias shows up exactly (RPE is immune
  to global alignment, unlike ATE)."""
  from badslam_tpu.io.dataset import save_tum_trajectory

  poses = []
  for i in range(15):
    T = np.asarray(se3.exp(jnp.asarray(
        [0.05 * i, 0.01 * i, 0, 0, 0.02 * i, 0], jnp.float32)), np.float64)
    poses.append(T)
  ts = [i / 30.0 for i in range(15)]
  gt = str(tmp_path / "gt.txt")
  save_tum_trajectory(gt, ts, poses)

  est_same = str(tmp_path / "same.txt")
  save_tum_trajectory(est_same, ts, poses)
  r = eval_mod.evaluate_rpe(est_same, gt)
  assert r["rpe_trans_rmse"] < 1e-6
  assert r["rpe_rot_rmse_deg"] < 1e-4

  # Per-frame drift of 2 mm along the local x axis.
  drifted = []
  D = np.eye(4)
  step = np.eye(4)
  step[0, 3] = 0.002
  for T in poses:
    drifted.append(T @ D)
    D = D @ step
  est_drift = str(tmp_path / "drift.txt")
  save_tum_trajectory(est_drift, ts, drifted)
  r = eval_mod.evaluate_rpe(est_drift, gt)
  # quaternion text round-trip + rotation interplay: ~2% slack
  assert r["rpe_trans_rmse"] == pytest.approx(0.002, rel=0.05)
  assert r["rpe_pairs"] == 14
