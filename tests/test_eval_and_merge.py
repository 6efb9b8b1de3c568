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
