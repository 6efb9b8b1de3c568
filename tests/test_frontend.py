"""End-to-end front-end test: odometry + keyframing + BA on a synthetic
multi-view sequence of the plane world.

This is the rebuild's stand-in for the reference's system-level testing on
TUM clips (SURVEY.md §4 "System-level testing"): render a consistent world
along a known trajectory, run the full per-frame pipeline, compare the
estimated trajectory against ground truth (ATE RMSE after Horn alignment is
overkill here — the first frame anchors the gauge, so direct errors work).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.slam.system import BadSlam
from badslam_tpu.utils import synthetic

W, H = 160, 120


def make_trajectory(n, step=0.004, rot_step=0.0012):
  traj = []
  for i in range(n):
    tangent = jnp.asarray(
        [step * i, 0.4 * step * i, -0.2 * step * i,
         rot_step * i, -0.5 * rot_step * i, 0.3 * rot_step * i], jnp.float32)
    traj.append(np.asarray(se3.exp(tangent)))
  return traj


@pytest.fixture(scope="module")
def synthetic_run():
  cam = synthetic.default_test_camera(W, H)
  rng = np.random.default_rng(7)
  normals = []
  for _ in range(3):
    n = rng.uniform(-1, 1, 3).astype(np.float32)
    n[2] = -1.0
    normals.append(n / np.linalg.norm(n))
  normals = np.asarray(normals)

  n_frames = 12
  traj_gt = make_trajectory(n_frames)
  video = synthetic.make_synthetic_video(cam, traj_gt, normals)

  cfg = BadSlamConfig(
      keyframe_interval=4,
      num_scales=3,
      max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=8,
      initial_surfel_capacity=1 << 14,
      enable_loop_detection=False,
      parallel_ba=False,
  )
  slam = BadSlam(cfg, video)
  for i in range(n_frames):
    slam.process_frame(i)
  return slam, video, traj_gt


def test_frontend_tracks_trajectory(synthetic_run):
  slam, video, traj_gt = synthetic_run
  # Every frame got a pose; compare against GT (frame 0 anchors the gauge).
  errs_t, errs_r = [], []
  for i in range(len(traj_gt)):
    T_est = video.frames[i].global_T_frame
    d = np.asarray(se3.log(se3.inverse(jnp.asarray(T_est)) @ jnp.asarray(traj_gt[i])))
    errs_t.append(np.linalg.norm(d[:3]))
    errs_r.append(np.linalg.norm(d[3:]))
  errs_t = np.asarray(errs_t)
  errs_r = np.asarray(errs_r)
  # Trajectory spans ~50 mm of motion; require mm-level tracking.
  assert errs_t.max() < 5e-3, f"translation errors {errs_t}"
  assert errs_r.max() < 2e-3, f"rotation errors {errs_r}"


def test_frontend_created_keyframes_and_surfels(synthetic_run):
  slam, video, traj_gt = synthetic_run
  assert slam.direct_ba.keyframe_count == 3  # frames 0, 4, 8
  assert slam.direct_ba.surfel_count > 500
  assert slam.keyframe_frame_indices == [0, 4, 8]


def test_frontend_map_consistency(synthetic_run):
  slam, video, traj_gt = synthetic_run
  pos, nrm, col = slam.direct_ba.export_point_cloud()
  # Surfels lie on the GT planes (world geometry n.x + 2.5 = 0).
  rng = np.random.default_rng(7)
  normals = []
  for _ in range(3):
    n = rng.uniform(-1, 1, 3).astype(np.float32)
    n[2] = -1.0
    normals.append(n / np.linalg.norm(n))
  normals = np.asarray(normals)
  d = np.abs(pos @ normals.T + 2.5).min(axis=1)
  assert np.quantile(d, 0.9) < 5e-3


def test_motion_model_prediction(synthetic_run):
  slam, video, traj_gt = synthetic_run
  # After running, the motion-model history must hold <= 3 entries and the
  # last one should be close to the current base_kf_T_frame relative pose.
  assert 1 <= len(slam.base_kf_tr_frame) <= 3
  est1, est2 = slam.predict_frame_pose()
  assert np.isfinite(est1).all() and np.isfinite(est2).all()


def test_frontend_parallel_ba_matches_sequential():
  """parallel_ba=True runs BA on a background thread with queued keyframes
  and pose fixups (BAThreadMain, bad_slam.cc:1160-1313); the trajectory must
  stay mm-accurate like the sequential path."""
  cam = synthetic.default_test_camera(W, H)
  rng = np.random.default_rng(7)
  normals = []
  for _ in range(3):
    n = rng.uniform(-1, 1, 3).astype(np.float32)
    n[2] = -1.0
    normals.append(n / np.linalg.norm(n))
  normals = np.asarray(normals)

  n_frames = 12
  traj_gt = make_trajectory(n_frames)
  video = synthetic.make_synthetic_video(cam, traj_gt, normals)

  cfg = BadSlamConfig(
      keyframe_interval=4, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 14,
      enable_loop_detection=False,
      parallel_ba=True)
  slam = BadSlam(cfg, video)
  for i in range(n_frames):
    slam.process_frame(i)
  slam.stop_ba_thread_and_wait()

  assert slam.direct_ba.keyframe_count == 3
  assert slam.direct_ba.surfel_count > 500
  errs_t = []
  for i in range(n_frames):
    T_est = video.frames[i].global_T_frame
    d = np.asarray(se3.log(
        se3.inverse(jnp.asarray(T_est)) @ jnp.asarray(traj_gt[i])))
    errs_t.append(np.linalg.norm(d[:3]))
  assert max(errs_t) < 6e-3, f"translation errors {errs_t}"


def test_prewarm_compiles_without_touching_the_map():
  """slam.prewarm() (--prewarm): runs the full pipeline on a throwaway
  system of the dataset's shapes, so the live system's map must stay empty
  and a subsequent real run must behave as without prewarm."""
  cam = synthetic.default_test_camera(W, H)
  rng = np.random.default_rng(7)
  normals = []
  for _ in range(3):
    n = rng.uniform(-1, 1, 3).astype(np.float32)
    n[2] = -1.0
    normals.append(n / np.linalg.norm(n))
  n_frames = 6
  traj_gt = make_trajectory(n_frames)
  video = synthetic.make_synthetic_video(cam, traj_gt, np.asarray(normals))
  cfg = BadSlamConfig(
      keyframe_interval=4, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 14,
      enable_loop_detection=False, parallel_ba=False)
  slam = BadSlam(cfg, video)
  # max_ba_keyframes exercises the bucketed-BA shape progression (gathered
  # window at 4, then the dense full-store phases past capacity // 2).
  slam.prewarm(max_ba_keyframes=6)
  assert slam.direct_ba.keyframe_count == 0
  assert slam.direct_ba.surfel_count == 0
  assert slam.last_frame_index == -1
  assert slam.base_kf_index is None
  for i in range(n_frames):
    slam.process_frame(i)
  assert slam.direct_ba.keyframe_count == 2  # frames 0, 4
  errs_t = []
  for i in range(n_frames):
    T_est = video.frames[i].global_T_frame
    d = np.asarray(se3.log(
        se3.inverse(jnp.asarray(T_est)) @ jnp.asarray(traj_gt[i])))
    errs_t.append(np.linalg.norm(d[:3]))
  assert max(errs_t) < 5e-3, f"translation errors {errs_t}"
