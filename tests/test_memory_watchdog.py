"""HBM memory-pressure watchdog (bad_slam.cc:958-968): when free device
memory drops below min_free_gpu_memory_mb + ~one keyframe, keyframes are
merged (middle keyframe of the closest chain deleted) and the loop-detector
database stays consistent. The memory read is injected via the
_device_memory_stats seam so the trigger logic is testable on backends
without memory_stats (CPU); on real TPU hardware the same read returns the
chip's bytes_in_use/bytes_limit."""

import numpy as np
import pytest

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.slam.system import BadSlam
from badslam_tpu.utils import synthetic

import jax.numpy as jnp

W, H = 160, 120


def _make_slam(n_frames=13, min_free_mb=250):
  cam = synthetic.default_test_camera(W, H)
  rng = np.random.default_rng(7)
  normals = []
  for _ in range(3):
    n = rng.uniform(-1, 1, 3).astype(np.float32)
    n[2] = -1.0
    normals.append(n / np.linalg.norm(n))
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.003 * i, 0.001 * i, 0, 0.0008 * i, 0, 0], jnp.float32)))
      for i in range(n_frames)]
  video = synthetic.make_synthetic_video(cam, traj, np.asarray(normals))
  cfg = BadSlamConfig(
      keyframe_interval=2, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1, min_observation_count=1,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 14,
      enable_loop_detection=False, parallel_ba=False,
      min_free_gpu_memory_mb=min_free_mb)
  return BadSlam(cfg, video), n_frames


def test_watchdog_fires_under_pressure_and_merges():
  slam, n = _make_slam()
  # Fake a nearly-full device: 16 GB limit, free below threshold + keyframe.
  limit = 16 * 1024**3
  slam._device_memory_stats = lambda: {
      "bytes_limit": limit,
      "bytes_in_use": limit - (slam.config.min_free_gpu_memory_mb
                               * 1024 * 1024)}
  for i in range(n):
    slam.process_frame(i)
  # Every keyframe creation saw pressure; merges must have fired and the
  # store must stay consistent (anchor keyframe 0 never deleted).
  assert slam.num_keyframes_merged > 0
  valid = np.asarray(slam.direct_ba.kf.valid)
  assert valid[0]
  assert valid.sum() == slam.direct_ba.keyframe_count - \
      slam.num_keyframes_merged
  # Poses of surviving keyframes stay finite and the system keeps tracking.
  poses = np.asarray(slam.direct_ba.kf.global_T_frame)[valid]
  assert np.isfinite(poses).all()


def test_watchdog_quiet_when_memory_free():
  slam, n = _make_slam()
  limit = 16 * 1024**3
  slam._device_memory_stats = lambda: {
      "bytes_limit": limit, "bytes_in_use": limit // 10}
  for i in range(n):
    slam.process_frame(i)
  assert slam.num_keyframes_merged == 0
  assert np.asarray(slam.direct_ba.kf.valid).sum() == \
      slam.direct_ba.keyframe_count
