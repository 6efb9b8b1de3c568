"""Real-time pacing parity: EndFrame playback throttling and the
target_frame_rate BA budget (bad_slam.cc:449-479, :213-278,
direct_ba_alternating.cc:703-709)."""

import time

import numpy as np
import pytest

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.slam.system import BadSlam
from badslam_tpu.utils import synthetic
from tests.test_frontend import make_trajectory

W, H = 160, 120


def _video(n):
  cam = synthetic.default_test_camera(W, H)
  rng = np.random.default_rng(7)
  normals = []
  for _ in range(3):
    nv = rng.uniform(-1, 1, 3).astype(np.float32)
    nv[2] = -1.0
    normals.append(nv / np.linalg.norm(nv))
  return synthetic.make_synthetic_video(cam, make_trajectory(n),
                                        np.asarray(normals))


def _cfg(**kw):
  base = dict(
      keyframe_interval=4, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 14,
      enable_loop_detection=False, parallel_ba=False)
  base.update(kw)
  return BadSlamConfig(**base)


def test_fps_restriction_paces_playback():
  """With fps_restriction > 0, N frames take at least N/fps seconds."""
  n = 6
  video = _video(n)
  slam = BadSlam(_cfg(fps_restriction=0), video)
  for i in range(n):  # warm the jits unpaced
    slam.process_frame(i)
    slam.end_frame()

  video2 = _video(n)
  fps = 4.0
  slam2 = BadSlam(_cfg(fps_restriction=fps), video2)
  t0 = time.perf_counter()
  for i in range(n):
    slam2.process_frame(i)
    slam2.end_frame()
  elapsed = time.perf_counter() - t0
  assert elapsed >= n / fps - 0.05, elapsed


def test_target_frame_rate_bounds_ba_budget():
  """In real-time mode an exhausted frame budget defers BA (the planned
  iterations stay queued) instead of running it; the run still completes
  with finite poses."""
  n = 10
  video = _video(n)
  # An absurd target rate => the budget is always exhausted, so sequential
  # BA must be skipped every frame while iterations accumulate.
  slam = BadSlam(_cfg(target_frame_rate=1e6, fps_restriction=0), video)
  for i in range(n):
    slam.process_frame(i)
    slam.end_frame()
  assert slam.num_planned_ba_iterations > 0  # BA was deferred, not dropped
  for i in range(n):
    T = video.frames[i].global_T_frame
    assert np.isfinite(T).all()

  # Offline mode on the same data runs the budget down.
  video2 = _video(n)
  slam2 = BadSlam(_cfg(target_frame_rate=0.0, fps_restriction=0), video2)
  for i in range(n):
    slam2.process_frame(i)
    slam2.end_frame()
  assert slam2.num_planned_ba_iterations == 0


def test_deadline_stops_ba_iterations():
  """A deadline in the past limits the scheme loop to one iteration."""
  video = _video(9)
  slam = BadSlam(_cfg(fps_restriction=0), video)
  for i in range(9):
    slam.process_frame(i)
  done, converged = slam.run_bundle_adjustment(
      False, False, max_iterations=8, deadline=time.perf_counter() - 1.0,
      increase_ba_iteration_count=False)
  assert done == 1
