"""Occlusion-rich synthetic world (round-3 verdict item 7): floating boxes
add depth discontinuities, occlusion shadows, and steep side-face normals,
so free-space-violation filtering (kernel_delete_surfels.cu:84), isolated-
pixel removal (cuda_depth_processing.cu:331), and normal-compatibility
gating are exercised against genuine violations — not just noise.
benchmarks/long_sequence.py --occlusions runs the full-scale gate; this is
the fast unit-level check."""

import numpy as np
import pytest

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.slam.system import BadSlam
from badslam_tpu.utils import synthetic, tum_synth

W, H = 160, 120
N_FRAMES = 24


def test_occlusion_boxes_render_discontinuities():
  cam = synthetic.default_test_camera(W, H)
  boxes = synthetic.occlusion_boxes(5)
  T = tum_synth.loop_trajectory(8, radius=0.25)[0]
  d_box, _ = synthetic.render_heightmap(cam, T, boxes=boxes)
  d_flat, _ = synthetic.render_heightmap(cam, T)
  frac_box = float(((np.abs(d_box - d_flat) > 0.01) & (d_box > 0)).mean())
  assert 0.01 < frac_box < 0.5, f"box coverage {frac_box}"
  steps = np.abs(np.diff(d_box, axis=0))
  assert (steps > 0.1).sum() > 50, "expected silhouette depth steps"


def test_slam_on_occlusion_world_rejects_outliers():
  """Full pipeline on the box world: the map must converge onto the true
  surfaces (boxes included), edge/shadow outliers must be filtered, and
  the delete pass must actually have fired.

  Trajectory: a gentle arc (~1 cm/frame — the benchmark protocol's frame
  spacing; a full orbit in 24 frames would be ~7 cm/frame, far beyond any
  real camera and enough to break tracking regardless of occluders)."""
  cam = synthetic.default_test_camera(W, H)
  boxes = synthetic.occlusion_boxes(5)
  traj = tum_synth.loop_trajectory(N_FRAMES, radius=0.25, loops=0.25)
  video = synthetic.make_heightmap_video(cam, traj, boxes=boxes)
  cfg = BadSlamConfig(
      keyframe_interval=4, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=2,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 14,
      enable_loop_detection=False, parallel_ba=False)
  slam = BadSlam(cfg, video)
  for i in range(N_FRAMES):
    slam.process_frame(i)
  assert slam.direct_ba.surfel_count > 300

  # The map lives in the SLAM gauge; align with the same rigid fit the ATE
  # protocol uses before measuring against the analytic surfaces
  # (benchmarks/long_sequence.py does the same — unaligned, the ~1 cm
  # common-mode trajectory drift of this short fast arc dominates).
  from badslam_tpu.loop.ransac import umeyama_alignment
  est = np.stack([video.frames[i].global_T_frame[:3, 3]
                  for i in range(N_FRAMES)])
  gt = np.stack([t[:3, 3] for t in traj])
  T = umeyama_alignment(est, gt)
  valid = np.asarray(slam.direct_ba.surfels.valid)
  pos = np.asarray(slam.direct_ba.surfels.pos)[valid] @ T[:3, :3].T + T[:3, 3]
  err = synthetic.surfel_map_error(pos, boxes=boxes)
  # Measured: median 0.48 mm / p95 1.6 mm / max 3.7 mm (boxes included in
  # the surface set). A floating edge-surfel population would blow p95.
  assert err["median_abs_m"] < 2e-3, err
  assert err["p95_abs_m"] < 8e-3, err
  assert err["max_abs_m"] < 0.02, err
  # The outlier-rejection machinery must actually have fired: the world's
  # depth discontinuities guarantee observation-starved edge surfels.
  assert slam.direct_ba.num_surfels_deleted > 100
