"""Convergence-analysis module test (convergence_analysis.cc equivalent)."""

import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry import se3
from badslam_tpu.utils import convergence, synthetic


def test_gather_and_analyze_pose_samples():
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.slam.direct_ba import DirectBA

  cam = synthetic.default_test_camera(160, 120)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1, min_observation_count=1,
      initial_keyframe_capacity=2, initial_surfel_capacity=1 << 13)
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  kf = synthetic.preprocess_like_test_keyframe(depth, cam, cell=2)
  ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb,
                  jnp.eye(4), 0)
  ba.create_surfels_for_keyframe(0, filter_new_surfels=False)

  T_init = se3.exp(jnp.asarray([0.004, -0.002, 0.001, 0.0005, 0, 0]))
  samples = convergence.gather_pose_samples(
      T_init, ba.surfels, kf.depth, kf.normals, kf.intensity, cam, cam,
      ba.depth_params(), num_iterations=30,
      use_descriptor_residuals=False)
  assert samples.cost.shape == (30,)
  # Cost must decrease overall; updates must shrink.
  assert samples.cost[-1] < 0.5 * samples.cost[0]
  assert samples.update_norm_sq[-1] < 1e-2 * samples.update_norm_sq[0]

  report = convergence.analyze_samples(samples)
  assert 0 <= report["converged_at_iteration"] < 30
  # The recommended threshold must be at or below the first update.
  assert (report["recommended_update_threshold_sq"]
          <= float(samples.update_norm_sq[0]))
