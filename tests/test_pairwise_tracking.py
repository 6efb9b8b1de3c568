"""Pairwise frame tracking test on the heightmap world — the port of
test_pairwise_frame_tracking.cc:425-556: render the densely-textured
heightmap surface from two random poses, distort the relative pose, run the
coarse-to-fine tracker, and require the error to shrink well below the
distortion."""

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.geometry import se3
from badslam_tpu.models import odometry as om
from badslam_tpu.ops import depth_model
from badslam_tpu.ops.pyramid import build_pyramid
from badslam_tpu.utils import synthetic

W, H = 192, 192  # reference uses 256x256; slightly smaller for CPU time


def _pyramids(cam, T, num_scales, seed, cfactor):
  depth, inten = synthetic.render_heightmap(cam, np.asarray(T), seed=seed)
  kf = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                               cell=1)
  calib = depth_model.calibrate_depth_image(
      jnp.float32(0.0), cfactor, kf.depth, 1)
  return build_pyramid(calib, kf.normals, kf.intensity, num_scales)


@pytest.mark.parametrize("distortion", [0.05, 0.01])
def test_pairwise_tracking_recovers_distorted_pose(distortion):
  cam = synthetic.default_test_camera(W, H)
  cfactor = jnp.zeros((H, W), jnp.float32)
  rng = np.random.default_rng(3)
  baseline_fx = jnp.float32(40.0)

  errors = []
  for trial in range(3):
    # Two nearby random poses (the reference uses exp(0.1 * random)).
    T0 = np.asarray(se3.exp(jnp.asarray(
        0.05 * rng.standard_normal(6), jnp.float32)))
    T1 = np.asarray(se3.exp(jnp.asarray(
        0.05 * rng.standard_normal(6), jnp.float32)))
    base_pyr = _pyramids(cam, T0, 4, 5, cfactor)
    tracked_pyr = _pyramids(cam, T1, 4, 5, cfactor)

    base_T_tracked_gt = jnp.asarray(np.linalg.inv(T0) @ T1)
    init = base_T_tracked_gt @ se3.exp(jnp.asarray(
        distortion * rng.standard_normal(6), jnp.float32))

    est, n_resid = om.track_frame_pairwise(
        base_pyr, tracked_pyr, cam, baseline_fx, init, init,
        test_different_initial_estimates=False,
        use_pyramid_level_0=True)
    assert int(n_resid) > 1000  # healthy association count
    err = float(np.linalg.norm(np.asarray(
        se3.log(se3.inverse(est) @ base_T_tracked_gt))))
    errors.append(err)

  avg = float(np.mean(errors))
  # The tracker must reduce the distortion by at least ~10x and reach
  # sub-millimeter-scale error on this well-conditioned world.
  assert avg < max(0.1 * distortion, 2e-3), f"errors {errors}"


def test_pairwise_tracking_gradmag_variant():
  """GradMag residual variant (kernel_opt_pose.cu:714-938): tracking on
  Sobel gradient-magnitude images must also recover a distorted pose."""
  from badslam_tpu.ops.image_proc import sobel_gradient_magnitude

  cam = synthetic.default_test_camera(W, H)
  cfactor = jnp.zeros((H, W), jnp.float32)
  rng = np.random.default_rng(7)
  baseline_fx = jnp.float32(40.0)

  def gm_pyramids(T):
    depth, inten = synthetic.render_heightmap(cam, np.asarray(T), seed=5)
    kf = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                                 cell=1)
    calib = depth_model.calibrate_depth_image(
        jnp.float32(0.0), cfactor, kf.depth, 1)
    gm = sobel_gradient_magnitude(kf.intensity)
    return build_pyramid(calib, kf.normals, gm, 4)

  T0 = np.asarray(se3.exp(jnp.asarray(
      0.05 * rng.standard_normal(6), jnp.float32)))
  T1 = np.asarray(se3.exp(jnp.asarray(
      0.05 * rng.standard_normal(6), jnp.float32)))
  base_pyr = gm_pyramids(T0)
  tracked_pyr = gm_pyramids(T1)
  gt = jnp.asarray(np.linalg.inv(T0) @ T1)
  init = gt @ se3.exp(jnp.asarray(0.01 * rng.standard_normal(6), jnp.float32))
  est, n_resid = om.track_frame_pairwise(
      base_pyr, tracked_pyr, cam, baseline_fx, init, init,
      test_different_initial_estimates=False,
      use_pyramid_level_0=True, residual_type="gradmag")
  assert int(n_resid) > 1000
  err = float(np.linalg.norm(np.asarray(se3.log(se3.inverse(est) @ gt))))
  assert err < 2e-3, f"gradmag tracking error {err}"


def test_odometry_drift_on_heightmap_sequence():
  """System-level drift check: 20 frames of pure odometry (no BA) on the
  heightmap world must stay at mm-level error — the regression guard for the
  ill-conditioned solve / drift cascade fixed in pose_opt.solve_6x6."""
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.slam.system import BadSlam

  cam = synthetic.default_test_camera(160, 120)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0004 * i, 0.0004 * i, -0.0002 * i,
       0.0003 * i], jnp.float32))) for i in range(20)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      keyframe_interval=5, max_num_ba_iterations_per_keyframe=0,
      # 160x120 is 4x below the resolution the reference's threshold was
      # tuned for; tighten accordingly (see odometry_convergence_threshold).
      odometry_convergence_threshold=1e-11,
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1, min_observation_count=1,
      enable_loop_detection=False, parallel_ba=False,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 14)
  slam = BadSlam(cfg, video)
  slam.process_frame(0, force_keyframe=True)
  for i in range(1, 20):
    slam.process_frame(i)
  errs = [np.linalg.norm(video.frames[i].global_T_frame[:3, 3]
                         - traj[i][:3, 3]) for i in range(20)]
  # Tightened 2e-2 -> 3e-3 after the round-2 orthonormalization fix
  # (se3_np.orthonormalize): measured drift is ~0.08 mm/frame at 160x120.
  assert max(errs) < 3e-3, f"odometry drift {max(errs)*1000:.2f} mm"
