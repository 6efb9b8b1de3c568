"""Active-keyframe-window parity: the bucketed window gather must produce
exactly the same BA results as the dense full-store path.

The window (slam/direct_ba.py _gather_kf_window_jit) is the TPU-native
realization of the reference's activation windowing
(direct_ba_alternating.cc:543-577): geometry accumulation, surfel activation
and pose optimization see only the active + covisible-active keyframes.
Inactive keyframes contribute exactly zero in the dense path, so gathering
must be bit-compatible up to float summation of zeros.
"""

import jax.numpy as jnp
import numpy as np

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.models import keyframes as kf_mod
from badslam_tpu.slam.direct_ba import DirectBA
from badslam_tpu.utils import synthetic

W, H = 160, 120


def _build(use_window: bool):
  cam = synthetic.default_test_camera(W, H)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=16,
      initial_surfel_capacity=1 << 14,
      use_active_kf_window=use_window,
  )
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  inten = synthetic.intensity_function_image(cam)
  kf = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                               cell=2)
  rng = np.random.default_rng(1)
  for i in range(8):
    noise = jnp.asarray(
        np.concatenate([rng.uniform(-3e-3, 3e-3, 3),
                        rng.uniform(-8e-4, 8e-4, 3)]), jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32) if i == 0 else se3.exp(noise)
    ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb,
                    T, i * 10)
  ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
  # 2 active + 1 covisible-active + 5 inactive: participating set of 3
  # buckets to a window of 4 <= capacity // 2 = 8 -> the gather engages.
  act = np.zeros(16, np.int32)
  act[2] = act[5] = kf_mod.ACTIVE
  act[6] = kf_mod.COVISIBLE_ACTIVE
  ba.set_activation(act)
  return ba


def test_active_window_matches_full_store():
  ba_full = _build(use_window=False)
  ba_win = _build(use_window=True)

  r_full = ba_full.bundle_adjustment(do_surfel_updates=False,
                                     max_iterations=2)
  r_win = ba_win.bundle_adjustment(do_surfel_updates=False, max_iterations=2)

  assert r_full == r_win  # (iterations_done, converged)
  # Tolerances: XLA reassociates reductions differently per scan length, so
  # bitwise equality is not guaranteed — observed deviation is ~1e-7.
  np.testing.assert_allclose(
      np.asarray(ba_win.kf.global_T_frame),
      np.asarray(ba_full.kf.global_T_frame), rtol=0, atol=1e-5)
  assert (np.asarray(ba_win.kf.activation)
          == np.asarray(ba_full.kf.activation)).all()
  assert (np.asarray(ba_win.surfels.active)
          == np.asarray(ba_full.surfels.active)).all()
  np.testing.assert_allclose(
      np.asarray(ba_win.surfels.pos), np.asarray(ba_full.surfels.pos),
      rtol=0, atol=1e-5)
  np.testing.assert_allclose(
      np.asarray(ba_win.surfels.desc), np.asarray(ba_full.surfels.desc),
      rtol=0, atol=1e-4)

  # Slots beyond the watermark are untouched by the scatter (padded window
  # entries carry idx == capacity and must be dropped).
  for i in range(8, 16):
    np.testing.assert_array_equal(
        np.asarray(ba_win.kf.global_T_frame[i]), np.eye(4))
    assert int(ba_win.kf.activation[i]) == 0


def test_fixed_window_final_ba_uses_gather():
  """Windowed final BA (main.cc:726-750 protocol): an explicit
  active_keyframe_window with few keyframes buckets small enough for the
  gather to engage; results must match the dense path."""
  results = []
  for use_window in (False, True):
    ba = _build(use_window=use_window)
    r = ba.bundle_adjustment(do_surfel_updates=False, optimize_poses=True,
                             optimize_geometry=True, max_iterations=2,
                             active_keyframe_window_start=1,
                             active_keyframe_window_end=3)
    results.append((r, np.asarray(ba.kf.global_T_frame),
                    np.asarray(ba.kf.activation)))
  (r_f, poses_f, act_f), (r_w, poses_w, act_w) = results
  assert r_f == r_w
  np.testing.assert_allclose(poses_w, poses_f, rtol=0, atol=1e-5)
  assert (act_w == act_f).all()


def test_window_disabled_when_set_spans_store():
  """All keyframes active: the bucketed window cannot shrink below
  capacity // 2, so the dense path runs (and still converges)."""
  ba = _build(use_window=True)
  act = np.zeros(16, np.int32)
  act[:8] = kf_mod.ACTIVE  # window would be 8 > capacity // 2 = 8? 8 <= 8
  act[8:] = 0
  ba.set_activation(act)
  iters, converged = ba.bundle_adjustment(do_surfel_updates=False,
                                          max_iterations=4)
  assert iters >= 1
  assert np.isfinite(np.asarray(ba.kf.global_T_frame)).all()
