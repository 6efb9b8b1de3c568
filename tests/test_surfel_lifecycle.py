"""Surfel creation / merge / delete / activation tests.

Mirrors the reference's synthetic-plane-scene pattern (SURVEY.md §4): build an
exact synthetic world, run the real ops, assert geometric invariants.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.models.association import DepthParamsArrays
from badslam_tpu.slam.direct_ba import DirectBA
from badslam_tpu.utils import synthetic

W, H = 160, 120
CELL = 2


def make_ba(cell=CELL, min_obs=1, surfel_capacity=1 << 15):
  cam = synthetic.default_test_camera(W, H)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=cell,
      min_observation_count_while_bootstrapping_1=min_obs,
      min_observation_count_while_bootstrapping_2=min_obs,
      min_observation_count=min_obs,
      initial_keyframe_capacity=4,
      initial_surfel_capacity=surfel_capacity,
  )
  return DirectBA(cfg, cam, cam), cam


def add_plane_keyframe(ba, cam, T=None, seed=0, intensity=None):
  depth, plane_normals = synthetic.make_plane_scene(cam, seed=seed)
  kf = synthetic.preprocess_like_test_keyframe(
      depth, cam, intensity=intensity, cell=ba.cell_size)
  if T is None:
    T = jnp.eye(4, dtype=jnp.float32)
  idx = ba.add_keyframe(
      kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb, T,
      frame_index=idx_from(ba))
  return idx, kf, plane_normals


def idx_from(ba):
  return ba.keyframe_count * 10


def test_create_surfels_on_planes():
  ba, cam = make_ba()
  idx, kf, plane_normals = add_plane_keyframe(ba, cam)
  ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)

  count = ba.surfel_count
  assert count > 100

  valid = np.asarray(ba.surfels.valid)
  pos = np.asarray(ba.surfels.pos)[valid]
  # Every surfel must lie on one of the three planes: n . p + 2.5 ~ 0
  # (within the u16 depth quantization of ~1 mm).
  dists = np.abs(pos @ plane_normals.T + 2.5)
  min_dist = dists.min(axis=1)
  assert np.quantile(min_dist, 0.95) < 5e-3
  # Normals roughly match a plane normal.
  nrm = np.asarray(ba.surfels.normal)[valid]
  dots = np.abs(nrm @ plane_normals.T).max(axis=1)
  assert np.quantile(dots, 0.9) > 0.95


def test_create_surfels_sparsification():
  """At most one surfel per sparsification cell on the first pass."""
  ba, cam = make_ba(cell=4)
  idx, kf, _ = add_plane_keyframe(ba, cam)
  ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)
  assert ba.surfel_count <= (H // 4 + 1) * (W // 4 + 1)
  # Second creation from the same keyframe: all cells supported, no new surfels.
  before = ba.surfel_count
  ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)
  assert ba.surfel_count == before


def test_observation_filtering_drops_unobserved():
  """filter_new_surfels=True with min_obs=2 and no covisible keyframe drops
  every candidate (obs stays at the initial 1)."""
  ba, cam = make_ba(min_obs=2)
  ba.config.min_observation_count_while_bootstrapping_1 = 2
  idx, kf, _ = add_plane_keyframe(ba, cam)
  ba.create_surfels_for_keyframe(idx, filter_new_surfels=True)
  assert ba.surfel_count == 0


def test_observation_filtering_keeps_covisible():
  """Two identical keyframes: candidates of the 2nd see the 1st -> obs = 2."""
  ba, cam = make_ba(min_obs=2)
  idx0, kf, _ = add_plane_keyframe(ba, cam)
  idx1, _, _ = add_plane_keyframe(ba, cam)
  assert bool(np.asarray(ba.kf.covis)[idx1, idx0])
  ba.create_surfels_for_keyframe(idx1, filter_new_surfels=True)
  assert ba.surfel_count > 100


def test_merge_removes_duplicates():
  ba, cam = make_ba()
  idx, kf, _ = add_plane_keyframe(ba, cam)
  ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)
  count1 = ba.surfel_count
  # Force duplicate surfels by creating from a second identical keyframe with
  # a slightly shifted pose so cells re-trigger (no support where depth
  # disagrees by > the association band is not the case here — identical
  # geometry means full support, so create unfiltered from scratch instead).
  from badslam_tpu.models import surfels as surfels_mod
  s = ba.surfels
  # Duplicate every surfel with a tiny offset (within merge distance).
  ba.surfels = surfels_mod.append(
      s, s.pos + 1e-4, s.normal, s.radius_sq, s.color, s.desc, s.valid)
  assert ba.surfel_count == 2 * count1

  from badslam_tpu.slam.direct_ba import _merge_surfels_jit
  ba.surfels = _merge_surfels_jit(
      ba.surfels, ba.kf, jnp.asarray(idx, jnp.int32),
      ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
      W, H, ba.cell_size, jnp.asarray(0.8, jnp.float32))
  # Merge should remove (nearly) all duplicates.
  assert ba.surfel_count <= count1 * 1.1


def test_delete_unobserved_surfels():
  ba, cam = make_ba(min_obs=1)
  idx, kf, _ = add_plane_keyframe(ba, cam)
  ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)
  count = ba.surfel_count
  assert count > 0

  # Add far-away garbage surfels that no keyframe observes.
  from badslam_tpu.models import surfels as surfels_mod
  n_garbage = 64
  gpos = jnp.tile(jnp.asarray([[100.0, 100.0, 100.0]]), (n_garbage, 1))
  gnrm = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n_garbage, 1))
  ba.surfels = surfels_mod.append(
      ba.surfels, gpos, gnrm, jnp.full((n_garbage,), 1e-4),
      jnp.zeros((n_garbage, 3)), jnp.zeros((n_garbage, 2)),
      jnp.ones((n_garbage,), bool))
  assert ba.surfel_count == count + n_garbage

  ba.perform_ba_scheme_end_tasks(do_surfel_updates=False)
  assert ba.surfel_count == count  # garbage gone, observed surfels kept


def test_surfel_activation_follows_keyframe_activation():
  ba, cam = make_ba()
  idx, kf, _ = add_plane_keyframe(ba, cam)
  ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)

  from badslam_tpu.models.keyframes import ACTIVE, INACTIVE
  from badslam_tpu.slam.direct_ba import _surfel_activation_jit

  # Keyframe inactive -> no surfel active.
  act = np.full(ba.kf.capacity, INACTIVE, np.int32)
  ba.set_activation(act)
  ba.surfels = ba.surfels._replace(active=jnp.zeros_like(ba.surfels.active))
  ba.surfels = _surfel_activation_jit(
      ba.surfels, ba.kf, ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
      jnp.zeros_like(ba.surfels.active), W, H, ba.cell_size)
  assert int(np.asarray(ba.surfels.active).sum()) == 0

  # Keyframe active -> (almost) all surfels observed by it become active.
  act[idx] = ACTIVE
  ba.set_activation(act)
  ba.surfels = _surfel_activation_jit(
      ba.surfels, ba.kf, ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
      jnp.zeros_like(ba.surfels.active), W, H, ba.cell_size)
  active_frac = (np.asarray(ba.surfels.active).sum() /
                 max(1, ba.surfel_count))
  assert active_frac > 0.9


def test_covisibility_and_activation_propagation():
  ba, cam = make_ba()
  idx0, _, _ = add_plane_keyframe(ba, cam)
  # A far-away keyframe: no frustum intersection.
  T_far = se3.make(jnp.eye(3), jnp.asarray([100.0, 0.0, 0.0]))
  depth, _ = synthetic.make_plane_scene(cam, seed=1)
  kf2 = synthetic.preprocess_like_test_keyframe(depth, cam, cell=ba.cell_size)
  idx_far = ba.add_keyframe(
      kf2.depth, kf2.normals, kf2.radius_sq, kf2.intensity, kf2.rgb, T_far, 10)
  covis = np.asarray(ba.kf.covis)
  assert not covis[idx0, idx_far]

  # A nearby keyframe: intersects keyframe 0.
  T_near = se3.make(jnp.eye(3), jnp.asarray([0.05, 0.0, 0.0]))
  idx_near = ba.add_keyframe(
      kf2.depth, kf2.normals, kf2.radius_sq, kf2.intensity, kf2.rgb, T_near, 20)
  covis = np.asarray(ba.kf.covis)
  assert covis[idx0, idx_near] and covis[idx_near, idx0]


def test_append_after_delete_does_not_overwrite_live_surfels():
  """Regression: deletion/merge clear validity WITHOUT lowering the
  allocation watermark — a later append must land in fresh slots, never on
  top of surviving surfels (found by review: count was reset to the live
  total, so creation overwrote live slots)."""
  from badslam_tpu.models import surfels as surfels_mod

  s = surfels_mod.create(64)
  rng = np.random.default_rng(0)
  pos = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
  nrm = jnp.asarray(np.tile([[0, 0, -1.0]], (32, 1)), jnp.float32)
  s = surfels_mod.append(s, pos, nrm, jnp.ones(32), jnp.zeros((32, 3)),
                         jnp.zeros((32, 2)), jnp.ones(32, dtype=bool))
  assert int(s.count) == 32

  # Invalidate every even slot (simulating merge/delete).
  kill = (jnp.arange(64) % 2 == 0) & s.valid
  s = s._replace(valid=s.valid & ~kill, active=s.active & ~kill)
  survivors = np.asarray(s.pos)[np.asarray(s.valid)].copy()
  assert int(s.count) == 32  # watermark unchanged

  # Append 8 more: must go to slots 32..39, not on top of survivors.
  pos2 = jnp.asarray(100.0 + rng.normal(size=(8, 3)), jnp.float32)
  s = surfels_mod.append(s, pos2, nrm[:8], jnp.ones(8), jnp.zeros((8, 3)),
                         jnp.zeros((8, 2)), jnp.ones(8, dtype=bool))
  assert int(s.count) == 40
  out_pos = np.asarray(s.pos)
  out_valid = np.asarray(s.valid)
  # All survivors still present, bit-identical.
  still = out_pos[out_valid & (np.abs(out_pos) < 50).all(axis=1)]
  assert len(still) == len(survivors)
  np.testing.assert_array_equal(np.sort(still, axis=0),
                                np.sort(survivors, axis=0))

  # Compaction re-packs and resets the watermark to the live count.
  s = surfels_mod.compact(s)
  assert int(s.count) == int(np.asarray(s.valid).sum()) == 24


def test_assign_colors_averages_observations():
  """AssignColors (kernel_assign_colors.cu): surfel colors become the mean
  of their observed keyframe colors."""
  ba, cam = make_ba()
  inten = synthetic.intensity_function_image(cam)
  idx, kf, _ = add_plane_keyframe(ba, cam, intensity=inten)
  ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)
  # Zero out the stored colors, then re-assign from observations.
  ba.surfels = ba.surfels._replace(color=jnp.zeros_like(ba.surfels.color))
  ba.assign_colors()
  valid = np.asarray(ba.surfels.valid)
  col = np.asarray(ba.surfels.color)[valid]
  assert (col > 0.05).any(), "colors were not refreshed"
  # Gray input: channels equal.
  np.testing.assert_allclose(col[:, 0], col[:, 1], atol=1e-5)


def test_debug_verify_counts():
  """DebugVerifySurfelCount analog (kernel_verify_count.cc:39-60): device
  recount matches the host mirrors through create/merge/delete, and a
  corrupted mirror is caught."""
  import pytest
  import jax.numpy as jnp
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.slam.direct_ba import DirectBA
  from badslam_tpu.utils import logging as log
  from badslam_tpu.utils import synthetic
  cam = synthetic.default_test_camera(64, 48)
  cfg = BadSlamConfig(sparse_surfel_cell_size=2,
                      min_observation_count_while_bootstrapping_1=1,
                      min_observation_count_while_bootstrapping_2=1,
                      min_observation_count=1,
                      initial_keyframe_capacity=2,
                      initial_surfel_capacity=1 << 10)
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=3, border=4)
  kf = synthetic.preprocess_like_test_keyframe(depth, cam, cell=2)
  T = jnp.eye(4, dtype=jnp.float32)
  ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb,
                  T, 0)
  ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
  ba.debug_verify_counts()
  ba.bundle_adjustment(max_iterations=2)
  ba.debug_verify_counts()
  # A corrupted keyframe-count mirror must be caught.
  ba._kf_count_host += 1
  with pytest.raises(log.CheckFailedError):
    ba.debug_verify_counts()
  ba._kf_count_host -= 1


def test_debug_locking_assertion():
  """DEBUG_LOCKING analog: _drain_keyframe_queue_locked CHECKs the BA lock
  when the mode is on."""
  import pytest
  import badslam_tpu.slam.system as system_mod
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.utils import logging as log
  from badslam_tpu.utils import synthetic
  cam = synthetic.default_test_camera(64, 48)
  video = synthetic.make_synthetic_video(
      cam, [__import__("numpy").eye(4, dtype="float32")],
      __import__("numpy").asarray([[0.0, 0.0, -1.0]], dtype="float32"))
  cfg = BadSlamConfig(parallel_ba=False)
  slam = system_mod.BadSlam(cfg, video)
  old = system_mod.DEBUG_LOCKING
  system_mod.DEBUG_LOCKING = True
  try:
    with pytest.raises(log.CheckFailedError):
      slam._drain_keyframe_queue_locked()  # lock NOT held
    with slam._ba_lock:
      slam._drain_keyframe_queue_locked()  # held: no-op on empty queue
  finally:
    system_mod.DEBUG_LOCKING = old
