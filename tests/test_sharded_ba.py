"""Distributed BA tests on a virtual 8-device CPU mesh.

Verifies (a) the sharded iteration compiles and runs under a real Mesh with
the surfel axis partitioned, and (b) it produces the same result as the
single-device alternating step (psum'd H/b == full H/b).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.parallel import sharded_ba
from badslam_tpu.slam.direct_ba import DirectBA
from badslam_tpu.utils import synthetic

W, H = 160, 120


def build_map():
  cam = synthetic.default_test_camera(W, H)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=4,
      initial_surfel_capacity=1 << 13,
  )
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  inten = synthetic.intensity_function_image(cam)
  kf = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                               cell=2)
  T_gt = jnp.eye(4, dtype=jnp.float32)
  rng = np.random.default_rng(0)
  for i in range(3):
    noise = jnp.asarray(
        np.concatenate([rng.uniform(-2e-3, 2e-3, 3),
                        rng.uniform(-5e-4, 5e-4, 3)]), jnp.float32)
    Ti = T_gt if i == 0 else T_gt @ se3.exp(noise)
    ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb,
                    Ti, i * 10)
  ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
  # All keyframes active, all surfels active.
  ba.kf = ba.kf._replace(
      activation=jnp.where(ba.kf.valid, 2, 0).astype(jnp.int32))
  ba.surfels = ba.surfels._replace(active=ba.surfels.valid)
  return ba, cam


def test_sharded_ba_iteration_matches_single_device():
  assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
  ba, cam = build_map()
  mesh = Mesh(np.asarray(jax.devices()[:8]), (sharded_ba.SURFEL_AXIS,))

  step = sharded_ba.make_sharded_ba_iteration(
      mesh, cam, cam, cell_size=ba.cell_size,
      use_depth_residuals=True, use_descriptor_residuals=True)

  surfels_sharded = sharded_ba.shard_surfels(ba.surfels, mesh)
  s_out, kf_out, nconv = step(
      surfels_sharded, ba.kf, ba.a, ba.cfactor, ba.baseline_fx)
  jax.block_until_ready(s_out)

  # Single-device reference: same geometry step + batched pose step.
  from badslam_tpu.models import geometry_opt, pose_opt
  from badslam_tpu.models.association import DepthParamsArrays
  dp = DepthParamsArrays(a=ba.a, cfactor=ba.cfactor,
                         baseline_fx=ba.baseline_fx, cell_size=ba.cell_size)
  s_ref = geometry_opt.optimize_geometry_iteration(
      ba.surfels, ba.kf, cam, cam, dp, True, True)
  optimize = ba.kf.valid & (ba.kf.activation != 0)
  T_ref, moved = pose_opt.estimate_frame_poses_batched(
      ba.kf.global_T_frame, optimize, s_ref,
      ba.kf.depth, ba.kf.normals, ba.kf.intensity, cam, cam, dp, True, True)

  np.testing.assert_allclose(
      np.asarray(s_out.pos), np.asarray(s_ref.pos), atol=1e-5)
  np.testing.assert_allclose(
      np.asarray(kf_out.global_T_frame), np.asarray(T_ref), atol=1e-4)


def test_sharded_ba_improves_poses():
  ba, cam = build_map()
  mesh = Mesh(np.asarray(jax.devices()[:8]), (sharded_ba.SURFEL_AXIS,))
  step = sharded_ba.make_sharded_ba_iteration(
      mesh, cam, cam, cell_size=ba.cell_size)
  surfels = sharded_ba.shard_surfels(ba.surfels, mesh)
  kf = ba.kf
  T_gt = np.eye(4, dtype=np.float32)

  err0 = [np.abs(np.asarray(se3.log(
      se3.inverse(jnp.asarray(np.asarray(kf.global_T_frame)[i]))
      @ jnp.asarray(T_gt)))).max() for i in range(3)]
  for _ in range(3):
    surfels, kf, nconv = step(surfels, kf, ba.a, ba.cfactor, ba.baseline_fx)
  err1 = [np.abs(np.asarray(se3.log(
      se3.inverse(jnp.asarray(np.asarray(kf.global_T_frame)[i]))
      @ jnp.asarray(T_gt)))).max() for i in range(3)]
  # Relative spread between keyframes shrinks (gauge may drift commonly).
  assert np.ptp(err1) < np.ptp(err0) or max(err1) < 1e-4


def test_sharded_pcg_matches_single_device():
  """The distributed PCG step (psum'd pose blocks + dot products) must agree
  with the single-device solver."""
  ba, cam = build_map()
  mesh = Mesh(np.asarray(jax.devices()[:8]), (sharded_ba.SURFEL_AXIS,))
  step = sharded_ba.make_sharded_pcg_step(
      mesh, cam, cam, cell_size=ba.cell_size, max_inner_iterations=15)
  surfels = sharded_ba.shard_surfels(ba.surfels, mesh)
  s_out, kf_out, upd = step(surfels, ba.kf, ba.a, ba.cfactor, ba.baseline_fx,
                            jnp.asarray(0, jnp.int32))
  jax.block_until_ready(s_out)

  from badslam_tpu.models import pcg
  from badslam_tpu.models.association import DepthParamsArrays
  dp = DepthParamsArrays(a=ba.a, cfactor=ba.cfactor,
                         baseline_fx=ba.baseline_fx, cell_size=ba.cell_size)
  delta = pcg.pcg_solve(ba.surfels, ba.kf, cam, cam, dp,
                        jnp.asarray(0, jnp.int32), max_inner_iterations=15)
  s_ref, kf_ref = pcg.apply_pcg_delta(ba.surfels, ba.kf, delta)

  np.testing.assert_allclose(np.asarray(kf_out.global_T_frame),
                             np.asarray(kf_ref.global_T_frame), atol=2e-4)
  np.testing.assert_allclose(np.asarray(s_out.pos), np.asarray(s_ref.pos),
                             atol=2e-3)


def build_mesh_map(mesh, n_kf=4, surfel_capacity=1 << 12):
  """DirectBA in mesh mode (or single-device for mesh=None): keyframes with
  small pose noise, first-keyframe surfels, rest of the lifecycle exercised
  through bundle_adjustment itself."""
  cam = synthetic.default_test_camera(64, 48)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=n_kf,
      initial_surfel_capacity=surfel_capacity,
  )
  ba = DirectBA(cfg, cam, cam, mesh=mesh)
  depth, _ = synthetic.make_plane_scene(cam, seed=3, border=4)
  inten = synthetic.intensity_function_image(cam)
  kfim = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                                 cell=2)
  rng = np.random.default_rng(0)
  for i in range(n_kf):
    noise = jnp.asarray(
        np.concatenate([rng.uniform(-2e-3, 2e-3, 3),
                        rng.uniform(-5e-4, 5e-4, 3)]), jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32) if i == 0 else se3.exp(noise)
    ba.add_keyframe(kfim.depth, kfim.normals, kfim.radius_sq, kfim.intensity,
                    kfim.rgb, T, i * 10)
  ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
  return ba


def test_directba_mesh_mode_full_scheme_matches_single_device():
  """VERDICT round-1 item 2: the FULL alternation — surfel creation,
  activation, geometry, merge, pose, intrinsics, delete/compact end tasks —
  must run sharded over a mesh and agree with the single-device scheme."""
  mesh = Mesh(np.asarray(jax.devices()[:8]), (sharded_ba.SURFEL_AXIS,))
  ba_m = build_mesh_map(mesh)
  ba_s = build_mesh_map(None)
  for ba in (ba_m, ba_s):
    ba.bundle_adjustment(max_iterations=3, optimize_depth_intrinsics=True)
  assert ba_m.surfel_count == ba_s.surfel_count
  np.testing.assert_allclose(np.asarray(ba_m.kf.global_T_frame),
                             np.asarray(ba_s.kf.global_T_frame), atol=1e-4)
  np.testing.assert_allclose(np.asarray(ba_m.depth_intr),
                             np.asarray(ba_s.depth_intr), atol=1e-3)
  np.testing.assert_allclose(np.asarray(ba_m.surfels.pos),
                             np.asarray(ba_s.surfels.pos), atol=1e-3)


def test_directba_mesh_mode_capacity_growth():
  """Surfel-store growth under the mesh keeps the sharded layout and the map
  intact (keyframe add/evict story for the sharded store)."""
  mesh = Mesh(np.asarray(jax.devices()[:8]), (sharded_ba.SURFEL_AXIS,))
  ba = build_mesh_map(mesh, surfel_capacity=256)  # forces growth
  assert ba.surfels.capacity > 256
  assert ba.surfel_count > 0
  before = ba.surfel_count
  # Creation for a second keyframe grows further and appends at the watermark.
  ba.create_surfels_for_keyframe(1, filter_new_surfels=True)
  assert ba.surfel_count >= before
  # Deletion via end tasks still executes sharded.
  ba.perform_ba_scheme_end_tasks()
  assert bool(jnp.isfinite(ba.surfels.pos).any())


def test_sharded_ba_2d_mesh_matches_single_device():
  """(kf x surfels) 2-D mesh: keyframe stacks sharded over hosts-axis,
  surfels over chips-axis; must agree with the single-device result."""
  ba, cam = build_map()
  # 4 keyframes to divide evenly over a kf axis of 2.
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  inten = synthetic.intensity_function_image(cam)
  kfim = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                                 cell=2)
  noise = jnp.asarray([1e-3, -1e-3, 5e-4, 2e-4, -1e-4, 3e-4], jnp.float32)
  ba.add_keyframe(kfim.depth, kfim.normals, kfim.radius_sq, kfim.intensity,
                  kfim.rgb, se3.exp(noise), 30)
  ba.kf = ba.kf._replace(
      activation=jnp.where(ba.kf.valid, 2, 0).astype(jnp.int32))

  devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
  mesh = Mesh(devices, (sharded_ba.KF_AXIS, sharded_ba.SURFEL_AXIS))
  step = sharded_ba.make_sharded_ba_iteration_2d(
      mesh, cam, cam, cell_size=ba.cell_size, max_pose_iterations=10)

  surfels = sharded_ba.shard_surfels_2d(ba.surfels, mesh)
  kf = sharded_ba.shard_keyframes_2d(ba.kf, mesh)
  s_out, kf_out, nconv = step(surfels, kf, ba.a, ba.cfactor, ba.baseline_fx)
  jax.block_until_ready(s_out)

  from badslam_tpu.models import geometry_opt, pose_opt
  from badslam_tpu.models.association import DepthParamsArrays
  dp = DepthParamsArrays(a=ba.a, cfactor=ba.cfactor,
                         baseline_fx=ba.baseline_fx, cell_size=ba.cell_size)
  s_ref = geometry_opt.optimize_geometry_iteration(
      ba.surfels, ba.kf, cam, cam, dp, True, True)
  optimize = ba.kf.valid & (ba.kf.activation != 0)
  T_ref, _ = pose_opt.estimate_frame_poses_batched(
      ba.kf.global_T_frame, optimize, s_ref,
      ba.kf.depth, ba.kf.normals, ba.kf.intensity, cam, cam, dp, True, True,
      max_iterations=10)

  np.testing.assert_allclose(np.asarray(s_out.pos), np.asarray(s_ref.pos),
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(kf_out.global_T_frame),
                             np.asarray(T_ref), atol=2e-4)


def test_sharded_pcg_2d_mesh_matches_single_device():
  """PCG on the 2-D (kf x surfels) mesh: pose unknowns sharded along kf,
  surfel unknowns along surfels; the joint delta must match the
  single-device solve (global gauge index resolved across kf shards)."""
  ba, cam = build_map()
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  inten = synthetic.intensity_function_image(cam)
  kfim = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                                 cell=2)
  noise = jnp.asarray([1e-3, -1e-3, 5e-4, 2e-4, -1e-4, 3e-4], jnp.float32)
  ba.add_keyframe(kfim.depth, kfim.normals, kfim.radius_sq, kfim.intensity,
                  kfim.rgb, se3.exp(noise), 30)
  ba.kf = ba.kf._replace(
      activation=jnp.where(ba.kf.valid, 2, 0).astype(jnp.int32))
  ba.surfels = ba.surfels._replace(active=ba.surfels.valid)

  devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
  mesh = Mesh(devices, (sharded_ba.KF_AXIS, sharded_ba.SURFEL_AXIS))
  step = sharded_ba.make_sharded_pcg_step_2d(
      mesh, cam, cam, cell_size=ba.cell_size, max_inner_iterations=15)
  surfels = sharded_ba.shard_surfels_2d(ba.surfels, mesh)
  kf = sharded_ba.shard_keyframes_2d(ba.kf, mesh)
  # Gauge on keyframe 2 — lives on the SECOND kf shard, exercising the
  # global-index resolution.
  s_out, kf_out, upd = step(surfels, kf, ba.a, ba.cfactor, ba.baseline_fx,
                            jnp.asarray(2, jnp.int32))
  jax.block_until_ready(s_out)

  from badslam_tpu.models import pcg
  from badslam_tpu.models.association import DepthParamsArrays
  dp = DepthParamsArrays(a=ba.a, cfactor=ba.cfactor,
                         baseline_fx=ba.baseline_fx, cell_size=ba.cell_size)
  delta = pcg.pcg_solve(ba.surfels, ba.kf, cam, cam, dp,
                        jnp.asarray(2, jnp.int32), max_inner_iterations=15)
  s_ref, kf_ref = pcg.apply_pcg_delta(ba.surfels, ba.kf, delta)

  np.testing.assert_allclose(np.asarray(kf_out.global_T_frame),
                             np.asarray(kf_ref.global_T_frame), atol=2e-4)
  np.testing.assert_allclose(np.asarray(s_out.pos), np.asarray(s_ref.pos),
                             atol=2e-3)


def test_keyframe_growth_and_insertion_under_kf_sharding():
  """Keyframe add/evict story under kf-sharding (VERDICT round-1 weak 8):
  grow the kf-sharded store, insert a new keyframe into a fresh slot on the
  grown store, run a 2-D BA iteration over the result."""
  ba, cam = build_map()  # 3 valid keyframes, capacity 4
  devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
  mesh = Mesh(devices, (sharded_ba.KF_AXIS, sharded_ba.SURFEL_AXIS))
  kf = sharded_ba.shard_keyframes_2d(ba.kf, mesh)
  surfels = sharded_ba.shard_surfels_2d(ba.surfels, mesh)

  kf8 = sharded_ba.grow_keyframes_2d(kf, mesh, 8)
  assert kf8.capacity == 8
  assert int(np.asarray(kf8.valid).sum()) == int(np.asarray(ba.kf.valid).sum())
  np.testing.assert_array_equal(np.asarray(kf8.depth[:4]),
                                np.asarray(ba.kf.depth))

  # Insert a new keyframe into slot 5 (second kf shard).
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  inten = synthetic.intensity_function_image(cam)
  kfim = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                                 cell=2)
  add = sharded_ba.make_add_keyframe_2d(mesh)
  covis_row = jnp.zeros((8,), bool).at[0].set(True)
  noise = jnp.asarray([8e-4, -6e-4, 4e-4, 1e-4, -2e-4, 1e-4], jnp.float32)
  kf8 = add(kf8, jnp.asarray(5, jnp.int32), kfim.depth, kfim.normals,
            kfim.radius_sq, kfim.intensity, kfim.rgb, se3.exp(noise),
            jnp.asarray(50, jnp.int32), jnp.asarray(0.5, jnp.float32),
            jnp.asarray(5.0, jnp.float32), covis_row)
  valid = np.asarray(kf8.valid)
  assert valid[5] and int(valid.sum()) == 4
  assert int(kf8.count) == 6
  covis = np.asarray(kf8.covis)
  assert covis[5, 0] and covis[0, 5] and covis[5, 5]

  # The grown+inserted store must run a 2-D BA iteration.
  step = sharded_ba.make_sharded_ba_iteration_2d(
      mesh, cam, cam, cell_size=ba.cell_size, max_pose_iterations=3)
  s_out, kf_out, nconv = step(surfels, kf8, ba.a, ba.cfactor, ba.baseline_fx)
  jax.block_until_ready(s_out)
  assert np.isfinite(np.asarray(kf_out.global_T_frame)).all()


def test_pose_kf_chunk_matches_full_vmap():
  """kf_chunk bounds the pose phase's (K x surfel_capacity) temporaries for
  production scale (round 5: 256 KF x 2M surfels = ~80 GB unchunked, 5x a
  v5e's HBM); the chunked lax.map path must be numerically identical to the
  full vmap, including a chunk size that does not divide K (padding)."""
  from badslam_tpu.models import pose_opt
  from badslam_tpu.models.association import DepthParamsArrays

  ba, cam = build_map()
  dp = DepthParamsArrays(a=ba.a, cfactor=ba.cfactor,
                         baseline_fx=ba.baseline_fx, cell_size=ba.cell_size)
  optimize = ba.kf.valid & (ba.kf.activation != 0)
  args = (ba.kf.global_T_frame, optimize, ba.surfels,
          ba.kf.depth, ba.kf.normals, ba.kf.intensity, cam, cam, dp,
          True, True)
  T_full, moved_full = pose_opt.estimate_frame_poses_batched(
      *args, max_iterations=6)
  for chunk in (1, 2, 3):  # K=4 slots: 3 does not divide K -> padding path
    T_c, moved_c = pose_opt.estimate_frame_poses_batched(
        *args, max_iterations=6, kf_chunk=chunk)
    # f32 H/b accumulation order differs between the vmap and lax.map
    # lowerings, and GN amplifies it across iterations; observed max
    # divergence ~1e-4 on the pose entries after 6 iterations.
    np.testing.assert_allclose(np.asarray(T_c), np.asarray(T_full),
                               rtol=0, atol=5e-4, err_msg=f"chunk={chunk}")
    assert np.array_equal(np.asarray(moved_c), np.asarray(moved_full))
