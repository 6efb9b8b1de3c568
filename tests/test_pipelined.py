"""Pipelined (transfer-free) front-end: slam/pipelined.py.

Two claims are tested:
  1. ACCURACY — the device-resident state machine (motion model, failure
     gates, trajectory recording, transfer-free BA) tracks the synthetic
     trajectory to the same mm-level bound as the host front-end.
  2. TRANSFER-FREEDOM — the per-frame loop performs no device->host
     readback. jax.transfer_guard can't see zero-copy CPU-backend reads, so
     the guard here patches the two funnels every materialization in this
     codebase goes through: ArrayImpl._value (int()/float()/device_get) and
     np.asarray of a jax.Array.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.slam.system import BadSlam
from badslam_tpu.utils import synthetic

W, H = 160, 120
N_FRAMES = 12


@contextlib.contextmanager
def forbid_device_to_host():
  """Raises on any device->host materialization of a jax array."""
  from jax._src import array as jarray
  cls = jarray.ArrayImpl
  orig_value = cls._value
  orig_asarray = np.asarray

  def guard_value(self):
    raise AssertionError(
        "device->host readback (ArrayImpl._value) inside the pipelined loop")

  def guard_asarray(a, *args, **kwargs):
    if isinstance(a, jax.Array):
      raise AssertionError(
          "np.asarray(device array) inside the pipelined loop")
    return orig_asarray(a, *args, **kwargs)

  cls._value = property(guard_value)
  np.asarray = guard_asarray
  try:
    yield
  finally:
    cls._value = orig_value
    np.asarray = orig_asarray


def _world():
  rng = np.random.default_rng(7)
  normals = []
  for _ in range(3):
    n = rng.uniform(-1, 1, 3).astype(np.float32)
    n[2] = -1.0
    normals.append(n / np.linalg.norm(n))
  return np.asarray(normals)


def _trajectory(n, step=0.004, rot_step=0.0012):
  traj = []
  for i in range(n):
    tangent = jnp.asarray(
        [step * i, 0.4 * step * i, -0.2 * step * i,
         rot_step * i, -0.5 * rot_step * i, 0.3 * rot_step * i], jnp.float32)
    traj.append(np.asarray(se3.exp(tangent)))
  return traj


def _config(**kw):
  base = dict(
      keyframe_interval=4, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 15,
      enable_loop_detection=False, parallel_ba=False)
  base.update(kw)
  return BadSlamConfig(**base)


def _translation_errors(video, traj_gt):
  errs = []
  for i in range(len(traj_gt)):
    T_est = video.frames[i].global_T_frame
    d = np.asarray(se3.log(
        se3.inverse(jnp.asarray(T_est)) @ jnp.asarray(traj_gt[i])))
    errs.append(np.linalg.norm(d[:3]))
  return np.asarray(errs)


def test_pipelined_concurrent_ba_transfer_free_and_accurate():
  """pipelined_concurrent_ba: BA iterations run on a dedicated host thread
  off the frame critical path. The readback guard patches the process-wide
  ArrayImpl._value, so it covers the BA thread too — the whole two-thread
  loop must stay transfer-free, and the trajectory must match the inline
  mode's accuracy."""
  cam = synthetic.default_test_camera(W, H)
  normals = _world()
  traj_gt = _trajectory(N_FRAMES)
  video = synthetic.make_synthetic_video(cam, traj_gt, normals)
  slam = BadSlam(_config(pipelined_frontend=True,
                         pipelined_concurrent_ba=True,
                         parallel_ba=True), video)
  slam.prewarm()
  try:
    with forbid_device_to_host():
      for i in range(N_FRAMES):
        slam.process_frame(i)
      slam._drain_pl_ba()  # surface any BA-thread guard trips
  finally:
    slam.stop_ba_thread_and_wait()
  slam.finalize_pipelined()
  errs_t = _translation_errors(video, traj_gt)
  assert errs_t.max() < 5e-3, f"translation errors {errs_t}"
  assert slam.direct_ba.keyframe_count == 3
  assert slam.direct_ba.surfel_count > 500


def test_pipelined_is_transfer_free_and_accurate():
  cam = synthetic.default_test_camera(W, H)
  normals = _world()
  traj_gt = _trajectory(N_FRAMES)
  video = synthetic.make_synthetic_video(cam, traj_gt, normals)
  slam = BadSlam(_config(pipelined_frontend=True), video)

  # Warm the jit caches OUTSIDE the guard (compilation may legitimately
  # inspect host values) through the production prewarm API — which must
  # not touch the live system's map.
  slam.prewarm()
  assert slam.direct_ba.keyframe_count == 0
  assert slam.direct_ba.surfel_count == 0
  assert slam.last_frame_index == -1

  with forbid_device_to_host():
    for i in range(N_FRAMES):
      slam.process_frame(i)

  # Finalization performs the run's only readbacks.
  slam.finalize_pipelined()
  errs_t = _translation_errors(video, traj_gt)
  assert errs_t.max() < 5e-3, f"translation errors {errs_t}"
  assert slam.direct_ba.keyframe_count == 3
  assert slam.direct_ba.surfel_count > 500


def test_pipelined_matches_host_frontend():
  """Pose-by-pose agreement with the host front-end on an identical run.
  The two paths share the tracking math but differ in where the motion
  model/gates run and in how interior frames anchor (base-keyframe compose
  vs. deformation), so the comparison is against GT bounds, not bitwise."""
  cam = synthetic.default_test_camera(W, H)
  normals = _world()
  traj_gt = _trajectory(N_FRAMES)

  video_h = synthetic.make_synthetic_video(cam, traj_gt, normals)
  slam_h = BadSlam(_config(), video_h)
  for i in range(N_FRAMES):
    slam_h.process_frame(i)

  video_p = synthetic.make_synthetic_video(cam, traj_gt, normals)
  slam_p = BadSlam(_config(pipelined_frontend=True), video_p)
  for i in range(N_FRAMES):
    slam_p.process_frame(i)
  slam_p.finalize_pipelined()

  errs_h = _translation_errors(video_h, traj_gt)
  errs_p = _translation_errors(video_p, traj_gt)
  assert errs_p.max() < max(2.0 * errs_h.max(), 2e-3), (errs_h, errs_p)
  # Same keyframe layout.
  assert slam_p.keyframe_frame_indices == slam_h.keyframe_frame_indices


def test_pipelined_with_loop_detection_host_images():
  """Loop detection in pipelined mode extracts features from HOST image
  copies; the detector database must still fill (one entry per keyframe)
  without breaking the frame loop."""
  cam = synthetic.default_test_camera(W, H)
  normals = _world()
  traj_gt = _trajectory(N_FRAMES)
  video = synthetic.make_synthetic_video(cam, traj_gt, normals)
  slam = BadSlam(
      _config(pipelined_frontend=True, enable_loop_detection=True,
              parallel_loop_detection=False), video)
  for i in range(N_FRAMES):
    slam.process_frame(i)
  slam.finalize_pipelined()
  entries = [e for e in slam.loop_detector.entries if e is not None]
  assert len(entries) == slam.direct_ba.keyframe_count
  errs_t = _translation_errors(video, traj_gt)
  assert errs_t.max() < 5e-3, f"translation errors {errs_t}"


def test_pipelined_pcg_transfer_free():
  """The joint PCG solver also runs transfer-free (gauge keyframe from the
  host valid mirror, no update-norm scalar read)."""
  cam = synthetic.default_test_camera(W, H)
  normals = _world()
  traj_gt = _trajectory(N_FRAMES)
  video = synthetic.make_synthetic_video(cam, traj_gt, normals)
  slam = BadSlam(_config(pipelined_frontend=True, use_pcg=True), video)

  warm_video = synthetic.make_synthetic_video(cam, traj_gt[:6], normals)
  warm = BadSlam(_config(pipelined_frontend=True, use_pcg=True), warm_video)
  for i in range(6):
    warm.process_frame(i)

  with forbid_device_to_host():
    for i in range(N_FRAMES):
      slam.process_frame(i)
  slam.finalize_pipelined()
  errs_t = _translation_errors(video, traj_gt)
  assert errs_t.max() < 5e-3, f"translation errors {errs_t}"


def test_pipelined_state_save_resume(tmp_path):
  """save_state during a pipelined run materializes the device trajectory
  first; a pipelined resume restarts constant-position from the restored
  base keyframe and keeps tracking."""
  from badslam_tpu.io import state as state_io
  cam = synthetic.default_test_camera(W, H)
  normals = _world()
  traj_gt = _trajectory(N_FRAMES)
  video = synthetic.make_synthetic_video(cam, traj_gt, normals)
  slam = BadSlam(_config(pipelined_frontend=True), video)
  for i in range(8):
    slam.process_frame(i)
  path = str(tmp_path / "state.npz")
  state_io.save_state(path, slam)
  # The snapshot's trajectory must be the materialized (current) one.
  errs = _translation_errors(video, traj_gt[:8])
  assert errs.max() < 5e-3

  video2 = synthetic.make_synthetic_video(cam, traj_gt, normals)
  slam2 = BadSlam(_config(pipelined_frontend=True), video2)
  state_io.load_state(path, slam2)
  for i in range(8, N_FRAMES):
    slam2.process_frame(i)
  slam2.finalize_pipelined()
  errs = _translation_errors(video2, traj_gt)
  assert errs.max() < 5e-3, f"translation errors {errs}"


def test_pipelined_device_closure_applied_on_drifted_map():
  """Device-side loop closure (loop/device_closure.py): the verification +
  pose-graph chain runs as one conditional device program with ZERO
  readbacks (guard-enforced); finalize resolves the outcome and the revisit
  keyframe snaps back."""
  from badslam_tpu.loop.detector import LoopDetector
  cam = synthetic.default_test_camera(W, H)
  normals = _world()
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.003 * i, 0.001 * i, 0, 0.0008 * i, 0, 0], jnp.float32)))
      for i in range(10)]
  traj.append(traj[0].copy())
  video = synthetic.make_synthetic_video(cam, traj, normals,
                                         texture_kind="checker")
  cfg = _config(pipelined_frontend=True, keyframe_interval=2,
                enable_loop_detection=True,
                initial_surfel_capacity=1 << 14)
  detector = LoopDetector(cfg, cam, recent_exclude=2)
  slam = BadSlam(cfg, video, loop_detector=detector)
  for i in range(10):
    slam.process_frame(i)
  assert slam.direct_ba.keyframe_count == 5

  # Inject drift into the recent keyframes' DEVICE poses (the matched
  # keyframe's neighborhood stays internally consistent, as real
  # accumulated drift is).
  drift = np.asarray([0.0, 0.0, 0.0, 0.06, 0.08], np.float32)
  poses = np.asarray(slam.direct_ba.kf.global_T_frame).copy()
  for s in range(5):
    poses[s][0, 3] += drift[s]
  slam.direct_ba.kf = slam.direct_ba.kf._replace(
      global_T_frame=jnp.asarray(poses))

  # The revisit frame — detection, verification, closure, BA — must perform
  # no device->host transfer.
  with forbid_device_to_host():
    slam.process_frame(10, force_keyframe=True)

  assert detector.events, "no loop closure event was generated"
  assert detector.events[-1].reason == "device-pending"
  slam.finalize_pipelined()
  event = detector.events[-1]
  assert event.applied, f"closure not applied: {event.reason}"
  assert event.matched_slot == 0
  assert detector.num_loops_closed == 1

  T10 = video.frames[10].global_T_frame
  err = np.linalg.norm(T10[:3, 3] - traj[10][:3, 3])
  assert err < 0.04, f"revisit pose error {err:.3f} m (drift was 0.08)"


def test_pipelined_mapping_only_uses_dataset_poses():
  """--no_pose_estimation in pipelined mode: keyframes must take the
  dataset's ground-truth poses (tracking never runs, so composing from the
  base keyframe would collapse everything onto the first pose)."""
  cam = synthetic.default_test_camera(W, H)
  normals = _world()
  traj_gt = _trajectory(8)
  video = synthetic.make_synthetic_video(cam, traj_gt, normals)
  for i, T in enumerate(traj_gt):
    video.frames[i].global_T_frame = np.asarray(T, np.float32)
  slam = BadSlam(_config(pipelined_frontend=True, estimate_poses=False,
                         keyframe_interval=2), video)
  for i in range(8):
    slam.process_frame(i)
  slam.finalize_pipelined()
  kf_poses = np.asarray(slam.direct_ba.kf.global_T_frame)
  for slot, fi in enumerate(slam.keyframe_frame_indices):
    np.testing.assert_allclose(kf_poses[slot], traj_gt[fi], atol=1e-4)


def test_transfer_guard_actually_fires():
  """The guard must catch both readback funnels, or the main test is vacuous."""
  x = jnp.ones((3, 3))
  with pytest.raises(AssertionError):
    with forbid_device_to_host():
      np.asarray(x)
  with pytest.raises(AssertionError):
    with forbid_device_to_host():
      int(jnp.sum(x))


def test_prewarm_covers_the_device_closure_program():
  """prewarm() in pipelined mode with loop detection enabled must also
  compile the device-closure program (otherwise it spikes at the first
  mid-run loop candidate) — and still leave the live map empty."""
  cam = synthetic.default_test_camera(W, H)
  traj_gt = _trajectory(6)
  video = synthetic.make_synthetic_video(cam, traj_gt, _world())
  slam = BadSlam(_config(pipelined_frontend=True,
                         enable_loop_detection=True), video)
  slam.prewarm(max_ba_keyframes=5)
  assert slam.direct_ba.keyframe_count == 0
  assert slam.last_frame_index == -1


def test_prewarm_eliminates_live_loop_compiles():
  """The property prewarm exists for: after prewarm over the run's keyframe
  progression — INCLUDING a keyframe-capacity growth (4 -> 8) — the live
  loop triggers zero XLA compilations."""
  import logging
  cam = synthetic.default_test_camera(W, H)
  normals = _world()
  n_frames = 20
  traj_gt = _trajectory(n_frames)
  video = synthetic.make_synthetic_video(cam, traj_gt, normals)
  # Keyframe capacity grows mid-run (4 -> 8); the surfel store is pre-sized
  # AND capped, as pipelined production runs do (the transfer-free watermark
  # bound over-grows otherwise — prewarm documents that surfel-capacity
  # growth is not simulated).
  cfg = _config(pipelined_frontend=True, keyframe_interval=3,
                initial_keyframe_capacity=4,
                initial_surfel_capacity=1 << 15,
                max_surfel_count=1 << 15)
  slam = BadSlam(cfg, video)

  records = []
  handler = logging.Handler()
  handler.emit = lambda r: records.append(r.getMessage())
  jlog = logging.getLogger("jax._src.interpreters.pxla")
  old_level = jlog.level
  jax.config.update("jax_log_compiles", True)
  jlog.addHandler(handler)
  jlog.setLevel(logging.DEBUG)
  try:
    slam.prewarm(max_ba_keyframes=7)  # keyframes at 0,3,...,18
    prewarm_compiles = [m for m in records if m.startswith("Compiling ")]
    records.clear()
    for i in range(n_frames):
      slam.process_frame(i)
    live_compiles = [m for m in records if m.startswith("Compiling ")]
  finally:
    jax.config.update("jax_log_compiles", False)
    jlog.removeHandler(handler)
    jlog.setLevel(old_level)
  if not prewarm_compiles:
    pytest.skip("compile logging not captured on this jax version")
  assert not live_compiles, f"live-loop compiles: {live_compiles}"
  slam.finalize_pipelined()
  assert slam.direct_ba.keyframe_count == 7
