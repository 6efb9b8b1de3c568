"""Adversarial concurrency tests (VERDICT round-1 item 8).

Parallel BA thread + parallel loop-detection thread + forced memory-pressure
keyframe merges all running simultaneously over a real tracked sequence, with
invariants checked at the end:

  * no orphaned loop-detector entries (every live entry's kf_slot is valid);
  * keyframe store bookkeeping consistent (valid count == watermark - merges);
  * all poses finite; queued keyframes drained; clean shutdown (no deadlock —
    the test finishing at all proves the join paths).

The reference flags exactly this area as "potentially unstable"
(README:271-275); these tests are the proof obligation that the map state
has a single writer (BA thread) and the watchdog's merge is routed there
(system.request_keyframe_merge).
"""

import jax.numpy as jnp
import numpy as np

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.loop.detector import LoopDetector
from badslam_tpu.slam.system import BadSlam
from badslam_tpu.utils import synthetic

W, H = 160, 120


def _make_slam(n_frames, keyframe_interval=2, loop_detection=True,
               ba_iterations_per_keyframe=5):
  cam = synthetic.default_test_camera(W, H)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0004 * i, 0.0004 * i, -0.0002 * i,
       0.0003 * i], jnp.float32))) for i in range(n_frames)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      keyframe_interval=keyframe_interval,
      max_num_ba_iterations_per_keyframe=ba_iterations_per_keyframe,
      odometry_convergence_threshold=1e-11,
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1, min_observation_count=1,
      parallel_ba=True, enable_loop_detection=loop_detection,
      parallel_loop_detection=loop_detection,
      initial_keyframe_capacity=4, initial_surfel_capacity=1 << 14)
  det = (LoopDetector(cfg, cam, parallel=True, recent_exclude=4,
                      vocab_train_size=8)
         if loop_detection else None)
  return BadSlam(cfg, video, loop_detector=det), traj, video


def _check_invariants(slam, merges_forced):
  ba = slam.direct_ba
  valid = np.asarray(ba.kf.valid)
  watermark = ba.keyframe_count
  assert valid[watermark:].sum() == 0
  # Every forced merge must be reflected: valid slots == watermark - deletions
  # (a lost concurrent update would resurrect a deleted keyframe).
  assert valid[:watermark].sum() == watermark - merges_forced, (
      f"watermark {watermark}, valid {int(valid[:watermark].sum())}, "
      f"merges {merges_forced}")
  poses = np.asarray(ba.kf.global_T_frame)[valid]
  assert np.isfinite(poses).all()
  assert len(slam._queued_keyframes) == 0
  assert slam._ba_thread is None or not slam._ba_thread.is_alive()
  det = slam.loop_detector
  if det is not None:
    for e in det.entries:
      assert e is None or (0 <= e.kf_slot < len(valid) and valid[e.kf_slot]), \
          f"orphaned detector entry for slot {e.kf_slot}"
    assert det.num_loops_closed + det.num_loops_ignored == len(det.events)


def test_parallel_ba_detection_and_merges_under_load():
  slam, traj, video = _make_slam(30)
  merges = 0
  for i in range(30):
    slam.process_frame(i)
    # Force a memory-pressure merge mid-flight every 8 frames, through the
    # same request path the HBM watchdog uses.
    if i % 8 == 7 and slam.direct_ba.keyframe_count >= 6:
      before = int(np.asarray(slam.direct_ba.kf.valid).sum())
      slam.request_keyframe_merge()
  slam.stop_ba_thread_and_wait()
  # Count how many merges actually landed (requests may coalesce: the flag
  # is level-triggered, one merge per BA wakeup).
  valid = int(np.asarray(slam.direct_ba.kf.valid).sum())
  merges = slam.direct_ba.keyframe_count - valid
  assert merges >= 1, "no forced merge landed"
  _check_invariants(slam, merges)
  # Tracking stayed sane through concurrent merges.
  errs = [np.linalg.norm(video.frames[i].global_T_frame[:3, 3]
                         - traj[i][:3, 3]) for i in range(30)]
  assert max(errs) < 2e-2, f"drift {max(errs) * 1000:.1f} mm"


def test_merge_serviced_with_empty_iteration_queue():
  """With max_num_ba_iterations_per_keyframe=0 no BA iterations are ever
  queued, yet a memory-pressure merge request must still wake the BA thread
  and be serviced (the reference's watchdog is independent of BA planning,
  bad_slam.cc:958-968)."""
  import time
  slam, traj, video = _make_slam(14, loop_detection=False,
                                 ba_iterations_per_keyframe=0)
  for i in range(14):
    slam.process_frame(i)
  # With zero planned iterations the BA thread never wakes to drain the
  # keyframe queue (reference semantics: draining happens inside
  # BAThreadMain's iteration wakeups, bad_slam.cc:1204-1257); register the
  # queued keyframes without stopping the thread.
  slam.quiesce()
  assert slam.direct_ba.keyframe_count >= 6
  before = int(np.asarray(slam.direct_ba.kf.valid).sum())
  slam.request_keyframe_merge()
  deadline = time.monotonic() + 30.0
  while time.monotonic() < deadline:
    if int(np.asarray(slam.direct_ba.kf.valid).sum()) < before:
      break
    time.sleep(0.02)
  after = int(np.asarray(slam.direct_ba.kf.valid).sum())
  assert after < before, "merge request never serviced without BA iterations"
  slam.stop_ba_thread_and_wait()
  _check_invariants(slam, before - after)


def test_parallel_shutdown_with_pending_work():
  """Stop the BA thread while keyframes and iterations are still queued:
  everything must drain, nothing deadlocks."""
  slam, traj, video = _make_slam(12, loop_detection=False)
  for i in range(12):
    slam.process_frame(i)
  slam.stop_ba_thread_and_wait()
  _check_invariants(slam, 0)
  # Restart semantics (RestartBAThread): a second stop is a no-op.
  slam.stop_ba_thread_and_wait()


def test_repair_debt_bypasses_backlog_cap():
  """Loop-closure repair iterations may never be dropped by the
  concurrent-BA backlog cap (round 5: with a warm cache the frame loop
  outruns BA dispatch, the queue sits at its cap, and a droppable repair
  burst was discarded almost entirely — measured as 21->31% run-to-run
  kidnap ATE variance). Exercises _enqueue_pl_ba's cap/debt semantics in
  isolation."""
  import threading

  from badslam_tpu.config import BadSlamConfig as _Cfg
  from badslam_tpu.slam.system import BadSlam as _B

  stub = _B.__new__(_B)
  stub.config = _Cfg(max_num_ba_iterations_per_keyframe=2)
  stub._ba_condition = threading.Condition()
  stub._pl_ba_queue = []
  stub._pl_ba_repair_debt = 0
  cap = 3 * stub.config.max_num_ba_iterations_per_keyframe

  # Ordinary iterations respect the cap.
  results = [_B._enqueue_pl_ba(stub, {"i": i}) for i in range(cap + 4)]
  assert results == [True] * cap + [False] * 4
  assert len(stub._pl_ba_queue) == cap

  # Repair debt bypasses the cap, exactly debt times.
  stub._pl_ba_repair_debt = 3
  results = [_B._enqueue_pl_ba(stub, {"r": i}) for i in range(5)]
  assert results == [True, True, True, False, False]
  assert len(stub._pl_ba_queue) == cap + 3
  assert stub._pl_ba_repair_debt == 0
