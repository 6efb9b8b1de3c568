"""Loop-closure stack tests: RANSAC alignment, pose-graph GN, trajectory
deformation, place recognition, and an applied closure on an artificially
drifted map (mirrors test_pose_graph_optimizer.cc plus the loop_detector.cc
verification pipeline)."""

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.geometry import se3
from badslam_tpu.loop import ransac as ransac_mod
from badslam_tpu.loop.pose_graph import PoseGraphOptimizer
from badslam_tpu.loop.trajectory_deformation import (
    extrapolate_and_interpolate_keyframe_pose_changes,
    remember_keyframe_poses,
)


def random_pose(rng, t_scale=1.0, r_scale=0.5):
  tangent = np.concatenate([rng.uniform(-t_scale, t_scale, 3),
                            rng.uniform(-r_scale, r_scale, 3)])
  return np.asarray(se3.exp(jnp.asarray(tangent, jnp.float32)))


def test_ransac_recovers_rigid_transform():
  rng = np.random.default_rng(0)
  T_gt = random_pose(rng)
  src = rng.uniform(-2, 2, (80, 3)).astype(np.float32)
  dst = src @ T_gt[:3, :3].T + T_gt[:3, 3]
  # 30% outliers
  n_out = 24
  dst[:n_out] += rng.uniform(0.5, 2.0, (n_out, 3))
  T, inliers = ransac_mod.ransac_3d3d(src, dst, rng=rng)
  assert T is not None
  assert inliers.sum() >= 80 - n_out
  err = np.abs(T - T_gt).max()
  assert err < 1e-3


def test_ransac_rejects_garbage():
  rng = np.random.default_rng(1)
  src = rng.uniform(-2, 2, (40, 3)).astype(np.float32)
  dst = rng.uniform(-2, 2, (40, 3)).astype(np.float32)
  T, inliers = ransac_mod.ransac_3d3d(src, dst, rng=rng)
  assert T is None


def test_pose_graph_corrects_drift():
  """Odometry chain with accumulated drift + one loop edge back to the start:
  optimization distributes the error (test_pose_graph_optimizer.cc idea)."""
  k = 10
  rng = np.random.default_rng(2)
  # Ground truth: a loop returning to the origin region.
  gt = [np.asarray(se3.exp(jnp.asarray(
      [0.1 * i, 0.05 * np.sin(0.6 * i), 0.0, 0.0, 0.0, 0.12 * i],
      jnp.float32))) for i in range(k)]
  # Drifted estimates: accumulate noisy odometry.
  drifted = [gt[0]]
  for i in range(1, k):
    z = np.asarray(se3.inverse(jnp.asarray(gt[i - 1])) @ jnp.asarray(gt[i]))
    noise = np.asarray(se3.exp(jnp.asarray(
        np.concatenate([rng.normal(0, 0.01, 3), rng.normal(0, 0.004, 3)]),
        jnp.float32)))
    drifted.append(drifted[-1] @ z @ noise)
  drifted = np.stack(drifted)

  opt = PoseGraphOptimizer(drifted, True)
  # Loop edge: last keyframe observes its TRUE relative pose to the first.
  z_loop = np.asarray(se3.inverse(jnp.asarray(gt[k - 1])) @ jnp.asarray(gt[0]))
  opt.add_edge(k - 1, 0, z_loop)
  out = opt.optimize(num_iterations=25)

  def err(T_est, T_gt):
    return np.abs(np.asarray(se3.log(
        se3.inverse(jnp.asarray(T_est)) @ jnp.asarray(T_gt)))).max()

  # The loop edge must pull the end of the chain toward consistency.
  before = err(drifted[k - 1] @ z_loop, gt[0] @ np.eye(4))
  after = err(out[k - 1] @ z_loop, out[0])
  assert after < 0.3 * before
  # Gauge: vertex 0 stays fixed.
  assert err(out[0], drifted[0]) < 1e-5


def test_trajectory_deformation_moves_interpolated_frames():
  # 3 keyframes at frames 0, 5, 10; 11 frames total.
  kf_indices = [0, 5, 10]
  kf_poses = np.stack([np.asarray(se3.exp(jnp.asarray(
      [0.1 * i, 0, 0, 0, 0, 0], jnp.float32))) for i in range(3)])
  frame_poses = [np.asarray(se3.exp(jnp.asarray(
      [0.02 * f, 0, 0, 0, 0, 0], jnp.float32))) for f in range(11)]
  original = remember_keyframe_poses(kf_poses)

  # Move keyframe 1 (frame 5) up by 0.1 in y; keep others.
  new_kf = kf_poses.copy()
  new_kf[1] = new_kf[1].copy()
  new_kf[1][1, 3] += 0.1

  for slot, f in enumerate(kf_indices):
    frame_poses[f] = new_kf[slot]
  extrapolate_and_interpolate_keyframe_pose_changes(
      kf_indices, original, new_kf, frame_poses)

  # Frame 3 sits between kf0 (unmoved) and kf1 (moved +0.1y): it must move
  # by ~ 3/5 * 0.1 in y.
  y3 = frame_poses[3][1, 3]
  assert 0.3 * 0.1 < y3 < 0.9 * 0.1
  # Frame 7 between kf1 and kf2: moves by ~ (1 - 2/5) * 0.1.
  y7 = frame_poses[7][1, 3]
  assert 0.3 * 0.1 < y7 < 0.9 * 0.1
  # Keyframes keep their assigned poses.
  assert frame_poses[5][1, 3] == pytest.approx(new_kf[1][1, 3])
  assert frame_poses[0][1, 3] == pytest.approx(0.0)


def _textured_intensity(seed, h=120, w=160):
  rng = np.random.default_rng(seed)
  img = rng.uniform(0.2, 0.8, (h // 8, w // 8)).astype(np.float32)
  img = np.kron(img, np.ones((8, 8), np.float32))  # blocky -> corners
  return img


def test_place_recognition_matches_revisit():
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.loop.detector import LoopDetector
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(160, 120)
  det = LoopDetector(BadSlamConfig(), cam, recent_exclude=3)
  depth = np.full((120, 160), 2.0, np.float32)

  img0 = _textured_intensity(0)
  entry0 = det._extract(0, img0, depth)
  assert len(entry0.descriptors) > 50
  det.entries.append(entry0)
  for i in range(1, 6):
    det.entries.append(det._extract(i, _textured_intensity(i), depth))
  # The temporal-neighbor normalizer assumes consecutive keyframes overlap
  # (as in any real sequence): make the latest entry resemble the queries'
  # surroundings by noising scene 0 slightly.
  rng = np.random.default_rng(42)
  img_prev = np.clip(img0 + rng.normal(0, 0.02, img0.shape), 0, 1
                     ).astype(np.float32)
  det.entries.append(det._extract(6, img_prev, depth))

  # Re-observation of scene 0 must match database entry 0.
  entry_re = det._extract(7, img0, depth)
  matched, count, matches = det._detect(entry_re)
  assert matched == 0
  assert count >= 50

  # A novel scene must not match anything (rejected by the low-normalizer
  # gate or by the match-count threshold).
  entry_new = det._extract(8, _textured_intensity(99), depth)
  matched2, _, _ = det._detect(entry_new)
  assert matched2 is None


def test_parallel_detection_thread_orders_and_patches_slots():
  """Parallel loop detection (loop_detector.h:162-166): images queued on the
  main thread are extracted/queried on the detection thread; add_keyframe
  pops results in order and patches the real keyframe slots."""
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.loop.detector import LoopDetector
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(160, 120)
  det = LoopDetector(BadSlamConfig(), cam, recent_exclude=10, parallel=True)
  depth = np.full((120, 160), 2.0, np.float32)
  try:
    for i in range(4):
      det.queue_for_detection(_textured_intensity(i), depth)
    # With only 4 entries inside the recency window nothing can match, so
    # add_keyframe must return None without needing a SLAM system.
    for i, slot in enumerate([5, 9, 11, 12]):
      ev = det.add_keyframe(slot, _textured_intensity(i), depth, slam=None)
      assert ev is None
    slots = [e.kf_slot for e in det.entries]
    assert slots == [5, 9, 11, 12]
    # Entries hold the right content for their slot (signature of image i
    # landed at position i).
    ref = [det._extract(-1, _textured_intensity(i), depth) for i in range(4)]
    for e, r in zip(det.entries, ref):
      assert np.array_equal(e.signature, r.signature)
    # remove_keyframe by slot works against patched entries.
    det.remove_keyframe(9)
    assert det.entries[1] is None
  finally:
    det.request_exit_and_wait()
  assert det._detection_thread is None


def test_loop_closure_applied_on_drifted_map():
  """Full pipeline closure: run a short sequence, inject drift into the
  keyframe poses, then revisit the start — the detector must verify the
  match and the pose graph must pull the revisit keyframe back."""
  import jax.numpy as jnp
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.loop.detector import LoopDetector
  from badslam_tpu.slam.system import BadSlam
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(160, 120)
  rng = np.random.default_rng(7)
  normals = []
  for _ in range(3):
    n = rng.uniform(-1, 1, 3).astype(np.float32)
    n[2] = -1.0
    normals.append(n / np.linalg.norm(n))
  normals = np.asarray(normals)

  # Frames 0..9 move slightly; frame 10 returns exactly to frame 0's pose.
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.003 * i, 0.001 * i, 0, 0.0008 * i, 0, 0], jnp.float32)))
      for i in range(10)]
  traj.append(traj[0].copy())
  video = synthetic.make_synthetic_video(cam, traj, normals,
                                         texture_kind="checker")

  cfg = BadSlamConfig(
      keyframe_interval=2, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 14,
      parallel_ba=False)  # the test mutates poses synchronously
  detector = LoopDetector(cfg, cam, recent_exclude=2)
  slam = BadSlam(cfg, video, loop_detector=detector)
  for i in range(10):
    slam.process_frame(i)
  assert slam.direct_ba.keyframe_count == 5  # kf at frames 0, 2, 4, 6, 8

  # Inject drift into the RECENT part of the trajectory only (keyframes 3, 4)
  # — the matched keyframe's neighborhood stays internally consistent, as in
  # real accumulated drift (the mutual-consistency gate requires that).
  drift = np.asarray([0.0, 0.0, 0.0, 0.06, 0.08], np.float32)  # meters in +x
  poses = np.asarray(slam.direct_ba.kf.global_T_frame).copy()
  for s in range(5):
    poses[s][0, 3] += drift[s]
  slam.direct_ba.kf = slam.direct_ba.kf._replace(
      global_T_frame=jnp.asarray(poses))
  slam.base_kf_global_T_frame = poses[4]
  for f, s in ((0, 0), (2, 1), (4, 2), (6, 3), (8, 4)):
    video.frames[f].global_T_frame = poses[s]

  # Revisit the start: odometry tracks against the drifted base keyframe, so
  # the new keyframe lands ~8 cm off; the loop closure must catch it.
  slam.process_frame(10, force_keyframe=True)
  assert detector.events, "no loop closure event was generated"
  event = detector.events[-1]
  assert event.applied, f"closure not applied: {event.reason}"
  assert event.matched_slot == 0

  # The revisit keyframe's pose error must shrink well below the 8 cm drift.
  T6 = video.frames[10].global_T_frame
  err = np.linalg.norm(T6[:3, 3] - traj[10][:3, 3])
  assert err < 0.04, f"revisit pose error {err:.3f} m (drift was 0.08)"


def test_inverted_index_matches_dense_l1():
  """DBoW2 inverted-file query == dense L1 scoring (for L1-normalized
  nonnegative vectors 1 - 0.5*|v-w|_1 == sum min(v_i, w_i)), including
  tombstoned entries."""
  import numpy as np
  from badslam_tpu.loop import bow
  rng = np.random.default_rng(3)
  W, D = 97, 23
  def rand_bow():
    v = np.zeros(W, np.float32)
    idx = rng.choice(W, size=8, replace=False)
    v[idx] = rng.uniform(0.1, 1.0, 8).astype(np.float32)
    return v / v.sum()
  db = [rand_bow() for _ in range(D)]
  index = bow.InvertedIndex(W)
  for i, v in enumerate(db):
    if i == 7:
      index.add(None)  # hole (entry id must still advance)
      continue
    assert index.add(v) == i
  index.remove(11)
  q = rand_bow()
  got = index.query(q)
  want = bow.l1_score(q, np.stack(db))
  for i in range(D):
    if i in (7, 11):
      assert got[i] == 0.0
    else:
      np.testing.assert_allclose(got[i], want[i], atol=1e-6)


def test_loop_closure_applied_at_bow_scale():
  """Closure through the TRAINED-vocabulary retrieval path: >=30 keyframes
  (so BoW + inverted index are active, not the small-database signature
  fallback), drift injected into the tail, a two-step revisit (the k=1
  temporal-consistency warm-up needs two consecutive queries agreeing), and
  the closure must verify, apply, and pull the revisit pose back."""
  import jax.numpy as jnp
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.loop.detector import LoopDetector
  from badslam_tpu.slam.system import BadSlam
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(160, 120)
  rng = np.random.default_rng(7)
  normals = []
  for _ in range(3):
    n = rng.uniform(-1, 1, 3).astype(np.float32)
    n[2] = -1.0
    normals.append(n / np.linalg.norm(n))
  normals = np.asarray(normals)

  # Frames 0..69 drift away; frames 70 and 72 revisit frame 0's pose (70
  # slightly offset so consecutive revisit queries exist).
  n_away = 70
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.0022 * i, 0.0008 * i, 0, 0.0006 * i, 0, 0], jnp.float32)))
      for i in range(n_away)]
  near0 = np.asarray(se3.exp(jnp.asarray(
      [0.004, 0.001, 0, 0, 0, 0], jnp.float32))) @ traj[0]
  traj += [near0, near0, traj[0].copy()]
  video = synthetic.make_synthetic_video(cam, traj, normals,
                                         texture_kind="checker")

  cfg = BadSlamConfig(
      keyframe_interval=2, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      # BA off: dense BA against the (undrifted) map legitimately
      # re-absorbs injected pose drift before the revisit — measured; with
      # BA disabled the drift persists and the CLOSURE path must fix it.
      max_num_ba_iterations_per_keyframe=0,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 14,
      parallel_ba=False)  # the test mutates poses synchronously
  # Real error mechanism: a sensor blackout mid-run (the tracking-failure
  # gate fires, the pose holds while the camera keeps creeping) — the same
  # injection the kidnap benchmark uses. The unobserved motion bakes an
  # offset into every later keyframe; with BA off, only the closure chain
  # (BoW retrieval -> RANSAC -> refinement -> weak-edge pose graph) can
  # repair it.
  blackout = range(40, 56)  # ~16 frames x ~2.6 mm/frame ~= 4 cm offset

  class BlackoutSlam(BadSlam):
    def _tracking_failure_injected(self, frame_index):
      return frame_index in blackout

  detector = LoopDetector(cfg, cam)
  slam = BlackoutSlam(cfg, video, loop_detector=detector)
  for i in range(n_away):
    slam.process_frame(i)
  assert slam.direct_ba.keyframe_count == 35

  # Two revisit keyframes: the first warms the temporal-consistency gate,
  # the second must close.
  for f in (n_away, n_away + 1, n_away + 2):
    slam.process_frame(f, force_keyframe=(f != n_away + 1))

  assert detector.vocab is not None, "BoW vocabulary must be the active path"
  assert detector.events, "no loop event at BoW scale"
  applied = [e for e in detector.events if e.applied]
  assert applied, ("closure not applied: "
                   f"{[(e.matched_slot, e.reason) for e in detector.events]}")
  # Blackout keyframe edges must be marked low-confidence.
  from badslam_tpu.slam.pipelined import WEAK_EDGE_WEIGHT
  weak = [s for s, w in slam.keyframe_edge_weight.items()
          if w == WEAK_EDGE_WEIGHT]
  assert weak, "blackout must produce weak odometry edges"
  # The closures must keep the trajectory consistent end-to-end: the final
  # revisit frame's pose error stays well under the ~4 cm unobserved
  # blackout offset (BA is off — closures are the only repair path).
  err = np.linalg.norm(
      video.frames[n_away + 2].global_T_frame[:3, 3] - traj[-1][:3, 3])
  assert err < 0.02, f"revisit pose error {err:.3f} m"
