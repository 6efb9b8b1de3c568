"""Loop detection and closure.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
loop_detector.{h,cc}:
  * feature extraction: FAST (threshold 20) + BRIEF over the gray keyframe
    image, keypoint depth stashed alongside (loop_detector.cc:97-128,744-757);
  * place recognition: DBoW2/DLoopDetector with normalized-similarity alpha
    0.15, temporal consistency k=1, exclusion of recent frames (:150-179);
  * geometric verification: 3D-3D RANSAC (threshold 0.06, >= 10 inliers)
    (:284-360);
  * direct refinement against the matched keyframe and its prev/next
    neighbors, mutual consistency gates (<= 10 deg, <= 0.02 m) (:436-604);
  * pose averaging + "is BA enough" reprojection test (<= 1 px skip)
    (:606-666);
  * pose-graph optimization + trajectory deformation (:670-705).

TPU-native redesign of the retrieval layer: instead of a pre-trained DBoW2
vocabulary (a binary resource we do not ship), we use ORB (FAST + rotated
BRIEF — the same detector family) and a two-stage query: a 256-bit
majority-vote global signature prefilter (vectorized Hamming popcount) over
all database keyframes, then exact descriptor matching with a ratio test on
the top candidates. Scores are normalized by the match count against the
temporally-previous keyframe, mirroring DBoW2's normalized similarity score,
with the same alpha = 0.15 acceptance threshold. All of this stays on CPU
(as in the reference); only the direct refinement runs on TPU via the
pairwise tracker.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import List, Optional, Tuple

import numpy as np

from badslam_tpu.geometry import se3_np
from badslam_tpu.loop.pose_graph import PoseGraphOptimizer
from badslam_tpu.loop.ransac import ransac_3d3d
from badslam_tpu.utils import logging as log
from badslam_tpu.loop.trajectory_deformation import (
    extrapolate_and_interpolate_keyframe_pose_changes,
    remember_keyframe_poses,
)

NSS_ALPHA = 0.15                 # loop_detector.cc:161
FAST_THRESHOLD = 20              # loop_detector.cc:123
RANSAC_THRESHOLD = 0.06          # loop_detector.cc:310
RANSAC_MIN_INLIERS = 10          # loop_detector.cc:312
MAX_ANGLE_DIFFERENCE = np.pi / 180.0 * 10.0   # loop_detector.cc:577
MAX_EUCLIDEAN_DISTANCE = 0.02                 # loop_detector.cc:578
AVERAGE_PIXEL_DISTANCE_THRESHOLD = 1.0        # loop_detector.cc:655


@dataclasses.dataclass
class KeyframeEntry:
  kf_slot: int                 # index in the DirectBA keyframe store
  keypoints: np.ndarray        # (N, 2) float pixel positions (cv convention)
  depths: np.ndarray           # (N,) metric depth at the keypoint (0 invalid)
  descriptors: np.ndarray      # (N, 32) uint8 ORB descriptors
  signature: np.ndarray        # (32,) uint8 majority-vote global signature
  bow: "np.ndarray | None" = None   # (W,) L1-normalized TF-IDF BoW vector


@dataclasses.dataclass
class LoopClosureEvent:
  current_slot: int
  matched_slot: int
  inlier_count: int
  applied: bool
  reason: str
  # Norm of the applied constraint's translation (the measured distance
  # between the two camera centers): a closure is FALSE iff this disagrees
  # with the GT pair distance — proximity of the pair alone cannot
  # distinguish a correct wide-baseline closure from an aliased one
  # (benchmarks/long_sequence.py false-closure accounting).
  measured_t_norm: "float | None" = None


def _popcount_u8(x: np.ndarray) -> np.ndarray:
  lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                      axis=1).sum(axis=1)
  return lut[x]


class LoopDetector:
  """Mirrors the reference LoopDetector public surface: AddImage (here
  add_keyframe), RemoveImage (remove_keyframe), loop counters."""

  def __init__(self, config, camera, min_match_count: int = 20,
               recent_exclude: int = 10, max_candidates: int = 8,
               num_features: int = 500, parallel: bool = False,
               vocab_train_size: int = 30,
               temporal_consistency: bool = True):
    import cv2
    self.config = config
    self.camera = camera
    self.orb = cv2.ORB_create(nfeatures=num_features,
                              fastThreshold=FAST_THRESHOLD)
    self.matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
    self.entries: List[Optional[KeyframeEntry]] = []
    self.min_match_count = min_match_count
    self.recent_exclude = recent_exclude
    self.max_candidates = max_candidates
    self.num_loops_closed = 0
    self.num_loops_ignored = 0
    self.events: List[LoopClosureEvent] = []
    # APPLIED loop constraints (cur_slot, old_slot, cur_T_old), re-added to
    # every later pose graph so verified closures stay pinned (the reference
    # rebuilds each graph with only the newest loop edge).
    self.applied_loop_edges: List[tuple] = []
    # Device twin for pipelined mode (the applied flag lives on device, so
    # accumulation must too): (loop_ei, loop_ej, loop_Z, loop_w, loop_count).
    self._device_loop_edges = None
    # Device-side closures (pipelined mode) whose outcome flag still lives
    # on device; resolve_pending_device_events reads them at finalize.
    self._pending_device_results: List = []

    # BoW retrieval (DBoW2 mechanism; loop/bow.py): the vocabulary is trained
    # online from the map's own descriptors once vocab_train_size keyframes
    # exist; before that, the 256-bit signature prefilter serves the (small)
    # database. DLoopDetector-style temporal consistency k=1: a detection is
    # accepted only when the previous query's best match pointed at a nearby
    # database entry (loop_detector.cc:150-179 parameter block).
    self.vocab = None
    self.vocab_train_size = max(2, vocab_train_size)
    self._vocab_trained_on = 0
    # DBoW2-style inverted file: word -> (entry, weight) postings, entry ids
    # aligned with self.entries (holes become dead index slots).
    self._inv_index = None
    self._indexed_upto = 0
    self.temporal_consistency = temporal_consistency
    self._prev_best_db: Optional[int] = None

    # Parallel detection (loop_detector.h:162-166, DetectionThreadMain
    # loop_detector.cc): a dedicated thread runs feature extraction +
    # database query + DB insertion for queued images, so the BA thread's
    # add_keyframe only pops a finished result and handles the CLOSING
    # (verification + application) itself.
    self.parallel = parallel
    self._detector_lock = threading.Lock()   # guards self.entries
    self._det_cond = threading.Condition()
    self._det_queue: List = []
    self._det_results: List = []
    self._quit = False
    self._detection_thread: Optional[threading.Thread] = None
    if parallel:
      self._detection_thread = threading.Thread(
          target=self._detection_thread_main, daemon=True,
          name="loop-detection")
      self._detection_thread.start()

  def queue_for_detection(self, intensity: np.ndarray, depth: np.ndarray):
    """QueueForLoopDetection (loop_detector.h:208-214): called on the main
    thread as soon as the keyframe image exists; detection runs ahead while
    the keyframe waits in the BA queue. Must be paired 1:1, in order, with a
    later add_keyframe call."""
    assert self._detection_thread is not None
    with self._det_cond:
      self._det_queue.append((np.array(intensity, copy=True),
                              np.array(depth, copy=True)))
      self._det_cond.notify_all()

  def _detection_thread_main(self):
    while True:
      with self._det_cond:
        while not self._det_queue and not self._quit:
          self._det_cond.wait(timeout=0.1)
        if self._quit:
          return
        intensity, depth = self._det_queue.pop(0)
      # kf_slot is unknown until the BA thread registers the keyframe; the
      # entry is patched with the real slot when the result is consumed.
      entry = self._extract(-1, intensity, depth)
      with self._detector_lock:
        matched_db, count, matches = self._detect(entry)
        self.entries.append(entry)
        entry_index = len(self.entries) - 1
      with self._det_cond:
        self._det_results.append((entry_index, matched_db, count, matches))
        self._det_cond.notify_all()

  def request_exit_and_wait(self):
    """~LoopDetector: stop the detection thread (no-op when sequential)."""
    if self._detection_thread is None:
      return
    with self._det_cond:
      self._quit = True
      self._det_cond.notify_all()
    self._detection_thread.join()
    self._detection_thread = None

  # --- feature extraction (loop_detector.cc:97-128,729-757) ---

  def _extract(self, kf_slot: int, intensity: np.ndarray,
               depth: np.ndarray) -> KeyframeEntry:
    gray = np.clip(intensity * 255.0 + 0.5, 0, 255).astype(np.uint8)
    keypoints, descriptors = self.orb.detectAndCompute(gray, None)
    if descriptors is None or len(keypoints) == 0:
      return KeyframeEntry(kf_slot, np.zeros((0, 2), np.float32),
                           np.zeros((0,), np.float32),
                           np.zeros((0, 32), np.uint8),
                           np.zeros((32,), np.uint8))
    pts = np.asarray([kp.pt for kp in keypoints], np.float32)
    h, w = depth.shape
    px = np.clip(pts[:, 0].astype(np.int32), 0, w - 1)
    py = np.clip(pts[:, 1].astype(np.int32), 0, h - 1)
    depths = depth[py, px].astype(np.float32)
    # Majority-vote signature: bit b set iff >= half the descriptors set it.
    bits = np.unpackbits(descriptors, axis=1)
    sig = np.packbits((bits.mean(axis=0) >= 0.5).astype(np.uint8))
    return KeyframeEntry(kf_slot, pts, depths, descriptors, sig)

  # --- retrieval ---

  def _maybe_train_vocabulary(self):
    """Online vocabulary training (called with the detector lock held): once
    vocab_train_size keyframes exist, fit the hierarchical k-medians tree on
    all database descriptors, fit IDF, and back-fill BoW vectors.

    The vocabulary RETRAINS every time the database DOUBLES past the last
    training size: a tree fit on the first 30 keyframes aliases the content
    of a larger map into too few effective words, and the reference
    sidesteps this only by shipping a large offline vocabulary
    (brief_k10L6.voc, 10^6 words). Round-3 used quadrupling (retrains at
    30/120/480), which left a 400-keyframe database querying a 120-keyframe
    vocabulary — measured recall 0.87; doubling (30/60/120/240/480) keeps
    staleness <= 2x and lifts recall to >= 0.95 at the same precision
    (benchmarks/retrieval_report.json). Fit cost is linear in the database,
    so doubling keeps TOTAL training work <= 4x the final fit — amortized
    O(1) per keyframe. Depth grows with the descriptor count so the word
    budget stays ahead of the database."""
    live = [e for e in self.entries if e is not None and len(e.descriptors)]
    if len(live) < self.vocab_train_size:
      return
    if self.vocab is not None and len(live) < 2 * self._vocab_trained_on:
      return
    from badslam_tpu.loop import bow
    all_desc = np.concatenate([e.descriptors for e in live])
    depth = 3 if len(all_desc) < 30_000 else 4
    vocab = bow.BinaryVocabulary(branching=10, depth=depth)
    vocab.fit(all_desc)
    word_lists = [vocab.transform(e.descriptors) for e in live]
    vocab.fit_idf(word_lists)
    for e in self.entries:
      if e is not None:
        e.bow = None  # invalidate stale vectors (old word space)
    for e, words in zip(live, word_lists):
      e.bow = vocab.bow_vector(words)
    self.vocab = vocab
    self._vocab_trained_on = len(live)
    # Rebuild the inverted file in the new word space.
    self._inv_index = bow.InvertedIndex(vocab.num_words)
    self._indexed_upto = 0
    self._index_new_entries()
    log.debug(f"BoW vocabulary trained on {len(live)} keyframes "
              f"({len(all_desc)} descriptors, depth {depth}, "
              f"{vocab.num_words} words)")

  def _index_new_entries(self):
    """Append entries not yet in the inverted file (ids stay aligned)."""
    while self._indexed_upto < len(self.entries):
      e = self.entries[self._indexed_upto]
      self._inv_index.add(
          self._bow_of(e) if e is not None and len(e.descriptors) else None)
      self._indexed_upto += 1

  def _bow_of(self, entry: KeyframeEntry) -> Optional[np.ndarray]:
    if self.vocab is None or len(entry.descriptors) == 0:
      return None
    if entry.bow is None:
      entry.bow = self.vocab.bow_vector(
          self.vocab.transform(entry.descriptors))
    return entry.bow

  def _detect(self, entry: KeyframeEntry) -> Tuple[Optional[int], int, list]:
    """Returns (matched database index or None, match count, matches)."""
    self._maybe_train_vocabulary()
    usable = [
        (i, e) for i, e in enumerate(self.entries)
        if e is not None and len(e.descriptors) > 0
        and i < len(self.entries) - self.recent_exclude
    ]
    if not usable or len(entry.descriptors) == 0:
      return None, 0, []

    # Normalizer entry: the temporally-previous keyframe (DBoW2/DLoopDetector
    # normalized similarity score).
    prev_entry = None
    for e in reversed(self.entries):
      if e is not None and len(e.descriptors) > 0:
        prev_entry = e
        break

    if self.vocab is not None:
      # Stage 1: BoW scoring via the inverted file — only database entries
      # sharing words with the query are touched (DBoW2
      # TemplatedDatabase::queryL1; for L1-normalized nonnegative vectors
      # 1 - 0.5*|v-w|_1 == sum_shared min(v_i, w_i)).
      q = self._bow_of(entry)
      self._index_new_entries()
      scores_full = self._inv_index.query(q)
      scores = scores_full[np.asarray([i for i, _ in usable])]
      prev_bow = self._bow_of(prev_entry) if prev_entry is not None else None
      norm_score = (float(np.minimum(q, prev_bow).sum())
                    if prev_bow is not None else 1.0)
      # DLoopDetector LOW_NSS_FACTOR: an unreliable normalizer (e.g. motion
      # blur) rejects the query instead of loosening the gate.
      if norm_score < 0.005:
        self._prev_best_db = None
        self._prev_cand_dbs = None
        return None, 0, []
      eta = scores / max(norm_score, 1e-6)
      order = np.argsort(-eta)[: self.max_candidates]
      best_db = usable[order[0]][0] if len(order) else None
      candidates = [usable[oi] for oi in order if eta[oi] >= NSS_ALPHA]
      # Temporal consistency k=1 over candidate ISLANDS (DLoopDetector
      # groups matches into db-index islands and requires consecutive
      # queries to hit the same island): a detection is accepted only when
      # SOME current candidate is index-near SOME of the previous query's
      # candidates. Round-3 compared single best indices, which falsely
      # rejected genuine revisits whenever the same PLACE had database
      # entries from multiple passes (best flipping between pass-1 and
      # pass-2 indices) — all 38 of the measured recall losses at 400
      # keyframes came from that.
      cand_dbs = [i for i, _ in candidates]
      prev_cands = getattr(self, "_prev_cand_dbs", None)
      consistent = (not self.temporal_consistency or
                    (prev_cands is not None and any(
                        abs(c - p) <= 5 for c in cand_dbs
                        for p in prev_cands)))
      self._prev_cand_dbs = cand_dbs or (
          [best_db] if best_db is not None else [])
      self._prev_best_db = best_db
      if not candidates or not consistent:
        return None, 0, []
    else:
      # Small-database fallback: 256-bit signature prefilter.
      sigs = np.stack([e.signature for _, e in usable])
      dist = _popcount_u8(sigs ^ entry.signature[None, :]).sum(axis=1)
      order = np.argsort(dist)[: self.max_candidates]
      norm_count = (self._match_count(entry, prev_entry)[0]
                    if prev_entry is not None else self.min_match_count)
      if norm_count < max(5, self.min_match_count // 4):
        return None, 0, []
      candidates = [usable[oi] for oi in order]

    # Stage 2: exact descriptor matching on the shortlisted candidates.
    best = (None, 0, [])
    for i, cand in candidates:
      count, matches = self._match_count(entry, cand)
      if count > best[1]:
        best = (i, count, matches)
    matched, count, matches = best
    if matched is None or count < self.min_match_count:
      return None, count, []
    if self.vocab is None:
      if count / norm_count < NSS_ALPHA:
        return None, count, []
    return matched, count, matches

  def _match_count(self, a: KeyframeEntry, b: KeyframeEntry):
    if len(a.descriptors) == 0 or len(b.descriptors) == 0:
      return 0, []
    knn = self.matcher.knnMatch(a.descriptors, b.descriptors, k=2)
    good = [m[0] for m in knn
            if len(m) == 2 and m[0].distance < 0.75 * m[1].distance
            and m[0].distance < 64]
    return len(good), good

  # --- public API ---

  def add_to_database(self, kf_slot: int, intensity: np.ndarray,
                      depth: np.ndarray) -> None:
    """Insert a keyframe WITHOUT querying — used only by the state-load
    path, which re-creates the database from the dataset images as the
    reference LoadState does (io.cc:521, parallel detection disabled for
    the duration, io.cc:392-395). Restores closure capability against
    pre-snapshot map regions for keyframes created AFTER the resume.

    Deliberate divergence from the reference: LoadState queues the loaded
    keyframes and runs the full AddImage detect+close on each of them
    afterwards (bad_slam.cc:1140, io.cc:527), so loop candidates *among*
    the snapshot's own keyframes can still fire at resume time; here they
    cannot — a converged snapshot has already absorbed or closed them, and
    re-closing against a map we just restored verbatim would only perturb
    it. Only post-resume keyframes query the rebuilt database."""
    entry = self._extract(kf_slot, intensity, depth)
    with self._detector_lock:
      self.entries.append(entry)

  def remove_keyframe(self, kf_slot: int):
    """LoopDetector::RemoveImage — keyframe deleted by keyframe merging.
    Takes the keyframe-store slot (stable under the masked store design).
    Callers already hold the BA lock; the detector lock serializes against
    the parallel detection thread (loop_detector.h:204-220)."""
    with self._detector_lock:
      for i, e in enumerate(self.entries):
        if e is not None and e.kf_slot == kf_slot:
          self.entries[i] = None
          if self._inv_index is not None and i < self._indexed_upto:
            self._inv_index.remove(i)

  def add_keyframe(self, kf_slot: int, intensity: np.ndarray,
                   depth: np.ndarray, slam) -> Optional[LoopClosureEvent]:
    """AddImage (loop_detector.cc:208-272): extract + query (or pop the
    parallel detection thread's result, loop_detector.cc:242-268), then
    verify and close on the calling thread."""
    if self._detection_thread is not None:
      with self._det_cond:
        while not self._det_results:
          self._det_cond.wait(timeout=1.0)
          if not self._det_results and not self._detection_thread.is_alive():
            raise RuntimeError("loop detection thread died")
        entry_index, matched_db, count, matches = self._det_results.pop(0)
      with self._detector_lock:
        entry = self.entries[entry_index]
        entry.kf_slot = kf_slot
        matched_entry = (self.entries[matched_db]
                         if matched_db is not None else None)
      if matched_db is None:
        return None
    else:
      entry = self._extract(kf_slot, intensity, depth)
      matched_db, count, matches = self._detect(entry)
      self.entries.append(entry)
      if matched_db is None:
        return None
      matched_entry = self.entries[matched_db]
    if matched_entry is None:
      # The matched keyframe was merged away between detection and closing.
      return None
    event = self._verify_and_close(entry, matched_entry, matches, slam)
    self.events.append(event)
    if event.applied:
      self.num_loops_closed += 1
      log.info(f"loop closed: kf {event.current_slot} -> "
               f"{event.matched_slot} ({event.inlier_count} inliers; "
               f"total {self.num_loops_closed})")
    else:
      self.num_loops_ignored += 1
      log.debug(f"loop candidate rejected: kf {event.current_slot} -> "
                f"{event.matched_slot} ({event.reason})")
    return event

  # --- verification + closure (loop_detector.cc:284-705) ---

  def _unproject(self, pts: np.ndarray, depths: np.ndarray) -> np.ndarray:
    # Corner-convention unprojection applied directly to cv keypoint
    # coordinates — this reproduces the reference EXACTLY, which also feeds
    # cv::KeyPoint::pt (center-convention) into UnprojectFromPixelCornerConv
    # (loop_detector.cc:294-296); the half-pixel offset is identical on both
    # sides of every correspondence, so it cancels in the relative pose.
    cam = self.camera
    nx = (pts[:, 0] - float(cam.cx)) / float(cam.fx)
    ny = (pts[:, 1] - float(cam.cy)) / float(cam.fy)
    return np.stack([depths * nx, depths * ny, depths], axis=-1)

  def _verify_and_close_device(self, cur: KeyframeEntry, old: KeyframeEntry,
                               old_T_cur: np.ndarray, cur_pts: np.ndarray,
                               n_inliers: int, slam) -> LoopClosureEvent:
    """Device-side verification + closure for the pipelined front-end: the
    early gates reuse DirectBA's HOST mirrors (single-threaded mode — no
    lock needed), then one jitted program refines, gates, and conditionally
    applies the pose graph without any device->host transfer. The returned
    event carries reason 'device-pending' until resolve_pending_device_events
    reads the on-device outcome (called by finalize_pipelined)."""
    import jax
    import jax.numpy as jnp
    from badslam_tpu.loop import device_closure
    ev = lambda applied, reason, inl=0: LoopClosureEvent(
        cur.kf_slot, old.kf_slot, inl, applied, reason)

    ba = slam.direct_ba
    k = ba.keyframe_count
    valid = ba._kf_valid_host
    if not (0 <= old.kf_slot < k and valid[old.kf_slot]):
      return ev(False, "matched keyframe no longer valid")
    nxt = next((i for i in range(old.kf_slot + 1, k) if valid[i]), None)
    if nxt is None:
      return ev(False, "no next keyframe for verification", n_inliers)
    prv = next((i for i in range(old.kf_slot - 1, -1, -1) if valid[i]), None)
    if prv is None:
      prv = next((i for i in range(nxt + 1, k) if valid[i]), None)
      if prv is None:
        return ev(False, "no second keyframe for verification", n_inliers)

    # Keypoints padded to a fixed bucket so candidates share one executable.
    cap = device_closure.KEYPOINT_BUCKET
    pts = np.zeros((cap, 3), np.float32)
    n = min(len(cur_pts), cap)
    pts[:n] = cur_pts[:n]
    mask = np.zeros((cap,), bool)
    mask[:n] = True

    # Odometry edges between consecutive valid slots, padded to capacity-1
    # with weight-0 self-edges (zero residual, zero Jacobian rows).
    slots = [i for i in range(k) if valid[i]]
    e_cap = max(1, ba.kf.capacity - 1)
    ei = np.zeros((e_cap,), np.int32)
    ej = np.zeros((e_cap,), np.int32)
    w = np.zeros((e_cap,), np.float32)
    for idx, (a_s, b_s) in enumerate(zip(slots[:-1], slots[1:])):
      ei[idx], ej[idx], w[idx] = a_s, b_s, 1.0

    cfg = slam.config
    width, height = ba.depth_size
    # Per-keyframe odometry-edge confidence (device; transfer-free) and the
    # accumulated applied-loop-edge buffer.
    slam._pl.ensure_edge_capacity(ba.kf.capacity, mesh=ba.mesh)
    if self._device_loop_edges is None:
      lc = device_closure.LOOP_EDGE_BUCKET
      self._device_loop_edges = (
          jnp.zeros((lc,), jnp.int32), jnp.zeros((lc,), jnp.int32),
          jnp.tile(jnp.eye(4, dtype=jnp.float32), (lc, 1, 1)),
          jnp.zeros((lc,), jnp.float32), jnp.asarray(0, jnp.int32))
      if ba.mesh is not None:
        # Same placement rule as PipelinedState.ensure_edge_capacity: these
        # feed the SPMD closure program alongside mesh-placed inputs.
        from badslam_tpu.parallel import sharded_ba
        self._device_loop_edges = jax.device_put(
            self._device_loop_edges, sharded_ba.replicated(ba.mesh))
    loop_ei, loop_ej, loop_Z, loop_w, loop_count = self._device_loop_edges
    small = (
        jnp.asarray(cur.kf_slot, jnp.int32), jnp.asarray(old.kf_slot,
                                                         jnp.int32),
        jnp.asarray(nxt, jnp.int32), jnp.asarray(prv, jnp.int32),
        jnp.asarray(old_T_cur, jnp.float32),
        jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray([float(self.camera.fx), float(self.camera.fy),
                     float(self.camera.cx), float(self.camera.cy)],
                    jnp.float32),
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(w))
    if ba.mesh is not None:
      # Every input of the SPMD closure program must be placed over the
      # mesh; a device-0-committed array deadlocks the collective
      # rendezvous inside the program.
      from badslam_tpu.parallel import sharded_ba
      small = jax.device_put(small, sharded_ba.replicated(ba.mesh))
    res = device_closure.verify_and_close(
        ba.kf, ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
        *small,
        slam._pl.edge_weight,
        loop_ei, loop_ej, loop_Z, loop_w, loop_count,
        width=width, height=height, cell_size=ba.cell_size,
        num_scales=cfg.num_scales,
        use_depth_residuals=cfg.use_geometric_residuals,
        use_descriptor_residuals=cfg.use_photometric_residuals,
        convergence_threshold=cfg.odometry_convergence_threshold,
        residual_type=("gradmag" if cfg.use_gradmag_for_tracking
                       else "gradient_xy"))
    ba.kf = ba.kf._replace(global_T_frame=res.global_T_frame)
    self._device_loop_edges = (res.loop_ei, res.loop_ej, res.loop_Z,
                               res.loop_w, res.loop_count)
    # Post-closure repair budget: if the closure applies, the subsequent
    # transfer-free BA iterations re-converge keyframes AND surfels onto
    # the corrected poses; when it does not apply, the extra iterations
    # converge immediately (cheap no-ops). The applied flag is on device,
    # so the budget is planned unconditionally. The budget is also recorded
    # as repair DEBT: the concurrent-BA queue's backlog cap may not drop
    # these iterations (measured round 5: with a warm cache the frame loop
    # outruns BA dispatch, the queue sits at its cap, and the entire repair
    # burst was silently discarded — ATE residual 21->31% of the kidnap
    # offset depending on how many repair iterations survived).
    slam.num_planned_ba_iterations += (
        cfg.max_num_ba_iterations_per_keyframe)
    slam._pl_ba_repair_debt = (getattr(slam, "_pl_ba_repair_debt", 0)
                               + cfg.max_num_ba_iterations_per_keyframe)
    self._pending_device_results.append(res)
    return ev(False, "device-pending", n_inliers)

  def resolve_pending_device_events(self):
    """Read back the outcomes of device-side closures (the pipelined run's
    finalize step) and fix events + counters; device-pending events were
    provisionally counted as ignored by add_keyframe."""
    if not self._pending_device_results:
      return
    log.info(f"resolving {len(self._pending_device_results)} pending "
             "device closure results")
    # ONE batched readback for all pending outcomes: in the tunnel's
    # post-readback sync mode each separate device->host read costs a full
    # round trip (measured: finalize dominated by per-event scalar reads),
    # so stack the scalars on device first.
    import jax
    import jax.numpy as jnp
    rs = self._pending_device_results
    batched = np.asarray(jnp.stack(
        [jnp.stack([r.applied.astype(jnp.float32),
                    r.ba_enough.astype(jnp.float32),
                    r.consistent.astype(jnp.float32),
                    r.depth_sane.astype(jnp.float32),
                    r.avg_px, r.t_norm]) for r in rs]))

    class _Resolved:
      def __init__(self, row):
        self.applied, self.ba_enough, self.consistent, self.depth_sane = (
            bool(row[0]), bool(row[1]), bool(row[2]), bool(row[3]))
        self.avg_px = float(row[4])
        self.t_norm = float(row[5])

    pending = iter([_Resolved(row) for row in batched])
    for i, event in enumerate(self.events):
      if event.reason != "device-pending":
        continue
      res = next(pending)
      if bool(res.applied):
        event.applied = True
        event.reason = "closed"
        event.measured_t_norm = res.t_norm
        self.num_loops_ignored -= 1
        self.num_loops_closed += 1
        log.info(f"loop closed on device: kf {event.current_slot} -> "
                 f"{event.matched_slot} ({event.inlier_count} inliers)")
      elif bool(res.ba_enough):
        event.reason = f"BA will absorb it (avg {float(res.avg_px):.2f} px)"
      elif not bool(res.consistent):
        event.reason = "refined estimates disagree"
      elif not bool(res.depth_sane):
        event.reason = "aligned depth fields disagree"
      else:
        event.reason = "rejected on device"
    self._pending_device_results = []

  def _verify_and_close(self, cur: KeyframeEntry, old: KeyframeEntry,
                        matches, slam) -> LoopClosureEvent:
    ev = lambda applied, reason, inl=0: LoopClosureEvent(
        cur.kf_slot, old.kf_slot, inl, applied, reason)

    # 3D-3D correspondences from keypoint depths.
    ci = np.asarray([m.queryIdx for m in matches], np.int32)
    oi = np.asarray([m.trainIdx for m in matches], np.int32)
    ok = (cur.depths[ci] > 0) & (old.depths[oi] > 0)
    if ok.sum() < RANSAC_MIN_INLIERS:
      return ev(False, "too few matches with depth")
    cur_pts = self._unproject(cur.keypoints[ci[ok]], cur.depths[ci[ok]])
    old_pts = self._unproject(old.keypoints[oi[ok]], old.depths[oi[ok]])

    old_T_cur, inliers = ransac_3d3d(
        cur_pts, old_pts, RANSAC_THRESHOLD, 500, RANSAC_MIN_INLIERS)
    if old_T_cur is None:
      return ev(False, "RANSAC failed", int(inliers.sum()))
    n_inliers = int(inliers.sum())

    if getattr(slam, "_pipelined", False):
      # Pipelined front-end: everything past RANSAC runs as one conditional
      # device program (loop/device_closure.py) — a host verification would
      # read poses back and permanently de-pipeline the tunnel. The outcome
      # stays on device; finalize_pipelined() resolves it. Under a mesh the
      # SPMD closure program's submission is serialized against the frame
      # loop's by the caller (system._spmd_dispatch), which removed the
      # XLA:CPU rendezvous deadlock that used to force a host fallback on
      # virtual CPU meshes (round-4 verdict item 3).
      return self._verify_and_close_device(cur, old, old_T_cur, cur_pts,
                                           n_inliers, slam)

    # Direct refinement vs matched keyframe and its next/prev neighbors.
    # Snapshot shared pose state under the BA lock (a concurrent
    # memory-pressure merge may invalidate keyframes between reads).
    ba = slam.direct_ba
    with slam._ba_lock:
      poses = np.asarray(ba.kf.global_T_frame)
      valid = np.asarray(ba.kf.valid)
      k = ba.keyframe_count
    if not (0 <= old.kf_slot < k and valid[old.kf_slot]):
      return ev(False, "matched keyframe no longer valid")

    neighbors = [old.kf_slot]
    nxt = next((i for i in range(old.kf_slot + 1, k) if valid[i]), None)
    if nxt is None:
      return ev(False, "no next keyframe for verification", n_inliers)
    neighbors.append(nxt)
    prv = next((i for i in range(old.kf_slot - 1, -1, -1) if valid[i]), None)
    if prv is None:
      prv = next((i for i in range(nxt + 1, k) if valid[i]), None)
      if prv is None:
        return ev(False, "no second keyframe for verification", n_inliers)
    neighbors.append(prv)

    import jax
    import jax.numpy as jnp
    # Host-side 4x4 pose algebra stays in numpy (se3_np): this runs on the
    # BA/detection threads concurrently with the main thread's device work.
    matched_frame_T_global = se3_np.inverse(poses[old.kf_slot])
    cur_T_old_refined = []
    for slot in neighbors:
      matched_T_this = (np.eye(4, dtype=np.float32) if slot == old.kf_slot
                        else matched_frame_T_global @ poses[slot])
      init = se3_np.inverse(old_T_cur) @ matched_T_this
      cur_T_tracked = slam.track_keyframe_pair(cur.kf_slot, slot, init)
      old_T_cur_ref = matched_T_this @ se3_np.inverse(cur_T_tracked)
      cur_T_old_refined.append(se3_np.inverse(old_T_cur_ref))

    # Mutual consistency gates (loop_detector.cc:575-604).
    for i in range(2):
      for j in range(i + 1, 3):
        zi = cur_T_old_refined[i][:3, 2]
        zj = cur_T_old_refined[j][:3, 2]
        ang = np.arccos(np.clip(zi @ zj, -1.0, 1.0))
        if ang > MAX_ANGLE_DIFFERENCE:
          return ev(False, f"refined rotations disagree ({ang:.3f} rad)",
                    n_inliers)
        dt = np.linalg.norm(cur_T_old_refined[i][:3, 3]
                            - cur_T_old_refined[j][:3, 3])
        if dt > MAX_EUCLIDEAN_DISTANCE:
          return ev(False, f"refined translations disagree ({dt:.3f} m)",
                    n_inliers)

    cur_T_old_avg = se3_np.average_poses(np.stack(cur_T_old_refined))

    # Depth-sanity gate (beyond the reference; device_closure.py
    # DEPTH_SANITY_RATIO): the refined alignment's depth fields must agree —
    # rejects perceptual-aliasing matches (identical texture, different
    # geometry) that survive the pose-consistency gates.
    from badslam_tpu.loop import device_closure as dc
    import jax
    import jax.numpy as jnp
    ratio, overlap = dc.alignment_depth_sanity(
        ba.kf.depth[cur.kf_slot], ba.kf.depth[old.kf_slot],
        jnp.asarray(se3_np.inverse(cur_T_old_avg)), ba.depth_intr,
        ba.baseline_fx)
    if (int(overlap) < dc.DEPTH_SANITY_MIN_OVERLAP
        or float(ratio) > dc.DEPTH_SANITY_RATIO):
      return ev(False, f"aligned depth fields disagree "
                f"(ratio {float(ratio):.2f}, overlap {int(overlap)})",
                n_inliers)

    # "Is BA enough?" reprojection test (loop_detector.cc:624-666).
    cur_T_global_est = cur_T_old_avg @ matched_frame_T_global
    global_T_cur_actual = poses[cur.kf_slot]
    delta = cur_T_global_est @ global_T_cur_actual
    moved = cur_pts @ delta[:3, :3].T + delta[:3, 3]
    cam = self.camera

    def project(p):
      z = p[:, 2]
      okz = z > 0
      return (np.stack([float(cam.fx) * p[:, 0] / np.where(okz, z, 1.0)
                        + float(cam.cx),
                        float(cam.fy) * p[:, 1] / np.where(okz, z, 1.0)
                        + float(cam.cy)], axis=-1), okz)

    pe, oke = project(moved)
    pc, okc = project(cur_pts)
    both = oke & okc
    if both.sum() >= 5:
      avg_px = float(np.linalg.norm(pe[both] - pc[both], axis=1).mean())
      if avg_px <= AVERAGE_PIXEL_DISTANCE_THRESHOLD:
        return ev(False, f"BA will absorb it (avg {avg_px:.2f} px)",
                  n_inliers)

    # Close the loop: pose graph + trajectory deformation. Odometry edges
    # carry the front-end's per-edge confidence (weak where the tracking-
    # failure gate fired, slam/system.py keyframe_edge_weight), and every
    # PREVIOUSLY applied loop edge re-enters the graph — the reference
    # rebuilds the graph with only the newest loop edge each time
    # (loop_detector.cc:670-705), discarding constraints it already
    # verified; keeping them pins all revisited regions at once.
    slot_map = [i for i in range(k) if valid[i]]
    graph_poses = poses[slot_map]
    ew = getattr(slam, "keyframe_edge_weight", {})
    odo_w = np.asarray([ew.get(slot_map[i + 1], 1.0)
                        for i in range(len(slot_map) - 1)], np.float32)
    optimizer = PoseGraphOptimizer(graph_poses, True, odometry_weights=odo_w)
    gi = slot_map.index(cur.kf_slot)
    gj = slot_map.index(old.kf_slot)
    optimizer.add_edge(gi, gj, cur_T_old_avg)
    for (pi, pj, pz) in self.applied_loop_edges:
      if pi in slot_map and pj in slot_map:
        optimizer.add_edge(slot_map.index(pi), slot_map.index(pj), pz)
    new_poses = optimizer.optimize()

    original = remember_keyframe_poses(graph_poses)
    # Pose/trajectory application mutates shared SLAM state; the reference
    # guards this with direct_ba_->Lock() (loop_detector.cc:670-705). Our
    # callers never hold _ba_lock here (the BA thread releases it around
    # keyframe registration), so acquiring it is deadlock-free.
    with slam._ba_lock:
      full = poses.copy()
      for out_i, slot in enumerate(slot_map):
        full[slot] = new_poses[out_i]
      ba.kf = ba.kf._replace(global_T_frame=jnp.asarray(full))

      # Deform the non-keyframe trajectory.
      frame_poses = [f.global_T_frame for f in slam.rgbd_video.frames]
      kf_frame_indices = [slam.keyframe_frame_indices[s] for s in slot_map]
      for out_i, slot in enumerate(slot_map):
        frame_poses[slam.keyframe_frame_indices[slot]] = new_poses[out_i]
      extrapolate_and_interpolate_keyframe_pose_changes(
          kf_frame_indices, original, new_poses, frame_poses,
          start_frame=0, end_frame=slam.last_frame_index)
      for i, p in enumerate(frame_poses):
        slam.rgbd_video.frames[i].global_T_frame = p
      if slam.base_kf_index is not None:
        slam.base_kf_global_T_frame = full[slam.base_kf_index]

    self.applied_loop_edges.append(
        (cur.kf_slot, old.kf_slot, np.asarray(cur_T_old_avg, np.float32)))
    # Post-closure map repair (the reference follows pose-graph application
    # with BA that re-converges keyframes AND surfels — the moved keyframes
    # re-enter the scheme as active): plan a full BA budget so geometry
    # optimization pulls the surfels onto the corrected poses.
    slam.num_planned_ba_iterations += (
        slam.config.max_num_ba_iterations_per_keyframe)

    event = ev(True, "closed", n_inliers)
    event.measured_t_norm = float(np.linalg.norm(cur_T_old_avg[:3, 3]))
    return event
