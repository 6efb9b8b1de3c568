"""BadSlam front-end: the per-frame SLAM pipeline.

Behavioral spec: /root/reference/applications/badslam/src/badslam/bad_slam.{h,cc}:
  ProcessFrame        bad_slam.cc:170-279
  PreprocessFrame     bad_slam.cc:639-761
  PredictFramePose    bad_slam.cc:763-825 (two constant-velocity hypotheses)
  RunOdometry         bad_slam.cc:827-951 (multi-scale pairwise tracking vs the
                      base keyframe; tracked side uses the UNfiltered depth,
                      base side the keyframe's filtered depth — both calibrated)
  CreateKeyframe      bad_slam.cc:953-1097 (every keyframe_interval-th frame;
                      first keyframe creates surfels unfiltered; later ones
                      plan max_num_ba_iterations_per_keyframe BA iterations)
  RunBundleAdjustment bad_slam.cc:481-536 (sequential path; planned-iteration
                      budget bookkeeping)

TPU-native notes: preprocessing + odometry are two jitted programs; the BA
"thread" is the sequential path for now (deterministic, what the reference
recommends for benchmarking); the parallel-BA event loop reproduces the
queued-keyframe semantics at the host level (SURVEY.md §7.3).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3_np
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.io.dataset import RGBDVideo
from badslam_tpu.models import odometry as odometry_mod
from badslam_tpu.ops import depth_model, depth_proc, image_proc
from badslam_tpu.ops.pyramid import FramePyramidLevel, build_pyramid
from badslam_tpu.slam.direct_ba import DirectBA, make_camera
from badslam_tpu.utils import logging as log
from badslam_tpu.utils.timing import Timing

# DEBUG_LOCKING analog (direct_ba.h:47,231-292): methods whose contract
# requires the BA lock CHECK it when BADSLAM_DEBUG_LOCKING is set.
import os
DEBUG_LOCKING = bool(os.environ.get("BADSLAM_DEBUG_LOCKING"))


class ProcessedFrame(NamedTuple):
  """Output of PreprocessFrame: everything a keyframe needs."""
  depth: jax.Array        # (H, W) filtered raw metric depth, 0 = invalid
  raw_depth: jax.Array    # (H, W) unfiltered raw metric depth (odometry)
  normals: jax.Array      # (H, W, 2)
  radius_sq: jax.Array    # (H, W)
  intensity: jax.Array    # (H, W) in [0, 1]
  rgb: jax.Array          # (H, W, 3) uint8


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cell_size", "sigma_xy",
                     "sigma_inv_depth", "radius_factor", "max_depth",
                     "use_pallas", "raw_scale"))
def _preprocess_jit(
    raw_depth, rgb, depth_intr, a, cfactor,
    width: int, height: int, cell_size: int,
    sigma_xy: float, sigma_inv_depth: float, radius_factor: float,
    max_depth: float, use_pallas: bool = False, raw_scale: float = 1.0,
) -> ProcessedFrame:
  """PreprocessFrame GPU part (bad_slam.cc:688-761): brightness, bilateral
  filter + cutoff, normals, radii/isolated-pixel removal. use_pallas routes
  the depth stencil chain through the fused VMEM kernel
  (ops/pallas_preprocess.py; 3.9x the XLA chain on TPU, bitwise-identical);
  intensity stays in XLA either way.

  raw_depth may arrive as uint16 sensor counts with raw_scale = the
  dataset's raw_to_float_depth: the metric conversion then runs on device,
  halving the per-frame H2D payload — the reference likewise uploads u16 and
  calibrates on the GPU (bad_slam.cc:663-685, kernel_downsample.cu:345)."""
  cam = make_camera(depth_intr, width, height)
  intensity = image_proc.rgb_to_intensity(rgb)
  if raw_depth.dtype != jnp.float32 or raw_scale != 1.0:
    raw_depth = raw_depth.astype(jnp.float32) * raw_scale
  if use_pallas:
    from badslam_tpu.ops import pallas_preprocess
    filtered_a, normals, radius_sq = pallas_preprocess.fused_depth_preprocess(
        raw_depth, depth_intr, a, cfactor, width=width, height=height,
        cell_size=cell_size, sigma_xy=sigma_xy,
        sigma_inv_depth=sigma_inv_depth, radius_factor=radius_factor,
        max_depth=max_depth)
  else:
    filtered = depth_proc.bilateral_filter_and_cutoff(
        raw_depth, sigma_xy=sigma_xy, sigma_inv_depth=sigma_inv_depth,
        radius_factor=radius_factor, max_depth=max_depth)
    filtered_b, normals = depth_proc.compute_normals(
        filtered, cam, a, cfactor, cell_size)
    radius_sq, filtered_a = depth_proc.compute_radii_and_remove_isolated(
        filtered_b, cam)
  return ProcessedFrame(
      depth=filtered_a, raw_depth=raw_depth, normals=normals,
      radius_sq=radius_sq, intensity=intensity, rgb=rgb)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cell_size", "num_scales",
                     "use_depth_residuals", "use_descriptor_residuals",
                     "use_pyramid_level_0", "convergence_threshold",
                     "residual_type"))
def _odometry_jit(
    base_depth, base_normals, base_intensity,
    tracked_raw_depth, tracked_normals, tracked_intensity,
    depth_intr, a, cfactor, baseline_fx,
    base_T_frame_init_1, base_T_frame_init_2,
    width: int, height: int, cell_size: int, num_scales: int,
    use_depth_residuals: bool, use_descriptor_residuals: bool,
    use_pyramid_level_0: bool,
    convergence_threshold: float = 1e-8,
    residual_type: str = "gradient_xy",
):
  """RunOdometry compute core (bad_slam.cc:827-951): calibrate both depth
  images, build pyramids, run coarse-to-fine pairwise tracking. In gradmag
  mode the photometric pyramid is built from the Sobel gradient-magnitude
  image (bad_slam.cc:859-898 GradMag branch)."""
  cam = make_camera(depth_intr, width, height)
  base_calib = depth_model.calibrate_depth_image(a, cfactor, base_depth,
                                                 cell_size)
  tracked_calib = depth_model.calibrate_depth_image(a, cfactor,
                                                    tracked_raw_depth,
                                                    cell_size)
  if residual_type == "gradmag":
    from badslam_tpu.ops.image_proc import sobel_gradient_magnitude
    base_intensity = sobel_gradient_magnitude(base_intensity)
    tracked_intensity = sobel_gradient_magnitude(tracked_intensity)
  base_pyr = build_pyramid(base_calib, base_normals, base_intensity,
                           num_scales)
  tracked_pyr = build_pyramid(tracked_calib, tracked_normals,
                              tracked_intensity, num_scales)
  return odometry_mod.track_frame_pairwise(
      base_pyr, tracked_pyr, cam, baseline_fx,
      base_T_frame_init_1, base_T_frame_init_2,
      test_different_initial_estimates=True,
      use_depth_residuals=use_depth_residuals,
      use_descriptor_residuals=use_descriptor_residuals,
      use_pyramid_level_0=use_pyramid_level_0,
      convergence_threshold=convergence_threshold,
      residual_type=residual_type,
  )


class BadSlam:
  """The system orchestrator (class BadSlam, bad_slam.h:62-363)."""

  def __init__(self, config: BadSlamConfig, rgbd_video: RGBDVideo,
               loop_detector=None, mesh=None):
    self.config = config
    self.rgbd_video = rgbd_video
    # Pyramid-level input scaling (main.cc:540-552): cameras and images are
    # downscaled by 2^level before anything else sees them.
    depth_cam = rgbd_video.depth_camera.scaled(
        0.5 ** config.pyramid_level_for_depth)
    color_cam = rgbd_video.color_camera.scaled(
        0.5 ** config.pyramid_level_for_color)
    # mesh: run the back-end distributed (DirectBA mesh mode — surfel store
    # sharded over the mesh, BA phases compiled as SPMD programs).
    self.direct_ba = DirectBA(config, depth_cam, color_cam, mesh=mesh)
    if loop_detector is None and config.enable_loop_detection:
      from badslam_tpu.loop.detector import LoopDetector
      # Pipelined mode runs detection inline: the parallel detection thread
      # pairs 1:1 with queue_for_detection, which the pipelined keyframe
      # path does not use (its closures verify on device; see
      # loop/device_closure.py).
      loop_detector = LoopDetector(
          config, color_cam,
          parallel=(config.parallel_loop_detection
                    and not config.pipelined_frontend))
    self.loop_detector = loop_detector

    # Base-keyframe state (bad_slam.h:330+): index into the keyframe store,
    # cached pose, image data, and the motion-model history (<= 3 relative
    # poses). The image cache lets odometry track against a keyframe that the
    # parallel BA thread has not registered in the store yet (the reference's
    # base_kf_ Keyframe pointer works the same way, bad_slam.cc:997-1000).
    self.base_kf_index: Optional[int] = None
    self.base_kf_images: Optional[ProcessedFrame] = None
    self.base_kf_global_T_frame = np.eye(4, dtype=np.float32)
    self.base_kf_tr_frame: List[np.ndarray] = []
    self.frame_tr_base_kf: List[np.ndarray] = []

    # Fused Pallas preprocess: None = auto-select on first frame (TPU
    # backend + frame fits VMEM); config can force it off.
    self._use_pallas_preprocess = (
        None if config.use_pallas_preprocess else False)

    self.num_planned_ba_iterations = 0
    # Loop-closure repair iterations still owed to the concurrent-BA queue;
    # these bypass the backlog cap (see the enqueue path) so a repair burst
    # can never be silently dropped when BA dispatch is slower than the
    # frame loop.
    self._pl_ba_repair_debt = 0
    self.ba_counter = 0
    self.last_frame_index = -1
    self.pose_estimated = False
    self.keyframe_created = False
    # Odometry-edge confidence per keyframe SLOT (host mirror; pipelined
    # mode keeps the device twin in PipelinedState.edge_weight): the weight
    # of the pose-graph edge from the previous keyframe into this one.
    # Weak (WEAK_EDGE_WEIGHT) when the tracking-failure gate fired anywhere
    # since the last keyframe — such an edge is a constant-position GUESS,
    # and a later loop closure should localize its correction there instead
    # of spreading it over the whole trajectory (loop/pose_graph.py).
    self.keyframe_edge_weight: dict = {}
    self._tracking_failed_since_kf = False
    # Keyframes deleted by the HBM watchdog's merge over the run.
    self.num_keyframes_merged = 0
    # Real-time pacing state (bad_slam.cc EndFrame :449-479 and the
    # sequential-BA time budget :213-278): actual_frame_start_time_ /
    # target_frame_end_time_ in the reference.
    self._actual_frame_start_time = 0.0
    self._target_frame_end_time = 0.0
    self._frame_timer_start: Optional[float] = None
    # frame_index of each keyframe slot (for trajectory deformation).
    self.keyframe_frame_indices: List[int] = []

    # Parallel-BA machinery (bad_slam.cc:1160-1313): a keyframe queue with
    # relative poses for post-BA fixup, an iteration-options queue, and the
    # BA thread. Shared state is guarded by _ba_lock (ba_thread_mutex_).
    import threading
    self._ba_lock = threading.Lock()
    self._ba_condition = threading.Condition(self._ba_lock)
    # SPMD submission serializer (mesh mode only): two host threads
    # dispatching multi-device programs concurrently can enqueue them in
    # DIFFERENT per-device orders — device 0 runs program A first while
    # device 1 runs B first — deadlocking the collective rendezvous
    # (measured deterministically on XLA:CPU's in-process rendezvous; the
    # inconsistent-submission-order hazard is backend-independent).
    # Dispatch is async, so the lock covers SUBMISSION only — execution
    # still overlaps across threads. Innermost lock: acquired after
    # _pl_map_lock / _ba_lock, never before. RLock: the closure program
    # dispatches inside the (locked) keyframe-creation dispatch region.
    self._spmd_dispatch_lock = threading.RLock()
    self._queued_keyframes: List[tuple] = []  # (processed, frame_idx, rel_T)
    self._parallel_iteration_queue: List[dict] = []
    self._merge_requested = False  # watchdog merge, executed by the BA thread
    self._quit_requested = False
    self._ba_busy = False  # True while the BA thread runs a popped iteration
    self._ba_thread = None
    # Pipelined (transfer-free) front-end: the per-frame state machine stays
    # on device (slam/pipelined.py). Implies sequential BA — the BA thread's
    # keyframe-queue fixup reads poses back per keyframe.
    self._pipelined = bool(config.pipelined_frontend)
    self._pl_concurrent_ba = bool(config.pipelined_frontend
                                  and config.pipelined_concurrent_ba
                                  and config.estimate_poses)
    if self._pipelined:
      from badslam_tpu.slam import pipelined
      self._pl = pipelined.PipelinedState(len(rgbd_video.frames))
      if config.parallel_ba and not self._pl_concurrent_ba:
        log.info("pipelined_frontend: forcing sequential BA "
                 "(--pipelined_concurrent_ba moves BA off the frame path)")
    self._parallel = bool(config.parallel_ba and config.estimate_poses
                          and not self._pipelined)
    if self._pl_concurrent_ba:
      # Concurrent transfer-free BA (config.pipelined_concurrent_ba): a
      # dedicated thread owns the MAP WRITES for BA iterations; the main
      # thread's map writes (keyframe registration, device closures) and
      # map READS that must see a consistent keyframe set take
      # _pl_map_lock. The thread performs no device->host transfer — the
      # readback guard holds across both threads (test_pipelined.py).
      self._pl_map_lock = threading.Lock()
      self._pl_ba_queue: List[dict] = []
      self._pl_ba_busy = False
      self._pl_ba_thread = threading.Thread(
          target=self._pl_ba_thread_main, name="pl_ba_thread", daemon=True)
      self._pl_ba_thread.start()
      import atexit
      atexit.register(self.stop_ba_thread_and_wait)
    else:
      self._pl_map_lock = None
      self._pl_ba_thread = None
    if self._parallel:
      self._ba_thread = threading.Thread(
          target=self._ba_thread_main, name="ba_thread", daemon=True)
      self._ba_thread.start()
      # Stop the thread cleanly before interpreter teardown — a daemon
      # thread killed mid-XLA-call aborts the process with a C++ exception.
      import atexit
      atexit.register(self.stop_ba_thread_and_wait)

  # --- per-frame pipeline ---

  def process_frame(self, frame_index: int, force_keyframe: bool = False):
    """ProcessFrame (bad_slam.cc:170-279), sequential-BA path."""
    if self._pipelined:
      return self._process_frame_pipelined(frame_index, force_keyframe)
    cfg = self.config
    video = self.rgbd_video

    # Frame timer + real-time target bookkeeping (bad_slam.cc:180-183; the
    # reference starts the timer after image I/O — here preprocessing loads
    # lazily, so I/O is included unless the prefetcher already hid it).
    import time as _time
    self._frame_timer_start = _time.perf_counter()
    if cfg.target_frame_rate > 0:
      self._target_frame_end_time += 1.0 / cfg.target_frame_rate

    with Timing.time("Preprocessing"):
      processed = self.preprocess_frame(frame_index)

    self.pose_estimated = False
    if cfg.estimate_poses and self.base_kf_images is not None:
      with Timing.time("Odometry"):
        self.run_odometry(frame_index, processed)
      self.pose_estimated = True

    if not self.pose_estimated:
      # No odometry ran (first frame or mapping-only mode): the frame still
      # counts as processed for trajectory export / deformation bounds.
      with self._ba_lock:
        self.last_frame_index = max(self.last_frame_index, frame_index)

    create_keyframe = (
        force_keyframe or
        ((frame_index - cfg.start_frame) % cfg.keyframe_interval == 0))
    if create_keyframe:
      with Timing.time("Keyframe creation"):
        self.create_keyframe(frame_index, processed)
    self.keyframe_created = create_keyframe

    if self.num_planned_ba_iterations > 0:
      # Real-time budget: only start sequential BA when there is frame time
      # left (bad_slam.cc:213-219).
      start_ba = True
      if not self._parallel and cfg.target_frame_rate > 0:
        elapsed = _time.perf_counter() - self._frame_timer_start
        start_ba = (self._actual_frame_start_time + elapsed
                    < self._target_frame_end_time)
      if not start_ba:
        return
      self.ba_counter += 1
      with self._ba_lock:
        k = self.direct_ba.keyframe_count + len(self._queued_keyframes)
      optimize_depth_intrinsics = (
          cfg.optimize_intrinsics and k >= 10 and
          (k <= 20 or self.ba_counter % cfg.intrinsics_optimization_interval == 0))
      if self._parallel:
        self.start_parallel_iterations(
            self.num_planned_ba_iterations,
            optimize_depth_intrinsics and cfg.use_geometric_residuals,
            optimize_depth_intrinsics and cfg.use_photometric_residuals)
        self.num_planned_ba_iterations = 0
      else:
        deadline = None
        if cfg.target_frame_rate > 0:
          # Remaining frame-time budget as an absolute deadline
          # (bad_slam.cc:269: target_frame_end_time_ - actual_frame_start_time_).
          deadline = (self._frame_timer_start
                      + (self._target_frame_end_time
                         - self._actual_frame_start_time))
        iterations_done, converged = self.run_bundle_adjustment(
            optimize_depth_intrinsics and cfg.use_geometric_residuals,
            optimize_depth_intrinsics and cfg.use_photometric_residuals,
            self.num_planned_ba_iterations,
            deadline=deadline,
            increase_ba_iteration_count=(cfg.target_frame_rate == 0))
        if converged:
          self.num_planned_ba_iterations = 0
        else:
          self.num_planned_ba_iterations = max(
              0, self.num_planned_ba_iterations - iterations_done)

  def end_frame(self):
    """EndFrame (bad_slam.cc:449-479): pace playback to fps_restriction; in
    real-time mode (target_frame_rate > 0) allow catching up when behind."""
    import time as _time
    if self._frame_timer_start is None:
      return
    actual_frame_time = _time.perf_counter() - self._frame_timer_start
    cfg = self.config
    if cfg.fps_restriction > 0:
      min_frame_time = 1.0 / cfg.fps_restriction
      if cfg.target_frame_rate > 0:
        min_frame_time = min(
            min_frame_time,
            self._target_frame_end_time - self._actual_frame_start_time)
      if actual_frame_time < min_frame_time:
        _time.sleep(min_frame_time - actual_frame_time)
        self._actual_frame_start_time += min_frame_time
      else:
        self._actual_frame_start_time += actual_frame_time
    else:
      self._actual_frame_start_time += actual_frame_time
      if self._actual_frame_start_time < self._target_frame_end_time:
        # Simulate real-time without actually sleeping.
        self._actual_frame_start_time = self._target_frame_end_time

  def prewarm(self, num_keyframes: int = 2,
              max_ba_keyframes: Optional[int] = None,
              compile_workers: Optional[int] = None) -> None:
    """Compile the live loop's jitted programs before the first real frame.

    Pushes (num_keyframes-1)*keyframe_interval + 3 synthetic frames of the
    dataset's exact shapes/dtypes through a THROWAWAY BadSlam sharing this
    system's config: preprocessing, every motion-model-history variant of
    tracking, keyframe creation + surfel creation, and the first BA window
    buckets compile up front instead of spiking inside the live loop. The
    reference's analog is loading the kernel-autotuning database before the
    frame loop (main.cc:437-447); on a live camera a mid-run 10-100 s
    compile drops frames, a startup one does not. Jitted programs are
    module-level — keyed by shapes + static config — so the compiles carry
    over to this instance.

    max_ba_keyframes: additionally pre-compile the programs for every
    active-window bucket and store capacity a map of that many keyframes
    passes through (the mid-run compile spikes in PERF.md): dummy keyframes
    are appended one at a time to the throwaway map, replaying the shape
    progression through DirectBA.ba_window_shape_key — one BA iteration per
    new (window bucket, keyframe capacity, surfel capacity) key, plus the
    keyframe-pose / surfel-creation / merge / device-closure programs at
    each keyframe-capacity growth. SURFEL-capacity growth is still not
    simulated: BA warm-up iterations run only on DISCARDED clones of the
    throwaway map (clone_for_prewarm), so the warm surfel store never grows
    past initial_surfel_capacity and all warmed programs compile at that
    capacity — size --initial_surfel_capacity for the expected map instead,
    or an under-sized store still compiles mid-run.

    compile_workers: the shape-key targets are independent programs, so
    their first-call compiles run on a thread pool (default min(4, targets))
    — the XLA compile service handles concurrent requests, turning the
    serial sum of per-bucket compile times into roughly the max. Pass 1 to
    force the serial order.

    Transfer-free: the warmup uses exactly the code paths the readback
    guard in tests/test_pipelined.py enforces (BA iterations run in
    transfer_free mode), so in pipelined mode it does not knock the tunnel
    out of pipelined dispatch.
    """
    import dataclasses
    from badslam_tpu.utils import synthetic

    video = self.rgbd_video
    if (video.depth_camera.width, video.depth_camera.height) != (
        video.color_camera.width, video.color_camera.height):
      # Unreachable through load_tum_dataset (one calibration for both
      # streams); live inputs with mismatched resolutions are out of scope
      # (PARITY.md), so the warm-data generator only renders one size.
      log.warning("prewarm: depth/color camera sizes differ — skipping")
      return
    cfg = dataclasses.replace(
        self.config, enable_loop_detection=False, parallel_ba=False,
        start_frame=0, fps_restriction=0, target_frame_rate=0)
    # PRE-SIZE the live keyframe store to the prewarm target: every
    # intermediate capacity is a full set of compiled program shapes, so a
    # run that would grow 16 -> 32 -> 64 pays three shape sets where a
    # pre-sized store pays one. Combined with the active-window gather
    # being disabled on TPU (DirectBA._window_enabled), the prewarm compile
    # surface collapses to ONE shape set per program.
    if max_ba_keyframes and self.direct_ba.keyframe_count == 0:
      self.direct_ba.reserve_keyframe_capacity(max_ba_keyframes)
      cfg = dataclasses.replace(
          cfg, initial_keyframe_capacity=self.direct_ba.kf.capacity)
    n = (max(1, num_keyframes) - 1) * max(1, cfg.keyframe_interval) + 3
    step = 0.004
    traj = []
    for i in range(n):
      T = np.eye(4, dtype=np.float32)
      T[0, 3] = step * i
      traj.append(T)
    warm_video = synthetic.make_heightmap_video(
        video.depth_camera, traj,
        raw_to_float_depth=video.raw_to_float_depth)
    import time as _time
    breakdown = {}  # phase -> seconds (per-shape compile-time evidence)
    t_build = _time.perf_counter()
    warm = BadSlam(cfg, warm_video, mesh=self.direct_ba.mesh)
    if warm._pipelined:
      # track_frame's compile is keyed on the trajectory buffer's shape:
      # the warm buffer must match the real run's frame count — which also
      # bounds how many warm frames can be recorded.
      from badslam_tpu.slam import pipelined
      warm._pl = pipelined.PipelinedState(video.frame_count())
      n = min(n, video.frame_count())
    breakdown["build_warm_system"] = _time.perf_counter() - t_build
    for i in range(n):
      t_f = _time.perf_counter()
      warm.process_frame(i)
      dt = _time.perf_counter() - t_f
      # Attribute slow frames (first-call compiles) individually.
      if dt > 1.0:
        breakdown[f"warm_frame_{i}"] = dt
    warm.stop_ba_thread_and_wait()

    # Remaining compile targets are INDEPENDENT programs (one per
    # (window bucket, keyframe capacity) shape key + the capacity-keyed
    # closure/keyframe-pose programs), so they compile concurrently: the
    # map growth below snapshots the throwaway DirectBA at each shape-key
    # change (clone_for_prewarm — device arrays shared, host mirrors
    # copied) and a thread pool drives the first-call compiles in
    # parallel. The remote XLA compile service serves the requests
    # concurrently; serially this was the dominant share of a ~6-minute
    # 640x480 prewarm.
    tasks: List = []
    warm_pl_hist = warm._pl.hist if warm._pipelined else None

    # Device-closure program at the initial capacity (it otherwise compiles
    # at the first loop candidate — mid-run, deep into the sequence).
    ba0 = warm.direct_ba.clone_for_prewarm()
    tasks.append(lambda c=ba0: self._prewarm_closure_program(c))

    if max_ba_keyframes is not None:
      ba_w = warm.direct_ba
      processed = warm.base_kf_images
      seen_shapes = {ba_w.ba_window_shape_key(ba_w.keyframe_count)}
      # Capacities whose capacity-keyed programs (keyframe_pose, surfel
      # creation, merge, device closure) are already compiled — the frame
      # loop above covered the initial one.
      warmed_caps = {ba_w.kf.capacity}
      fi = n
      while ba_w.keyframe_count < max_ba_keyframes:
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 2e-3 * ba_w.keyframe_count
        ba_w.add_keyframe(
            processed.depth, processed.normals, processed.radius_sq,
            processed.intensity, processed.rgb, jnp.asarray(T), fi)
        fi += 1
        count = ba_w.keyframe_count
        cap_grew = ba_w.kf.capacity not in warmed_caps
        if cap_grew:
          warmed_caps.add(ba_w.kf.capacity)
        if warm._pipelined:
          # Edge-confidence programs are keyed on the edge array's capacity:
          # replay the growth concat + record at each capacity here (the
          # growth loop bypasses _create_keyframe_pipelined).
          from badslam_tpu.slam import pipelined
          warm._pl.ensure_edge_capacity(ba_w.kf.capacity, mesh=ba_w.mesh)
          warm._pl.edge_weight, warm._pl.fail_acc = \
              pipelined.record_edge_weight(
                  warm._pl.edge_weight, jnp.asarray(count - 1, jnp.int32),
                  warm._pl.fail_acc)
        key = ba_w.ba_window_shape_key(count)
        if key in seen_shapes and not cap_grew:
          continue
        seen_shapes.add(key)
        # Surfel creation + merge are keyframe-capacity-keyed (observation
        # filtering runs over the covisible keyframe stacks): run them
        # through the real BA path once per grown capacity. The pipelined
        # growth path is transfer-free by design (_ensure_surfel_capacity),
        # so this keeps the tunnel in pipelined dispatch.
        clone = ba_w.clone_for_prewarm()

        def _warm_target(c=clone, count=count, cap_grew=cap_grew):
          if cap_grew:
            if warm_pl_hist is not None:
              from badslam_tpu.slam import pipelined
              # keyframe_pose is keyed on the pose stack's capacity.
              pipelined.keyframe_pose(c.kf.global_T_frame,
                                      jnp.asarray(0, jnp.int32),
                                      warm_pl_hist)
            self._prewarm_closure_program(c)
          c.bundle_adjustment(
              optimize_depth_intrinsics=(
                  cfg.optimize_intrinsics and count >= 10
                  and cfg.use_geometric_residuals),
              optimize_color_intrinsics=(
                  cfg.optimize_intrinsics and count >= 10
                  and cfg.use_photometric_residuals),
              do_surfel_updates=(cfg.do_surfel_updates and cap_grew),
              optimize_poses=True, optimize_geometry=True,
              min_iterations=0, max_iterations=1,
              active_keyframe_window_start=0,
              active_keyframe_window_end=count - 1,
              increase_ba_iteration_count=False,
              transfer_free=True)

        tasks.append(_warm_target)

    t_tasks = _time.perf_counter()
    if compile_workers is None:
      compile_workers = min(4, len(tasks))
    if compile_workers > 1 and len(tasks) > 1:
      from concurrent.futures import ThreadPoolExecutor
      with ThreadPoolExecutor(max_workers=compile_workers) as pool:
        # list() propagates the first worker exception, as the serial
        # path would.
        list(pool.map(lambda t: t(), tasks))
    else:
      for t in tasks:
        t()
    breakdown[f"shape_key_tasks_x{len(tasks)}"] = (
        _time.perf_counter() - t_tasks)
    # Per-shape compile-time breakdown (round-3 verdict item 8): which
    # programs the prewarm budget actually goes to.
    self.last_prewarm_breakdown = {
        k: round(v, 1) for k, v in breakdown.items()}
    log.info("prewarm breakdown: " + ", ".join(
        f"{k}={v:.1f}s" for k, v in sorted(
            breakdown.items(), key=lambda kv: -kv[1]) if v >= 1.0))

  def _prewarm_closure_program(self, ba_w) -> None:
    """Compile loop/device_closure.verify_and_close for warm's current
    keyframe-store capacity (its executable is keyed on the store capacity
    and the padded odometry-edge list, capacity - 1)."""
    if not (self._pipelined and self.config.enable_loop_detection
            and ba_w.keyframe_count >= 2):
      return
    from badslam_tpu.loop import device_closure
    cfg = self.config
    w_, h_ = ba_w.depth_size
    e_cap = max(1, ba_w.kf.capacity - 1)
    kb = device_closure.KEYPOINT_BUCKET
    lc = device_closure.LOOP_EDGE_BUCKET
    res = device_closure.verify_and_close(
        ba_w.kf, ba_w.depth_intr, ba_w.a, ba_w.cfactor, ba_w.baseline_fx,
        jnp.asarray(1, jnp.int32), jnp.asarray(0, jnp.int32),
        jnp.asarray(1, jnp.int32), jnp.asarray(1, jnp.int32),
        jnp.eye(4, dtype=jnp.float32),
        jnp.zeros((kb, 3), jnp.float32), jnp.zeros((kb,), bool),
        jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32),
        jnp.zeros((e_cap,), jnp.int32), jnp.zeros((e_cap,), jnp.int32),
        jnp.zeros((e_cap,), jnp.float32),
        jnp.ones((ba_w.kf.capacity,), jnp.float32),
        jnp.zeros((lc,), jnp.int32), jnp.zeros((lc,), jnp.int32),
        jnp.tile(jnp.eye(4, dtype=jnp.float32), (lc, 1, 1)),
        jnp.zeros((lc,), jnp.float32), jnp.asarray(0, jnp.int32),
        width=w_, height=h_, cell_size=ba_w.cell_size,
        num_scales=cfg.num_scales,
        use_depth_residuals=cfg.use_geometric_residuals,
        use_descriptor_residuals=cfg.use_photometric_residuals,
        convergence_threshold=cfg.odometry_convergence_threshold,
        residual_type=("gradmag" if cfg.use_gradmag_for_tracking
                       else "gradient_xy"))
    jax.block_until_ready(res.global_T_frame)

  # --- pipelined (transfer-free) front-end; see slam/pipelined.py ---

  def _spmd_dispatch(self):
    """Context guarding multi-device program SUBMISSION (see
    _spmd_dispatch_lock in __init__). Null context without a mesh — the
    single-device dispatch path needs no ordering guarantee."""
    import contextlib
    if self.direct_ba.mesh is None:
      return contextlib.nullcontext()
    return self._spmd_dispatch_lock

  def _process_frame_pipelined(self, frame_index: int,
                               force_keyframe: bool = False):
    """ProcessFrame with ZERO device->host transfers: tracking state,
    motion model, failure gates, and trajectory recording run on device;
    BA uses DirectBA's transfer_free mode. Call finalize_pipelined() after
    the run to materialize global poses."""
    from badslam_tpu.slam import pipelined
    cfg = self.config
    ba = self.direct_ba

    # Pacing bookkeeping (host-only — no transfers; see end_frame).
    import time as _time
    self._frame_timer_start = _time.perf_counter()
    if cfg.target_frame_rate > 0:
      self._target_frame_end_time += 1.0 / cfg.target_frame_rate

    with Timing.time("Preprocessing"), self._spmd_dispatch():
      processed = self.preprocess_frame(frame_index)

    self.pose_estimated = False
    if cfg.estimate_poses and self.base_kf_images is not None:
      with Timing.time("Odometry"), self._spmd_dispatch():
        base = self.base_kf_images
        w, h = ba.depth_size
        if self._tracking_failure_injected(frame_index):
          self._tracking_failed_since_kf = True  # host mirror (ADVICE r4)
        force_fail = jnp.asarray(
            1.0 if self._tracking_failure_injected(frame_index) else 0.0,
            jnp.float32)
        self._pl.hist, self._pl.traj_rel, self._pl.fail_acc = \
            pipelined.track_frame(
            base.depth, base.normals, base.intensity,
            processed.raw_depth, processed.normals, processed.intensity,
            ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
            self._pl.hist, self._pl.traj_rel,
            jnp.asarray(frame_index, jnp.int32),
            self._pl.fail_acc, force_fail,
            hist_n=min(3, self._pl.hist_n),
            width=w, height=h, cell_size=ba.cell_size,
            num_scales=cfg.num_scales,
            use_depth_residuals=cfg.use_geometric_residuals,
            use_descriptor_residuals=cfg.use_photometric_residuals,
            use_motion_model=cfg.use_motion_model,
            convergence_threshold=cfg.odometry_convergence_threshold,
            residual_type=("gradmag" if cfg.use_gradmag_for_tracking
                           else "gradient_xy"),
            min_resid=max(50, (w * h) // 100),
            max_speed=float(cfg.max_translation_per_frame))
        self._pl.hist_n = min(3, self._pl.hist_n + 1)
        self._pl.traj_slot[frame_index] = self._pl.base_slot
      self.pose_estimated = True
      # Fault-injection seam (benchmarks/long_sequence.py wrappers): mutate
      # the device tracking state between tracking and keyframe creation —
      # the pipelined analog of overriding run_odometry.
      with self._spmd_dispatch():
        self._after_pipelined_tracking(frame_index)
    self.last_frame_index = max(self.last_frame_index, frame_index)

    create_keyframe = (
        force_keyframe or
        ((frame_index - cfg.start_frame) % cfg.keyframe_interval == 0))
    if create_keyframe:
      with Timing.time("Keyframe creation"):
        self._create_keyframe_pipelined(frame_index, processed)
    self.keyframe_created = create_keyframe

    # One transfer-free BA iteration per frame while budget remains — the
    # parallel-BA thread's schedule (bad_slam.cc:1268-1289); inline on the
    # main thread, or handed to the concurrent BA thread
    # (pipelined_concurrent_ba) so the frame path never waits on BA
    # dispatch.
    if self.num_planned_ba_iterations > 0 and ba.keyframe_count >= 2:
      self.ba_counter += 1
      k = ba.keyframe_count
      optimize_depth_intrinsics = (
          cfg.optimize_intrinsics and k >= 10 and
          (k <= 20 or
           self.ba_counter % cfg.intrinsics_optimization_interval == 0))
      opts = dict(
          optimize_depth_intrinsics=(optimize_depth_intrinsics
                                     and cfg.use_geometric_residuals),
          optimize_color_intrinsics=(optimize_depth_intrinsics
                                     and cfg.use_photometric_residuals),
          k=k)
      if self._pl_concurrent_ba:
        if (self._pl_ba_thread is not None
            and not self._pl_ba_thread.is_alive()):
          # The worker died on an exception: surface the stored error once,
          # then fall back to inline iterations — queueing to a dead thread
          # would silently drop all further BA work and wedge a later
          # _drain_pl_ba (ADVICE round 4).
          with self._ba_condition:
            err = getattr(self, "_pl_ba_error", None)
            self._pl_ba_error = None
            self._pl_ba_queue.clear()
          if err is not None:
            raise err
          with Timing.time("Bundle adjustment"):
            with self._pl_map_lock:
              self._run_pl_ba_iteration(opts)
        else:
          self._enqueue_pl_ba(opts)
      else:
        with Timing.time("Bundle adjustment"):
          self._run_pl_ba_iteration(opts)
      self.num_planned_ba_iterations -= 1

  def _enqueue_pl_ba(self, opts: dict) -> bool:
    """Hand one BA iteration to the concurrent-BA worker.

    Bounds the backlog, as start_parallel_iterations does: when BA is
    slower than the frame rate, excess iterations drop rather than queueing
    unboundedly behind the camera — EXCEPT loop-closure repair iterations
    (_pl_ba_repair_debt): with a warm cache the frame loop outruns BA
    dispatch, the queue sits at its cap, and a droppable repair burst is
    discarded almost entirely (measured round 5 as 21->31% run-to-run
    kidnap ATE variance). Repair debt bypasses the cap; it is bounded by
    one per-keyframe budget per dispatched closure, and whatever the run
    cannot absorb drains at finalize (the reference likewise lets the BA
    thread finish its planned iterations after the camera stops,
    bad_slam.cc:1268-1313 + main.cc final BA)."""
    cfg = self.config
    with self._ba_condition:
      repair = self._pl_ba_repair_debt > 0
      if repair:
        self._pl_ba_repair_debt -= 1
      if repair or (len(self._pl_ba_queue)
                    < 3 * cfg.max_num_ba_iterations_per_keyframe):
        self._pl_ba_queue.append(opts)
        self._ba_condition.notify_all()
        return True
      return False

  def _run_pl_ba_iteration(self, opts: dict):
    """One transfer-free BA iteration over the full store (the parallel-BA
    thread's schedule, bad_slam.cc:1268-1289). Submission of the SPMD
    programs is serialized against the frame loop's (_spmd_dispatch) so
    per-device program order stays consistent under a mesh."""
    cfg = self.config
    with self._spmd_dispatch():
      self.direct_ba.bundle_adjustment(
          optimize_depth_intrinsics=opts["optimize_depth_intrinsics"],
          optimize_color_intrinsics=opts["optimize_color_intrinsics"],
          do_surfel_updates=cfg.do_surfel_updates,
          optimize_poses=True, optimize_geometry=True,
          min_iterations=0, max_iterations=1,
          active_keyframe_window_start=0,
          active_keyframe_window_end=opts["k"] - 1,
          increase_ba_iteration_count=False,
          transfer_free=True)
      # Scheme-end delete cadence: with increase_ba_iteration_count=False
      # the counter-gated end tasks only ever ran ONCE, so the
      # min-observation / free-space-violation delete pass never re-ran
      # during a pipelined run — after a loop-closure repair moves
      # keyframes, their orphaned surfels (beyond the association band)
      # survived as permanent outliers (measured: 21k of 128k surfels >2 cm
      # off-surface on the kidnap protocol). Run the delete+radius pass (no
      # merge — that is K programs) every
      # max_num_ba_iterations_per_keyframe iterations, the reference's
      # per-scheme cadence, transfer-free. Runs under every mesh too: the
      # submission serializer above removed the XLA:CPU rendezvous
      # deadlock this cadence used to be disabled for (round-4 verdict
      # item 3).
      if cfg.do_surfel_updates:
        self._pl_ba_sched_count = getattr(self, "_pl_ba_sched_count", 0) + 1
        if (self._pl_ba_sched_count
            % max(1, cfg.max_num_ba_iterations_per_keyframe) == 0):
          self.direct_ba.perform_ba_scheme_end_tasks(
              do_surfel_updates=False, transfer_free=True)

  def _pl_ba_thread_main(self):
    """Concurrent transfer-free BA worker (pipelined_concurrent_ba): the
    BAThreadMain analog (bad_slam.cc:1192-1313) without keyframe-queue
    readbacks — keyframes are registered inline by the main thread; this
    thread only runs BA iterations, holding the map lock for each whole
    iteration (the reference holds ba_thread_mutex_ across its BA
    iteration the same way)."""
    while True:
      with self._ba_condition:
        self._pl_ba_busy = False
        while not self._pl_ba_queue and not self._quit_requested:
          self._ba_condition.wait(timeout=0.1)
        if self._quit_requested and not self._pl_ba_queue:
          return
        self._pl_ba_busy = True
        opts = self._pl_ba_queue.pop(0)
      try:
        with self._pl_map_lock:
          # The keyframe set may have grown since the request was queued;
          # the snapshot k keeps the window consistent with the planned
          # iteration (new keyframes get their own budget).
          self._run_pl_ba_iteration(opts)
      except BaseException as e:  # surface to _drain_pl_ba, don't hang it
        with self._ba_condition:
          self._pl_ba_error = e
          self._pl_ba_busy = False
          self._pl_ba_queue.clear()
        raise

  def _drain_pl_ba(self):
    """Wait until the concurrent BA thread has no queued or in-flight
    iteration (finalize/save need the final BA state). Re-raises any
    exception the BA thread died with."""
    if self._pl_ba_thread is None:
      return
    import time as _time
    while True:
      with self._ba_lock:
        err = getattr(self, "_pl_ba_error", None)
        if err is not None:
          self._pl_ba_error = None
          raise err
        if not self._pl_ba_queue and not self._pl_ba_busy:
          return
        if not self._pl_ba_thread.is_alive():
          # Dead worker with queued work and no stored error (already
          # consumed): waiting would spin forever (ADVICE round 4).
          self._pl_ba_queue.clear()
          self._pl_ba_busy = False
          raise RuntimeError(
              "concurrent BA thread died with queued iterations")
      _time.sleep(0.002)

  def _after_pipelined_tracking(self, frame_index: int):
    """Hook between tracking and keyframe creation in the pipelined loop;
    no-op by default (fault-injection wrappers override it)."""

  def _tracking_failure_injected(self, frame_index: int) -> bool:
    """Fault-injection seam: report a tracking failure for this frame (a
    covered lens / sensor blackout manifests exactly as the gate firing).
    Overridden by the kidnap/blackout harness wrappers; always False in
    production."""
    return False

  def _create_keyframe_pipelined(self, frame_index: int,
                                 processed: ProcessedFrame):
    """CreateKeyframe without readbacks: the keyframe pose is composed on
    device from the base keyframe's CURRENT store pose; loop-detection
    features come from the host image copies (the reference extracts them
    on the CPU too, bad_slam.cc:1014-1024). The memory-pressure watchdog is
    skipped — its merge ranking reads poses back; size the surfel store via
    config in pipelined runs.

    Map writes here (keyframe registration, surfel creation, device
    closures) take the map lock in concurrent-BA mode — the BA thread is
    the only other map writer and holds the same lock per iteration."""
    import contextlib
    with (self._pl_map_lock if self._pl_map_lock is not None
          else contextlib.nullcontext()):
      with self._spmd_dispatch():
        self._create_keyframe_pipelined_locked(frame_index, processed)

  def _create_keyframe_pipelined_locked(self, frame_index: int,
                                        processed: ProcessedFrame):
    from badslam_tpu.slam import pipelined
    ba = self.direct_ba
    cfg = self.config

    if ba.keyframe_count == 0 or not cfg.estimate_poses:
      # First keyframe, or mapping-only mode (--no_pose_estimation): use the
      # dataset's pose, as the host create_keyframe does — without tracking
      # the device history stays identity and composing from the base
      # keyframe would collapse all keyframes onto the first.
      pose_dev = jnp.asarray(
          self.rgbd_video.frames[frame_index].global_T_frame, jnp.float32)
    else:
      pose_dev = pipelined.keyframe_pose(
          ba.kf.global_T_frame, jnp.asarray(self._pl.base_slot, jnp.int32),
          self._pl.hist)

    idx = ba.add_keyframe(
        processed.depth, processed.normals, processed.radius_sq,
        processed.intensity, processed.rgb, pose_dev, frame_index)
    self.keyframe_frame_indices.append(frame_index)
    # Odometry-edge confidence (device, transfer-free): weak if the
    # tracking-failure gate fired since the last keyframe (constant-position
    # fallback — this edge is a guess). Consumed by the device-closure pose
    # graph so a post-blackout loop closure localizes its correction here.
    self._pl.ensure_edge_capacity(ba.kf.capacity, mesh=ba.mesh)
    self._pl.edge_weight, self._pl.fail_acc = pipelined.record_edge_weight(
        self._pl.edge_weight, jnp.asarray(idx, jnp.int32), self._pl.fail_acc)
    # Host mirror of the edge confidence (ADVICE round 4): host-side
    # consumers (state snapshots, diagnostics) see the same weak-edge
    # marking the device twin records. Injected failures are known host-side
    # exactly; device-detected failures (min-residual gate) are not visible
    # without a readback, so the mirror is a lower bound on weakness there.
    self.keyframe_edge_weight[idx] = (
        pipelined.WEAK_EDGE_WEIGHT if self._tracking_failed_since_kf
        or self._tracking_failure_injected(frame_index) else 1.0)
    self._tracking_failed_since_kf = False
    if ba.keyframe_count == 1:
      ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)
    elif not cfg.do_surfel_updates:
      ba.create_surfels_for_keyframe(idx, filter_new_surfels=True)

    if (self.loop_detector is not None
        and self._loop_detection_due(frame_index)):
      intensity, depth = self._host_detection_images(frame_index, processed)
      self.loop_detector.add_keyframe(idx, intensity, depth, self)

    # Device history rebase + host bookkeeping.
    self._pl.base_slot = idx
    self._pl.traj_slot[frame_index] = idx
    if self._pl.hist_n == 0:
      self._pl.hist_n = 1  # identity entry for the first keyframe
    else:
      self._pl.hist = pipelined.rebase_history(self._pl.hist)
    self.base_kf_index = idx
    self.base_kf_images = processed

    if cfg.estimate_poses and ba.keyframe_count >= 2:
      self.num_planned_ba_iterations += cfg.max_num_ba_iterations_per_keyframe

  def _host_detection_images(self, frame_index: int,
                             processed: ProcessedFrame):
    """Loop-detection inputs without touching device arrays: intensity and
    metric depth from the dataset's host copies (matches
    ops/image_proc.rgb_to_intensity's u8-luma quantization). Falls back to
    a device readback when input pyramid scaling is active (host images
    would no longer match the detector's camera)."""
    cfg = self.config
    if cfg.pyramid_level_for_depth == 0 and cfg.pyramid_level_for_color == 0:
      rgb = np.asarray(
          self.rgbd_video.frames[frame_index].rgb(), np.float32)
      luma = np.floor(
          0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
          + 0.5)
      intensity = np.clip(luma, 0.0, 255.0) * (1.0 / 255.0)
      depth = np.asarray(self.rgbd_video.depth_metric(frame_index),
                         np.float32)
      # Match the processed depth's validity semantics where it matters for
      # keypoints: the max-depth cutoff (processed.depth zeroes those
      # pixels; without this, pipelined closures would admit far points the
      # host path excludes). The bilateral smoothing and isolated-pixel
      # removal remain host-side deviations — sub-threshold for RANSAC's
      # 0.06 m gate.
      depth = np.where((depth > 0.0) & (depth <= cfg.max_depth), depth, 0.0)
      return intensity.astype(np.float32), depth
    return (np.asarray(processed.intensity), np.asarray(processed.depth))

  def finalize_pipelined(self):
    """Materialize global per-frame poses from the device trajectory (the
    run's only mandatory device->host transfers) into rgbd_video."""
    if not self._pipelined:
      return
    import time as _time
    from badslam_tpu.slam import pipelined
    t0 = _time.perf_counter()
    # A closure near the end of the run plans more repair iterations than
    # there are frames left to enqueue them on; flush the remaining repair
    # debt into the queue so the drain below completes the repair (the
    # analog of the reference's final BA after the camera loop,
    # main.cc:726-770).
    debt = getattr(self, "_pl_ba_repair_debt", 0)
    if (debt > 0 and self._pl_concurrent_ba
        and self._pl_ba_thread is not None
        and self._pl_ba_thread.is_alive()
        and self.direct_ba.keyframe_count >= 2):
      opts = dict(optimize_depth_intrinsics=False,
                  optimize_color_intrinsics=False,
                  k=self.direct_ba.keyframe_count)
      with self._ba_condition:
        for _ in range(debt):
          self._pl_ba_queue.append(dict(opts))
        self._pl_ba_repair_debt = 0
        self._ba_condition.notify_all()
    self._drain_pl_ba()  # final poses must include queued BA iterations
    t1 = _time.perf_counter()
    # Trajectory FIRST: the run's first device->host read performs the
    # tunnel's speculation->sync transition, and reading a plain live
    # array (traj_rel) transitions reliably; making the first read touch
    # the retained mid-run closure-result buffers instead has been seen to
    # wedge the tunnel indefinitely at 2000-frame scale.
    poses = pipelined.finalize(
        self._pl, self.direct_ba.kf.global_T_frame,
        self.keyframe_frame_indices, self.last_frame_index)
    for i, p in poses.items():
      self.rgbd_video.frames[i].global_T_frame = p
    t2 = _time.perf_counter()
    if self.loop_detector is not None:
      self.loop_detector.resolve_pending_device_events()
    log.info(f"finalize_pipelined: ba_drain {t1 - t0:.1f}s, "
             f"trajectory {t2 - t1:.1f}s, "
             f"device_events {_time.perf_counter() - t2:.1f}s")

  def preprocess_frame(self, frame_index: int) -> ProcessedFrame:
    cfg = self.config
    video = self.rgbd_video
    raw_scale = 1.0
    if (cfg.median_filter_and_densify_iterations == 0
        and cfg.pyramid_level_for_depth == 0):
      # Hot path: upload the u16 sensor counts as-is and convert to metric
      # on device — half the depth H2D bytes of the f32 path.
      raw = video.frames[frame_index].depth_raw()
      if raw.dtype == np.uint16:
        raw_scale = float(video.raw_to_float_depth)
      else:
        raw = raw.astype(np.float32) * video.raw_to_float_depth
    else:
      raw = video.depth_metric(frame_index)
      if cfg.median_filter_and_densify_iterations > 0:
        raw = np.asarray(depth_proc.median_filter_and_densify(
            jnp.asarray(raw), cfg.median_filter_and_densify_iterations))
      if cfg.pyramid_level_for_depth > 0:
        raw = depth_proc.downscale_depth_median_excluding_invalid(
            jnp.asarray(raw), cfg.pyramid_level_for_depth)
    rgb = video.frames[frame_index].rgb()
    if cfg.pyramid_level_for_color > 0:
      rgb = depth_proc.downscale_rgb(jnp.asarray(rgb),
                                     cfg.pyramid_level_for_color)
    ba = self.direct_ba
    w, h = ba.depth_size
    use_pallas = self._use_pallas_preprocess
    if use_pallas is None:
      from badslam_tpu.ops import pallas_preprocess
      use_pallas = pallas_preprocess.should_use(h, w)
      self._use_pallas_preprocess = use_pallas
    return _preprocess_jit(
        jnp.asarray(raw), jnp.asarray(rgb), ba.depth_intr, ba.a, ba.cfactor,
        w, h, ba.cell_size,
        cfg.bilateral_filter_sigma_xy, cfg.bilateral_filter_sigma_inv_depth,
        cfg.bilateral_filter_radius_factor, cfg.max_depth,
        use_pallas=use_pallas, raw_scale=raw_scale)

  def predict_frame_pose(self) -> Tuple[np.ndarray, np.ndarray]:
    """Two constant-velocity hypotheses (bad_slam.cc:763-825), as
    base_kf_T_frame estimates."""
    hist = self.base_kf_tr_frame
    inv_hist = self.frame_tr_base_kf
    n = len(hist)
    if self.config.use_motion_model:
      if n >= 2:
        est1 = hist[n - 1] @ inv_hist[n - 2] @ hist[n - 1]
      else:
        est1 = hist[n - 1]
      if n >= 3:
        prev_T_last = inv_hist[n - 3] @ hist[n - 2]
        est2 = hist[n - 2] @ prev_T_last @ prev_T_last
      else:
        est2 = est1
    else:
      est1 = hist[n - 1]
      est2 = est1
    # Divergence guard (the reference surfaces this as a debug prompt,
    # pairwise_frame_tracking.cc:649-669): a non-finite or absurd prediction
    # must not poison tracking — fall back to the last relative pose.
    def sane(e):
      if not np.isfinite(e).all() or np.linalg.norm(e[:3, 3]) > 10.0:
        return hist[n - 1] if np.isfinite(hist[n - 1]).all() else \
            np.eye(4, dtype=np.float32)
      # The motion model squares relative poses, which doubles any rotation-
      # block defect per frame (see se3_np.orthonormalize); renormalize so
      # the tracker starts from a true rigid transform.
      return se3_np.orthonormalize(e)
    return sane(est1), sane(est2)

  def run_odometry(self, frame_index: int, processed: ProcessedFrame):
    """RunOdometry (bad_slam.cc:827-951)."""
    ba = self.direct_ba
    cfg = self.config
    est1, est2 = self.predict_frame_pose()
    w, h = ba.depth_size

    base = self.base_kf_images
    base_T_frame, n_resid = _odometry_jit(
        base.depth, base.normals, base.intensity,
        processed.raw_depth, processed.normals, processed.intensity,
        ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
        jnp.asarray(est1), jnp.asarray(est2),
        w, h, ba.cell_size, cfg.num_scales,
        cfg.use_geometric_residuals, cfg.use_photometric_residuals,
        True, cfg.odometry_convergence_threshold,
        "gradmag" if cfg.use_gradmag_for_tracking else "gradient_xy")
    # Renormalize the tracker output: GN updates (init @ exp(x)) preserve any
    # non-orthonormality of the init, and this result feeds back into the
    # motion-model history (the round-1 divergence cascade; se3_np
    # .orthonormalize docstring).
    base_T_frame = se3_np.orthonormalize(np.asarray(base_T_frame))
    n_resid = int(n_resid)
    # Tracking-failure gate. If the final GN iteration associated almost no
    # pixels, the estimate never re-entered the association basin: GN was a
    # no-op around a bad initialization and the "result" is just that
    # initialization. The reference silently accepts this (and its two-
    # hypothesis TOTAL-cost heuristic can then prefer the low-residual
    # garbage), which lets the constant-velocity motion model double the
    # error every frame until overflow — its README flags this instability.
    # Here: fall back to the last ACCEPTED relative pose (constant-position
    # model), which also zeroes the implied velocity and breaks the feedback.
    min_resid = max(50, (w * h) // 100)  # 1% of level-0 pixels
    prev_rel = (self.base_kf_tr_frame[-1] if self.base_kf_tr_frame
                else np.eye(4, dtype=np.float32))
    frame_speed = float(np.linalg.norm(base_T_frame[:3, 3] - prev_rel[:3, 3]))
    if (not np.isfinite(base_T_frame).all() or n_resid < min_resid
        or frame_speed > cfg.max_translation_per_frame
        or self._tracking_failure_injected(frame_index)):
      log.warning(f"tracking failed at frame {frame_index} "
            f"({n_resid} residuals, {frame_speed:.2f} m moved); "
            "holding last pose")
      base_T_frame = prev_rel
      self._tracking_failed_since_kf = True

    with self._ba_lock:
      new_global_T_frame = self.base_kf_global_T_frame @ base_T_frame
      self.rgbd_video.frames[frame_index].global_T_frame = new_global_T_frame
      self.last_frame_index = frame_index

    if len(self.base_kf_tr_frame) >= 3:
      self.base_kf_tr_frame.pop(0)
      self.frame_tr_base_kf.pop(0)
    self.base_kf_tr_frame.append(base_T_frame)
    self.frame_tr_base_kf.append(se3_np.inverse(base_T_frame))

  def _add_keyframe_to_ba(self, processed: ProcessedFrame, frame_index: int,
                          global_T_frame: np.ndarray,
                          run_loop_detection: bool,
                          edge_weight: float = 1.0) -> int:
    """AddKeyframeToBA (bad_slam.cc:1120-1158): register in the store, run
    loop closing, create first-keyframe surfels. Caller must NOT hold
    _ba_lock (loop closing re-enters SLAM state). `run_loop_detection` was
    decided at keyframe-creation time on the main thread so the parallel
    detection queue and this closing call stay paired 1:1."""
    ba = self.direct_ba
    idx = ba.add_keyframe(
        processed.depth, processed.normals, processed.radius_sq,
        processed.intensity, processed.rgb,
        jnp.asarray(global_T_frame), frame_index)
    self.keyframe_frame_indices.append(frame_index)
    self.keyframe_edge_weight[idx] = edge_weight
    if ba.keyframe_count == 1:
      # First keyframe: create surfels unfiltered (bad_slam.cc:1087-1094).
      ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)
    elif not self.config.do_surfel_updates:
      ba.create_surfels_for_keyframe(idx, filter_new_surfels=True)
    if run_loop_detection:
      self.loop_detector.add_keyframe(
          idx, np.asarray(processed.intensity),
          np.asarray(processed.depth), self)
    return idx

  def _loop_detection_due(self, frame_index: int) -> bool:
    """Throttle loop detection to loop_detection_image_frequency
    (bad_slam_config.h:367-370: defaults to the keyframe rate, i.e. every
    keyframe; lower values subsample). The keyframe rate derives from the
    DATASET's frame rate (not a hardcoded 30) as the reference does."""
    dataset_fps = getattr(self, "_dataset_fps", None)
    if dataset_fps is None:
      dataset_fps = self._dataset_fps = self.rgbd_video.fps()
    freq = self.config.get_loop_detection_image_frequency(dataset_fps)
    kf_freq = dataset_fps / max(1, self.config.keyframe_interval)
    if freq >= kf_freq:
      return True
    interval = max(1, int(round(kf_freq / max(freq, 1e-6))))
    self._loop_detection_counter = getattr(
        self, "_loop_detection_counter", -1) + 1
    return self._loop_detection_counter % interval == 0

  def _device_memory_stats(self):
    """Seam for the watchdog's memory read (tests inject fake stats; CPU
    backends often report none)."""
    try:
      return jax.local_devices()[0].memory_stats()
    except Exception:
      return None

  def _check_memory_pressure(self):
    """Low-HBM watchdog (bad_slam.cc:958-968): merge keyframes when free
    device memory drops below min_free_gpu_memory_mb + ~one keyframe."""
    approx_keyframe_bytes = 4 * 1024 * 1024  # kApproxKeyframeSize
    stats = self._device_memory_stats()
    if not stats:
      return
    limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    used = stats.get("bytes_in_use")
    if not limit or used is None:
      return
    free = limit - used
    if free < (self.config.min_free_gpu_memory_mb * 1024 * 1024
               + approx_keyframe_bytes):
      self.request_keyframe_merge()

  def request_keyframe_merge(self):
    """Memory-pressure keyframe merge. Map state (kf/surfel stores) has a
    SINGLE writer: the BA thread in parallel mode (sequential mode: the main
    thread). A merge from the watchdog must therefore be routed to the BA
    thread — mutating self.direct_ba.kf concurrently with the BA scheme's
    read-modify-write phases would silently lose one side's update (the
    reference serializes the same way via ba_thread_mutex_ held across the
    BA iteration, bad_slam.cc:1273-1289)."""
    if self._parallel:
      with self._ba_condition:
        self._merge_requested = True
        self._ba_condition.notify_all()
    else:
      deleted = self.direct_ba.merge_keyframes(self.loop_detector)
      self.num_keyframes_merged += deleted
      if deleted:
        log.warning(f"low device memory; merged {deleted} keyframe(s)")

  def create_keyframe(self, frame_index: int, processed: ProcessedFrame):
    """CreateKeyframe (bad_slam.cc:953-1097)."""
    ba = self.direct_ba
    cfg = self.config
    self._check_memory_pressure()
    global_T_frame = self.rgbd_video.frames[frame_index].global_T_frame

    # Relative pose of this keyframe wrt the previous one, for the BA
    # thread's absolute-pose fixup (bad_slam.cc:1035-1037,1229-1231).
    last_kf_T_this = (self.base_kf_tr_frame[-1] if self.base_kf_tr_frame
                      else np.eye(4, dtype=np.float32))

    # Loop detection decision + queueing happen here on the main thread
    # (bad_slam.cc:1016-1023): with parallel detection the feature
    # extraction/database query runs ahead on its own thread while the
    # keyframe waits in the BA queue; the closing stays with
    # _add_keyframe_to_ba.
    run_loop_detection = (self.loop_detector is not None
                          and self._loop_detection_due(frame_index))
    if run_loop_detection and self.loop_detector.parallel:
      self.loop_detector.queue_for_detection(
          np.asarray(processed.intensity), np.asarray(processed.depth))

    # Odometry-edge confidence: weak if the gate fired since the last
    # keyframe (this edge's relative pose is a constant-position guess).
    from badslam_tpu.slam.pipelined import WEAK_EDGE_WEIGHT
    edge_weight = (WEAK_EDGE_WEIGHT if self._tracking_failed_since_kf
                   else 1.0)
    self._tracking_failed_since_kf = False

    if self._parallel:
      with self._ba_lock:
        self._queued_keyframes.append(
            (processed, frame_index, last_kf_T_this, run_loop_detection,
             edge_weight))
        keyframes_added = (len(self._queued_keyframes)
                           + ba.keyframe_count)
        self.base_kf_index = None  # resolved when the BA thread adds it
        self.base_kf_global_T_frame = np.asarray(global_T_frame)
    else:
      idx = self._add_keyframe_to_ba(processed, frame_index, global_T_frame,
                                     run_loop_detection, edge_weight)
      self.base_kf_index = idx
      self.base_kf_global_T_frame = np.asarray(global_T_frame)
      keyframes_added = ba.keyframe_count

    self.base_kf_images = processed

    # Rebase the motion-model history onto the new base keyframe
    # (bad_slam.cc:1062-1075).
    if self.base_kf_tr_frame:
      last = self.base_kf_tr_frame[-1]
      last_inv = self.frame_tr_base_kf[-1]
      for k in range(len(self.base_kf_tr_frame) - 1):
        self.frame_tr_base_kf[k] = se3_np.orthonormalize(
            self.frame_tr_base_kf[k] @ last)
        self.base_kf_tr_frame[k] = se3_np.orthonormalize(
            last_inv @ self.base_kf_tr_frame[k])
      self.base_kf_tr_frame[-1] = np.eye(4, dtype=np.float32)
      self.frame_tr_base_kf[-1] = np.eye(4, dtype=np.float32)
    else:
      self.base_kf_tr_frame.append(np.eye(4, dtype=np.float32))
      self.frame_tr_base_kf.append(np.eye(4, dtype=np.float32))

    if not cfg.estimate_poses:
      return

    if keyframes_added >= 2:
      self.num_planned_ba_iterations += cfg.max_num_ba_iterations_per_keyframe

  # --- parallel BA (BAThreadMain, bad_slam.cc:1160-1313) ---

  def start_parallel_iterations(self, num_planned: int,
                                optimize_depth_intrinsics: bool,
                                optimize_color_intrinsics: bool):
    """StartParallelIterations (bad_slam.cc:1160-1190): enqueue up to
    max_num_ba_iterations_per_keyframe iteration requests."""
    options = dict(
        optimize_depth_intrinsics=optimize_depth_intrinsics,
        optimize_color_intrinsics=optimize_color_intrinsics,
        do_surfel_updates=self.config.do_surfel_updates,
    )
    with self._ba_condition:
      cap = self.config.max_num_ba_iterations_per_keyframe
      to_queue = min(cap - len(self._parallel_iteration_queue), num_planned)
      for _ in range(max(0, to_queue)):
        self._parallel_iteration_queue.append(options)
      self._ba_condition.notify_all()

  def _drain_keyframe_queue_locked(self):
    """Register queued keyframes with absolute-pose fixup from the relative
    pose (the last registered keyframe may have moved during BA). Must be
    called with _ba_lock HELD; releases and re-acquires it around the
    registration work."""
    if DEBUG_LOCKING:
      log.check(self._ba_lock.locked(),
                "_drain_keyframe_queue_locked requires _ba_lock")
    while self._queued_keyframes:
      (processed, frame_index, last_kf_T_this,
       run_loop_detection, edge_weight) = self._queued_keyframes.pop(0)
      ba = self.direct_ba
      if ba.keyframe_count > 0:
        last_slot = ba.keyframe_count - 1
        last_pose = np.asarray(ba.kf.global_T_frame)[last_slot]
        global_T_frame = last_pose @ last_kf_T_this
      else:
        global_T_frame = self.rgbd_video.frames[frame_index].global_T_frame
      self._ba_lock.release()
      try:
        idx = self._add_keyframe_to_ba(processed, frame_index, global_T_frame,
                                       run_loop_detection, edge_weight)
      finally:
        self._ba_lock.acquire()
      self.rgbd_video.frames[frame_index].global_T_frame = \
          np.asarray(global_T_frame)
      if self._queued_keyframes == [] and self.base_kf_index is None:
        self.base_kf_index = idx
        self.base_kf_global_T_frame = np.asarray(global_T_frame)

  def _ba_thread_main(self):
    while True:
      with self._ba_condition:
        self._ba_busy = False
        while (not self._parallel_iteration_queue
               and not self._merge_requested and not self._quit_requested):
          self._ba_condition.wait(timeout=0.1)
        if self._quit_requested:
          return
        self._ba_busy = True
        # A merge request alone (empty iteration queue) still wakes the
        # thread: memory pressure must be serviced even when no BA
        # iterations are planned.
        options = (self._parallel_iteration_queue.pop(0)
                   if self._parallel_iteration_queue else None)
        merge_requested = self._merge_requested
        self._merge_requested = False

      # Merge BEFORE draining the keyframe queue so the memory is freed
      # before the queued keyframes' device stacks are allocated — the
      # reference's watchdog likewise merges ahead of the new keyframe's
      # allocation (bad_slam.cc:958-997). Map-state writes are safe off the
      # lock: this thread is the single map writer in parallel mode.
      if merge_requested:
        deleted = self.direct_ba.merge_keyframes(self.loop_detector)
        self.num_keyframes_merged += deleted
        if deleted:
          log.warning(f"low device memory; merged {deleted} keyframe(s)")

      with self._ba_lock:
        self._drain_keyframe_queue_locked()
        original = np.asarray(self.direct_ba.kf.global_T_frame).copy()

      if options is None:
        continue

      # One BA iteration over all keyframes (the BA thread never uses
      # deactivation or PCG, bad_slam.cc:1268-1289).
      k = self.direct_ba.keyframe_count
      if k >= 2:
        self.direct_ba.bundle_adjustment(
            optimize_depth_intrinsics=options["optimize_depth_intrinsics"],
            optimize_color_intrinsics=options["optimize_color_intrinsics"],
            do_surfel_updates=options["do_surfel_updates"],
            optimize_poses=True, optimize_geometry=True,
            min_iterations=0, max_iterations=1,
            active_keyframe_window_start=0,
            active_keyframe_window_end=k - 1,
            increase_ba_iteration_count=False)


      # Trajectory deformation + base keyframe pose refresh
      # (bad_slam.cc:1291-1300).
      self._apply_trajectory_deformation(original)

  def quiesce(self):
    """Wait until the parallel BA thread has no queued iterations and no
    iteration in flight, then register any keyframes still waiting in the
    queue — WITHOUT stopping the thread. State readers that need a
    consistent full snapshot mid-run (save_state) call this; otherwise a
    keyframe queued but not yet registered (e.g. while the BA jits are
    still compiling) would silently be missing from the snapshot."""
    if self._ba_thread is None:
      return
    import time as _time
    while True:
      with self._ba_lock:
        if not self._parallel_iteration_queue and not self._ba_busy:
          self._drain_keyframe_queue_locked()
          return
      _time.sleep(0.005)

  def stop_ba_thread_and_wait(self):
    """StopBAThreadAndWaitForIt (bad_slam.h): finish queued work, stop the
    thread, and register any keyframes still in the queue."""
    if self._pl_ba_thread is not None:
      self._drain_pl_ba()
      with self._ba_condition:
        self._quit_requested = True
        self._ba_condition.notify_all()
      self._pl_ba_thread.join(timeout=300.0)
      self._pl_ba_thread = None
    if self._ba_thread is None:
      if self.loop_detector is not None:
        self.loop_detector.request_exit_and_wait()
      return
    # Let the thread drain its iteration queue first.
    import time as _time
    while True:
      with self._ba_lock:
        if not self._parallel_iteration_queue:
          break
      _time.sleep(0.01)
    with self._ba_condition:
      self._quit_requested = True
      self._ba_condition.notify_all()
    self._ba_thread.join(timeout=300.0)
    self._ba_thread = None
    with self._ba_lock:
      self._drain_keyframe_queue_locked()
    if self.loop_detector is not None:
      self.loop_detector.request_exit_and_wait()

  def run_bundle_adjustment(self, optimize_depth_intrinsics: bool,
                            optimize_color_intrinsics: bool,
                            max_iterations: int,
                            deadline: Optional[float] = None,
                            increase_ba_iteration_count: bool = True,
                            ) -> Tuple[int, bool]:
    """RunBundleAdjustment, sequential path (bad_slam.cc:481-536). In
    real-time mode the caller passes the frame deadline (perf_counter time)
    and increase_ba_iteration_count=False, as the reference does for
    target_frame_rate > 0 (bad_slam.cc:264-270)."""
    cfg = self.config
    k = self.direct_ba.keyframe_count
    original = np.asarray(self.direct_ba.kf.global_T_frame).copy()
    with Timing.time("Bundle adjustment"):
      result = self.direct_ba.bundle_adjustment(
          optimize_depth_intrinsics=optimize_depth_intrinsics,
          optimize_color_intrinsics=optimize_color_intrinsics,
          do_surfel_updates=cfg.do_surfel_updates,
          optimize_poses=True,
          optimize_geometry=True,
          min_iterations=0,
          max_iterations=max_iterations,
          active_keyframe_window_start=0 if cfg.disable_deactivation else -1,
          active_keyframe_window_end=(k - 1) if cfg.disable_deactivation else -1,
          increase_ba_iteration_count=increase_ba_iteration_count,
          deadline=deadline,
      )
    # Trajectory deformation + base keyframe pose refresh after BA — the
    # sequential path does this too (bad_slam.cc:524-530).
    self._apply_trajectory_deformation(original)
    return result

  def _apply_trajectory_deformation(self, original_kf_poses: np.ndarray):
    """Propagate keyframe pose changes to non-keyframe video frames and
    refresh the cached base-keyframe pose. Caller must NOT hold _ba_lock."""
    from badslam_tpu.loop.trajectory_deformation import (
        extrapolate_and_interpolate_keyframe_pose_changes)
    with self._ba_lock:
      new_poses = np.asarray(self.direct_ba.kf.global_T_frame)
      n_kf = len(self.keyframe_frame_indices)
      if n_kf and self.last_frame_index >= 0:
        frame_poses = [f.global_T_frame for f in self.rgbd_video.frames]
        orig_frame_T_global = se3_np.inverse(original_kf_poses[:n_kf])
        for slot in range(n_kf):
          frame_poses[self.keyframe_frame_indices[slot]] = new_poses[slot]
        extrapolate_and_interpolate_keyframe_pose_changes(
            self.keyframe_frame_indices, orig_frame_T_global,
            new_poses[:n_kf], frame_poses,
            start_frame=self.config.start_frame,
            end_frame=self.last_frame_index)
        for i, p in enumerate(frame_poses):
          self.rgbd_video.frames[i].global_T_frame = p
      if self.base_kf_index is not None:
        self.base_kf_global_T_frame = new_poses[self.base_kf_index]

  def track_keyframe_pair(self, base_slot: int, tracked_slot: int,
                          base_T_tracked_init: np.ndarray) -> np.ndarray:
    """Direct multi-scale alignment between two stored keyframes (used by
    loop-closure refinement, loop_detector.cc:498-548: base = current
    keyframe, tracked = matched/prev/next keyframe; both sides use the
    keyframes' filtered depth, calibrated on the fly)."""
    ba = self.direct_ba
    cfg = self.config
    w, h = ba.depth_size
    kfs = ba.kf
    init = jnp.asarray(base_T_tracked_init)
    out = _odometry_jit(
        kfs.depth[base_slot], kfs.normals[base_slot], kfs.intensity[base_slot],
        kfs.depth[tracked_slot], kfs.normals[tracked_slot],
        kfs.intensity[tracked_slot],
        ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
        init, init,
        w, h, ba.cell_size, cfg.num_scales,
        cfg.use_geometric_residuals, cfg.use_photometric_residuals,
        True, cfg.odometry_convergence_threshold,
        "gradmag" if cfg.use_gradmag_for_tracking else "gradient_xy")
    return np.asarray(out[0])

  # --- trajectory access ---

  def update_keyframe_poses_in_video(self):
    """Write optimized keyframe poses back to the video frames."""
    poses = np.asarray(self.direct_ba.kf.global_T_frame)
    for slot, frame_index in enumerate(self.keyframe_frame_indices):
      self.rgbd_video.frames[frame_index].global_T_frame = poses[slot]

  def trajectory(self) -> Tuple[List[float], List[np.ndarray]]:
    """(timestamps, global_T_frame) for all processed frames."""
    ts, poses = [], []
    for f in self.rgbd_video.frames[: self.last_frame_index + 1]:
      ts.append(f.depth_timestamp)
      poses.append(f.global_T_frame)
    return ts, poses
