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
from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.io.dataset import RGBDVideo
from badslam_tpu.models import odometry as odometry_mod
from badslam_tpu.ops import depth_model, depth_proc, image_proc
from badslam_tpu.ops.pyramid import FramePyramidLevel, build_pyramid
from badslam_tpu.slam.direct_ba import DirectBA, make_camera
from badslam_tpu.utils.timing import Timing


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
                     "sigma_inv_depth", "radius_factor", "max_depth"))
def _preprocess_jit(
    raw_depth, rgb, depth_intr, a, cfactor,
    width: int, height: int, cell_size: int,
    sigma_xy: float, sigma_inv_depth: float, radius_factor: float,
    max_depth: float,
) -> ProcessedFrame:
  """PreprocessFrame GPU part (bad_slam.cc:688-761): brightness, bilateral
  filter + cutoff, normals, radii/isolated-pixel removal."""
  cam = make_camera(depth_intr, width, height)
  intensity = image_proc.rgb_to_intensity(rgb)
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
                     "use_pyramid_level_0"))
def _odometry_jit(
    base_depth, base_normals, base_intensity,
    tracked_raw_depth, tracked_normals, tracked_intensity,
    depth_intr, a, cfactor, baseline_fx,
    base_T_frame_init_1, base_T_frame_init_2,
    width: int, height: int, cell_size: int, num_scales: int,
    use_depth_residuals: bool, use_descriptor_residuals: bool,
    use_pyramid_level_0: bool,
):
  """RunOdometry compute core (bad_slam.cc:827-951): calibrate both depth
  images, build pyramids, run coarse-to-fine pairwise tracking."""
  cam = make_camera(depth_intr, width, height)
  base_calib = depth_model.calibrate_depth_image(a, cfactor, base_depth,
                                                 cell_size)
  tracked_calib = depth_model.calibrate_depth_image(a, cfactor,
                                                    tracked_raw_depth,
                                                    cell_size)
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
  )


class BadSlam:
  """The system orchestrator (class BadSlam, bad_slam.h:62-363)."""

  def __init__(self, config: BadSlamConfig, rgbd_video: RGBDVideo,
               loop_detector=None):
    self.config = config
    self.rgbd_video = rgbd_video
    self.direct_ba = DirectBA(
        config, rgbd_video.depth_camera, rgbd_video.color_camera)
    if loop_detector is None and config.enable_loop_detection:
      from badslam_tpu.loop.detector import LoopDetector
      loop_detector = LoopDetector(config, rgbd_video.color_camera)
    self.loop_detector = loop_detector

    # Base-keyframe state (bad_slam.h:330+): index into the keyframe store,
    # cached pose, and the motion-model history (up to 3 relative poses).
    self.base_kf_index: Optional[int] = None
    self.base_kf_global_T_frame = np.eye(4, dtype=np.float32)
    self.base_kf_tr_frame: List[np.ndarray] = []
    self.frame_tr_base_kf: List[np.ndarray] = []

    self.num_planned_ba_iterations = 0
    self.ba_counter = 0
    self.last_frame_index = -1
    self.pose_estimated = False
    self.keyframe_created = False
    # frame_index of each keyframe slot (for trajectory deformation).
    self.keyframe_frame_indices: List[int] = []

  # --- per-frame pipeline ---

  def process_frame(self, frame_index: int, force_keyframe: bool = False):
    """ProcessFrame (bad_slam.cc:170-279), sequential-BA path."""
    cfg = self.config
    video = self.rgbd_video

    with Timing.time("Preprocessing"):
      processed = self.preprocess_frame(frame_index)

    self.pose_estimated = False
    if cfg.estimate_poses and self.base_kf_index is not None:
      with Timing.time("Odometry"):
        self.run_odometry(frame_index, processed)
      self.pose_estimated = True

    create_keyframe = (
        force_keyframe or
        ((frame_index - cfg.start_frame) % cfg.keyframe_interval == 0))
    if create_keyframe:
      with Timing.time("Keyframe creation"):
        self.create_keyframe(frame_index, processed)
    self.keyframe_created = create_keyframe

    if self.num_planned_ba_iterations > 0:
      self.ba_counter += 1
      k = self.direct_ba.keyframe_count
      optimize_depth_intrinsics = (
          cfg.optimize_intrinsics and k >= 10 and
          (k <= 20 or self.ba_counter % cfg.intrinsics_optimization_interval == 0))
      iterations_done, converged = self.run_bundle_adjustment(
          optimize_depth_intrinsics and cfg.use_geometric_residuals,
          optimize_depth_intrinsics and cfg.use_photometric_residuals,
          self.num_planned_ba_iterations)
      if converged:
        self.num_planned_ba_iterations = 0
      else:
        self.num_planned_ba_iterations = max(
            0, self.num_planned_ba_iterations - iterations_done)

  def preprocess_frame(self, frame_index: int) -> ProcessedFrame:
    cfg = self.config
    video = self.rgbd_video
    raw = video.depth_metric(frame_index)
    if cfg.median_filter_and_densify_iterations > 0:
      raw = np.asarray(depth_proc.median_filter_and_densify(
          jnp.asarray(raw), cfg.median_filter_and_densify_iterations))
    rgb = video.frames[frame_index].rgb()
    ba = self.direct_ba
    w, h = ba.depth_size
    return _preprocess_jit(
        jnp.asarray(raw), jnp.asarray(rgb), ba.depth_intr, ba.a, ba.cfactor,
        w, h, ba.cell_size,
        cfg.bilateral_filter_sigma_xy, cfg.bilateral_filter_sigma_inv_depth,
        cfg.bilateral_filter_radius_factor, cfg.max_depth)

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
    return est1, est2

  def run_odometry(self, frame_index: int, processed: ProcessedFrame):
    """RunOdometry (bad_slam.cc:827-951)."""
    ba = self.direct_ba
    cfg = self.config
    est1, est2 = self.predict_frame_pose()
    w, h = ba.depth_size

    kfs = ba.kf
    i = self.base_kf_index
    base_depth = kfs.depth[i]
    base_normals = kfs.normals[i]
    base_intensity = kfs.intensity[i]

    base_T_frame = _odometry_jit(
        base_depth, base_normals, base_intensity,
        processed.raw_depth, processed.normals, processed.intensity,
        ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
        jnp.asarray(est1), jnp.asarray(est2),
        w, h, ba.cell_size, cfg.num_scales,
        cfg.use_geometric_residuals, cfg.use_photometric_residuals,
        True)
    base_T_frame = np.asarray(base_T_frame)

    new_global_T_frame = self.base_kf_global_T_frame @ base_T_frame
    self.rgbd_video.frames[frame_index].global_T_frame = new_global_T_frame
    self.last_frame_index = frame_index

    if len(self.base_kf_tr_frame) >= 3:
      self.base_kf_tr_frame.pop(0)
      self.frame_tr_base_kf.pop(0)
    self.base_kf_tr_frame.append(base_T_frame)
    self.frame_tr_base_kf.append(
        np.asarray(se3.inverse(jnp.asarray(base_T_frame))))

  def create_keyframe(self, frame_index: int, processed: ProcessedFrame):
    """CreateKeyframe (bad_slam.cc:953-1097), sequential path."""
    ba = self.direct_ba
    cfg = self.config
    global_T_frame = self.rgbd_video.frames[frame_index].global_T_frame

    idx = ba.add_keyframe(
        processed.depth, processed.normals, processed.radius_sq,
        processed.intensity, processed.rgb,
        jnp.asarray(global_T_frame), frame_index)
    self.keyframe_frame_indices.append(frame_index)
    self.base_kf_index = idx
    self.base_kf_global_T_frame = np.asarray(global_T_frame)

    if self.loop_detector is not None:
      self.loop_detector.add_keyframe(
          idx, np.asarray(processed.intensity),
          np.asarray(processed.depth), self)

    # Rebase the motion-model history onto the new base keyframe
    # (bad_slam.cc:1062-1075).
    if self.base_kf_tr_frame:
      last = self.base_kf_tr_frame[-1]
      last_inv = self.frame_tr_base_kf[-1]
      for k in range(len(self.base_kf_tr_frame) - 1):
        self.frame_tr_base_kf[k] = self.frame_tr_base_kf[k] @ last
        self.base_kf_tr_frame[k] = last_inv @ self.base_kf_tr_frame[k]
      self.base_kf_tr_frame[-1] = np.eye(4, dtype=np.float32)
      self.frame_tr_base_kf[-1] = np.eye(4, dtype=np.float32)
    else:
      self.base_kf_tr_frame.append(np.eye(4, dtype=np.float32))
      self.frame_tr_base_kf.append(np.eye(4, dtype=np.float32))

    if not cfg.estimate_poses:
      return idx

    if ba.keyframe_count >= 2:
      if not cfg.do_surfel_updates:
        ba.create_surfels_for_keyframe(idx, filter_new_surfels=True)
      self.num_planned_ba_iterations += cfg.max_num_ba_iterations_per_keyframe
    else:
      # First keyframe: create surfels unfiltered (bad_slam.cc:1087-1094).
      ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)
    return idx

  def run_bundle_adjustment(self, optimize_depth_intrinsics: bool,
                            optimize_color_intrinsics: bool,
                            max_iterations: int) -> Tuple[int, bool]:
    """RunBundleAdjustment, sequential path (bad_slam.cc:481-536)."""
    cfg = self.config
    k = self.direct_ba.keyframe_count
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
          increase_ba_iteration_count=True,
      )
    # Refresh the cached base keyframe pose after BA (bad_slam.cc:1291-1300).
    if self.base_kf_index is not None:
      self.base_kf_global_T_frame = np.asarray(
          self.direct_ba.kf.global_T_frame)[self.base_kf_index]
      self.rgbd_video.frames[
          self.keyframe_frame_indices[self.base_kf_index]
      ].global_T_frame = self.base_kf_global_T_frame
    return result

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
        True)
    return np.asarray(out)

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
