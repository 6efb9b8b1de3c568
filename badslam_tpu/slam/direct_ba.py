"""DirectBA: the SLAM back-end — surfel map + direct bundle adjustment driver.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
direct_ba.{h,cc} (class DirectBA) and direct_ba_alternating.cc:285-740
(``BundleAdjustmentAlternating``). Covisibility: direct_ba.cc:231-249;
min-observation bootstrapping schedule: direct_ba.h:219-226; end-of-scheme
tasks: direct_ba.cc:566-653.

TPU-native architecture:
  * All map state (SurfelStore, KeyframeStore, depth-deformation params) is a
    device-side pytree with static capacities; host code only orchestrates the
    alternation schedule and reads back tiny scalars (activation states).
  * Keyframe pose optimization is BATCHED: one vmapped Gauss-Newton over all
    active keyframes (the reference loops them sequentially on the host,
    direct_ba_alternating.cc:543-577 — the problems are independent within an
    alternation step).
  * No compaction in the hot path: deletion/merge just clear validity masks
    (the reference compacts with CUB scans to keep CUDA launches dense, which
    a masked dense TPU program does not need).
  * Cameras are passed to jit as dynamic (4,) intrinsics vectors + static
    (width, height), so intrinsics self-calibration does not recompile.
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
from badslam_tpu.models import geometry_opt, keyframes as kf_mod, pose_opt, surfel_ops
from badslam_tpu.models.association import DepthParamsArrays
from badslam_tpu.models.keyframes import ACTIVE, COVISIBLE_ACTIVE, INACTIVE, KeyframeStore
from badslam_tpu.models.surfels import SurfelStore
from badslam_tpu.models import surfels as surfels_mod
from badslam_tpu.ops import depth_model
from badslam_tpu.ops.depth_proc import compute_min_max_depth
from badslam_tpu.utils import logging as log
from badslam_tpu.utils.timing import Timing

# kDebugVerifySurfelCount analog (direct_ba.cc:55): recount on device and
# CHECK the host mirrors after every BA scheme. Debug-only (performs D2H).
import os
DEBUG_VERIFY_COUNT = bool(os.environ.get("BADSLAM_DEBUG_VERIFY_COUNT"))


def make_camera(intr: jax.Array, width: int, height: int) -> PinholeCamera:
  return PinholeCamera(width, height, intr[0], intr[1], intr[2], intr[3])


def camera_intrinsics(cam: PinholeCamera) -> jax.Array:
  return jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32)


# --- jitted phases (module-level for cache sharing) ---


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _add_keyframe_jit(
    kf: KeyframeStore,
    depth, normals, radius_sq, intensity, rgb, global_T_frame, frame_index,
    depth_intr, width: int, height: int,
) -> KeyframeStore:
  """Insert + covisibility update (DirectBA::AddKeyframe +
  DetermineNewKeyframeCoVisibility, direct_ba.cc:188-249)."""
  cam = make_camera(depth_intr, width, height)
  min_d, max_d = compute_min_max_depth(depth)
  new_index = kf.count
  kf = kf_mod.add_keyframe(
      kf, depth, normals, radius_sq, intensity, rgb, global_T_frame,
      frame_index, min_d, max_d)

  # Frustum intersection of the new keyframe vs. every existing one.
  k = kf.capacity
  others = jnp.arange(k, dtype=jnp.int32)
  inter = jax.vmap(
      lambda j: kf_mod.frustums_intersect(
          kf, new_index, j, cam.fx_inv, cam.fy_inv, cam.cx_inv, cam.cy_inv,
          width, height)
  )(others)
  inter = inter & kf.valid & (others != new_index)
  covis = kf.covis
  covis = covis.at[new_index, :].set(inter)
  covis = covis.at[:, new_index].set(inter)
  # Covisible inactive keyframes become covisible-active (direct_ba.cc:244-246).
  activation = jnp.where(
      inter & (kf.activation == INACTIVE), COVISIBLE_ACTIVE, kf.activation)
  return kf._replace(covis=covis, activation=activation)


@functools.partial(
    jax.jit,
    static_argnames=("dwidth", "dheight", "cwidth", "cheight",
                     "filter_new_surfels", "cell_size"))
def _create_surfels_jit(
    surfels: SurfelStore,
    kf: KeyframeStore,
    kf_index,
    depth_intr, color_intr, a, cfactor, baseline_fx, min_observation_count,
    dwidth: int, dheight: int, cwidth: int, cheight: int,
    filter_new_surfels: bool, cell_size: int,
) -> SurfelStore:
  depth_cam = make_camera(depth_intr, dwidth, dheight)
  color_cam = make_camera(color_intr, cwidth, cheight)
  dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                         cell_size=cell_size)
  g = lambda arr: jax.lax.dynamic_index_in_dim(arr, kf_index, 0, keepdims=False)
  covis_mask = kf.covis[kf_index] & kf.valid
  return surfel_ops.create_surfels_for_keyframe(
      surfels,
      g(kf.depth), g(kf.normals), g(kf.radius_sq), g(kf.intensity), g(kf.rgb),
      g(kf.global_T_frame),
      depth_cam, color_cam, dp,
      kf.depth, kf.normals, kf.global_T_frame, covis_mask,
      min_observation_count, filter_new_surfels=filter_new_surfels)


@functools.partial(
    jax.jit,
    static_argnames=("dwidth", "dheight", "cell_size"))
def _merge_surfels_jit(
    surfels: SurfelStore, kf: KeyframeStore, kf_index,
    depth_intr, a, cfactor, baseline_fx,
    dwidth: int, dheight: int, cell_size: int,
    surfel_merge_dist_factor,
) -> SurfelStore:
  depth_cam = make_camera(depth_intr, dwidth, dheight)
  dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                         cell_size=cell_size)
  g = lambda arr: jax.lax.dynamic_index_in_dim(arr, kf_index, 0, keepdims=False)
  frame_T_global = se3.inverse(g(kf.global_T_frame))
  return surfel_ops.merge_surfels_for_keyframe(
      surfels, frame_T_global, g(kf.depth), g(kf.normals), depth_cam, dp,
      surfel_merge_dist_factor)


@functools.partial(
    jax.jit,
    static_argnames=("dwidth", "dheight", "cell_size", "update_radii"))
def _delete_surfels_jit(
    surfels: SurfelStore, kf: KeyframeStore,
    depth_intr, a, cfactor, baseline_fx, min_observation_count,
    dwidth: int, dheight: int, cell_size: int, update_radii: bool,
) -> SurfelStore:
  depth_cam = make_camera(depth_intr, dwidth, dheight)
  dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                         cell_size=cell_size)
  return surfel_ops.delete_surfels_and_update_radii(
      surfels, kf, depth_cam, dp, min_observation_count, update_radii)


@functools.partial(
    jax.jit,
    static_argnames=("dwidth", "dheight", "cell_size"))
def _surfel_activation_jit(
    surfels: SurfelStore, kf: KeyframeStore,
    depth_intr, a, cfactor, baseline_fx, keep_active,
    dwidth: int, dheight: int, cell_size: int,
) -> SurfelStore:
  depth_cam = make_camera(depth_intr, dwidth, dheight)
  dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                         cell_size=cell_size)
  return surfel_ops.update_surfel_activation(surfels, kf, depth_cam, dp,
                                             keep_active)


@functools.partial(
    jax.jit,
    static_argnames=("dwidth", "dheight", "cwidth", "cheight", "cell_size",
                     "use_depth_residuals", "use_descriptor_residuals"))
def _geometry_iteration_jit(
    surfels: SurfelStore, kf: KeyframeStore,
    depth_intr, color_intr, a, cfactor, baseline_fx,
    dwidth: int, dheight: int, cwidth: int, cheight: int, cell_size: int,
    use_depth_residuals: bool, use_descriptor_residuals: bool,
) -> SurfelStore:
  depth_cam = make_camera(depth_intr, dwidth, dheight)
  color_cam = make_camera(color_intr, cwidth, cheight)
  dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                         cell_size=cell_size)
  return geometry_opt.optimize_geometry_iteration(
      surfels, kf, depth_cam, color_cam, dp,
      use_depth_residuals, use_descriptor_residuals)


@functools.partial(
    jax.jit,
    static_argnames=("dwidth", "dheight", "cwidth", "cheight", "cell_size",
                     "use_depth_residuals", "use_descriptor_residuals",
                     "max_iterations"))
def _pose_optimization_jit(
    surfels: SurfelStore, kf: KeyframeStore,
    depth_intr, color_intr, a, cfactor, baseline_fx,
    dwidth: int, dheight: int, cwidth: int, cheight: int, cell_size: int,
    use_depth_residuals: bool, use_descriptor_residuals: bool,
    max_iterations: int,
) -> Tuple[KeyframeStore, jax.Array]:
  """Batched pose GN for all non-inactive keyframes; updates activation to
  kActive/kInactive by frame_moved (direct_ba_alternating.cc:543-577)."""
  depth_cam = make_camera(depth_intr, dwidth, dheight)
  color_cam = make_camera(color_intr, cwidth, cheight)
  dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                         cell_size=cell_size)
  optimize = kf.valid & (kf.activation != INACTIVE)
  T, moved = pose_opt.estimate_frame_poses_batched(
      kf.global_T_frame, optimize, surfels,
      kf.depth, kf.normals, kf.intensity,
      depth_cam, color_cam, dp,
      use_depth_residuals, use_descriptor_residuals, max_iterations)
  activation = jnp.where(
      optimize, jnp.where(moved, ACTIVE, INACTIVE), kf.activation)
  kf = kf._replace(global_T_frame=T, activation=activation)
  # The reference counts deleted (null) keyframes as converged and compares
  # against keyframes_.size() (direct_ba_alternating.cc:548-551,692-701);
  # here "size" is the slot watermark kf.count, so invalid slots only count
  # within it (slots beyond the watermark were never keyframes).
  in_watermark = jnp.arange(kf.capacity) < kf.count
  num_converged = jnp.sum(
      (kf.valid & (activation == INACTIVE)).astype(jnp.int32))
  num_converged = num_converged + jnp.sum(
      (~kf.valid & in_watermark).astype(jnp.int32))
  return kf, num_converged


@functools.partial(
    jax.jit,
    static_argnames=("dwidth", "dheight", "cwidth", "cheight", "cell_size",
                     "use_depth_residuals", "use_descriptor_residuals",
                     "max_inner_iterations", "opt_dintr", "opt_cintr"))
def _pcg_iteration_jit(
    surfels: SurfelStore, kf: KeyframeStore,
    depth_intr, color_intr, a, cfactor, baseline_fx, gauge_index,
    dwidth: int, dheight: int, cwidth: int, cheight: int, cell_size: int,
    use_depth_residuals: bool, use_descriptor_residuals: bool,
    max_inner_iterations: int,
    opt_dintr: bool = False, opt_cintr: bool = False,
):
  """One joint GN step via matrix-free PCG (BundleAdjustmentPCG inner work,
  direct_ba_pcg.cc:339-471) over poses + surfels (+ intrinsics when the
  opt_* flags are set — the unknowns fold into the joint vector exactly as
  direct_ba_pcg.cc:240-307), followed by the PCG path's separate normal
  re-estimation (kernel_opt_geometry.cu:527+). Returns
  (surfels, kf, depth_intr, color_intr, a, cfactor, max pose-update norm)."""
  from badslam_tpu.models import pcg as pcg_mod
  depth_cam = make_camera(depth_intr, dwidth, dheight)
  color_cam = make_camera(color_intr, cwidth, cheight)
  dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                         cell_size=cell_size)
  delta = pcg_mod.pcg_solve(
      surfels, kf, depth_cam, color_cam, dp, gauge_index,
      max_inner_iterations, use_depth_residuals, use_descriptor_residuals,
      opt_dintr=opt_dintr, opt_cintr=opt_cintr)
  surfels, kf = pcg_mod.apply_pcg_delta(surfels, kf, delta)
  depth_intr, color_intr, a, cfactor = pcg_mod.apply_pcg_delta_intrinsics(
      depth_intr, color_intr, a, cfactor, delta, opt_dintr, opt_cintr)
  surfels = geometry_opt.reestimate_normals(surfels, kf, depth_cam, dp)
  pose_update = jnp.max(
      jnp.where(kf.valid[:, None], jnp.abs(delta.poses), 0.0))
  return surfels, kf, depth_intr, color_intr, a, cfactor, pose_update


@functools.partial(
    jax.jit,
    static_argnames=("dwidth", "dheight", "cwidth", "cheight", "cell_size"))
def _assign_colors_jit(
    surfels: SurfelStore, kf: KeyframeStore,
    depth_intr, color_intr, a, cfactor, baseline_fx,
    dwidth: int, dheight: int, cwidth: int, cheight: int, cell_size: int,
) -> SurfelStore:
  depth_cam = make_camera(depth_intr, dwidth, dheight)
  color_cam = make_camera(color_intr, cwidth, cheight)
  dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                         cell_size=cell_size)
  return surfel_ops.assign_colors(surfels, kf, depth_cam, color_cam, dp)


@jax.jit
def _gather_kf_window_jit(kf: KeyframeStore, idx: jax.Array) -> KeyframeStore:
  """Gather the participating (non-inactive) keyframes into a small windowed
  store so the O(K·N) BA phases pay for the ACTIVE set, not the full store.

  This is the TPU-native equivalent of the reference's host-side skipping of
  inactive keyframes (direct_ba_alternating.cc:543-577): static shapes rule
  out data-dependent sizes inside jit, so the window is a bucketed
  (power-of-two) dense gather built on the host from one activation readback
  the scheme loop performs anyway. Padded slots carry ``idx == capacity``:
  the gather clips them (values masked via ``valid=False``) and the scatter
  drops them.
  """
  safe = jnp.clip(idx, 0, kf.capacity - 1)
  real = idx < kf.capacity
  take = lambda x: jnp.take(x, safe, axis=0)
  covis = kf.covis[safe][:, safe] & real[:, None] & real[None, :]
  return kf._replace(
      depth=take(kf.depth), normals=take(kf.normals),
      radius_sq=take(kf.radius_sq), intensity=take(kf.intensity),
      rgb=take(kf.rgb), global_T_frame=take(kf.global_T_frame),
      frame_index=jnp.where(real, take(kf.frame_index), -1),
      min_depth=take(kf.min_depth), max_depth=take(kf.max_depth),
      valid=take(kf.valid) & real,
      activation=jnp.where(real, take(kf.activation), INACTIVE),
      covis=covis,
      count=jnp.asarray(idx.shape[0], jnp.int32))


@jax.jit
def _scatter_kf_window_jit(kf: KeyframeStore, win: KeyframeStore,
                           idx: jax.Array) -> KeyframeStore:
  """Write the window's optimized poses/activation back into the full store
  (padded slots have idx == capacity and are dropped)."""
  return kf._replace(
      global_T_frame=kf.global_T_frame.at[idx].set(
          win.global_T_frame, mode="drop"),
      activation=kf.activation.at[idx].set(win.activation, mode="drop"))


@jax.jit
def _determine_covisible_active_jit(kf: KeyframeStore) -> KeyframeStore:
  """kInactive keyframes covisible with a kActive one become kCovisibleActive
  (DirectBA::DetermineCovisibleActiveKeyframes, direct_ba.cc:549-564)."""
  active = kf.valid & (kf.activation == ACTIVE)
  # covis is symmetric: row i of covis @ active > 0 means i sees an active KF.
  touched = jnp.any(kf.covis & active[None, :], axis=1)
  new_act = jnp.where(
      kf.valid & (kf.activation == INACTIVE) & touched,
      COVISIBLE_ACTIVE, kf.activation)
  return kf._replace(activation=new_act)


class DirectBA:
  """Host-side orchestrator owning the device map state.

  Mirrors the reference DirectBA public surface (direct_ba.h:65-550):
  AddKeyframe, CreateSurfelsForKeyframe, BundleAdjustment,
  PerformBASchemeEndTasks, EstimateFramePose (via pose_opt), accessors.
  """

  def __init__(
      self,
      config: BadSlamConfig,
      depth_cam: PinholeCamera,
      color_cam: PinholeCamera,
      keyframe_capacity: Optional[int] = None,
      surfel_capacity: Optional[int] = None,
      mesh: Optional["jax.sharding.Mesh"] = None,
  ):
    self.config = config
    # Distributed mode: with a mesh, the surfel store lives sharded along the
    # surfel axis and keyframes replicated; every jitted phase then compiles
    # as an SPMD program (GSPMD partitions the dense per-surfel math and
    # inserts all-reduces for the H/b reductions — the same communication
    # pattern as parallel/sharded_ba.py's explicit shard_map steps, which
    # remain the hand-scheduled hot path). See _mesh_place().
    self.mesh = mesh
    self.depth_size = (depth_cam.width, depth_cam.height)
    self.color_size = (color_cam.width, color_cam.height)
    self.depth_intr = camera_intrinsics(depth_cam)
    self.color_intr = camera_intrinsics(color_cam)

    kcap = keyframe_capacity or config.initial_keyframe_capacity
    scap = surfel_capacity or config.initial_surfel_capacity
    self.kf = kf_mod.create(kcap, depth_cam.height, depth_cam.width)
    self.surfels = surfels_mod.create(scap)

    cell = config.sparse_surfel_cell_size
    hc, wc = depth_model.cfactor_shape(depth_cam.height, depth_cam.width, cell)
    self.a = jnp.asarray(config.depth_deformation_a, jnp.float32)
    self.cfactor = jnp.zeros((hc, wc), jnp.float32)
    self.baseline_fx = jnp.asarray(config.baseline_fx, jnp.float32)
    self.cell_size = cell

    # NOTE on in-place-mutated HOST state: clone_for_prewarm() hands copies
    # of this object to concurrent compile-warmup tasks; every np.ndarray /
    # list / dict attribute that bundle_adjustment mutates in place MUST be
    # deep-copied there (device pytrees are immutable and safe to share).
    # When adding a new mutable host mirror here, extend clone_for_prewarm.
    self._kf_count_host = 0
    # Host mirror of kf.valid: every mutation (add/delete/grow) is
    # host-initiated, so the mirror is exact. Lets the transfer-free BA mode
    # build its activation masks without a device read.
    self._kf_valid_host = np.zeros(kcap, bool)
    self._surfel_count_cache = (None, 0)
    self._surfel_watermark_cache = (None, 0)
    # Host-side upper bound on the surfel watermark (see
    # _ensure_surfel_capacity): re-synced to the true value whenever
    # surfel_watermark is actually read.
    self._watermark_bound = 0
    self._mesh_place()
    # --save_timings stream (direct_ba.h:382): per-BA-iteration stats lines.
    self.timings_stream = None

    # Active-keyframe window: only worth it on the CPU backend. Measured on
    # TPU v5e (benchmarks/kf_scale_report.json): the dense BA iteration is
    # dispatch/latency-bound at ~0.2-0.5 ms FLAT from 8 to 256 keyframes,
    # while the gather+scatter adds 0.1-0.8 ms and never breaks even; on
    # the CPU backend the dense phases really cost O(K x pixels) and the
    # window wins ~3x at 32 keyframes (round-3 measurement). Disabling it
    # on TPU also collapses the per-window-bucket compile-shape keys, which
    # dominated prewarm time (round-3 verdict item 8).
    self._window_enabled = (config.use_active_kf_window
                            and jax.default_backend() == "cpu")
    self.ba_iteration_count = 0
    self.last_ba_iteration_count = -1
    # Outlier-rejection accounting (kernel_delete_surfels.cu counts the
    # same way): surfels invalidated by the end-of-scheme delete pass
    # (min-observation / free-space-violation filtering). Only maintained
    # outside transfer-free mode — the count is a device read.
    self.num_surfels_deleted = 0
    # Host-side per-slot bookkeeping (mirrors Keyframe::last_active_in_ba_iteration).
    self.last_active_in_ba_iteration = np.full(kcap, -1, np.int64)
    self.use_depth_residuals = config.use_geometric_residuals
    self.use_descriptor_residuals = config.use_photometric_residuals
    self.surfel_merge_dist_factor = config.surfel_merge_dist_factor

  def _mesh_place(self):
    """Distributed placement (no-op without a mesh, and cheap when arrays are
    already correctly placed): surfel arrays sharded over the mesh's
    'surfels' axis, keyframes + calibration replicated. Called after any op
    that may produce differently-placed arrays (store growth, compaction,
    host-built masks), so that every jitted phase sees a consistent SPMD
    layout."""
    if self.mesh is None:
      return
    from badslam_tpu.parallel import sharded_ba
    self.surfels = sharded_ba.shard_surfels(self.surfels, self.mesh)
    rep = sharded_ba.replicated(self.mesh)
    self.kf = jax.device_put(self.kf, rep)
    self.a = jax.device_put(jnp.asarray(self.a), rep)
    self.cfactor = jax.device_put(jnp.asarray(self.cfactor), rep)
    self.baseline_fx = jax.device_put(jnp.asarray(self.baseline_fx), rep)
    self.depth_intr = jax.device_put(jnp.asarray(self.depth_intr), rep)
    self.color_intr = jax.device_put(jnp.asarray(self.color_intr), rep)

  # --- capacity management ---
  #
  # Host-side count mirrors: reading a device scalar is a host sync (and the
  # axon TPU tunnel's first scalar read costs ~2 minutes, later ones ~0.4 s),
  # so counts are tracked on the host and the surfel count is cached per
  # store object and only re-read after lifecycle ops change it.

  @property
  def keyframe_count(self) -> int:
    return self._kf_count_host

  @property
  def surfel_count(self) -> int:
    """Number of LIVE surfels (valid mask), not the allocation watermark."""
    cached_obj, cached_val = self._surfel_count_cache
    if cached_obj is self.surfels.valid:
      return cached_val
    val = int(jnp.sum(self.surfels.valid))
    self._surfel_count_cache = (self.surfels.valid, val)
    return val

  @property
  def surfel_watermark(self) -> int:
    """Allocation watermark: next append position (>= surfel_count)."""
    cached_obj, cached_val = self._surfel_watermark_cache
    if cached_obj is self.surfels.count:
      return cached_val
    val = int(self.surfels.count)
    self._surfel_watermark_cache = (self.surfels.count, val)
    self._watermark_bound = val
    return val

  def depth_camera(self) -> PinholeCamera:
    w, h = self.depth_size
    intr = np.asarray(self.depth_intr)
    return PinholeCamera(w, h, float(intr[0]), float(intr[1]),
                         float(intr[2]), float(intr[3]))

  def color_camera(self) -> PinholeCamera:
    w, h = self.color_size
    intr = np.asarray(self.color_intr)
    return PinholeCamera(w, h, float(intr[0]), float(intr[1]),
                         float(intr[2]), float(intr[3]))

  def depth_params(self) -> DepthParamsArrays:
    return DepthParamsArrays(a=self.a, cfactor=self.cfactor,
                             baseline_fx=self.baseline_fx,
                             cell_size=self.cell_size)

  def reserve_keyframe_capacity(self, n: int):
    """Grow the keyframe store (and host mirrors) to hold >= n keyframes
    now. Pre-sizing from --prewarm_keyframes means the live run never
    passes through intermediate capacities — each of which is a full set of
    compiled program shapes (round-3 verdict item 8)."""
    new_cap = self.kf.capacity
    while new_cap < n:
      new_cap *= 2
    if new_cap == self.kf.capacity:
      return
    self.kf = kf_mod.grow(self.kf, new_cap)
    grown = np.full(new_cap, -1, np.int64)
    grown[: len(self.last_active_in_ba_iteration)] = \
        self.last_active_in_ba_iteration
    self.last_active_in_ba_iteration = grown
    valid_grown = np.zeros(new_cap, bool)
    valid_grown[: len(self._kf_valid_host)] = self._kf_valid_host
    self._kf_valid_host = valid_grown
    self._mesh_place()

  def _ensure_keyframe_capacity(self):
    if self.keyframe_count >= self.kf.capacity:
      self.reserve_keyframe_capacity(self.kf.capacity * 2)

  def _ensure_surfel_capacity(self):
    # Keep >= one image worth of candidate headroom before each creation pass.
    w, h = self.depth_size
    cell = self.cell_size
    headroom = (h // cell + 1) * (w // cell + 1)
    # Appends land at the WATERMARK. Use the host-side upper bound rather
    # than reading the device count: on the axon TPU tunnel, ANY device->host
    # transfer permanently drops the process out of speculative pipelined
    # dispatch into ~1.5 ms-per-call sync mode (PERF.md "tunnel dispatch
    # modes"), so the steady-state path must stay transfer-free. The bound
    # only over-estimates; when it would trigger growth, re-sync it to the
    # true device watermark first (one transfer, only on the rare growth
    # path) so repeated creations cannot ratchet the store to max capacity.
    if self._watermark_bound + headroom > self.surfels.capacity:
      if self.config.pipelined_frontend:
        # Transfer-free mode: grow on the host upper bound alone. The bound
        # ratchets by one creation pass's headroom regardless of how many
        # surfels actually appended, so this over-grows — the price of
        # keeping the tunnel in pipelined dispatch; the ratchet is capped by
        # max_surfel_count and a post-run compaction reclaims the slack.
        pass
      else:
        _ = self.surfel_watermark  # re-syncs _watermark_bound
    while (self._watermark_bound + headroom > self.surfels.capacity and
           self.surfels.capacity < self.config.max_surfel_count):
      self.surfels = surfels_mod.grow(
          self.surfels,
          min(self.surfels.capacity * 2, self.config.max_surfel_count))
      self._mesh_place()
    self._watermark_bound = min(self._watermark_bound + headroom,
                                self.surfels.capacity)

  def get_min_observation_count(self) -> int:
    """Bootstrapping schedule (direct_ba.h:219-226)."""
    k = self.keyframe_count
    if k < 5:
      return self.config.min_observation_count_while_bootstrapping_1
    if k < 10:
      return self.config.min_observation_count_while_bootstrapping_2
    return self.config.min_observation_count

  def ba_window_shape_key(self, participating_count: int,
                          optimize_poses: bool = True,
                          optimize_geometry: bool = True):
    """The compiled-shape key a bundle_adjustment call's phases run at when
    `participating_count` keyframes participate: (window bucket or -1 for
    the dense full store, keyframe capacity, surfel capacity). This is the
    single source of truth for the active-window bucketing — the scheme
    loop builds its gather from it and BadSlam.prewarm replays the shape
    progression through it."""
    use_pcg = self.config.use_pcg and optimize_poses and optimize_geometry
    wsize = -1
    if (self.mesh is None and not use_pcg
        and self._window_enabled and participating_count > 0):
      w = max(4, 1 << int(np.ceil(np.log2(participating_count))))
      if w <= self.kf.capacity // 2:
        wsize = w
    return (wsize, self.kf.capacity, self.surfels.capacity)

  def clone_for_prewarm(self) -> "DirectBA":
    """Cheap snapshot for concurrent compile warm-up (BadSlam.prewarm).

    Device state (kf / surfels namedtuples, intrinsics, cfactor) is
    immutable and shared; the host-side mutable mirrors are copied so a
    bundle_adjustment run on the clone cannot race the original. Clones are
    throwaway compile targets only — they never feed results back.
    """
    import copy
    c = copy.copy(self)
    c.last_active_in_ba_iteration = self.last_active_in_ba_iteration.copy()
    c._kf_valid_host = self._kf_valid_host.copy()
    c.timings_stream = None
    return c

  # --- keyframe management ---

  def add_keyframe(self, depth, normals, radius_sq, intensity, rgb,
                   global_T_frame, frame_index: int) -> int:
    """Returns the new keyframe's index."""
    self._ensure_keyframe_capacity()
    self._mesh_place()
    idx = self.keyframe_count
    w, h = self.depth_size
    self.kf = _add_keyframe_jit(
        self.kf, depth, normals, radius_sq, intensity,
        jnp.asarray(rgb, jnp.uint8), global_T_frame,
        jnp.asarray(frame_index, jnp.int32), self.depth_intr, w, h)
    self._kf_count_host += 1
    self._kf_valid_host[idx] = True
    return idx

  def create_surfels_for_keyframe(self, kf_index: int,
                                  filter_new_surfels: bool = True):
    self._ensure_surfel_capacity()
    self._mesh_place()
    w, h = self.depth_size
    cw, ch = self.color_size
    self.surfels = _create_surfels_jit(
        self.surfels, self.kf, jnp.asarray(kf_index, jnp.int32),
        self.depth_intr, self.color_intr, self.a, self.cfactor,
        self.baseline_fx,
        jnp.asarray(self.get_min_observation_count(), jnp.int32),
        w, h, cw, ch, filter_new_surfels, self.cell_size)

  def set_activation(self, activation: np.ndarray):
    self.kf = self.kf._replace(
        activation=jnp.asarray(activation, jnp.int32))

  # --- the alternating BA scheme ---

  def bundle_adjustment(
      self,
      optimize_depth_intrinsics: bool = False,
      optimize_color_intrinsics: bool = False,
      do_surfel_updates: bool = True,
      optimize_poses: bool = True,
      optimize_geometry: bool = True,
      min_iterations: int = 0,
      max_iterations: int = 10,
      active_keyframe_window_start: int = -1,
      active_keyframe_window_end: int = -1,
      increase_ba_iteration_count: bool = True,
      max_inner_pose_iterations: int = 30,
      transfer_free: bool = False,
      deadline: Optional[float] = None,
  ) -> Tuple[int, bool]:
    """BundleAdjustmentAlternating (direct_ba_alternating.cc:285-740).

    transfer_free: run with ZERO device->host transfers — activation masks
    come from the host valid mirror and the convergence scalar is never
    read, so exactly max_iterations run and `converged` returns False.
    Requires a fixed active window (the parallel-BA thread's semantics,
    bad_slam.cc:1268-1289); used by the pipelined front-end to keep the
    whole live loop in the tunnel's speculative dispatch mode (PERF.md
    "tunnel dispatch modes").

    deadline: absolute time.perf_counter() deadline for real-time mode —
    the scheme loop stops before starting an iteration past it (the
    reference's time_limit check, direct_ba_alternating.cc:703-709; like
    the reference's, it bounds when iterations START — async device work
    already dispatched still completes).

    Returns (num_iterations_done, converged).
    """
    cfg = self.config
    w, h = self.depth_size
    cw, ch = self.color_size
    fixed_ba_iteration_count = self.ba_iteration_count

    if (not increase_ba_iteration_count and
        fixed_ba_iteration_count != self.last_ba_iteration_count):
      self.last_ba_iteration_count = fixed_ba_iteration_count
      self.perform_ba_scheme_end_tasks(do_surfel_updates,
                                       transfer_free=transfer_free)

    fixed_active_set = (active_keyframe_window_start >= 0 or
                        active_keyframe_window_end >= 0)
    if transfer_free and not fixed_active_set:
      raise ValueError("transfer_free BA requires a fixed active window "
                       "(activation evolution needs per-iteration reads)")
    self._mesh_place()

    # Initialize surfel active states to inactive.
    self.surfels = self.surfels._replace(
        active=jnp.zeros_like(self.surfels.active))

    converged = False
    iterations_done = 0
    kcount = self.keyframe_count

    import time as _time
    for iteration in range(max_iterations):
      # Real-time budget (direct_ba_alternating.cc:703-709): don't start
      # another iteration past the frame deadline. The first iteration
      # always runs — the caller only starts BA with time in hand.
      if (deadline is not None and iteration > 0
          and iteration >= min_iterations
          and _time.perf_counter() > deadline):
        break
      iterations_done += 1

      if fixed_active_set:
        act = np.full(self.kf.capacity, INACTIVE, np.int32)
        s = max(0, active_keyframe_window_start)
        e = (active_keyframe_window_end if active_keyframe_window_end >= 0
             else kcount - 1)
        act[s:e + 1] = ACTIVE
        valid_np = (self._kf_valid_host if transfer_free
                    else np.asarray(self.kf.valid))
        act = np.where(valid_np[: self.kf.capacity], act, INACTIVE)
        self.set_activation(act)
        self._mesh_place()
        self.kf = _determine_covisible_active_jit(self.kf)

      if transfer_free:
        # The fixed-window activation is fully host-determined: ACTIVE for
        # valid window slots, -1 elsewhere (covisible-active only matters
        # outside the window, which a fixed full window has none of).
        act_valid = np.where(self._kf_valid_host[: self.kf.capacity],
                             act, -1)
      else:
        # One fused device->host read per iteration: activation with -1 for
        # invalid slots. Drives both newly-active surfel creation and the
        # active-window gather below.
        act_valid = np.asarray(
            jnp.where(self.kf.valid, self.kf.activation, -1))

      # --- ACTIVE-KEYFRAME WINDOW ---
      # The dense BA phases cost O(store_capacity x surfels) regardless of
      # activation; when the participating (active + covisible-active) set is
      # much smaller than the store, gather it into a power-of-two bucketed
      # window so device work scales with the active set — the reference's
      # activation windowing (direct_ba_alternating.cc:543-577), realized as
      # a gather instead of host-side skipping (static shapes). PCG and mesh
      # mode keep the full store (sharded layouts are per-capacity).
      use_pcg = self.config.use_pcg and optimize_poses and optimize_geometry
      window_idx = None
      part = np.flatnonzero(act_valid >= COVISIBLE_ACTIVE)
      wsize = self.ba_window_shape_key(
          len(part), optimize_poses, optimize_geometry)[0]
      if wsize > 0:
        padded = np.full(wsize, self.kf.capacity, np.int32)
        padded[:len(part)] = part
        window_idx = jnp.asarray(padded)

      # --- SURFEL CREATION for newly-active keyframes ---
      old_valid = self.surfels.valid
      keyframes_with_new_surfels: List[int] = []
      if optimize_geometry and do_surfel_updates:
        with Timing.time("BA surfel creation"):
          for i in range(kcount):
            if act_valid[i] < 0:
              continue
            if (act_valid[i] == ACTIVE and
                self.last_active_in_ba_iteration[i] != fixed_ba_iteration_count):
              self.last_active_in_ba_iteration[i] = fixed_ba_iteration_count
              keyframes_with_new_surfels.append(i)
          for i in keyframes_with_new_surfels:
            self.create_surfels_for_keyframe(i, filter_new_surfels=True)

      # The gathered window (the creation pass above does not mutate the
      # keyframe store, so gathering here sees the iteration's final state).
      kf_phase = (self.kf if window_idx is None
                  else _gather_kf_window_jit(self.kf, window_idx))

      # --- SURFEL ACTIVATION ---
      with Timing.time("BA surfel activation"):
        # New surfels (valid now but not before) start active. The creation
        # pass may have grown the store's capacity — pad the old mask.
        if self.surfels.capacity != old_valid.shape[0]:
          old_valid = jnp.pad(
              old_valid, (0, self.surfels.capacity - old_valid.shape[0]))
        new_surfels = self.surfels.valid & ~old_valid
        if fixed_active_set:
          self.surfels = self.surfels._replace(active=self.surfels.valid)
        else:
          self.surfels = _surfel_activation_jit(
              self.surfels, kf_phase, self.depth_intr, self.a, self.cfactor,
              self.baseline_fx, new_surfels, w, h, self.cell_size)

      # --- GEOMETRY OPTIMIZATION (alternating) or JOINT PCG STEP ---
      # Under PCG the intrinsics unknowns fold into the joint vector
      # (direct_ba_pcg.cc:240-307) instead of the alternated Schur step.
      pcg_dintr = (use_pcg and optimize_depth_intrinsics
                   and self.use_depth_residuals)
      pcg_cintr = (use_pcg and optimize_color_intrinsics
                   and self.use_descriptor_residuals)
      if use_pcg:
        with Timing.time("BA PCG"):
          # Gauge: rotate the fixed keyframe deterministically over the VALID
          # slots (the reference randomizes over live keyframes,
          # direct_ba_pcg.cc:318-337); a deleted slot would leave the system
          # gauge-free.
          valid_np = (self._kf_valid_host if transfer_free
                      else np.asarray(self.kf.valid))  # one transfer
          valid_slots = [i for i in range(kcount) if valid_np[i]] or [0]
          gauge = valid_slots[iteration % len(valid_slots)]
          (self.surfels, self.kf, self.depth_intr, self.color_intr,
           self.a, self.cfactor, pose_update) = _pcg_iteration_jit(
              self.surfels, self.kf, self.depth_intr, self.color_intr,
              self.a, self.cfactor, self.baseline_fx,
              jnp.asarray(gauge, jnp.int32),
              w, h, cw, ch, self.cell_size,
              self.use_depth_residuals, self.use_descriptor_residuals,
              self.config.pcg_max_inner_iterations,
              opt_dintr=pcg_dintr, opt_cintr=pcg_cintr)
      elif optimize_geometry:
        with Timing.time("BA geometry optimization"):
          self.surfels = _geometry_iteration_jit(
              self.surfels, kf_phase, self.depth_intr, self.color_intr,
              self.a, self.cfactor, self.baseline_fx,
              w, h, cw, ch, self.cell_size,
              self.use_depth_residuals, self.use_descriptor_residuals)

      # --- SURFEL MERGE (keyframes with new surfels) ---
      if do_surfel_updates and keyframes_with_new_surfels:
        with Timing.time("BA initial surfel merge"):
          for i in keyframes_with_new_surfels:
            self.surfels = _merge_surfels_jit(
                self.surfels, self.kf, jnp.asarray(i, jnp.int32),
                self.depth_intr, self.a, self.cfactor, self.baseline_fx,
                w, h, self.cell_size,
                jnp.asarray(self.surfel_merge_dist_factor, jnp.float32))

      # --- POSE OPTIMIZATION (batched over keyframes) ---
      num_converged = kcount
      if use_pcg:
        # The PCG step already updated poses; convergence from the update norm
        # (IsScale1PoseEstimationConverged analog on the joint step).
        if transfer_free:
          num_converged = 0  # never read the scalar; run all iterations
        elif float(pose_update) ** 2 * 100.0 < 1e-6:
          num_converged = kcount
        else:
          num_converged = 0
      elif optimize_poses:
        with Timing.time("BA pose optimization"):
          if window_idx is None:
            self.kf, num_converged_dev = _pose_optimization_jit(
                self.surfels, self.kf, self.depth_intr, self.color_intr,
                self.a, self.cfactor, self.baseline_fx,
                w, h, cw, ch, self.cell_size,
                self.use_depth_residuals, self.use_descriptor_residuals,
                max_inner_pose_iterations)
            # One scalar read (the jitted phase already computed the count).
            num_converged = 0 if transfer_free else int(num_converged_dev)
          else:
            kf_win, num_conv_win = _pose_optimization_jit(
                self.surfels, kf_phase, self.depth_intr, self.color_intr,
                self.a, self.cfactor, self.baseline_fx,
                w, h, cw, ch, self.cell_size,
                self.use_depth_residuals, self.use_descriptor_residuals,
                max_inner_pose_iterations)
            self.kf = _scatter_kf_window_jit(self.kf, kf_win, window_idx)
            # Window convergence: padded + converged window slots count in
            # num_conv_win; every keyframe OUTSIDE the window is INACTIVE
            # (or deleted) and therefore converged, so
            #   still_active = wsize - num_conv_win
            #   num_converged = kcount - still_active.
            num_converged = (0 if transfer_free else
                             kcount - (window_idx.shape[0]
                                       - int(num_conv_win)))

      # --- INTRINSICS OPTIMIZATION (alternated; skipped for the unknowns
      # the joint PCG step above already solved) ---
      alt_dintr = optimize_depth_intrinsics and not pcg_dintr
      alt_cintr = optimize_color_intrinsics and not pcg_cintr
      if alt_dintr or alt_cintr:
        with Timing.time("BA intrinsics optimization"):
          self._optimize_intrinsics(alt_dintr, alt_cintr)

      if self.timings_stream is not None:
        self.timings_stream.write(
            f"BA_count {fixed_ba_iteration_count} "
            f"inner_iteration {iteration} keyframe_count {kcount} "
            f"surfel_count {self.surfel_count}\n")
      # Structured per-iteration counters (host mirrors only — no D2H).
      log.debug(f"BA {fixed_ba_iteration_count} it {iteration}: "
                f"kf {kcount}, converged {num_converged}")

      # --- CONVERGENCE ---
      if (iteration >= min_iterations - 1 and
          (num_converged == kcount or not optimize_poses)):
        converged = True
        break

      self.kf = _determine_covisible_active_jit(self.kf)

    if increase_ba_iteration_count:
      self.perform_ba_scheme_end_tasks(do_surfel_updates,
                                       transfer_free=transfer_free)
      self.ba_iteration_count += 1

    if DEBUG_VERIFY_COUNT:
      self.debug_verify_counts()
    return iterations_done, converged

  def debug_verify_counts(self):
    """DebugVerifySurfelCount analog (kernel_verify_count.cc:39-60,
    kDebugVerifySurfelCount at direct_ba.cc:55): recount live surfels on
    device and CHECK the host-side mirrors' invariants. A debug facility —
    the D2H reads here drop the axon tunnel out of pipelined dispatch, so
    it is gated on BADSLAM_DEBUG_VERIFY_COUNT (and usable from tests)."""
    device_valid = int(jnp.sum(self.surfels.valid))
    log.check_eq(device_valid, self.surfel_count, "surfel count mirror")
    watermark = int(self.surfels.count)
    log.check_le(device_valid, watermark, "live surfels within watermark")
    log.check_le(watermark, self.surfels.capacity, "watermark within store")
    log.check_le(watermark, self._watermark_bound,
                 "host watermark bound is an upper bound")
    log.check_eq(int(self.kf.count), self._kf_count_host,
                 "keyframe count mirror")
    log.check(bool(np.array_equal(np.asarray(self.kf.valid),
                                  self._kf_valid_host)),
              "keyframe valid mirror matches device mask")
    log.debug("DebugVerifySurfelCount: ok")

  def perform_ba_scheme_end_tasks(self, do_surfel_updates: bool = True,
                                  transfer_free: bool = False):
    """Merge (keyframes active this block) + delete + radius update
    (direct_ba.cc:566-653). Compaction is unnecessary under the mask design.
    """
    w, h = self.depth_size
    self._mesh_place()
    if do_surfel_updates:
      with Timing.time("BA final surfel merge and compact"):
        for i in range(self.keyframe_count):
          if self.last_active_in_ba_iteration[i] == self.ba_iteration_count:
            self.surfels = _merge_surfels_jit(
                self.surfels, self.kf, jnp.asarray(i, jnp.int32),
                self.depth_intr, self.a, self.cfactor, self.baseline_fx,
                w, h, self.cell_size,
                jnp.asarray(self.surfel_merge_dist_factor, jnp.float32))
    with Timing.time("BA final surfel del. and radius upd."):
      before = None if transfer_free else self.surfel_count
      self.surfels = _delete_surfels_jit(
          self.surfels, self.kf, self.depth_intr, self.a, self.cfactor,
          self.baseline_fx,
          jnp.asarray(self.get_min_observation_count(), jnp.int32),
          w, h, self.cell_size, True)
      if before is not None:
        self.num_surfels_deleted += max(0, before - self.surfel_count)
    # Compaction (CompactSurfelsCUDA in the reference's end tasks,
    # direct_ba.cc:645): reclaim dead slots when fragmentation is high so
    # the watermark does not creep toward capacity. The fragmentation check
    # reads two device scalars, so the transfer-free mode skips it — under
    # the masked-store design compaction is purely an optimization, and
    # watermark creep is still bounded by _ensure_surfel_capacity growth.
    if transfer_free:
      return
    if (self.surfel_watermark - self.surfel_count
        > max(1024, self.surfels.capacity // 4)):
      with Timing.time("BA surfel compaction"):
        self.surfels = surfels_mod.compact(self.surfels)
        self._mesh_place()

  def _optimize_intrinsics(self, optimize_depth: bool, optimize_color: bool):
    """Self-calibration step — implemented in models/intrinsics_opt.py."""
    from badslam_tpu.models import intrinsics_opt
    depth_intr, color_intr, a, cfactor = intrinsics_opt.optimize_intrinsics(
        self.surfels, self.kf, self.depth_intr, self.color_intr,
        self.a, self.cfactor, self.baseline_fx,
        self.depth_size, self.color_size, self.cell_size,
        optimize_depth, optimize_color,
        self.use_depth_residuals, self.use_descriptor_residuals)
    if optimize_depth:
      self.depth_intr = depth_intr
      self.a = a
      self.cfactor = cfactor
    if optimize_color:
      self.color_intr = color_intr

  # --- keyframe deletion / merging (memory pressure) ---

  def delete_keyframe(self, keyframe_index: int, loop_detector=None):
    """DirectBA::DeleteKeyframe (direct_ba.cc:207-229). Under the masked
    store design the slot is invalidated (indices stay stable — no
    covisibility-list surgery needed beyond clearing the row/column)."""
    kf = self.kf
    covis = kf.covis.at[keyframe_index, :].set(False)
    covis = covis.at[:, keyframe_index].set(False)
    self.kf = kf._replace(
        valid=kf.valid.at[keyframe_index].set(False),
        activation=kf.activation.at[keyframe_index].set(INACTIVE),
        covis=covis)
    self._kf_valid_host[keyframe_index] = False
    if loop_detector is not None:
      loop_detector.remove_keyframe(keyframe_index)

  def merge_keyframes(self, loop_detector=None, approx_merge_count: int = 1):
    """DirectBA::MergeKeyframes (direct_ba.cc:251-338): rank consecutive
    keyframe pairs by a combined angle/translation distance (90 deg counts
    like 0.5 m) and delete the middle keyframes of the closest chains.
    Keyframe 0 (the reconstruction anchor) is never deleted."""
    max_angle = 0.5 * np.pi / 2.0      # kMaxAngleDifference
    max_dist = 0.3                     # kMaxEuclideanDistance
    valid = np.asarray(self.kf.valid)
    poses = np.asarray(self.kf.global_T_frame)
    slots = [i for i in range(self.keyframe_count) if valid[i]]
    if len(slots) <= 1:
      return 0

    distances = []  # (weight, prev_id, id, next_id)
    prev_half = 0.0
    prev_id = slots[0]
    for a, b in zip(slots[:-1], slots[1:]):
      za, zb = poses[a][:3, 2], poses[b][:3, 2]
      angle = float(np.arccos(np.clip(za @ zb, -1.0, 1.0)))
      if angle > max_angle:
        continue
      dist = float(np.linalg.norm(poses[a][:3, 3] - poses[b][:3, 3]))
      if dist > max_dist:
        continue
      next_half = dist + (0.5 / (np.pi / 2.0)) * angle
      if a > 0:
        distances.append((prev_half + next_half, prev_id, a, b))
      prev_half = next_half
      prev_id = a

    distances.sort()
    deleted = 0
    dead = set()
    for weight, p, m, nx in distances[:approx_merge_count]:
      if p in dead or m in dead or nx in dead:
        continue
      self.delete_keyframe(m, loop_detector)
      dead.add(m)
      deleted += 1
    return deleted

  # --- exports ---

  def assign_colors(self):
    """Refresh surfel colors by averaging their observations across all
    keyframes (DirectBA::AssignColors, direct_ba.cc:456-459)."""
    w, h = self.depth_size
    cw, ch = self.color_size
    self.surfels = _assign_colors_jit(
        self.surfels, self.kf, self.depth_intr, self.color_intr,
        self.a, self.cfactor, self.baseline_fx, w, h, cw, ch, self.cell_size)

  def export_point_cloud(self, refresh_colors: bool = True
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(positions (M,3), normals (M,3), colors (M,3) u8) of valid surfels
    (DirectBA::ExportToPointCloud, direct_ba.cc:461-547)."""
    if refresh_colors and self.keyframe_count > 0:
      self.assign_colors()
    valid = np.asarray(self.surfels.valid)
    pos = np.asarray(self.surfels.pos)[valid]
    nrm = np.asarray(self.surfels.normal)[valid]
    col = np.clip(np.asarray(self.surfels.color)[valid] * 255.0, 0, 255
                  ).astype(np.uint8)
    return pos, nrm, col
