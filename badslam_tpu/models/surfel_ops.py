"""Surfel lifecycle ops: creation, supporting-surfel merge, deletion, activation.

Behavioral specs from /root/reference/applications/badslam/src/badslam/:
  * creation pipeline  kernel_create_surfels.cu (serializing kernel :41-76,
    observation counting :214-276, filtering :314-337, append :357-398) and the
    driver CreateSurfelsForKeyframe (direct_ba.cc:340-405);
  * supporting surfels + merge  kernel_supporting_surfels.cu:45-97;
  * deletion + radius update  kernel_delete_surfels.cu:42-160;
  * activation  kernel_surfel_activation.cu:38-80.

TPU-native redesign notes:
  * The CUDA code compacts surfels with CUB scans and keeps launches dense;
    here everything is dense over the static surfel capacity with validity
    masks (SURVEY.md §7.1), so "deletion" just clears mask bits.
  * The reference's atomicCAS races pick a *random* representative pixel per
    sparsification cell (kernel_create_surfels.cu:58-60 TODO notes this); we
    pick the first valid pixel per cell deterministically.
  * The merge kernel's 3-deep CAS buffer chain (kMergeBufferCount) becomes
    3 rounds of segment-min cluster-head selection — deterministic, same
    semantics as the CAS chain under index ordering.
  * Per-cell reductions use jax.ops.segment_* over the static cell grid.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import DepthToColorTransform, PinholeCamera
from badslam_tpu.models import association, cost, surfels as surfels_mod
from badslam_tpu.models.association import (
    COS_NORMAL_COMPATIBILITY_THRESHOLD,
    DEPTH_TUKEY_PARAMETER,
    DepthParamsArrays,
    depth_residual_inv_stddev,
)
from badslam_tpu.models.surfels import SurfelStore
from badslam_tpu.ops import depth_model, interp
from badslam_tpu.ops.depth_proc import normals_3d

# kernel_supporting_surfels.cu merge normal threshold: cos(pi/4) via
# kernels.cc cos_surfel_merge_normal_threshold = cos(M_PI / 4).
COS_SURFEL_MERGE_NORMAL_THRESHOLD = 0.7071067811865476
MERGE_ROUNDS = 3  # kMergeBufferCount (kernels.cuh:52)


def _cell_grid_shape(height: int, width: int, cell: int) -> Tuple[int, int]:
  return (-(-height // cell), -(-width // cell))


def _pixel_association_with_keyframe(
    pos: jax.Array,           # (N, 3) global positions
    normal: jax.Array,        # (N, 3) global normals
    valid: jax.Array,         # (N,) bool
    frame_T_global: jax.Array,
    kf_depth: jax.Array,
    kf_normals: jax.Array,
    depth_cam: PinholeCamera,
    dp: DepthParamsArrays,
):
  """Shared wrapper over associate_surfels returning the hit-cell ids too."""
  assoc = association.associate_surfels(
      pos, normal, valid, frame_T_global, kf_depth, kf_normals, depth_cam, dp)
  hc, wc = _cell_grid_shape(depth_cam.height, depth_cam.width, dp.cell_size)
  cell_id = (assoc.py // dp.cell_size) * wc + (assoc.px // dp.cell_size)
  return assoc, cell_id, hc * wc


# --- Supporting-surfel detection (creation gate) ---


def supported_cell_mask(
    surfels: SurfelStore,
    frame_T_global: jax.Array,
    kf_depth: jax.Array,
    kf_normals: jax.Array,
    depth_cam: PinholeCamera,
    dp: DepthParamsArrays,
) -> jax.Array:
  """(Hc*Wc,) bool — cells of this keyframe that already have an associated
  surfel (DetermineSupportingSurfelsCUDAKernel without merging)."""
  assoc, cell_id, num_cells = _pixel_association_with_keyframe(
      surfels.pos, surfels.normal, surfels.valid, frame_T_global,
      kf_depth, kf_normals, depth_cam, dp)
  support = jnp.zeros((num_cells,), bool)
  return support.at[jnp.where(assoc.mask, cell_id, num_cells)].set(
      True, mode="drop")


# --- Surfel creation ---


class NewSurfelCandidates(NamedTuple):
  mask: jax.Array        # (P,) bool  — pixel spawns a surfel
  pos: jax.Array         # (P, 3) global position
  normal: jax.Array      # (P, 3) global normal
  radius_sq: jax.Array   # (P,)
  color: jax.Array       # (P, 3) float [0,1]
  desc: jax.Array        # (P, 2)


def _first_valid_pixel_per_cell(candidate: jax.Array, cell: int) -> jax.Array:
  """(H, W) bool -> (H, W) bool keeping only the first candidate pixel (row-
  major order) inside each cell x cell sparsification block.

  Deterministic replacement for the reference's atomicCAS race
  (kernel_create_surfels.cu:58-60).
  """
  h, w = candidate.shape
  hc, wc = _cell_grid_shape(h, w, cell)
  pad_h, pad_w = hc * cell - h, wc * cell - w
  p = jnp.pad(candidate, ((0, pad_h), (0, pad_w)))
  # (Hc, cell, Wc, cell) -> (Hc, Wc, cell*cell) with in-cell row-major order.
  blocks = p.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3).reshape(hc, wc, cell * cell)
  first = jnp.argmax(blocks, axis=-1)  # first True (or 0 if none)
  any_valid = jnp.any(blocks, axis=-1)
  onehot = jax.nn.one_hot(first, cell * cell, dtype=bool) & any_valid[..., None]
  out = onehot.reshape(hc, wc, cell, cell).transpose(0, 2, 1, 3).reshape(hc * cell, wc * cell)
  return out[:h, :w]


def compute_new_surfel_candidates(
    surfels: SurfelStore,
    kf_depth: jax.Array,       # (H, W) raw metric depth (filtered), 0 invalid
    kf_normals: jax.Array,     # (H, W, 2)
    kf_radius_sq: jax.Array,   # (H, W)
    kf_intensity: jax.Array,   # (H, W) in [0, 1]
    kf_rgb: jax.Array,         # (H, W, 3) uint8
    global_T_frame: jax.Array,
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    dp: DepthParamsArrays,
) -> NewSurfelCandidates:
  """Candidate surfels for every pixel of a keyframe whose sparsification cell
  has no supporting surfel (serializing kernel + CreateNewSurfel,
  kernel_create_surfels.cu:41-162). Returns dense (P = H*W) masked attributes.
  """
  h, w = kf_depth.shape
  frame_T_global = se3.inverse(global_T_frame)

  support = supported_cell_mask(
      surfels, frame_T_global, kf_depth, kf_normals, depth_cam, dp)
  hc, wc = _cell_grid_shape(h, w, dp.cell_size)
  support_img = support.reshape(hc, wc)

  ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
  valid = kf_depth > 0.0
  border = (xs >= 1) & (ys >= 1) & (xs < w - 1) & (ys < h - 1)  # kBorder = 1
  unsupported = ~support_img[ys // dp.cell_size, xs // dp.cell_size]
  candidate = valid & border & unsupported
  candidate = _first_valid_pixel_per_cell(candidate, dp.cell_size)

  # Attributes (CreateNewSurfel, kernel_create_surfels.cu:97-162).
  calibrated = depth_model.calibrate_depth_image(
      dp.a, dp.cfactor, kf_depth, dp.cell_size)
  local_pos = depth_cam.unproject_center(
      xs.astype(jnp.float32), ys.astype(jnp.float32), calibrated)
  gpos = se3.transform_points(global_T_frame, local_pos.reshape(-1, 3))
  gnormal = se3.rotate(global_T_frame, normals_3d(kf_normals).reshape(-1, 3))
  radius_sq = kf_radius_sq.ravel()

  # Color sample at the color-camera pixel (corner conv: x+0.5, y+0.5).
  d2c = DepthToColorTransform.between(depth_cam, color_cam)
  depth_pxy = jnp.stack(
      [xs.astype(jnp.float32) + 0.5, ys.astype(jnp.float32) + 0.5], axis=-1
  ).reshape(-1, 2)
  color_pxy, _ = d2c.apply(depth_pxy)
  rgb_f = kf_rgb.astype(jnp.float32) * (1.0 / 255.0)
  color = jnp.stack(
      [interp.sample_bilinear(rgb_f[..., c], color_pxy[:, 0], color_pxy[:, 1])
       for c in range(3)],
      axis=-1,
  )

  # Initial descriptor: raw residual against a zero descriptor
  # (= 180 * (I(t_i) - I(c))), kernel_create_surfels.cu:141-151.
  t1_pxy, t2_pxy = cost.tangent_projections(
      gpos, gnormal, radius_sq,
      frame_T_global[0:3, 0:3], frame_T_global[0:3, 3], color_cam)
  d1, d2 = cost.raw_descriptor_residual(
      kf_intensity, color_pxy, t1_pxy, t2_pxy,
      jnp.zeros((h * w, 2), jnp.float32))

  return NewSurfelCandidates(
      mask=candidate.ravel(),
      pos=gpos,
      normal=gnormal,
      radius_sq=radius_sq,
      color=color,
      desc=jnp.stack([d1, d2], axis=-1),
  )


def filter_candidates_by_observations(
    cand: NewSurfelCandidates,
    kf_depth: jax.Array,
    kf_normals: jax.Array,
    global_T_frame: jax.Array,
    covis_depth: jax.Array,     # (K, H, W) full keyframe depth stack
    covis_normals: jax.Array,   # (K, H, W, 2)
    covis_T_global: jax.Array,  # (K, 4, 4) global_T_frame per keyframe
    covis_mask: jax.Array,      # (K,) bool — covisible with the new keyframe
    depth_cam: PinholeCamera,
    dp: DepthParamsArrays,
    min_observation_count,
) -> jax.Array:
  """Returns the filtered candidate mask: each candidate starts with one
  observation (its own keyframe), accumulates observations / free-space
  violations over the covisible keyframes, and survives iff
  ``obs >= min_observation_count and violations <= obs``
  (CountObservationsForNewSurfelsCUDAKernel + FilterNewSurfelsCUDAKernel,
  kernel_create_surfels.cu:214-337).
  """

  def scan_body(carry, inputs):
    obs, fsv = carry
    c_depth, c_normals, c_T, c_valid = inputs
    frame_T_global = se3.inverse(c_T)
    assoc = association.associate_surfels(
        cand.pos, cand.normal, cand.mask, frame_T_global,
        c_depth, c_normals, depth_cam, dp)
    obs = obs + (assoc.mask & c_valid).astype(jnp.int32)
    fsv = fsv + (assoc.free_space_violation & c_valid).astype(jnp.int32)
    return (obs, fsv), None

  p = cand.mask.shape[0]
  init = (jnp.ones((p,), jnp.int32), jnp.zeros((p,), jnp.int32))
  (obs, fsv), _ = jax.lax.scan(
      scan_body, init, (covis_depth, covis_normals, covis_T_global, covis_mask))
  return cand.mask & (obs >= min_observation_count) & (fsv <= obs)


def create_surfels_for_keyframe(
    surfels: SurfelStore,
    kf_depth: jax.Array,
    kf_normals: jax.Array,
    kf_radius_sq: jax.Array,
    kf_intensity: jax.Array,
    kf_rgb: jax.Array,
    global_T_frame: jax.Array,
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    dp: DepthParamsArrays,
    covis_depth: jax.Array,
    covis_normals: jax.Array,
    covis_T_global: jax.Array,
    covis_mask: jax.Array,
    min_observation_count,
    filter_new_surfels: bool = True,
) -> SurfelStore:
  """Full creation pipeline (CreateSurfelsForKeyframeCUDA + driver,
  direct_ba.cc:340-405). New surfels are appended masked and marked active."""
  cand = compute_new_surfel_candidates(
      surfels, kf_depth, kf_normals, kf_radius_sq, kf_intensity, kf_rgb,
      global_T_frame, depth_cam, color_cam, dp)
  mask = cand.mask
  if filter_new_surfels:
    mask = filter_candidates_by_observations(
        cand, kf_depth, kf_normals, global_T_frame,
        covis_depth, covis_normals, covis_T_global, covis_mask,
        depth_cam, dp, min_observation_count)
  return surfels_mod.append(
      surfels, cand.pos, cand.normal, cand.radius_sq, cand.color, cand.desc,
      mask)


# --- Supporting-surfel merge ---


def merge_surfels_for_keyframe(
    surfels: SurfelStore,
    frame_T_global: jax.Array,
    kf_depth: jax.Array,
    kf_normals: jax.Array,
    depth_cam: PinholeCamera,
    dp: DepthParamsArrays,
    surfel_merge_dist_factor: float = 0.8,
) -> SurfelStore:
  """Merge redundant surfels that associate with the same sparsification cell
  of this keyframe (DetermineSupportingSurfelsAndMergeSurfelsCUDA,
  kernel_supporting_surfels.cu:45-97).

  Round i selects the lowest-index unresolved surfel per cell as cluster head;
  surfels mergeable with their head (normal dot > cos(45 deg), squared distance
  < merge_factor^2 * min radius^2) are invalidated; non-mergeable ones go to
  the next round (the reference holds up to kMergeBufferCount=3 heads/cell).
  """
  assoc, cell_id, num_cells = _pixel_association_with_keyframe(
      surfels.pos, surfels.normal, surfels.valid, frame_T_global,
      kf_depth, kf_normals, depth_cam, dp)
  n = surfels.capacity
  idx = jnp.arange(n, dtype=jnp.int32)
  merge_dist_sq = surfel_merge_dist_factor * surfel_merge_dist_factor

  alive = surfels.valid
  unresolved = assoc.mask  # still competing for a cell slot
  for _ in range(MERGE_ROUNDS):
    contender = unresolved & alive
    seg = jnp.where(contender, cell_id, num_cells)
    head_per_cell = jax.ops.segment_min(
        jnp.where(contender, idx, n), seg, num_segments=num_cells + 1,
        indices_are_sorted=False)
    my_head = head_per_cell[jnp.minimum(seg, num_cells)]
    is_head = contender & (my_head == idx)
    has_head = contender & (my_head < idx) & (my_head < n)
    head_safe = jnp.clip(my_head, 0, n - 1)

    head_normal = surfels.normal[head_safe]
    head_pos = surfels.pos[head_safe]
    head_radius = surfels.radius_sq[head_safe]
    normal_ok = (
        jnp.sum(head_normal * surfels.normal, axis=-1)
        > COS_SURFEL_MERGE_NORMAL_THRESHOLD
    )
    min_radius_sq = jnp.minimum(head_radius, surfels.radius_sq)
    dist_ok = (
        jnp.sum((head_pos - surfels.pos) ** 2, axis=-1)
        < min_radius_sq * merge_dist_sq
    )
    merged = has_head & normal_ok & dist_ok
    alive = alive & ~merged
    # Heads and merged surfels leave the competition; the rest try again.
    unresolved = unresolved & ~is_head & ~merged

  # NOTE: count (the allocation watermark) is intentionally unchanged —
  # lowering it would let the next append() overwrite live surfels.
  return surfels._replace(
      valid=alive,
      active=surfels.active & alive,
  )


# --- Deletion + radius update ---


def delete_surfels_and_update_radii(
    surfels: SurfelStore,
    kf: "KeyframeStore",  # noqa: F821 — forward ref to avoid import cycle
    depth_cam: PinholeCamera,
    dp: DepthParamsArrays,
    min_observation_count,
    update_radii: bool = True,
) -> SurfelStore:
  """Count observations and free-space violations over ALL keyframes; delete
  surfels with obs < min_observation_count or violations > obs; set radius to
  the minimum observed pixel radius (DeleteSurfelsAndUpdateRadiiCUDA,
  kernel_delete_surfels.cu:42-160)."""
  n = surfels.capacity

  def scan_body(carry, inputs):
    obs, fsv, min_r = carry
    depth, normals, radius_img, T, valid = inputs
    frame_T_global = se3.inverse(T)
    assoc = association.associate_surfels(
        surfels.pos, surfels.normal, surfels.valid, frame_T_global,
        depth, normals, depth_cam, dp)
    m = assoc.mask & valid
    obs = obs + m.astype(jnp.int32)
    fsv = fsv + (assoc.free_space_violation & valid).astype(jnp.int32)
    if update_radii:
      from badslam_tpu.ops.interp import gather_image as _gi
      r_obs = _gi(radius_img, assoc.py, assoc.px)
      min_r = jnp.where(m, jnp.minimum(min_r, r_obs), min_r)
    return (obs, fsv, min_r), None

  init = (
      jnp.zeros((n,), jnp.int32),
      jnp.zeros((n,), jnp.int32),
      jnp.full((n,), jnp.inf, jnp.float32),
  )
  (obs, fsv, min_r), _ = jax.lax.scan(
      scan_body, init,
      (kf.depth, kf.normals, kf.radius_sq, kf.global_T_frame, kf.valid))

  delete = surfels.valid & ((obs < min_observation_count) | (fsv > obs))
  alive = surfels.valid & ~delete
  new_radius = surfels.radius_sq
  if update_radii:
    new_radius = jnp.where(alive & jnp.isfinite(min_r), min_r, new_radius)
  # count (allocation watermark) intentionally unchanged; see merge above.
  return surfels._replace(
      valid=alive,
      active=surfels.active & alive,
      radius_sq=new_radius,
  )


# --- Activation ---


def update_surfel_activation(
    surfels: SurfelStore,
    kf: "KeyframeStore",  # noqa: F821
    depth_cam: PinholeCamera,
    dp: DepthParamsArrays,
    keep_active: jax.Array,  # (N,) bool — surfels forced active (new ones)
) -> SurfelStore:
  """A surfel is active iff it is observed by an ACTIVE keyframe (or forced)
  (UpdateSurfelActivationCUDA, kernel_surfel_activation.cu:38-80)."""
  from badslam_tpu.models.keyframes import ACTIVE  # local: avoid import cycle

  def scan_body(active, inputs):
    depth, normals, T, valid, activation = inputs
    is_active_kf = valid & (activation == ACTIVE)
    frame_T_global = se3.inverse(T)
    assoc = association.associate_surfels(
        surfels.pos, surfels.normal, surfels.valid, frame_T_global,
        depth, normals, depth_cam, dp)
    return active | (assoc.mask & is_active_kf), None

  active, _ = jax.lax.scan(
      scan_body, keep_active & surfels.valid,
      (kf.depth, kf.normals, kf.global_T_frame, kf.valid, kf.activation))
  return surfels._replace(active=active & surfels.valid)


# --- Color assignment (visualization / export) ---


def assign_colors(
    surfels: SurfelStore,
    kf: "KeyframeStore",  # noqa: F821
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    dp: DepthParamsArrays,
) -> SurfelStore:
  """Set each surfel's color to the average of its observed keyframe colors
  (AssignColorsCUDA, kernel_assign_colors.cu:42-140 — the reference uses
  this for visualization; we use it to refresh colors before export)."""
  n = surfels.capacity
  d2c = DepthToColorTransform.between(depth_cam, color_cam)

  def scan_body(carry, inputs):
    count, rgb_sum = carry
    depth, normals, rgb, T, valid = inputs
    frame_T_global = se3.inverse(T)
    assoc = association.associate_surfels(
        surfels.pos, surfels.normal, surfels.valid, frame_T_global,
        depth, normals, depth_cam, dp)
    color_pxy, in_color = d2c.apply(assoc.pxy)
    m = assoc.mask & in_color & valid
    rgb_f = rgb.astype(jnp.float32) * (1.0 / 255.0)
    sample = jnp.stack(
        [interp.sample_bilinear(rgb_f[..., c], color_pxy[:, 0],
                                color_pxy[:, 1]) for c in range(3)],
        axis=-1)
    count = count + m.astype(jnp.float32)
    rgb_sum = rgb_sum + jnp.where(m[:, None], sample, 0.0)
    return (count, rgb_sum), None

  (count, rgb_sum), _ = jax.lax.scan(
      scan_body,
      (jnp.zeros((n,), jnp.float32), jnp.zeros((n, 3), jnp.float32)),
      (kf.depth, kf.normals, kf.rgb, kf.global_T_frame, kf.valid))
  observed = count > 0
  new_color = jnp.where(
      observed[:, None], rgb_sum / jnp.maximum(count, 1.0)[:, None],
      surfels.color)
  return surfels._replace(color=new_color)
