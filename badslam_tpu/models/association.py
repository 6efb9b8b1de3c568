"""Surfel -> keyframe-pixel data association as dense masked math.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
surfel_projection_nvcc_only.cuh:48-127 (``IsAssociatedWithPixel``) and
:300-328 (``SurfelProjectsToAssociatedPixel``). The divergent early-exit CUDA
control flow becomes one vectorized predicate over all N surfels — the
TPU-native formulation (SURVEY.md §7.1).

Association criteria (all must hold):
  1. surfel projects in front of the camera (z > 0) into image bounds;
  2. the hit pixel has valid depth;
  3. |calibrated_pixel_depth - surfel_local_z| <= tukey_param * sigma, with
     sigma the propagated depth stddev (cost_function.cuh:81-88); the
     free-space-violation flag marks measurements far *behind* the surfel;
  4. the surfel normal faces the camera (dot(local_pos, local_normal) <= 0);
  5. surfel normal vs. measured pixel normal within 40 degrees
     (cos threshold 0.76604, kernels.cuh:56-58).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.ops import depth_model
from badslam_tpu.ops.depth_proc import normals_3d
from badslam_tpu.ops.interp import gather_image

# kernels.cuh:56-58 — cos(40 deg)
COS_NORMAL_COMPATIBILITY_THRESHOLD = 0.76604
# cost_function.cuh:48 — Tukey parameter on the depth residual
DEPTH_TUKEY_PARAMETER = 10.0
# cost_function.cuh:52 — empirical stereo-matching uncertainty factor
DEPTH_UNCERTAINTY_EMPIRICAL_FACTOR = 0.1


class DepthParamsArrays(NamedTuple):
  """On-device depth calibration state (surfel_projection.cuh:129-149)."""

  a: jax.Array          # () float32 — global deformation alpha_1
  cfactor: jax.Array    # (Hc, Wc) float32 — per-cell deformation field
  baseline_fx: jax.Array  # () float32
  # static:
  cell_size: int        # sparse_surfel_cell_size (static int)


class AssociationResult(NamedTuple):
  mask: jax.Array                 # (N,) bool — fully associated
  free_space_violation: jax.Array  # (N,) bool
  observed: jax.Array             # (N,) bool — passed the depth test band
  local_pos: jax.Array            # (N, 3) surfel position in frame coords
  local_normal: jax.Array         # (N, 3) surfel normal in frame coords
  px: jax.Array                   # (N,) int32 hit pixel x
  py: jax.Array                   # (N,) int32 hit pixel y
  pxy: jax.Array                  # (N, 2) float corner-convention projection
  calibrated_depth: jax.Array     # (N,) pixel calibrated depth
  inv_stddev: jax.Array           # (N,) propagated inverse depth stddev


def depth_residual_inv_stddev(
    nx: jax.Array, ny: jax.Array, depth: jax.Array,
    local_normal: jax.Array, baseline_fx,
) -> jax.Array:
  """cost_function.cuh:86-88."""
  denom = (
      DEPTH_UNCERTAINTY_EMPIRICAL_FACTOR
      * jnp.abs(local_normal[..., 0] * nx + local_normal[..., 1] * ny + local_normal[..., 2])
      * depth * depth
  )
  return baseline_fx / jnp.maximum(denom, 1e-12)


def associate_surfels(
    pos: jax.Array,            # (N, 3) global surfel positions
    normal: jax.Array,         # (N, 3) global surfel normals
    surfel_valid: jax.Array,   # (N,) bool
    frame_T_global: jax.Array,  # (4, 4)
    kf_depth: jax.Array,       # (H, W) raw metric depth, 0 = invalid
    kf_normals: jax.Array,     # (H, W, 2)
    depth_cam: PinholeCamera,
    dp: DepthParamsArrays,
    tukey_scaling: float = 1.0,
) -> AssociationResult:
  """Vectorized SurfelProjectsToAssociatedPixel over all surfels."""
  n = pos.shape[0]
  local_pos = se3.transform_points(frame_T_global, pos)
  z_ok = local_pos[..., 2] > 0.0

  pxy = depth_cam.project_corner(
      jnp.where(z_ok[..., None], local_pos, jnp.asarray([0.0, 0.0, 1.0]))
  )
  in_img = depth_cam.in_image(pxy) & z_ok
  px = jnp.clip(pxy[..., 0].astype(jnp.int32), 0, depth_cam.width - 1)
  py = jnp.clip(pxy[..., 1].astype(jnp.int32), 0, depth_cam.height - 1)

  # Combined depth+normal gather: one (H, W, 3) row gather instead of two.
  combo = jnp.concatenate([kf_depth[..., None], kf_normals], axis=-1)
  g = gather_image(combo, py, px)
  measured = g[..., 0]
  depth_ok = measured > 0.0

  cfac = gather_image(dp.cfactor, py // dp.cell_size, px // dp.cell_size)
  calibrated = depth_model.calibrate_depth(dp.a, cfac, measured)

  local_normal = se3.rotate(frame_T_global, normal)

  nx = depth_cam.nx(px.astype(jnp.float32))
  ny = depth_cam.ny(py.astype(jnp.float32))
  inv_stddev = depth_residual_inv_stddev(nx, ny, calibrated, local_normal, dp.baseline_fx)
  threshold = (tukey_scaling * DEPTH_TUKEY_PARAMETER) / inv_stddev

  depth_diff = calibrated - local_pos[..., 2]
  base_ok = surfel_valid & in_img & depth_ok
  free_space_violation = base_ok & (depth_diff > threshold)
  within_band = base_ok & (jnp.abs(depth_diff) <= threshold)

  # Normal faces the camera.
  facing = jnp.sum(local_pos * local_normal, axis=-1) <= 0.0

  # Normal compatibility with the measurement.
  pixel_normal = normals_3d(g[..., 1:3])
  compat = (
      jnp.sum(local_normal * pixel_normal, axis=-1)
      >= COS_NORMAL_COMPATIBILITY_THRESHOLD
  )

  mask = within_band & facing & compat
  return AssociationResult(
      mask=mask,
      free_space_violation=free_space_violation,
      observed=within_band,
      local_pos=local_pos,
      local_normal=local_normal,
      px=px,
      py=py,
      pxy=pxy,
      calibrated_depth=calibrated,
      inv_stddev=inv_stddev,
  )
