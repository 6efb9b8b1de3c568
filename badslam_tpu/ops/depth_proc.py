"""Depth-image preprocessing: bilateral filter + cutoff, normals, radii,
min/max depth.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
cuda_depth_processing.cu (kernels at :42, :134, :331, :391). Depth here is
float32 metric meters with <= 0 meaning invalid (replaces u16 + invalid bit).

TPU design: fixed-radius stencils expressed as static shifted-slice sums over a
padded image — XLA fuses the whole stencil into one elementwise loop; no
gathers, no data-dependent shapes.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.ops import depth_model


def _shifted(padded: jax.Array, dy: int, dx: int, h: int, w: int, radius: int) -> jax.Array:
  """View of the padded image shifted by (dy, dx), shape (h, w). Static
  slicing (offsets are Python ints) — also what Pallas/Mosaic can lower,
  unlike lax.dynamic_slice (ops/pallas_preprocess.py reuses these
  stencils inside its kernel)."""
  return padded[radius + dy:radius + dy + h, radius + dx:radius + dx + w]


def bilateral_filter_and_cutoff(
    depth: jax.Array,
    sigma_xy: float = 1.5,
    sigma_inv_depth: float = 0.005,
    radius_factor: float = 2.0,
    max_depth: float = 3.0,
) -> jax.Array:
  """Joint xy/inverse-depth bilateral filter with max-depth cutoff
  (BilateralFilteringAndDepthCutoffCUDAKernel, cuda_depth_processing.cu:42-98).

  Filtering happens in inverse-depth space; the weighted mean of inverse depth
  is inverted back. Pixels with depth <= 0 or > max_depth become invalid (0).
  """
  h, w = depth.shape
  radius = int(radius_factor * sigma_xy + 0.5)
  radius_sq = radius * radius
  denom_xy = 2.0 * sigma_xy * sigma_xy
  denom_value = 2.0 * sigma_inv_depth * sigma_inv_depth

  center_valid = (depth > 0.0) & (depth <= max_depth)
  inv_center = 1.0 / jnp.where(depth > 0.0, depth, 1.0)

  padded = jnp.pad(depth, radius)  # zero padding = invalid samples
  wsum = jnp.zeros_like(depth)
  vsum = jnp.zeros_like(depth)
  for dy in range(-radius, radius + 1):
    for dx in range(-radius, radius + 1):
      grid_sq = dx * dx + dy * dy
      if grid_sq > radius_sq:
        continue
      sample = _shifted(padded, dy, dx, h, w, radius)
      sample_valid = sample > 0.0
      inv_sample = 1.0 / jnp.where(sample_valid, sample, 1.0)
      diff = inv_center - inv_sample
      wgt = jnp.where(
          sample_valid,
          jnp.exp(-grid_sq / denom_xy - (diff * diff) / denom_value),
          0.0,
      )
      wsum = wsum + wgt
      vsum = vsum + wgt * inv_sample

  ok = center_valid & (wsum > 0.0)
  out = wsum / jnp.where(vsum > 0.0, vsum, 1.0)  # 1 / weighted-mean inverse depth
  return jnp.where(ok, out, 0.0)


def compute_normals_planar(
    depth: jax.Array,
    camera: PinholeCamera,
    a,
    cfactor: jax.Array,
    cell: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """compute_normals in PLANAR form: 3-D points carried as (x, y, z)
  component planes instead of (H, W, 3) arrays. Identical math; this is the
  VMEM-native layout (a 3-wide minor dimension tiles terribly against the
  128-lane registers, and Pallas/Mosaic cannot lower the minor-dim stacks
  at all — ops/pallas_preprocess.py runs this inside its kernel).

  Returns (out_depth, normal_x, normal_y)."""
  h, w = depth.shape
  calib = depth_model.calibrate_depth_image(a, cfactor, depth, cell)

  valid = depth > 0.0
  # f32 round trip: Mosaic cannot pad i1 vectors (pallas_preprocess.py).
  padded_valid = jnp.pad(valid.astype(jnp.float32), 1) > 0.5
  padded_calib = jnp.pad(calib, 1)

  def shift(arr, dy, dx):
    return arr[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

  v_l, v_r = shift(padded_valid, 0, -1), shift(padded_valid, 0, 1)
  v_t, v_b = shift(padded_valid, -1, 0), shift(padded_valid, 1, 0)
  all_valid = valid & v_l & v_r & v_t & v_b

  # Border pixels invalid (kBorder = 1). Built from iota comparisons —
  # scatter-free so Pallas/Mosaic can lower it (pallas_preprocess.py).
  ys_b = jnp.arange(h)[:, None]
  xs_b = jnp.arange(w)[None, :]
  border = ((ys_b == 0) | (ys_b == h - 1) | (xs_b == 0) | (xs_b == w - 1))
  all_valid = all_valid & ~border

  d_c = calib
  d_l, d_r = shift(padded_calib, 0, -1), shift(padded_calib, 0, 1)
  d_t, d_b = shift(padded_calib, -1, 0), shift(padded_calib, 1, 0)

  xs = jnp.arange(w)[None, :].astype(depth.dtype)
  ys = jnp.arange(h)[:, None].astype(depth.dtype)

  def unproj(px, py, d):
    """(x, y, z) component planes of the unprojection."""
    return (d * (camera.fx_inv * px + camera.cx_inv),
            d * (camera.fy_inv * py + camera.cy_inv),
            d)

  p_c = unproj(xs, ys, d_c)
  p_l = unproj(xs - 1, ys, d_l)
  p_r = unproj(xs + 1, ys, d_r)
  p_t = unproj(xs, ys - 1, d_t)
  p_b = unproj(xs, ys + 1, d_b)

  ratio_thr_sq = 4.0  # kRatioThreshold = 2

  def pick_difference(p_neg, p_pos):
    """Occlusion-aware difference: full central difference when the two sides
    have comparable distances; else one-sided toward the nearer side."""
    neg_sq = sum((n - c) ** 2 for n, c in zip(p_neg, p_c))
    pos_sq = sum((p - c) ** 2 for p, c in zip(p_pos, p_c))
    ratio = neg_sq / jnp.maximum(pos_sq, 1e-30)
    use_central = (ratio < ratio_thr_sq) & (ratio > 1.0 / ratio_thr_sq)
    nearer_neg = neg_sq < pos_sq
    return tuple(
        jnp.where(use_central, pos - neg,
                  jnp.where(nearer_neg, c - neg, pos - c))
        for neg, pos, c in zip(p_neg, p_pos, p_c))

  ax, ay, az = pick_difference(p_l, p_r)   # left-to-right
  bx, by, bz = pick_difference(p_b, p_t)   # bottom-to-top

  nx = ay * bz - az * by
  ny = az * bx - ax * bz
  nz = ax * by - ay * bx
  length = jnp.sqrt(nx * nx + ny * ny + nz * nz)
  degenerate = ~(length > 1e-6)
  sign = jnp.where(camera.fy_inv < 0, -1.0, 1.0)
  inv_len = sign / jnp.where(degenerate, 1.0, length)
  keep = all_valid & ~degenerate
  out_x = jnp.where(keep, nx * inv_len, 0.0)
  out_y = jnp.where(keep, ny * inv_len, 0.0)
  out_depth = jnp.where(all_valid, depth, 0.0)
  return out_depth, out_x, out_y


def compute_normals(
    depth: jax.Array,
    camera: PinholeCamera,
    a,
    cfactor: jax.Array,
    cell: int,
) -> Tuple[jax.Array, jax.Array]:
  """Central-difference normals with the occlusion-aware side selection
  (ComputeNormalsCUDAKernel, cuda_depth_processing.cu:134-255).

  Returns (out_depth, normals_xy):
    out_depth: depth with border/incomplete-neighborhood pixels invalidated;
    normals_xy: (H, W, 2) image-space normal x/y of the *normalized* 3D normal
      (z is reconstructed as -sqrt(max(0, 1-x^2-y^2)) when needed).
  Normals are computed on *calibrated* depth.
  """
  out_depth, out_x, out_y = compute_normals_planar(
      depth, camera, a, cfactor, cell)
  return out_depth, jnp.stack([out_x, out_y], axis=-1)


def normal_z(nxy: jax.Array) -> jax.Array:
  """Reconstruct z from stored x/y (U16ToImageSpaceNormal, util.cuh:123-130):
  z = -sqrt(max(0, 1 - x^2 - y^2)); points toward the camera."""
  zsq = 1.0 - nxy[..., 0] ** 2 - nxy[..., 1] ** 2
  return -jnp.sqrt(jnp.maximum(zsq, 0.0))


def normals_3d(nxy: jax.Array) -> jax.Array:
  return jnp.concatenate([nxy, normal_z(nxy)[..., None]], axis=-1)


def compute_radii_and_remove_isolated(
    depth: jax.Array, camera: PinholeCamera
) -> Tuple[jax.Array, jax.Array]:
  """Point radius = min squared distance to the 4-neighborhood; pixels with
  fewer than 4 valid neighbors are invalidated
  (ComputePointRadiiAndRemoveIsolatedPixelsCUDAKernel,
  cuda_depth_processing.cu:331-358). Uses *uncalibrated* depth, as the
  reference does.

  Returns (radius_sq, out_depth).
  """
  h, w = depth.shape
  valid = depth > 0.0
  padded = jnp.pad(depth, 1)
  # f32 round trip: Mosaic cannot pad i1 vectors (pallas_preprocess.py).
  padded_valid = jnp.pad(valid.astype(jnp.float32), 1) > 0.5

  def shift(arr, dy, dx):
    return arr[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

  xs = jnp.arange(w)[None, :].astype(depth.dtype)
  ys = jnp.arange(h)[:, None].astype(depth.dtype)

  def unproj(px, py, d):
    """(x, y, z) component planes — planar form; see compute_normals_planar
    for why (VMEM layout + Pallas lowering)."""
    return (d * (camera.fx_inv * px + camera.cx_inv),
            d * (camera.fy_inv * py + camera.cy_inv),
            d)

  p_c = unproj(xs, ys, depth)

  min_sq = jnp.full((h, w), jnp.inf, dtype=depth.dtype)
  count = jnp.zeros((h, w), dtype=jnp.int32)
  for dy, dx in ((0, -1), (0, 1), (-1, 0), (1, 0)):
    d_n = shift(padded, dy, dx)
    v_n = shift(padded_valid, dy, dx)
    p_n = unproj(xs + dx, ys + dy, d_n)
    dist_sq = sum((n - c) ** 2 for n, c in zip(p_n, p_c))
    min_sq = jnp.where(v_n & (dist_sq < min_sq), dist_sq, min_sq)
    count = count + v_n.astype(jnp.int32)

  ok = valid & (count >= 4)
  radius_sq = jnp.where(ok, min_sq, 0.0)
  out_depth = jnp.where(ok, depth, 0.0)
  return radius_sq, out_depth


def compute_min_max_depth(depth: jax.Array) -> Tuple[jax.Array, jax.Array]:
  """(min, max) over valid pixels (ComputeMinMaxDepthCUDAKernel,
  cuda_depth_processing.cu:391-425)."""
  valid = depth > 0.0
  min_d = jnp.min(jnp.where(valid, depth, jnp.inf))
  max_d = jnp.max(jnp.where(valid, depth, 0.0))
  return min_d, max_d


def downscale_depth_median_excluding_invalid(depth: jax.Array,
                                             levels: int = 1) -> jax.Array:
  """Half-resolution depth downscale taking the median of the VALID samples
  in each 2x2 block (libvis Image::DownscaleUsingMedianWhileExcluding(0),
  used by the --pyramid_level_for_depth input path, bad_slam.cc:668-673).
  For 2 valid samples the lower one is returned (libvis takes element
  count/2 of the sorted run)."""
  for _ in range(levels):
    h2, w2 = depth.shape[0] // 2, depth.shape[1] // 2
    d = depth[: 2 * h2, : 2 * w2]
    q = jnp.stack([d[0::2, 0::2], d[0::2, 1::2], d[1::2, 0::2],
                   d[1::2, 1::2]], axis=0)          # (4, h2, w2)
    valid = q > 0.0
    n = valid.sum(axis=0)
    big = jnp.where(valid, q, jnp.inf)
    srt = jnp.sort(big, axis=0)
    idx = jnp.where(n > 0, (n - 1) // 2, 0)
    med = jnp.take_along_axis(srt, idx[None], axis=0)[0]
    depth = jnp.where(n > 0, med, 0.0)
  return depth


def downscale_rgb(rgb: jax.Array, levels: int = 1) -> jax.Array:
  """Half-resolution RGB by 2x2 averaging (ImagePyramid for
  --pyramid_level_for_color)."""
  out = rgb.astype(jnp.float32)
  for _ in range(levels):
    h2, w2 = out.shape[0] // 2, out.shape[1] // 2
    d = out[: 2 * h2, : 2 * w2]
    out = 0.25 * (d[0::2, 0::2] + d[0::2, 1::2] + d[1::2, 0::2]
                  + d[1::2, 1::2])
  return jnp.clip(out + 0.5, 0, 255).astype(jnp.uint8)


def median_filter_and_densify(depth: jax.Array, iterations: int) -> jax.Array:
  """Optional CPU-side median filter + densification pass
  (preprocessing.cc:40-85): each iteration replaces every pixel by the median
  of the valid entries in its 3x3 neighborhood (filling holes when at least
  one neighbor is valid)."""
  if iterations <= 0:
    return depth
  h, w = depth.shape
  for _ in range(iterations):
    padded = jnp.pad(depth, 1)
    samples = []
    valids = []
    for dy in (-1, 0, 1):
      for dx in (-1, 0, 1):
        s = padded[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
        samples.append(s)
        valids.append(s > 0.0)
    stack = jnp.stack(samples, axis=0)  # (9, H, W)
    vstack = jnp.stack(valids, axis=0)
    n_valid = jnp.sum(vstack, axis=0)
    # Median over valid entries: sort with invalid pushed to +inf, index (n-1)//2.
    sort_in = jnp.where(vstack, stack, jnp.inf)
    sorted_stack = jnp.sort(sort_in, axis=0)
    idx = jnp.maximum(n_valid - 1, 0) // 2
    med = jnp.take_along_axis(sorted_stack, idx[None, ...], axis=0)[0]
    depth = jnp.where(n_valid > 0, med, 0.0)
  return depth
