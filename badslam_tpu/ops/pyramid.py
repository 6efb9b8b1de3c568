"""Multi-resolution pyramid construction for odometry.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
kernel_downsample.cu (DownsampleImagesCUDAKernel :107-160,
CalibrateAndDownsampleImagesCUDAKernel :40-105).

Depth downsampling is occlusion-aware: among the four source pixels, take the
valid depth *closest to the valid-average* (a median-like selection that never
invents depths across discontinuities), and carry that pixel's normal.
Color downsamples with a bilinear tap at the shared corner (= 4-pixel mean),
then re-quantizes to u8 as the reference's texture write does.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FramePyramidLevel(NamedTuple):
  depth: jax.Array        # (H, W) float32 metric depth, 0 = invalid
  normals: jax.Array      # (H, W, 2) image-space normal x/y
  intensity: jax.Array    # (H, W) float32 in [0, 1]


def _quads(img: jax.Array) -> jax.Array:
  """(H, W, ...) -> (4, H//2, W//2, ...) the 2x2 source pixels per output."""
  h2, w2 = img.shape[0] // 2, img.shape[1] // 2
  img = img[: 2 * h2, : 2 * w2]
  return jnp.stack(
      [
          img[0::2, 0::2],
          img[0::2, 1::2],
          img[1::2, 0::2],
          img[1::2, 1::2],
      ],
      axis=0,
  )


def downsample_depth_and_normals(
    depth: jax.Array, normals: jax.Array
) -> Tuple[jax.Array, jax.Array]:
  """Half-resolution depth + carried normals (closest-to-average selection)."""
  q = _quads(depth)                      # (4, h, w)
  valid = q > 0.0
  count = jnp.sum(valid, axis=0)
  avg = jnp.sum(jnp.where(valid, q, 0.0), axis=0) / jnp.maximum(count, 1)
  dist = jnp.where(valid, jnp.abs(q - avg), jnp.inf)
  closest = jnp.argmin(dist, axis=0)     # (h, w)
  out_depth = jnp.where(
      count > 0, jnp.take_along_axis(q, closest[None], axis=0)[0], 0.0
  )
  qn = _quads(normals)                   # (4, h, w, 2)
  out_normals = jnp.take_along_axis(qn, closest[None, ..., None], axis=0)[0]
  return out_depth, out_normals


def downsample_intensity(intensity: jax.Array) -> jax.Array:
  """Half-res color: 4-pixel mean, re-quantized to u8 steps
  (tex2D at the shared corner + 255*c + 0.5 u8 write, kernel_downsample.cu:157-158)."""
  q = _quads(intensity)
  mean = jnp.mean(q, axis=0)
  return jnp.floor(255.0 * mean + 0.5) * (1.0 / 255.0)


def build_pyramid(
    depth: jax.Array, normals: jax.Array, intensity: jax.Array, num_scales: int
) -> List[FramePyramidLevel]:
  """Full pyramid, level 0 = full resolution, matching
  PairwiseFrameTrackingBuffers (pairwise_frame_tracking.cc:39-80)."""
  levels = [FramePyramidLevel(depth, normals, intensity)]
  for _ in range(num_scales - 1):
    d, n = downsample_depth_and_normals(levels[-1].depth, levels[-1].normals)
    c = downsample_intensity(levels[-1].intensity)
    levels.append(FramePyramidLevel(d, n, c))
  return levels
