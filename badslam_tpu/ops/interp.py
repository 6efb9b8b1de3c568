"""Bilinear image sampling matching CUDA texture semantics.

The reference samples images via ``tex2D(tex, x, y)`` with corner-convention
float coordinates, linear filtering, and clamp-to-edge addressing
(cost_function.cuh:149-153, 200-253). CUDA's linear filter interpolates the
pixel grid at (x - 0.5, y - 0.5); we reproduce that exactly, including the
truncation/clamping in the analytic gradient used by
``DescriptorJacobianWrtProjectedPosition``.

All functions take arbitrarily-shaped coordinate arrays and gather from a
single (H, W) image. Gathers lower to XLA GatherOp on TPU; the Pallas
optimization pass can swap these out without changing call sites.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gather2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
  """img[iy, ix] with clamp-to-edge (CUDA texture address mode)."""
  h, w = img.shape[0], img.shape[1]
  iy = jnp.clip(iy, 0, h - 1)
  ix = jnp.clip(ix, 0, w - 1)
  return img[iy, ix]


def _lerp_setup(x: jax.Array, y: jax.Array) -> Tuple[jax.Array, ...]:
  """Reference's tap setup: ix = int(max(0, x-0.5)); tx = clamp(x-0.5-ix, 0, 1)."""
  u = jnp.maximum(0.0, x - 0.5)
  v = jnp.maximum(0.0, y - 0.5)
  ix = u.astype(jnp.int32)
  iy = v.astype(jnp.int32)
  tx = jnp.clip(x - 0.5 - ix.astype(x.dtype), 0.0, 1.0)
  ty = jnp.clip(y - 0.5 - iy.astype(y.dtype), 0.0, 1.0)
  return ix, iy, tx, ty


def sample_bilinear(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
  """tex2D(img, x, y) with linear filtering, corner-convention coords."""
  ix, iy, tx, ty = _lerp_setup(x, y)
  tl = gather2d(img, iy, ix)
  tr = gather2d(img, iy, ix + 1)
  bl = gather2d(img, iy + 1, ix)
  br = gather2d(img, iy + 1, ix + 1)
  top = tl + tx * (tr - tl)
  bottom = bl + tx * (br - bl)
  return top + ty * (bottom - top)


def sample_bilinear_grad(img: jax.Array, x: jax.Array, y: jax.Array
                         ) -> Tuple[jax.Array, jax.Array]:
  """d(sample)/dx, d(sample)/dy of the bilinear interpolation — the 4-tap
  analytic gradient from cost_function.cuh:200-212 (per-pixel units)."""
  ix, iy, tx, ty = _lerp_setup(x, y)
  tl = gather2d(img, iy, ix)
  tr = gather2d(img, iy, ix + 1)
  bl = gather2d(img, iy + 1, ix)
  br = gather2d(img, iy + 1, ix + 1)
  dx = (br - bl) * ty + (tr - tl) * (1.0 - ty)
  dy = (br - tr) * tx + (bl - tl) * (1.0 - tx)
  return dx, dy


def sample_bilinear_with_grad(img: jax.Array, x: jax.Array, y: jax.Array
                              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """Fused value + gradient (shares the 4 gathers)."""
  ix, iy, tx, ty = _lerp_setup(x, y)
  tl = gather2d(img, iy, ix)
  tr = gather2d(img, iy, ix + 1)
  bl = gather2d(img, iy + 1, ix)
  br = gather2d(img, iy + 1, ix + 1)
  top = tl + tx * (tr - tl)
  bottom = bl + tx * (br - bl)
  value = top + ty * (bottom - top)
  dx = (br - bl) * ty + (tr - tl) * (1.0 - ty)
  dy = (br - tr) * tx + (bl - tl) * (1.0 - tx)
  return value, dx, dy


def sample_nearest(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
  """Point sampling at corner-convention coords (pixel int(x), int(y))."""
  return gather2d(img, y.astype(jnp.int32), x.astype(jnp.int32))
