"""The non-parametric depth deformation model.

Behavioral spec: /root/reference/applications/badslam/src/badslam/util.cuh:46-63
``RawToCalibratedDepth``: d' = 1 / (1/d + c * exp(-a / d)) where c comes from a
per-cell "cfactor" field (one cell per sparse_surfel_cell_size pixels) and a is
the global deformation factor alpha_1.

Depth convention in this rebuild: float32 metric depth in meters; value <= 0
means invalid (replaces the reference's u16 + kInvalidDepthBit encoding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def calibrate_depth(a, cfactor: jax.Array, depth: jax.Array) -> jax.Array:
  """d' = 1/(1/d + c*exp(-a/d)); passes invalid (<=0) depth through as 0."""
  valid = depth > 0.0
  safe = jnp.where(valid, depth, 1.0)
  inv_depth = 1.0 / safe
  out = 1.0 / (inv_depth + cfactor * jnp.exp(-a * inv_depth))
  return jnp.where(valid, out, 0.0)


def cfactor_shape(height: int, width: int, cell: int) -> tuple:
  """cfactor grid dimensions (direct_ba.cc allocates ceil(size/cell))."""
  return (-(-height // cell), -(-width // cell))


def cfactor_image(cfactor: jax.Array, height: int, width: int, cell: int) -> jax.Array:
  """Upsample the cell grid to a full (H, W) image by nearest lookup
  (cfactor_buffer(py/cell, px/cell) in the reference kernels).

  Implemented as two 0/1 selection MATMULS (U_y @ grid @ S_x with
  U_y[p, i] = [p//cell == i]) instead of a 2-D gather: identical values,
  MXU-friendly, and — unlike gather or a lane-axis repeat+reshape —
  lowerable by Pallas/Mosaic, so the fused preprocess kernel
  (ops/pallas_preprocess.py) can inline it."""
  hc, wc = cfactor.shape
  dt = cfactor.dtype
  uy = (jnp.arange(height)[:, None] // cell
        == jnp.arange(hc)[None, :]).astype(dt)
  sx = (jnp.arange(wc)[:, None]
        == jnp.arange(width)[None, :] // cell).astype(dt)
  return uy @ cfactor @ sx


def calibrate_depth_image(a, cfactor: jax.Array, depth: jax.Array,
                          cell: int) -> jax.Array:
  """Calibrate a full (H, W) depth image with the per-cell cfactor grid."""
  h, w = depth.shape
  c_img = cfactor_image(cfactor, h, w, cell)
  return calibrate_depth(a, c_img, depth)
