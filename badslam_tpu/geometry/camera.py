"""Pinhole camera with the reference's dual pixel-origin conventions.

Behavioral spec from /root/reference:
  applications/badslam/src/badslam/surfel_projection.cuh:40-126 —
  ``PixelCornerProjector`` projects with (fx, fy, cx, cy) where cx/cy use the
  "pixel corner" origin convention (integer coordinates sit on pixel corners);
  ``PixelCenterUnprojector`` converts corner-convention cx/cy to
  center-convention (cx - 0.5) and unprojects integer pixel indices.

These conventions are correctness-critical (SURVEY.md §7.3): a projected float
position ``p`` in corner convention covers pixel ``int(p)``; the unprojection of
integer pixel (x, y) uses the center convention.

The camera is a plain NamedTuple of scalars so it is a jit-friendly pytree, and
``scaled()`` reproduces libvis's pyramid-level scaling (camera.h Scaled()).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
  """Intrinsics in the "pixel corner" convention (reference default storage).

  width/height are static Python ints (shapes must be static under jit);
  fx, fy, cx, cy may be Python floats or traced scalars.
  """

  width: int
  height: int
  fx: jax.Array
  fy: jax.Array
  cx: jax.Array
  cy: jax.Array

  # --- projection (corner convention, surfel_projection.cuh:52-55) ---

  def project_corner(self, p: jax.Array) -> jax.Array:
    """(...,3) camera-space points -> (...,2) float pixels, corner origin."""
    z = p[..., 2]
    return jnp.stack(
        [self.fx * (p[..., 0] / z) + self.cx, self.fy * (p[..., 1] / z) + self.cy],
        axis=-1,
    )

  # --- projection (center convention, used for Jacobians' fx/fy scaling) ---

  @property
  def center_cx(self):
    return self.cx - 0.5

  @property
  def center_cy(self):
    return self.cy - 0.5

  def project_center(self, p: jax.Array) -> jax.Array:
    z = p[..., 2]
    return jnp.stack(
        [
            self.fx * (p[..., 0] / z) + self.center_cx,
            self.fy * (p[..., 1] / z) + self.center_cy,
        ],
        axis=-1,
    )

  # --- unprojection (center convention, surfel_projection.cuh:88-126) ---

  @property
  def fx_inv(self):
    return 1.0 / self.fx

  @property
  def fy_inv(self):
    return 1.0 / self.fy

  @property
  def cx_inv(self):
    return -(self.cx - 0.5) / self.fx

  @property
  def cy_inv(self):
    return -(self.cy - 0.5) / self.fy

  def nx(self, px: jax.Array) -> jax.Array:
    """Normalized image x-coordinate of integer pixel px (center convention)."""
    return self.fx_inv * px + self.cx_inv

  def ny(self, py: jax.Array) -> jax.Array:
    return self.fy_inv * py + self.cy_inv

  def unproject_center(self, px: jax.Array, py: jax.Array, depth: jax.Array) -> jax.Array:
    """Unproject integer pixel indices (center convention) at given depth:
    (...,) x, y, depth -> (...,3)."""
    return jnp.stack(
        [depth * self.nx(px), depth * self.ny(py), depth], axis=-1
    )

  def unproject_grid(self, depth: jax.Array) -> jax.Array:
    """Unproject a full (H, W) depth image -> (H, W, 3) camera-space points."""
    h, w = depth.shape[-2], depth.shape[-1]
    xs = jnp.arange(w, dtype=depth.dtype)
    ys = jnp.arange(h, dtype=depth.dtype)
    nx = (self.fx_inv * xs + self.cx_inv)[None, :]
    ny = (self.fy_inv * ys + self.cy_inv)[:, None]
    return jnp.stack(
        [depth * nx, depth * ny, depth], axis=-1
    )

  # --- pyramid scaling (libvis camera.h Scaled) ---

  def scaled(self, factor: float) -> "PinholeCamera":
    """Scale the camera for a pyramid level. Corner-convention intrinsics scale
    as fx*s, cx*s (the corner origin is scale-invariant). Shrinking floors
    the size so the dims match repeated floor-halving pyramid construction
    (floor(floor(n/2)/2) == floor(n/4)); growing rounds."""
    import math
    size = (lambda v: int(math.floor(v * factor))) if factor < 1.0 else (
        lambda v: int(round(v * factor)))
    return PinholeCamera(
        width=size(self.width),
        height=size(self.height),
        fx=self.fx * factor,
        fy=self.fy * factor,
        cx=self.cx * factor,
        cy=self.cy * factor,
    )

  def half_resolution(self) -> "PinholeCamera":
    return self.scaled(0.5)

  def in_image(self, pxy: jax.Array) -> jax.Array:
    """Bounds test matching ProjectSurfelToImage (util.cuh:67-82):
    float coords must be >= 0 and the containing integer pixel < size."""
    px = pxy[..., 0].astype(jnp.int32)
    py = pxy[..., 1].astype(jnp.int32)
    return (
        (pxy[..., 0] >= 0)
        & (pxy[..., 1] >= 0)
        & (px < self.width)
        & (py < self.height)
    )


class DepthToColorTransform(NamedTuple):
  """Affine pixel transform depth->color (surfel_projection.cuh:184-207).

  In the reference this handles differing depth/color intrinsics; pixel
  coordinates use the corner convention on both sides.
  """

  fx: jax.Array
  fy: jax.Array
  cx: jax.Array
  cy: jax.Array
  width: int
  height: int

  @staticmethod
  def between(depth_cam: PinholeCamera, color_cam: PinholeCamera) -> "DepthToColorTransform":
    # color_px = color_fx * ((depth_px - depth_cx)/depth_fx) + color_cx
    fx = color_cam.fx / depth_cam.fx
    fy = color_cam.fy / depth_cam.fy
    return DepthToColorTransform(
        fx=fx,
        fy=fy,
        cx=color_cam.cx - fx * depth_cam.cx,
        cy=color_cam.cy - fy * depth_cam.cy,
        width=color_cam.width,
        height=color_cam.height,
    )

  def apply(self, pxy: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Returns (color_pxy, in_bounds)."""
    out = jnp.stack(
        [self.fx * pxy[..., 0] + self.cx, self.fy * pxy[..., 1] + self.cy],
        axis=-1,
    )
    ok = (
        (out[..., 0] >= 0)
        & (out[..., 1] >= 0)
        & (out[..., 0].astype(jnp.int32) < self.width)
        & (out[..., 1].astype(jnp.int32) < self.height)
    )
    return out, ok
