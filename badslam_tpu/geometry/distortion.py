"""Distorted camera models and undistortion-map construction.

Behavioral spec: /root/reference/libvis/src/libvis/camera.h (RadtanDistortion8/9
:~700+, ThinPrismFisheyeDistortion12 :~800+) and applications/badslam/src/
badslam/undistortion.{h,cc} (pinhole-from-generic-camera selection +
undistortion maps for live inputs).

The SLAM core itself runs on pinhole intrinsics; these models exist to bring
distorted live-camera images into the pinhole world, exactly as the
reference's undistortion path does.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry.camera import PinholeCamera


class RadTanCamera(NamedTuple):
  """Pinhole + radial-tangential (plumb bob) distortion — Radtan8 (k3=0) or
  Radtan9 parameterization."""
  width: int
  height: int
  fx: jax.Array
  fy: jax.Array
  cx: jax.Array   # corner convention, like PinholeCamera
  cy: jax.Array
  k1: jax.Array
  k2: jax.Array
  p1: jax.Array
  p2: jax.Array
  k3: jax.Array   # 0 for the 8-parameter model

  def distort(self, nxy: jax.Array) -> jax.Array:
    """Normalized image coords (...,2) -> distorted normalized coords."""
    x, y = nxy[..., 0], nxy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
    xd = (x * radial + 2.0 * self.p1 * x * y
          + self.p2 * (r2 + 2.0 * x * x))
    yd = (y * radial + self.p1 * (r2 + 2.0 * y * y)
          + 2.0 * self.p2 * x * y)
    return jnp.stack([xd, yd], axis=-1)

  def undistort(self, nxy_d: jax.Array, iterations: int = 20) -> jax.Array:
    """Inverse distortion by fixed-point iteration (the reference uses an
    iterative inverse as well for its Unproject)."""
    def body(i, est):
      d = self.distort(est)
      return est - (d - nxy_d)
    out = jax.lax.fori_loop(0, iterations, body, nxy_d)
    # Far outside the model's valid domain the fixed point diverges; fall
    # back to the distorted coords (same behavior class as the reference's
    # iterative Unproject, which simply does not converge there).
    ok = jnp.all(jnp.isfinite(out), axis=-1, keepdims=True)
    return jnp.where(ok, out, nxy_d)

  def project_corner(self, p: jax.Array) -> jax.Array:
    z = p[..., 2]
    nxy = jnp.stack([p[..., 0] / z, p[..., 1] / z], axis=-1)
    d = self.distort(nxy)
    return jnp.stack(
        [self.fx * d[..., 0] + self.cx, self.fy * d[..., 1] + self.cy],
        axis=-1)

  def unproject_center(self, px, py, depth) -> jax.Array:
    nxy_d = jnp.stack(
        [(px - (self.cx - 0.5)) / self.fx,
         (py - (self.cy - 0.5)) / self.fy], axis=-1)
    nxy = self.undistort(nxy_d)
    return jnp.stack(
        [depth * nxy[..., 0], depth * nxy[..., 1], depth], axis=-1)


class ThinPrismFisheyeCamera(NamedTuple):
  """Pinhole + fisheye (equidistant) + radial + thin-prism terms — the
  reference's ThinPrismFisheyeDistortion12 parameterization."""
  width: int
  height: int
  fx: jax.Array
  fy: jax.Array
  cx: jax.Array
  cy: jax.Array
  k1: jax.Array
  k2: jax.Array
  k3: jax.Array
  k4: jax.Array
  p1: jax.Array
  p2: jax.Array
  sx1: jax.Array
  sy1: jax.Array

  def distort(self, nxy: jax.Array) -> jax.Array:
    x, y = nxy[..., 0], nxy[..., 1]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan(r)
    small = r < 1e-8
    scale = jnp.where(small, 1.0, theta / jnp.where(small, 1.0, r))
    xf = x * scale
    yf = y * scale
    r2 = xf * xf + yf * yf
    radial = 1.0 + r2 * (self.k1 + r2 * (self.k2
                                         + r2 * (self.k3 + r2 * self.k4)))
    xd = (xf * radial + 2.0 * self.p1 * xf * yf
          + self.p2 * (r2 + 2.0 * xf * xf) + self.sx1 * r2)
    yd = (yf * radial + self.p1 * (r2 + 2.0 * yf * yf)
          + 2.0 * self.p2 * xf * yf + self.sy1 * r2)
    return jnp.stack([xd, yd], axis=-1)

  def undistort(self, nxy_d: jax.Array, iterations: int = 30) -> jax.Array:
    def body(i, est):
      d = self.distort(est)
      return est - 0.7 * (d - nxy_d)
    return jax.lax.fori_loop(0, iterations, body, nxy_d)

  def project_corner(self, p: jax.Array) -> jax.Array:
    z = p[..., 2]
    nxy = jnp.stack([p[..., 0] / z, p[..., 1] / z], axis=-1)
    d = self.distort(nxy)
    return jnp.stack(
        [self.fx * d[..., 0] + self.cx, self.fy * d[..., 1] + self.cy],
        axis=-1)

  def unproject_center(self, px, py, depth) -> jax.Array:
    nxy_d = jnp.stack(
        [(px - (self.cx - 0.5)) / self.fx,
         (py - (self.cy - 0.5)) / self.fy], axis=-1)
    nxy = self.undistort(nxy_d)
    return jnp.stack(
        [depth * nxy[..., 0], depth * nxy[..., 1], depth], axis=-1)


def pinhole_from_distorted(distorted, avoid_invalid: bool = True
                           ) -> PinholeCamera:
  """Choose pinhole intrinsics covering the distorted camera's view
  (undistortion.h:37-62 CreatePinholeCameraFor...): unproject the border
  pixels, bound the normalized-coordinate range, and fit fx/fy/cx/cy so the
  undistorted image spans the same pixel count."""
  w, h = distorted.width, distorted.height
  xs = np.concatenate([
      np.stack([np.arange(w), np.zeros(w)], -1),
      np.stack([np.arange(w), np.full(w, h - 1)], -1),
      np.stack([np.zeros(h), np.arange(h)], -1),
      np.stack([np.full(h, w - 1), np.arange(h)], -1),
  ]).astype(np.float32)
  pts = np.asarray(distorted.unproject_center(
      jnp.asarray(xs[:, 0]), jnp.asarray(xs[:, 1]), jnp.ones(len(xs))))
  nx = pts[:, 0]
  ny = pts[:, 1]
  if avoid_invalid:
    # Inner bounding box: largest pinhole view fully inside valid pixels.
    nx_min = np.max(nx[xs[:, 0] == 0])
    nx_max = np.min(nx[xs[:, 0] == w - 1])
    ny_min = np.max(ny[xs[:, 1] == 0])
    ny_max = np.min(ny[xs[:, 1] == h - 1])
  else:
    nx_min, nx_max = nx.min(), nx.max()
    ny_min, ny_max = ny.min(), ny.max()
  fx = w / (nx_max - nx_min)
  fy = h / (ny_max - ny_min)
  cx = -nx_min * fx   # corner convention
  cy = -ny_min * fy
  return PinholeCamera(width=w, height=h, fx=float(fx), fy=float(fy),
                       cx=float(cx), cy=float(cy))


def build_undistortion_maps(distorted, pinhole: PinholeCamera
                            ) -> Tuple[jax.Array, jax.Array]:
  """(map_x, map_y) (H, W): for every undistorted pinhole pixel, the source
  pixel in the distorted image (corner convention, for bilinear sampling)."""
  h, w = pinhole.height, pinhole.width
  ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
  rays = pinhole.unproject_center(xs, ys, jnp.ones_like(xs))
  pxy = distorted.project_corner(rays)
  return pxy[..., 0], pxy[..., 1]


def undistort_image(img: jax.Array, map_x: jax.Array, map_y: jax.Array
                    ) -> jax.Array:
  """Bilinear remap of an (H, W) image through the undistortion maps."""
  from badslam_tpu.ops import interp
  return interp.sample_bilinear(img, map_x, map_y)
