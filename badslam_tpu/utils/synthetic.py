"""Synthetic test scenes: random planes intersected by camera rays.

Replicates the reference's convergence-test scene construction
(test/test_pose_optimization_geometric_residual.cc:85-110 in
/root/reference/applications/badslam/src/badslam): N planes with random
normals (z forced to -1 before normalization) at distance 2.5, rendered into
vertical image stripes with a 10-pixel border, depths quantized like the u16
raw depth of the reference (raw_to_float 1/1000).

Also provides the test Keyframe preprocessing path (keyframe.cc:81-158
second constructor): brightness, normals, radii/isolated-pixel removal,
min/max depth.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.ops import depth_proc, image_proc


def default_test_camera(width: int = 640, height: int = 480) -> PinholeCamera:
  """The convergence tests' camera: fx=fy=h/2, c at image center
  (test_pose_optimization_geometric_residual.cc:56-57)."""
  return PinholeCamera(
      width=width, height=height,
      fx=0.5 * height, fy=0.5 * height,
      # libvis camera parameters are corner-convention (camera.h:1006-1008);
      # the test passes cx = 0.5*w - 0.5 directly.
      cx=0.5 * width - 0.5, cy=0.5 * height - 0.5,
  )


def make_plane_scene(
    camera: PinholeCamera,
    num_planes: int = 3,
    plane_distance: float = 2.5,
    border: int = 10,
    raw_to_float_depth: float = 1.0 / 1000.0,
    seed: int = 0,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray]:
  """Returns (depth (H, W) float32 metric with quantization, plane_normals
  (num_planes, 3)). Depth 0 = invalid (outside the stripes)."""
  if rng is None:
    rng = np.random.default_rng(seed)
  w, h = camera.width, camera.height
  depth = np.zeros((h, w), np.float32)
  normals = np.zeros((num_planes, 3), np.float32)

  xs = np.arange(w, dtype=np.float32)
  ys = np.arange(h, dtype=np.float32)
  # Center-convention unprojection directions with z = 1.
  nx = (xs - (float(camera.cx) - 0.5)) / float(camera.fx)
  ny = (ys - (float(camera.cy) - 0.5)) / float(camera.fy)
  dir_x, dir_y = np.meshgrid(nx, ny)

  min_x, max_x = border, w - border - 1
  for p in range(num_planes):
    n = rng.uniform(-1.0, 1.0, size=3).astype(np.float32)
    n[2] = -1.0
    n /= np.linalg.norm(n)
    normals[p] = n
    left = int(min_x + (max_x - min_x) * ((2 * p) / (2.0 * num_planes - 1)))
    right = int(min_x + (max_x - min_x) * ((2 * p + 1) / (2.0 * num_planes - 1)))
    # Ray: t * (dir_x, dir_y, 1); plane: n . x + d = 0 with d = plane_distance.
    denom = n[0] * dir_x + n[1] * dir_y + n[2]
    t = -plane_distance / denom
    region = np.zeros((h, w), bool)
    region[border:h - border, left:right] = True
    z = np.where(region & (t > 0), t, 0.0)
    # u16 quantization: round(z / raw) * raw.
    z = np.floor(z / raw_to_float_depth + 0.5) * raw_to_float_depth
    depth = np.where(region, z.astype(np.float32), depth)
  return depth, normals


def intensity_function_image(camera: PinholeCamera, kind: str = "sine"
                             ) -> np.ndarray:
  """Analytic intensity image for photometric tests (the reference uses
  patterned images for descriptor-residual tests). Values in [0, 1],
  quantized to u8 steps like a real camera image."""
  w, h = camera.width, camera.height
  xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32))
  if kind == "sine":
    v = 0.5 + 0.25 * np.sin(0.1 * xs) + 0.25 * np.sin(0.1 * ys)
  elif kind == "ramp":
    v = (xs + ys) / (w + h)
  else:
    raise ValueError(kind)
  u8 = np.floor(255.0 * v + 0.5)
  return (u8 / 255.0).astype(np.float32)


class SyntheticKeyframe(NamedTuple):
  depth: jnp.ndarray       # (H, W) preprocessed depth (0 invalid)
  normals: jnp.ndarray     # (H, W, 2)
  radius_sq: jnp.ndarray   # (H, W)
  intensity: jnp.ndarray   # (H, W)
  rgb: jnp.ndarray         # (H, W, 3) uint8


def preprocess_like_test_keyframe(
    depth: np.ndarray,
    camera: PinholeCamera,
    intensity: Optional[np.ndarray] = None,
    a: float = 0.0,
    cfactor: Optional[jnp.ndarray] = None,
    cell: int = 1,
) -> SyntheticKeyframe:
  """The reference's test Keyframe constructor pipeline (keyframe.cc:81-158):
  normals (invalidates incomplete neighborhoods), radii + isolated-pixel
  removal; no bilateral filter."""
  h, w = depth.shape
  if cfactor is None:
    from badslam_tpu.ops import depth_model
    hc, wc = depth_model.cfactor_shape(h, w, cell)
    cfactor = jnp.zeros((hc, wc), jnp.float32)
  d = jnp.asarray(depth, jnp.float32)
  d_n, nxy = depth_proc.compute_normals(d, camera, a, cfactor, cell)
  radius_sq, d_out = depth_proc.compute_radii_and_remove_isolated(d_n, camera)
  if intensity is None:
    intensity_arr = jnp.zeros((h, w), jnp.float32)
    rgb = jnp.zeros((h, w, 3), jnp.uint8)
  else:
    intensity_arr = jnp.asarray(intensity, jnp.float32)
    u8 = np.clip(np.floor(np.asarray(intensity) * 255.0 + 0.5), 0, 255
                 ).astype(np.uint8)
    rgb = jnp.asarray(np.stack([u8, u8, u8], axis=-1))
  return SyntheticKeyframe(
      depth=d_out, normals=nxy, radius_sq=radius_sq,
      intensity=intensity_arr, rgb=rgb)
