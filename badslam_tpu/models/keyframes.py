"""Keyframe store: static-capacity batched image stacks + pose/metadata.

Reference: Keyframe class (keyframe.h:50-237 in /root/reference/applications/
badslam/src/badslam) holds per-keyframe GPU buffers (u16 depth, u16 packed
normals, u16 half radius, uchar4 color + texture) plus pose, activation state
and covisibility list.

TPU-native redesign: all keyframes live in batched arrays (K, H, W[, C]) so a
BA sweep is a `lax.scan`/vmap over the leading axis with no per-keyframe
dispatch. Activation states and the covisibility relation are dense masks.

Activation states (keyframe.h:54-67):
  0 = inactive, 1 = covisible-active, 2 = active.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3

INACTIVE = 0
COVISIBLE_ACTIVE = 1
ACTIVE = 2


class KeyframeStore(NamedTuple):
  # Image data (filtered but *uncalibrated* metric depth; the depth-deformation
  # model is applied on the fly so self-calibration retroactively affects all
  # keyframes, mirroring the reference's raw u16 storage).
  depth: jax.Array        # (K, H, W) float32, 0 = invalid
  normals: jax.Array      # (K, H, W, 2) float32 image-space normal x/y
  radius_sq: jax.Array    # (K, H, W) float32
  intensity: jax.Array    # (K, H, W) float32 in [0, 1]
  rgb: jax.Array          # (K, H, W, 3) uint8 (export/color voting only)

  # Pose and metadata.
  global_T_frame: jax.Array  # (K, 4, 4) float32
  frame_index: jax.Array     # (K,) int32 — source video frame
  min_depth: jax.Array       # (K,) float32
  max_depth: jax.Array       # (K,) float32
  valid: jax.Array           # (K,) bool
  activation: jax.Array      # (K,) int32 (states above)
  covis: jax.Array           # (K, K) bool — symmetric covisibility relation
  count: jax.Array           # () int32

  @property
  def capacity(self) -> int:
    return self.depth.shape[0]

  @property
  def image_shape(self):
    return self.depth.shape[1], self.depth.shape[2]

  def frame_T_global(self) -> jax.Array:
    return se3.inverse(self.global_T_frame)


def create(capacity: int, height: int, width: int) -> KeyframeStore:
  eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (capacity, 4, 4))
  return KeyframeStore(
      depth=jnp.zeros((capacity, height, width), jnp.float32),
      normals=jnp.zeros((capacity, height, width, 2), jnp.float32),
      radius_sq=jnp.zeros((capacity, height, width), jnp.float32),
      intensity=jnp.zeros((capacity, height, width), jnp.float32),
      rgb=jnp.zeros((capacity, height, width, 3), jnp.uint8),
      global_T_frame=eye,
      frame_index=jnp.full((capacity,), -1, jnp.int32),
      min_depth=jnp.zeros((capacity,), jnp.float32),
      max_depth=jnp.zeros((capacity,), jnp.float32),
      valid=jnp.zeros((capacity,), bool),
      activation=jnp.zeros((capacity,), jnp.int32),
      covis=jnp.zeros((capacity, capacity), bool),
      count=jnp.zeros((), jnp.int32),
  )


def grow(kf: KeyframeStore, new_capacity: int) -> KeyframeStore:
  pad = new_capacity - kf.capacity
  assert pad >= 0

  def _pad(x, is_pose=False):
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    out = jnp.pad(x, widths)
    return out

  eye_pad = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (pad, 4, 4))
  return kf._replace(
      depth=_pad(kf.depth),
      normals=_pad(kf.normals),
      radius_sq=_pad(kf.radius_sq),
      intensity=_pad(kf.intensity),
      rgb=_pad(kf.rgb),
      global_T_frame=jnp.concatenate([kf.global_T_frame, eye_pad], axis=0),
      frame_index=jnp.pad(kf.frame_index, (0, pad), constant_values=-1),
      min_depth=_pad(kf.min_depth),
      max_depth=_pad(kf.max_depth),
      valid=_pad(kf.valid),
      activation=_pad(kf.activation),
      covis=jnp.pad(kf.covis, ((0, pad), (0, pad))),
      count=kf.count,
  )


def add_keyframe(
    kf: KeyframeStore,
    depth: jax.Array,
    normals: jax.Array,
    radius_sq: jax.Array,
    intensity: jax.Array,
    rgb: jax.Array,
    global_T_frame: jax.Array,
    frame_index,
    min_depth,
    max_depth,
) -> KeyframeStore:
  """Insert at slot `count` (jit-safe; caller must ensure capacity, growing
  outside jit when count == capacity)."""
  i = kf.count
  return kf._replace(
      depth=jax.lax.dynamic_update_index_in_dim(kf.depth, depth, i, 0),
      normals=jax.lax.dynamic_update_index_in_dim(kf.normals, normals, i, 0),
      radius_sq=jax.lax.dynamic_update_index_in_dim(kf.radius_sq, radius_sq, i, 0),
      intensity=jax.lax.dynamic_update_index_in_dim(kf.intensity, intensity, i, 0),
      rgb=jax.lax.dynamic_update_index_in_dim(kf.rgb, rgb, i, 0),
      global_T_frame=jax.lax.dynamic_update_index_in_dim(
          kf.global_T_frame, global_T_frame, i, 0),
      frame_index=kf.frame_index.at[i].set(jnp.asarray(frame_index, jnp.int32)),
      min_depth=kf.min_depth.at[i].set(jnp.asarray(min_depth, jnp.float32)),
      max_depth=kf.max_depth.at[i].set(jnp.asarray(max_depth, jnp.float32)),
      valid=kf.valid.at[i].set(True),
      activation=kf.activation.at[i].set(ACTIVE),
      count=kf.count + 1,
  )


def frustums_intersect(
    kf: KeyframeStore, i: jax.Array, j: jax.Array,
    fx_inv, fy_inv, cx_inv, cy_inv, width: int, height: int,
) -> jax.Array:
  """Conservative frustum intersection test for covisibility
  (camera_frustum.h:225 via direct_ba.cc:233-247). We use a sphere-bound
  approximation: each keyframe's frustum is bounded by the sphere through its
  8 corner points; frustums "intersect" when the spheres do.

  This is more permissive than the reference's separating-axis test (extra
  covisible pairs only add work, never reduce accuracy).
  """
  def frustum_sphere(k):
    T = kf.global_T_frame[k]
    mn, mx = kf.min_depth[k], kf.max_depth[k]
    corners_x = jnp.asarray([cx_inv, width * fx_inv + cx_inv])
    corners_y = jnp.asarray([cy_inv, height * fy_inv + cy_inv])
    # 8 corners in camera space
    cx_, cy_ = jnp.meshgrid(corners_x, corners_y)
    dirs = jnp.stack([cx_.ravel(), cy_.ravel(), jnp.ones(4)], axis=-1)  # (4,3)
    pts = jnp.concatenate([dirs * mn, dirs * mx], axis=0)  # (8,3)
    pts_g = se3.transform_points(T, pts)
    center = jnp.mean(pts_g, axis=0)
    radius = jnp.max(jnp.linalg.norm(pts_g - center, axis=-1))
    return center, radius

  ci, ri = frustum_sphere(i)
  cj, rj = frustum_sphere(j)
  return jnp.linalg.norm(ci - cj) <= ri + rj
