"""Headless surfel splat renderer.

Behavioral spec: the reference's OpenGL surfel viewer renders every surfel as
a depth-tested screen-space square of half-extent
``splat_half_extent_in_pixels`` (default 3.0, main.cc:285-287; geometry
shader render_window.cc:1363-1385), with per-surfel display colors filled by
kernel_update_visualization.cu:40-100 (RGB color / descriptor / activation
modes; normals mode at :75-79).

TPU-native redesign (no GL, no interop): z-buffer rasterization as a
``segment_min`` scatter over linearized pixel ids. The surfel set is chunked
through a ``lax.scan`` so the (surfels x footprint) expansion never
materializes more than one chunk, and per-chunk winners merge into the carry
z-buffer — deterministic (ties break toward the larger surfel index),
compiled once per (resolution, footprint, capacity) triple.

Used by ``main.py --render_preview`` to dump keyframe-viewpoint previews and
by tests as a map-quality probe; replaces the reference's interactive
render_window.{h,cc} + kernel_update_visualization.cu for a headless target.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.models.surfels import SurfelStore

_RENDER_CHUNK = 1 << 16


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "splat_half_extent_in_pixels"))
def render_surfel_splats(
    pos: jax.Array,            # (N, 3) global surfel positions
    colors: jax.Array,         # (N, 3) float in [0, 1]
    valid: jax.Array,          # (N,) bool
    frame_T_global: jax.Array,  # (4, 4) camera-from-global
    intr: jax.Array,           # (4,) fx, fy, cx, cy (corner convention)
    height: int,
    width: int,
    splat_half_extent_in_pixels: float = 3.0,
    max_depth: float = jnp.inf,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """Rasterize surfels into (depth (H,W) f32, color (H,W,3) f32, hit (H,W)).

  A surfel covers every pixel whose center lies within the screen-space
  square of half-extent ``splat_half_extent_in_pixels`` around its projected
  position (the splat shader's quad, render_window.cc:1363-1385); the
  nearest covering surfel wins each pixel (GL depth test).
  """
  h_ext = float(splat_half_extent_in_pixels)
  # Pixel px is covered iff |px + 0.5 - x| <= h, i.e. px within h + 0.5 index
  # units of floor(x) in the worst case.
  r = max(0, int(math.ceil(h_ext + 0.5)))
  offs = jnp.arange(-r, r + 1)
  f = 2 * r + 1
  n = pos.shape[0]
  n_pix = height * width

  if n == 0:  # empty map: every pixel misses
    depth = jnp.zeros((height, width), jnp.float32)
    return depth, jnp.zeros((height, width, 3), jnp.float32), depth > 0

  chunk = min(_RENDER_CHUNK, n)
  n_chunks = -(-n // chunk)
  pad = n_chunks * chunk - n

  def _pad(x, fill=0):
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)

  pos_c = _pad(pos).reshape(n_chunks, chunk, 3)
  val_c = _pad(valid).reshape(n_chunks, chunk)
  idx_c = jnp.arange(n_chunks * chunk, dtype=jnp.int32).reshape(
      n_chunks, chunk)

  R = frame_T_global[0:3, 0:3]
  t = frame_T_global[0:3, 3]
  fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]

  def step(carry, inp):
    zbuf, ibuf = carry
    p, v, gi = inp
    local = p @ R.T + t
    z = local[:, 2]
    ok = v & (z > 0.0) & (z <= max_depth)
    zs = jnp.where(ok, z, 1.0)
    px = fx * local[:, 0] / zs + cx
    py = fy * local[:, 1] / zs + cy

    # Footprint pixels: base = pixel containing the projected point, then a
    # (2r+1)^2 neighborhood gated by the splat square around (px, py).
    bx = jnp.floor(px).astype(jnp.int32)
    by = jnp.floor(py).astype(jnp.int32)
    gx = bx[:, None] + offs[None, :]                      # (C, F)
    gy = by[:, None] + offs[None, :]
    cov_x = jnp.abs(gx.astype(jnp.float32) + 0.5 - px[:, None]) <= h_ext
    cov_y = jnp.abs(gy.astype(jnp.float32) + 0.5 - py[:, None]) <= h_ext
    in_x = (gx >= 0) & (gx < width)
    in_y = (gy >= 0) & (gy < height)
    cover = ((cov_x & in_x)[:, None, :] & (cov_y & in_y)[:, :, None]
             & ok[:, None, None])                          # (C, F, F)
    pix = (gy[:, :, None] * width + gx[:, None, :])        # (C, F, F)
    pix = jnp.where(cover, pix, n_pix).ravel()             # dropped -> n_pix

    z_e = jnp.broadcast_to(z[:, None, None], (chunk, f, f)).ravel()
    i_e = jnp.broadcast_to(gi[:, None, None], (chunk, f, f)).ravel()
    zmin = jax.ops.segment_min(z_e, pix, num_segments=n_pix + 1,
                               indices_are_sorted=False)[:n_pix]
    winner = (z_e == zmin[jnp.clip(pix, 0, n_pix - 1)]) & (pix < n_pix)
    iwin = jax.ops.segment_max(jnp.where(winner, i_e, -1), pix,
                               num_segments=n_pix + 1)[:n_pix]

    better = zmin < zbuf
    return (jnp.where(better, zmin, zbuf),
            jnp.where(better, iwin, ibuf)), None

  init = (jnp.full((n_pix,), jnp.inf, jnp.float32),
          jnp.full((n_pix,), -1, jnp.int32))
  (zbuf, ibuf), _ = jax.lax.scan(step, init, (pos_c, val_c, idx_c))

  hit = ibuf >= 0
  depth = jnp.where(hit, zbuf, 0.0).reshape(height, width)
  safe_i = jnp.maximum(ibuf, 0)
  color = jnp.where(hit[:, None], colors[safe_i], 0.0).reshape(
      height, width, 3)
  return depth, color, hit.reshape(height, width)


def surfel_display_colors(s: SurfelStore, mode: str = "color") -> jax.Array:
  """Per-surfel (N, 3) display colors in [0, 1].

  Modes mirror kernel_update_visualization.cu: "color" = stored RGB (:99),
  "descriptors" = (0.5*d1+0.5, 0.5*d2+0.5, 0.5) with descriptors normalized
  from their [-180, 180] storage range (:67-72), "normals" = 0.5*(n+1)
  (:75-79), "activation" = red for active / gray for inactive surfels (the
  GUI's activation coloring, redesigned: exact reference colors are a GUI
  style choice).
  """
  if mode == "color":
    return s.color
  if mode == "descriptors":
    d = jnp.clip(s.desc / 180.0, -1.0, 1.0)
    return jnp.stack(
        [0.5 * d[:, 0] + 0.5, 0.5 * d[:, 1] + 0.5,
         jnp.full(s.desc.shape[:1], 0.5)], axis=-1)
  if mode == "normals":
    return 0.5 * (s.normal + 1.0)
  if mode == "activation":
    act = s.active[:, None].astype(jnp.float32)
    red = jnp.asarray([0.9, 0.2, 0.2])
    gray = jnp.asarray([0.6, 0.6, 0.6])
    return act * red + (1.0 - act) * gray
  raise ValueError(f"unknown render mode: {mode}")


def render_map(ba, frame_T_global: np.ndarray, mode: str = "color",
               splat_half_extent_in_pixels: float = 3.0,
               resolution: Optional[Tuple[int, int]] = None,
               max_depth: float = float("inf"),
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
  """Render a DirectBA's surfel map from an arbitrary camera pose.

  Returns host arrays (depth (H,W) f32 meters, color (H,W,3) u8, hit (H,W)
  bool). Rendering uses the color camera unless ``resolution`` overrides it.
  """
  cam: PinholeCamera = ba.color_camera()
  if resolution is not None:
    height, width = resolution
    # Anisotropic rescale so a non-proportional target keeps the full field
    # of view on both axes instead of cropping/squashing one.
    sx = width / ba.color_size[0]
    sy = height / ba.color_size[1]
    intr = jnp.asarray([cam.fx * sx, cam.fy * sy, cam.cx * sx, cam.cy * sy],
                       jnp.float32)
  else:
    width, height = ba.color_size
    intr = jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32)
  colors = surfel_display_colors(ba.surfels, mode)
  depth, color, hit = render_surfel_splats(
      ba.surfels.pos, colors, ba.surfels.valid,
      jnp.asarray(frame_T_global, jnp.float32), intr, height, width,
      splat_half_extent_in_pixels, max_depth)
  color_u8 = np.clip(np.asarray(color) * 255.0, 0, 255).astype(np.uint8)
  return np.asarray(depth), color_u8, np.asarray(hit)


def save_preview_png(path: str, color_u8: np.ndarray) -> None:
  from PIL import Image
  Image.fromarray(color_u8).save(path)


def save_depth_png(path: str, depth_m: np.ndarray,
                   scale: float = 5000.0) -> None:
  """TUM-convention u16 depth PNG (meters * 5000, 0 = no hit)."""
  from PIL import Image
  raw = np.clip(depth_m * scale, 0, 65535).astype(np.uint16)
  Image.fromarray(raw).save(path)


def render_keyframe_previews(slam, out_dir: str, mode: str = "color",
                             splat_half_extent_in_pixels: float = 3.0,
                             every: int = 1, quiet: bool = True) -> int:
  """Render the map from every ``every``-th keyframe viewpoint into
  ``out_dir`` as kf_<frame>_color.png + kf_<frame>_depth.png. Returns the
  number of rendered viewpoints. (The headless stand-in for the GUI's map
  view following the trajectory.)"""
  import os

  os.makedirs(out_dir, exist_ok=True)
  ba = slam.direct_ba
  if mode == "color" and ba.keyframe_count > 0:
    ba.assign_colors()
  kf = ba.kf
  valid = np.asarray(kf.valid)
  g_T_f = np.asarray(kf.global_T_frame)
  frame_idx = np.asarray(kf.frame_index)
  rendered = 0
  for k in range(int(np.asarray(kf.count))):
    if not valid[k] or k % max(1, every) != 0:
      continue
    f_T_g = np.asarray(se3.inverse(jnp.asarray(g_T_f[k])))
    depth, color_u8, _ = render_map(
        ba, f_T_g, mode=mode,
        splat_half_extent_in_pixels=splat_half_extent_in_pixels)
    stem = os.path.join(out_dir, f"kf_{int(frame_idx[k]):06d}")
    save_preview_png(stem + "_color.png", color_u8)
    save_depth_png(stem + "_depth.png", depth)
    rendered += 1
    if not quiet:
      print(f"rendered {stem}")
  return rendered
