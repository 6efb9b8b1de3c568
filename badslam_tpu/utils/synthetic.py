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


def render_planes(
    camera: PinholeCamera,
    global_T_frame: np.ndarray,
    plane_normals: np.ndarray,     # (P, 3) world-space unit normals
    plane_d: float = 2.5,
    border: int = 10,
    raw_to_float_depth: float = 1.0 / 1000.0,
    max_depth: float = 10.0,
) -> np.ndarray:
  """Render the infinite-plane world {n_p . x + d = 0} from an arbitrary
  camera pose: per pixel, nearest positive ray intersection. This produces
  *consistent* multi-view depth maps of one world geometry (unlike
  make_plane_scene's per-image stripes), for full-pipeline tests.
  """
  w, h = camera.width, camera.height
  R = global_T_frame[:3, :3].astype(np.float64)
  o = global_T_frame[:3, 3].astype(np.float64)

  xs = np.arange(w, dtype=np.float64)
  ys = np.arange(h, dtype=np.float64)
  nx = (xs - (float(camera.cx) - 0.5)) / float(camera.fx)
  ny = (ys - (float(camera.cy) - 0.5)) / float(camera.fy)
  dx, dy = np.meshgrid(nx, ny)
  dirs = np.stack([dx, dy, np.ones_like(dx)], axis=-1)   # camera frame, z=1
  world_dirs = dirs @ R.T                                 # (H, W, 3)

  best = np.full((h, w), np.inf)
  for n in plane_normals:
    denom = world_dirs @ n
    t = -(plane_d + o @ n) / np.where(np.abs(denom) > 1e-12, denom, 1e-12)
    t = np.where((np.abs(denom) > 1e-12) & (t > 0), t, np.inf)
    best = np.minimum(best, t)

  depth = np.where(np.isfinite(best) & (best <= max_depth), best, 0.0)
  depth = np.floor(depth / raw_to_float_depth + 0.5) * raw_to_float_depth
  mask = np.zeros((h, w), bool)
  mask[border:h - border, border:w - border] = True
  return np.where(mask, depth, 0.0).astype(np.float32)


def render_intensity(
    camera: PinholeCamera,
    global_T_frame: np.ndarray,
    depth: np.ndarray,
    freq: float = 3.0,
    kind: str = "sine",
) -> np.ndarray:
  """World-anchored analytic intensity: a smooth function of the 3D point each
  pixel sees, so photometric residuals are multi-view consistent. Quantized to
  u8 steps."""
  h, w = depth.shape
  R = global_T_frame[:3, :3].astype(np.float64)
  o = global_T_frame[:3, 3].astype(np.float64)
  xs = np.arange(w, dtype=np.float64)
  ys = np.arange(h, dtype=np.float64)
  nx = (xs - (float(camera.cx) - 0.5)) / float(camera.fx)
  ny = (ys - (float(camera.cy) - 0.5)) / float(camera.fy)
  dx, dy = np.meshgrid(nx, ny)
  pts_cam = np.stack([depth * dx, depth * dy, depth], axis=-1)
  pts = pts_cam @ R.T + o
  if kind == "sine":
    v = (0.5
         + 0.2 * np.sin(freq * pts[..., 0])
         + 0.2 * np.sin(freq * pts[..., 1])
         + 0.1 * np.sin(freq * pts[..., 2]))
  elif kind == "checker":
    # Hash-based 3D cell pattern: sharp world-anchored corners for feature
    # detectors (ORB/FAST need them; the smooth sine texture does not).
    cells = np.floor(freq * pts).astype(np.int64)
    h_ = (cells[..., 0] * 73856093 ^ cells[..., 1] * 19349663
          ^ cells[..., 2] * 83492791) & 0xFF
    v = 0.25 + 0.5 * (h_.astype(np.float32) / 255.0)
  else:
    raise ValueError(kind)
  u8 = np.clip(np.floor(255.0 * v + 0.5), 0, 255)
  # u8 * f32(1/255): bit-identical to the packed-sampling unpack path.
  return u8.astype(np.float32) * np.float32(1.0 / 255.0)


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
  return u8.astype(np.float32) * np.float32(1.0 / 255.0)


def _value_noise_2d(x: np.ndarray, y: np.ndarray, cell: float,
                    seed: int) -> np.ndarray:
  """Smooth value noise in [0,1]: hash lattice + bilinear interpolation —
  world-anchored, dense, non-repeating (the analytic analog of the
  reference test's random per-vertex colors)."""
  xi = np.floor(x / cell).astype(np.int64)
  yi = np.floor(y / cell).astype(np.int64)
  tx = (x / cell - xi).astype(np.float32)
  ty = (y / cell - yi).astype(np.float32)

  def h(ix, iy):
    v = (ix * 374761393 + iy * 668265263 + seed * 144665) & 0x7FFFFFFF
    v = (v ^ (v >> 13)) * 1274126177 & 0x7FFFFFFF
    return ((v ^ (v >> 16)) & 0xFFFF).astype(np.float32) / 65535.0

  v00 = h(xi, yi)
  v10 = h(xi + 1, yi)
  v01 = h(xi, yi + 1)
  v11 = h(xi + 1, yi + 1)
  top = v00 + tx * (v10 - v00)
  bot = v01 + tx * (v11 - v01)
  return top + ty * (bot - top)


def heightmap_z(x: np.ndarray, y: np.ndarray, z_distance: float = 1.0,
                z_variation: float = 0.05, seed: int = 5) -> np.ndarray:
  """Smooth random surface z(x, y) — the analytic analog of the reference
  pairwise-tracking test's heightmap (kHeightmapZDistance 1.0, ZVariation
  0.05, test_pairwise_frame_tracking.cc:292-320)."""
  v = (_value_noise_2d(x, y, 0.35, seed)
       + 0.5 * _value_noise_2d(x, y, 0.11, seed + 1))
  return z_distance + z_variation * (2.0 * v / 1.5 - 1.0)


def occlusion_boxes(seed: int = 5, z_distance: float = 1.0,
                    spread: float = 0.55, num_boxes: int = 7) -> np.ndarray:
  """Deterministic floating axis-aligned boxes between the camera and the
  heightmap — the occlusion-rich world (round-3 verdict item 7): box edges
  create depth discontinuities and occlusion shadows, box sides present
  steep normals, and edge/mixed pixels produce floating outlier surfels
  that only free-space-violation filtering (kernel_delete_surfels.cu:84)
  and isolated-pixel removal (cuda_depth_processing.cu:331) clean up.

  Returns (B, 2, 3): per box (min_corner, max_corner) in world frame.
  Boxes hover 0.18-0.38 m above the surface (i.e. in front of it for the
  downward-looking synthetic cameras), spread over the orbit footprint."""
  rng = np.random.default_rng(seed + 1000)
  boxes = []
  for _ in range(num_boxes):
    cx_ = rng.uniform(-spread, spread)
    cy_ = rng.uniform(-spread * 0.5, spread * 1.5)
    half = rng.uniform(0.05, 0.11, size=2)
    height = rng.uniform(0.02, 0.05)
    top = z_distance - rng.uniform(0.18, 0.38)
    boxes.append([[cx_ - half[0], cy_ - half[1], top],
                  [cx_ + half[0], cy_ + half[1], top + height]])
  return np.asarray(boxes, np.float64)


def _ray_box_hits(o: np.ndarray, dirs: np.ndarray, boxes: np.ndarray):
  """Nearest positive ray/AABB hit per pixel (slab method, vectorized).
  Returns (t_hit, hit_mask) with t_hit = +inf where no box is hit."""
  t_best = np.full(dirs.shape[:-1], np.inf)
  inv = 1.0 / np.where(np.abs(dirs) < 1e-12, 1e-12, dirs)
  for bmin, bmax in boxes:
    t0 = (bmin[None, None, :] - o[None, None, :]) * inv
    t1 = (bmax[None, None, :] - o[None, None, :]) * inv
    tnear = np.minimum(t0, t1).max(axis=-1)
    tfar = np.maximum(t0, t1).min(axis=-1)
    hit = (tfar >= tnear) & (tfar > 1e-6)
    t_entry = np.where(tnear > 1e-6, tnear, tfar)  # inside-box: exit
    t_best = np.where(hit & (t_entry < t_best), t_entry, t_best)
  return t_best, np.isfinite(t_best)


def render_heightmap(
    camera: PinholeCamera,
    global_T_frame: np.ndarray,
    z_distance: float = 1.0,
    z_variation: float = 0.05,
    seed: int = 5,
    texture_cell: float = 0.02,
    border: int = 2,
    raw_to_float_depth: float = 1.0 / 5000.0,
    boxes: "np.ndarray | None" = None,
    texture_period: "float | None" = None,
):
  """(depth, intensity) of the heightmap surface from an arbitrary pose, by
  fixed-point ray casting (low slopes -> fast convergence). The intensity is
  dense value noise at ~2 cm world scale — strong gradients everywhere.

  texture_period: perceptual-aliasing mode — the TEXTURE repeats with this
  world period (x and y wrapped modulo period before the noise lookup)
  while the geometry stays unique, so distinct places look identical to an
  appearance-only retrieval layer (repeated carpet/tile structure). Used by
  the retrieval aliasing stress eval (benchmarks/loop_retrieval_eval.py)."""
  w, h = camera.width, camera.height
  R = global_T_frame[:3, :3].astype(np.float64)
  o = global_T_frame[:3, 3].astype(np.float64)
  xs = np.arange(w, dtype=np.float64)
  ys = np.arange(h, dtype=np.float64)
  nx = (xs - (float(camera.cx) - 0.5)) / float(camera.fx)
  ny = (ys - (float(camera.cy) - 0.5)) / float(camera.fy)
  dx, dy = np.meshgrid(nx, ny)
  dirs = np.stack([dx, dy, np.ones_like(dx)], axis=-1) @ R.T  # world dirs

  dz = dirs[..., 2]
  ok = dz > 1e-6
  dz_safe = np.where(ok, dz, 1.0)
  t = (z_distance - o[2]) / dz_safe
  for _ in range(16):
    px = o[0] + t * dirs[..., 0]
    py = o[1] + t * dirs[..., 1]
    zs = heightmap_z(px, py, z_distance, z_variation, seed)
    t = (zs - o[2]) / dz_safe
  box_hit = None
  if boxes is not None and len(boxes):
    # Occluders: take the nearer of the heightmap hit and any box hit. Box
    # pixels are valid geometry (top/side faces); the DEPTH DISCONTINUITY
    # at their silhouettes is what exercises the outlier machinery.
    t_box, box_mask = _ray_box_hits(o, dirs, np.asarray(boxes, np.float64))
    box_hit = box_mask & (t_box < t) & ok
    t = np.where(box_hit, t_box, t)
  depth = np.where(ok & (t > 0.05), t * 1.0, 0.0)
  # camera-frame z == t since local dir z = 1 before rotation
  depth = np.floor(depth / raw_to_float_depth + 0.5) * raw_to_float_depth
  mask = np.zeros((h, w), bool)
  mask[border:h - border, border:w - border] = True
  depth = np.where(mask, depth, 0.0).astype(np.float32)

  px = o[0] + t * dirs[..., 0]
  py = o[1] + t * dirs[..., 1]
  if texture_period is not None:
    px = np.mod(px, texture_period)
    py = np.mod(py, texture_period)
  # Band-limited 1/f-style texture. A white-spectrum texture (power at the
  # pixel scale) aliases at every pyramid level: the 2x2-mean pyramid then
  # presents coarse GN with a landscape of false local minima ~0.2 px apart,
  # which corrupts coarse-to-fine tracking and lets the constant-velocity
  # motion model double the error each frame (measured: benchmarks/
  # diag_odometry.py experiments A-G). Natural images fall off ~1/f^2, and
  # the reference's own pairwise test textures a heightmap with random
  # per-vertex colors at ~10 px spacing, Gouraud-interpolated
  # (test_pairwise_frame_tracking.cc:292-330) — band-limited by
  # construction. Octaves: dominant structure at 5x and 17x the base cell
  # (well-resolved at all pyramid levels for the benchmark cameras), plus a
  # low-amplitude fine octave at the base cell for level-0 sharpness.
  v = (0.40 * _value_noise_2d(px, py, texture_cell * 17.0, seed + 8)
       + 0.40 * _value_noise_2d(px, py, texture_cell * 5.0, seed + 7)
       + 0.20 * _value_noise_2d(px, py, texture_cell, seed + 9))
  if box_hit is not None:
    # Box faces carry their own band-limited texture; pz breaks the
    # side-face coordinate degeneracy (x or y constant on a face).
    pz = o[2] + t * dirs[..., 2]
    bx = px + 3.7 * pz
    by = py + 1.3 * pz
    vb = (0.45 * _value_noise_2d(bx, by, texture_cell * 13.0, seed + 21)
          + 0.35 * _value_noise_2d(bx, by, texture_cell * 4.0, seed + 22)
          + 0.20 * _value_noise_2d(bx, by, texture_cell, seed + 23))
    v = np.where(box_hit, vb, v)
  v = 0.15 + 0.7 * v
  u8 = np.clip(np.floor(255.0 * v + 0.5), 0, 255)
  intensity = u8.astype(np.float32) * np.float32(1.0 / 255.0)
  return depth, intensity


def make_heightmap_video(
    camera: PinholeCamera,
    trajectory: "list[np.ndarray]",
    z_distance: float = 1.0,
    z_variation: float = 0.05,
    seed: int = 5,
    raw_to_float_depth: float = 1.0 / 5000.0,
    fps: float = 30.0,
    boxes: "np.ndarray | None" = None,
):
  """In-memory RGBDVideo of the heightmap world (well-conditioned for
  tracking: dense texture, varied normals). Pass boxes=occlusion_boxes()
  for the occlusion-rich variant."""
  from badslam_tpu.io.dataset import Frame, RGBDVideo

  frames = []
  for i, T in enumerate(trajectory):
    depth, inten = render_heightmap(
        camera, T, z_distance, z_variation, seed,
        raw_to_float_depth=raw_to_float_depth, boxes=boxes)
    u8 = np.clip(np.floor(inten * 255.0 + 0.5), 0, 255).astype(np.uint8)
    rgb = np.stack([u8, u8, u8], axis=-1)
    raw_u16 = np.floor(depth / raw_to_float_depth + 0.5).astype(np.uint16)
    f = Frame(rgb_path="", depth_path="", rgb_timestamp=i / fps,
              depth_timestamp=i / fps)
    f._rgb = rgb
    f._depth = raw_u16
    frames.append(f)
  return RGBDVideo(frames=frames, color_camera=camera, depth_camera=camera,
                   raw_to_float_depth=raw_to_float_depth)


def make_synthetic_video(
    camera: PinholeCamera,
    trajectory: "list[np.ndarray]",   # per-frame global_T_frame (4,4)
    plane_normals: np.ndarray,
    plane_d: float = 2.5,
    raw_to_float_depth: float = 1.0 / 5000.0,
    fps: float = 30.0,
    textured: bool = True,
    texture_kind: str = "sine",
):
  """In-memory RGBDVideo of the plane world rendered along a trajectory —
  the TPU rebuild's stand-in for a TUM dataset in tests and benchmarks."""
  from badslam_tpu.io.dataset import Frame, RGBDVideo

  frames = []
  for i, T in enumerate(trajectory):
    depth = render_planes(camera, T, plane_normals, plane_d,
                          raw_to_float_depth=raw_to_float_depth)
    if textured:
      inten = render_intensity(camera, T, depth, kind=texture_kind)
      u8 = np.clip(np.floor(inten * 255.0 + 0.5), 0, 255).astype(np.uint8)
      rgb = np.stack([u8, u8, u8], axis=-1)
    else:
      rgb = np.zeros(depth.shape + (3,), np.uint8)
    raw_u16 = np.floor(depth / raw_to_float_depth + 0.5).astype(np.uint16)
    f = Frame(rgb_path="", depth_path="", rgb_timestamp=i / fps,
              depth_timestamp=i / fps)
    f._rgb = rgb
    f._depth = raw_u16
    f.global_T_frame = np.eye(4, dtype=np.float32)  # to be estimated
    frames.append(f)
  return RGBDVideo(frames=frames, color_camera=camera, depth_camera=camera,
                   raw_to_float_depth=raw_to_float_depth)


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


def surfel_map_error(positions: np.ndarray,
                     z_distance: float = 1.0,
                     z_variation: float = 0.05,
                     seed: int = 5,
                     boxes: "np.ndarray | None" = None) -> dict:
  """Map-quality metric against the analytic heightmap world.

  The synthetic worlds (render_heightmap / tum_synth.write_tum_dataset) are
  the graph of z(x, y) = heightmap_z(x, y), so every reconstructed surfel
  has a closed-form ground-truth surface point directly below/above it:
  error_i = pos_z_i - z(pos_x_i, pos_y_i). The heightmap's slopes are small
  (z_variation 0.05 over noise cells >= 0.11 m), so the vertical distance
  overestimates the true point-to-surface distance by only a few percent —
  adequate as a regression gate.

  The reference's evaluation protocol is trajectory-only (ETH3D SLAM / TUM
  ATE-RMSE, README.md:161-178); this adds the direct check that the MAP
  converges onto the observed surface, not just the poses — drift repaired
  by a pose-graph closure but never re-optimized into the surfels, or a
  geometry-optimization regression, shows up here first.

  positions: (N, 3) world-frame surfel positions (valid surfels only).
  Returns summary stats in meters.
  """
  positions = np.asarray(positions, np.float64)
  if positions.size == 0:
    return {"count": 0}
  gt_z = heightmap_z(positions[:, 0], positions[:, 1],
                     z_distance, z_variation, seed)
  err = positions[:, 2] - gt_z
  if boxes is not None and len(boxes):
    # Occlusion world: a surfel may lie on a box instead of the heightmap —
    # its error is the distance to the NEAREST surface (AABB signed
    # distance vs the vertical heightmap distance). Sign kept from the
    # heightmap term (bias is only meaningful for the dominant surface).
    abs_box = np.full(positions.shape[0], np.inf)
    for bmin, bmax in np.asarray(boxes, np.float64):
      q = np.maximum(np.maximum(bmin[None, :] - positions,
                                positions - bmax[None, :]), 0.0)
      outside = np.linalg.norm(q, axis=1)
      inside = np.minimum(
          np.min(positions - bmin[None, :], axis=1),
          np.min(bmax[None, :] - positions, axis=1))
      d = np.where(outside > 0, outside, np.maximum(inside, 0.0))
      abs_box = np.minimum(abs_box, d)
    err = np.where(abs_box < np.abs(err), np.sign(err) * abs_box, err)
  abs_err = np.abs(err)
  return {
      "count": int(positions.shape[0]),
      "rmse_m": float(np.sqrt(np.mean(err ** 2))),
      "mean_abs_m": float(np.mean(abs_err)),
      "median_abs_m": float(np.median(abs_err)),
      "p95_abs_m": float(np.quantile(abs_err, 0.95)),
      "max_abs_m": float(np.max(abs_err)),
      "bias_m": float(np.mean(err)),
  }
