"""TUM RGB-D dataset loading and the RGBDVideo frame container.

Behavioral spec: /root/reference/libvis/src/libvis/rgbd_video_io_tum_dataset.h
(ReadTUMRGBDDatasetAssociatedAndCalibrated :126-240, trajectory reader :73-117,
slerp pose interpolation :43-71) and rgbd_video.h / image_frame.h (lazy image
loading with per-frame global_T_frame pose).

Format: a dataset directory with
  calibration.txt   "fx fy cx cy" (center convention; +0.5 -> corner, :233-236)
  associated.txt    "rgb_ts rgb_file depth_ts depth_file" per line
  depth/*.png       16-bit PNG, value * (1/5000) m (TUM) — raw_to_float_depth
  rgb/*.png         8-bit RGB PNG
  groundtruth.txt   optional "ts tx ty tz qx qy qz qw" trajectory
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np

from badslam_tpu.geometry.camera import PinholeCamera


def _load_image(path: str) -> np.ndarray:
  """Decode an image, preferring the native libpng path (native/dataloader.cc)
  over PIL when the shared library is built."""
  if path.lower().endswith(".png"):
    try:
      from badslam_tpu.io import native_loader
      if native_loader.native_available():
        return native_loader.decode_png(path)
    except Exception:
      pass
  from PIL import Image as PILImage
  with PILImage.open(path) as im:
    arr = np.asarray(im)
  return arr


@dataclasses.dataclass
class Frame:
  """One RGB-D frame: lazy image access + pose (image_frame.h:41-120)."""
  rgb_path: str
  depth_path: str
  rgb_timestamp: float
  depth_timestamp: float
  global_T_frame: np.ndarray = dataclasses.field(
      default_factory=lambda: np.eye(4, dtype=np.float32))
  _rgb: Optional[np.ndarray] = None
  _depth: Optional[np.ndarray] = None
  _loader: Optional[object] = None       # NativePrefetchLoader
  _loader_index: int = -1

  def _fetch(self):
    depth, rgb = self._loader.get(self._loader_index)
    self._depth = depth
    self._rgb = rgb

  def rgb(self) -> np.ndarray:
    if self._rgb is None:
      if self._loader is not None:
        self._fetch()
      else:
        img = _load_image(self.rgb_path)
        if img.ndim == 2:
          img = np.stack([img] * 3, axis=-1)
        self._rgb = img[..., :3].astype(np.uint8)
    return self._rgb

  def depth_raw(self) -> np.ndarray:
    """Raw u16 depth image."""
    if self._depth is None:
      if self._loader is not None:
        self._fetch()
      else:
        self._depth = _load_image(self.depth_path).astype(np.uint16)
    return self._depth

  def clear_cache(self):
    self._rgb = None
    self._depth = None


@dataclasses.dataclass
class RGBDVideo:
  """Frame list + cameras (rgbd_video.h:40-71). Pose per frame is shared
  between color and depth (the TUM loader sets both identically)."""
  frames: List[Frame]
  color_camera: PinholeCamera
  depth_camera: PinholeCamera
  raw_to_float_depth: float = 1.0 / 5000.0
  _prefetch_loader: Optional[object] = None

  def frame_count(self) -> int:
    return len(self.frames)

  def fps(self, default: float = 30.0) -> float:
    """Frame rate derived from the depth timestamps (median inter-frame
    delta). The reference derives the loop-detection fallback frequency from
    the actual dataset fps (bad_slam_config.h:367-370) — a hardcoded 30
    would mis-throttle detection on 15/60 FPS datasets."""
    if len(self.frames) < 2:
      return default
    ts = np.asarray([f.depth_timestamp for f in self.frames], np.float64)
    dt = np.diff(ts)
    dt = dt[dt > 0]
    if dt.size == 0:
      return default
    return float(1.0 / np.median(dt))

  def depth_metric(self, index: int) -> np.ndarray:
    """(H, W) float32 metric depth, 0 = invalid."""
    return self.frames[index].depth_raw().astype(np.float32) * self.raw_to_float_depth

  def enable_native_prefetch(self, prefetch: int = 4, threads: int = 2
                             ) -> bool:
    """Switch frame loading to the native prefetching thread pool
    (PreLoadThread equivalent). Returns False when the native library is
    unavailable or frames are in-memory."""
    from badslam_tpu.io import native_loader
    if not native_loader.native_available():
      return False
    if not all(f.depth_path.lower().endswith(".png")
               and f.rgb_path.lower().endswith(".png") for f in self.frames):
      return False
    try:
      loader = native_loader.NativePrefetchLoader(
          [f.depth_path for f in self.frames],
          [f.rgb_path for f in self.frames],
          prefetch=prefetch, threads=threads)
    except Exception:
      return False
    self._prefetch_loader = loader
    for i, f in enumerate(self.frames):
      f._loader = loader
      f._loader_index = i
    return True


def read_tum_trajectory(path: str) -> Tuple[np.ndarray, np.ndarray]:
  """Returns (timestamps (N,), poses (N,4,4) global_T_frame) from a TUM-format
  trajectory file 'ts tx ty tz qx qy qz qw' (rgbd_video_io_tum_dataset.h:73+)."""
  from badslam_tpu.geometry import se3
  import jax.numpy as jnp

  ts, poses = [], []
  with open(path) as f:
    for line in f:
      line = line.strip()
      if not line or line.startswith("#"):
        continue
      parts = line.split()
      if len(parts) < 8:
        raise ValueError(f"Cannot read pose line: {line}")
      t = float(parts[0])
      tx, ty, tz, qx, qy, qz, qw = (float(v) for v in parts[1:8])
      R = np.asarray(
          se3.quaternion_to_matrix(jnp.asarray([qx, qy, qz, qw], jnp.float32)))
      T = np.eye(4, dtype=np.float32)
      T[:3, :3] = R
      T[:3, 3] = [tx, ty, tz]
      ts.append(t)
      poses.append(T)
  return np.asarray(ts), np.asarray(poses)


def interpolate_pose(timestamp: float, ts: np.ndarray, poses: np.ndarray
                     ) -> np.ndarray:
  """Slerp+lerp interpolation (rgbd_video_io_tum_dataset.h:43-71): clamps to
  the ends outside the range."""
  from badslam_tpu.geometry import se3
  import jax.numpy as jnp

  if timestamp <= ts[0]:
    return poses[0]
  if timestamp >= ts[-1]:
    return poses[-1]
  i = int(np.searchsorted(ts, timestamp, side="right")) - 1
  i = max(0, min(i, len(ts) - 2))
  factor = (timestamp - ts[i]) / (ts[i + 1] - ts[i])
  return np.asarray(se3.interpolate(
      jnp.asarray(poses[i]), jnp.asarray(poses[i + 1]), float(factor)))


def _read_file_list(path: str):
  entries = []
  with open(path) as f:
    for line in f:
      line = line.strip()
      if not line or line.startswith("#"):
        continue
      parts = line.split()
      entries.append((float(parts[0]), parts[0], parts[1]))
  return entries


def _associate_rgb_depth(dataset_dir: str, max_diff: float = 0.02):
  """associate.py equivalent: greedy nearest-timestamp matching of rgb.txt
  and depth.txt entries."""
  rgb = _read_file_list(os.path.join(dataset_dir, "rgb.txt"))
  depth = _read_file_list(os.path.join(dataset_dir, "depth.txt"))
  if not rgb or not depth:
    raise FileNotFoundError(
        f"{dataset_dir}: neither associated.txt nor rgb.txt/depth.txt found")
  dts = np.asarray([d[0] for d in depth])
  used = set()
  lines = []
  for t, ts_str, rgb_file in rgb:
    j = int(np.argmin(np.abs(dts - t)))
    if abs(dts[j] - t) <= max_diff and j not in used:
      used.add(j)
      lines.append(f"{ts_str} {rgb_file} {depth[j][1]} {depth[j][2]}")
  return lines


def load_tum_dataset(
    dataset_dir: str,
    trajectory_filename: Optional[str] = None,
    raw_to_float_depth: float = 1.0 / 5000.0,
) -> RGBDVideo:
  """ReadTUMRGBDDatasetAssociatedAndCalibrated
  (rgbd_video_io_tum_dataset.h:126-240)."""
  calib_path = os.path.join(dataset_dir, "calibration.txt")
  with open(calib_path) as f:
    fx, fy, cx, cy = (float(v) for v in f.readline().split()[:4])

  pose_ts = pose_mats = None
  if trajectory_filename:
    pose_ts, pose_mats = read_tum_trajectory(
        os.path.join(dataset_dir, trajectory_filename))

  frames: List[Frame] = []
  assoc_path = os.path.join(dataset_dir, "associated.txt")
  if not os.path.exists(assoc_path):
    # Raw TUM/ETH3D download without associate.py having been run: build the
    # association from rgb.txt + depth.txt ourselves (nearest timestamps
    # within 0.02 s — the benchmark tool's default).
    assoc_lines = _associate_rgb_depth(dataset_dir)
  else:
    with open(assoc_path) as f:
      assoc_lines = [l.strip() for l in f]
  for line in assoc_lines:
      line = line.strip()
      if not line or line.startswith("#"):
        continue
      rgb_ts, rgb_file, depth_ts, depth_file = line.split()[:4]
      frame = Frame(
          rgb_path=os.path.join(dataset_dir, rgb_file),
          depth_path=os.path.join(dataset_dir, depth_file),
          rgb_timestamp=float(rgb_ts),
          depth_timestamp=float(depth_ts),
      )
      if pose_ts is not None:
        frame.global_T_frame = interpolate_pose(
            frame.depth_timestamp, pose_ts, pose_mats).astype(np.float32)
      frames.append(frame)

  if not frames:
    raise ValueError(f"No frames in {assoc_path}")

  # Image size from the first frame.
  first = frames[0].rgb()
  height, width = first.shape[0], first.shape[1]
  frames[0].clear_cache()

  # calibration.txt is center-convention; storage is corner convention
  # (rgbd_video_io_tum_dataset.h:233-236 adds 0.5).
  cam = PinholeCamera(width=width, height=height, fx=fx, fy=fy,
                      cx=cx + 0.5, cy=cy + 0.5)
  return RGBDVideo(frames=frames, color_camera=cam, depth_camera=cam,
                   raw_to_float_depth=raw_to_float_depth)


def save_tum_trajectory(path: str, timestamps: List[float],
                        poses_global_T_frame: List[np.ndarray]):
  """TUM-format export 'ts tx ty tz qx qy qz qw' (io.cc SavePoses)."""
  from badslam_tpu.geometry import se3
  import jax.numpy as jnp

  with open(path, "w") as f:
    for t, T in zip(timestamps, poses_global_T_frame):
      q = np.asarray(se3.matrix_to_quaternion(jnp.asarray(T[:3, :3])))
      tr = T[:3, 3]
      f.write(f"{t} {tr[0]} {tr[1]} {tr[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n")
