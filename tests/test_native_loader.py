"""Native data loader tests (native/dataloader.cc via ctypes): PNG decode
parity with PIL and the prefetching loader's correctness."""

import os

import numpy as np
import pytest

from badslam_tpu.io import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.native_available(),
    reason="native library not built (make -C native)")


def _write_pngs(tmp_path, n=5, h=48, w=64):
  from PIL import Image as PILImage
  rng = np.random.default_rng(0)
  depth_paths, rgb_paths = [], []
  for i in range(n):
    d = rng.integers(0, 60000, (h, w)).astype(np.uint16)
    c = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    dp = str(tmp_path / f"d{i}.png")
    cp = str(tmp_path / f"c{i}.png")
    PILImage.fromarray(d).save(dp)
    PILImage.fromarray(c).save(cp)
    depth_paths.append(dp)
    rgb_paths.append(cp)
  return depth_paths, rgb_paths


def test_decode_png_matches_pil(tmp_path):
  from PIL import Image as PILImage
  depth_paths, rgb_paths = _write_pngs(tmp_path, n=1)
  d_native = native_loader.decode_png(depth_paths[0])
  d_pil = np.asarray(PILImage.open(depth_paths[0]))
  assert d_native.dtype == np.uint16
  np.testing.assert_array_equal(d_native, d_pil)
  c_native = native_loader.decode_png(rgb_paths[0])
  c_pil = np.asarray(PILImage.open(rgb_paths[0]))
  np.testing.assert_array_equal(c_native, c_pil)


def test_prefetch_loader_sequential_and_random(tmp_path):
  from PIL import Image as PILImage
  depth_paths, rgb_paths = _write_pngs(tmp_path, n=5)
  loader = native_loader.NativePrefetchLoader(depth_paths, rgb_paths,
                                              prefetch=3, threads=2)
  # Sequential access
  for i in range(5):
    d, c = loader.get(i)
    np.testing.assert_array_equal(d, np.asarray(PILImage.open(depth_paths[i])))
    np.testing.assert_array_equal(c, np.asarray(PILImage.open(rgb_paths[i])))
  # Revisit (already evicted -> re-decoded)
  d, c = loader.get(1)
  np.testing.assert_array_equal(d, np.asarray(PILImage.open(depth_paths[1])))
  loader.close()


def test_video_native_prefetch_integration(tmp_path):
  from badslam_tpu.io.dataset import Frame, RGBDVideo
  from badslam_tpu.geometry.camera import PinholeCamera
  depth_paths, rgb_paths = _write_pngs(tmp_path, n=3)
  frames = [Frame(rgb_path=rgb_paths[i], depth_path=depth_paths[i],
                  rgb_timestamp=i / 30.0, depth_timestamp=i / 30.0)
            for i in range(3)]
  cam = PinholeCamera(64, 48, 24.0, 24.0, 32.0, 24.0)
  video = RGBDVideo(frames=frames, color_camera=cam, depth_camera=cam)
  assert video.enable_native_prefetch()
  d = video.depth_metric(2)
  assert d.shape == (48, 64) and d.dtype == np.float32
  c = video.frames[0].rgb()
  assert c.shape == (48, 64, 3)
