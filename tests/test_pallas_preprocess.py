"""Fused Pallas preprocess kernel (ops/pallas_preprocess.py) vs the XLA
stencil chain. On the CPU test backend the kernel runs in interpret mode;
on real TPU hardware the measured parity is bitwise (PERF.md round 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.ops import depth_proc, pallas_preprocess
from badslam_tpu.ops.depth_model import cfactor_shape
from badslam_tpu.utils import synthetic


@pytest.mark.parametrize("size", [(256, 128), (160, 120)])
def test_fused_preprocess_matches_xla_chain(size):
  W, H = size
  cell = 4
  cam = synthetic.default_test_camera(W, H)
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  # Punch some invalid holes + out-of-range pixels into the depth map.
  rng = np.random.default_rng(0)
  d = np.asarray(depth).copy()
  d[rng.random(d.shape) < 0.02] = 0.0
  d[rng.random(d.shape) < 0.01] = 9.0  # beyond max_depth
  depth = jnp.asarray(d)
  intr = jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32)
  hc, wc = cfactor_shape(H, W, cell)
  cfactor = jnp.full((hc, wc), 0.001, jnp.float32)
  a = jnp.asarray(0.01, jnp.float32)
  kw = dict(width=W, height=H, cell_size=cell, sigma_xy=1.5,
            sigma_inv_depth=0.005, radius_factor=2.0, max_depth=5.0)

  f, n, r = pallas_preprocess.fused_depth_preprocess(
      depth, intr, a, cfactor, interpret=jax.default_backend() == "cpu",
      **kw)

  filt = depth_proc.bilateral_filter_and_cutoff(
      depth, sigma_xy=1.5, sigma_inv_depth=0.005, radius_factor=2.0,
      max_depth=5.0)
  fb, nn = depth_proc.compute_normals(filt, cam, a, cfactor, cell)
  rr, fa = depth_proc.compute_radii_and_remove_isolated(fb, cam)

  np.testing.assert_allclose(np.asarray(f), np.asarray(fa), atol=1e-5)
  np.testing.assert_allclose(np.asarray(n), np.asarray(nn), atol=1e-4)
  np.testing.assert_allclose(np.asarray(r), np.asarray(rr), atol=1e-6)


def test_cfactor_image_matmul_matches_gather_semantics():
  """The matmul upsample must equal nearest (y//cell, x//cell) indexing."""
  from badslam_tpu.ops.depth_model import cfactor_image
  rng = np.random.default_rng(1)
  for (h, w, cell) in [(120, 160, 4), (37, 53, 3), (8, 8, 8)]:
    hc, wc = cfactor_shape(h, w, cell)
    grid = rng.normal(size=(hc, wc)).astype(np.float32)
    img = np.asarray(cfactor_image(jnp.asarray(grid), h, w, cell))
    ys = np.arange(h) // cell
    xs = np.arange(w) // cell
    ref = grid[ys[:, None], xs[None, :]]
    np.testing.assert_allclose(img, ref, atol=1e-6)


def test_should_use_gating():
  assert not pallas_preprocess.should_use(960, 1280)  # exceeds VMEM budget
  on_cpu = jax.default_backend() == "cpu"
  assert pallas_preprocess.should_use(480, 640) == (not on_cpu)
