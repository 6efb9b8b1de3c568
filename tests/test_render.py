"""Headless surfel splat renderer tests.

The renderer replaces the reference's OpenGL splat viewer
(render_window.cc:1340-1401 + kernel_update_visualization.cu) for a headless
target; these tests pin the depth-test, footprint, display-color, and
map-round-trip semantics.
"""

import os

import jax.numpy as jnp
import numpy as np

from badslam_tpu import render
from badslam_tpu.config import BadSlamConfig
from badslam_tpu.slam.direct_ba import DirectBA
from badslam_tpu.utils import synthetic

W, H = 160, 120


def test_splat_depth_test_footprint_and_masking():
  intr = jnp.asarray([100.0, 100.0, 32.0, 24.0])
  pos = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0], [0.1, 0.05, 1.5]])
  col = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
  valid = jnp.asarray([True, True, True])
  T = jnp.eye(4)
  depth, color, hit = render.render_surfel_splats(
      pos, col, valid, T, intr, 48, 64, 1.5)
  d, c, h = np.asarray(depth), np.asarray(color), np.asarray(hit)

  # Surfels 0 and 1 project to the same pixel (32, 24): nearer z=1 wins the
  # depth test and contributes its (green) color.
  assert abs(d[24, 32] - 1.0) < 1e-6
  assert c[24, 32, 1] == 1.0 and c[24, 32, 0] == 0.0
  # Surfel 2 at its own projection (38.67, 27.33).
  assert abs(d[27, 38] - 1.5) < 1e-6 and c[27, 38, 2] == 1.0

  # Splat square of half-extent 1.5 around (32.0, 24.0): pixel centers
  # within 1.5 -> px in [30, 33], py in [22, 25] (render_window.cc quad).
  assert h[24, 30] and h[24, 33] and not h[24, 34] and not h[24, 29]
  assert h[22, 32] and h[25, 32] and not h[26, 32] and not h[21, 32]

  # Invalid surfels and behind-camera points render nothing.
  _, _, hit2 = render.render_surfel_splats(
      pos, col, jnp.zeros(3, bool), T, intr, 48, 64, 1.5)
  assert not np.asarray(hit2).any()
  behind = jnp.asarray([[0.0, 0.0, -1.0]])
  _, _, hit3 = render.render_surfel_splats(
      behind, col[:1], jnp.ones(1, bool), T, intr, 48, 64, 1.5)
  assert not np.asarray(hit3).any()


def test_display_color_modes():
  from badslam_tpu.models import surfels as surfels_mod
  s = surfels_mod.create(8)
  s = s._replace(
      desc=jnp.full((8, 2), 90.0),
      normal=jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (8, 1)),
      color=jnp.full((8, 3), 0.25),
      active=jnp.asarray([True] * 4 + [False] * 4),
  )
  np.testing.assert_allclose(
      np.asarray(render.surfel_display_colors(s, "color")), 0.25)
  # kernel_update_visualization.cu:67-72 with desc normalized from [-180,180]:
  # 90 -> 0.5*0.5+0.5 = 0.75, blue fixed at 0.5.
  dcol = np.asarray(render.surfel_display_colors(s, "descriptors"))
  np.testing.assert_allclose(dcol, [[0.75, 0.75, 0.5]] * 8, atol=1e-6)
  ncol = np.asarray(render.surfel_display_colors(s, "normals"))
  np.testing.assert_allclose(ncol, [[0.5, 0.5, 0.0]] * 8, atol=1e-6)
  acol = np.asarray(render.surfel_display_colors(s, "activation"))
  assert (acol[:4] != acol[4:]).any()


def test_rendered_map_lies_on_scene_planes(tmp_path):
  """Round trip: surfels created from a keyframe, rendered back from the
  same viewpoint. Unprojecting each hit pixel with the rendered depth must
  land near one of the ground-truth planes — flat splats overhang slanted
  surfaces by at most ~half_extent * depth / fx, so the tolerance scales
  with the splat size, not with numerical error."""
  cam = synthetic.default_test_camera(W, H)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=2,
      initial_surfel_capacity=1 << 14,
  )
  ba = DirectBA(cfg, cam, cam)
  depth, plane_normals = synthetic.make_plane_scene(cam, seed=3)
  kf = synthetic.preprocess_like_test_keyframe(
      depth, cam, intensity=synthetic.intensity_function_image(cam), cell=2)
  idx = ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity,
                        kf.rgb, jnp.eye(4, dtype=jnp.float32), frame_index=0)
  ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)
  assert ba.surfel_count > 100

  d_r, c_r, hit = render.render_map(
      ba, np.eye(4, dtype=np.float32), mode="color",
      splat_half_extent_in_pixels=1.0, resolution=(H, W))
  kf_depth = np.asarray(kf.depth)
  m = hit & (d_r > 0) & (kf_depth > 0)
  assert m.sum() > 500

  # Flat splats overhang slanted surfaces by up to (half_extent + 0.5px
  # footprint quantization) * |grad depth| per pixel; this scene's random
  # planes are steep (~5 cm/px), so the contract is the slant-aware bound,
  # plus near-exactness on the near-fronto-parallel portion.
  gy, gx = np.gradient(kf_depth)
  grad = np.hypot(gy, gx)
  err = np.abs(d_r - kf_depth)
  tol = 0.005 + 2.0 * grad
  within = (err <= tol) | ~m
  assert within[m].mean() > 0.95, within[m].mean()
  # Sharp invariant: at each surfel's own projected pixel the depth buffer
  # holds (at most) that surfel's depth — exactly, up to occlusion by a
  # nearer splat.
  sval = np.asarray(ba.surfels.valid)
  spos = np.asarray(ba.surfels.pos)[sval]
  fx, fy, cx, cy = (float(cam.fx), float(cam.fy), float(cam.cx),
                    float(cam.cy))
  spx = np.floor(fx * spos[:, 0] / spos[:, 2] + cx).astype(int)
  spy = np.floor(fy * spos[:, 1] / spos[:, 2] + cy).astype(int)
  inb = (spx >= 0) & (spx < W) & (spy >= 0) & (spy < H)
  over = d_r[spy[inb], spx[inb]] - spos[inb][:, 2]
  assert (over <= 1e-5).all()  # never farther than the surfel itself
  assert np.quantile(np.abs(over), 0.9) < 2e-3  # and almost always equal

  # Unprojected hit pixels stay near the ground-truth planes in the median.
  ys, xs = np.nonzero(m)
  pts = np.asarray(cam.unproject_center(
      jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
      jnp.asarray(d_r[m])))
  dist = np.abs(pts @ np.asarray(plane_normals).T + 2.5).min(axis=1)
  assert np.median(dist) < 0.03, np.median(dist)

  assert c_r.dtype == np.uint8 and c_r.shape == (H, W, 3)


def test_render_preview_cli_writes_pngs(tmp_path):
  """render_keyframe_previews writes color + depth PNGs per keyframe."""
  from PIL import Image

  cam = synthetic.default_test_camera(W, H)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=2,
      initial_surfel_capacity=1 << 14,
  )
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  kf = synthetic.preprocess_like_test_keyframe(
      depth, cam, intensity=synthetic.intensity_function_image(cam), cell=2)
  idx = ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity,
                        kf.rgb, jnp.eye(4, dtype=jnp.float32), frame_index=7)
  ba.create_surfels_for_keyframe(idx, filter_new_surfels=False)

  class _Slam:  # minimal duck-typed SLAM holder for the preview helper
    direct_ba = ba

  out = str(tmp_path / "previews")
  n = render.render_keyframe_previews(_Slam(), out, mode="normals",
                                      splat_half_extent_in_pixels=2.0)
  assert n == 1
  cpath = os.path.join(out, "kf_000007_color.png")
  dpath = os.path.join(out, "kf_000007_depth.png")
  assert os.path.exists(cpath) and os.path.exists(dpath)
  dimg = np.asarray(Image.open(dpath))
  assert dimg.dtype == np.uint16 and (dimg > 0).sum() > 500
  cimg = np.asarray(Image.open(cpath))
  assert cimg.shape[-1] == 3 and (cimg > 0).any()
