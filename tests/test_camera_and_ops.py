"""Camera convention and preprocessing-op unit tests."""

import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry.camera import DepthToColorTransform, PinholeCamera
from badslam_tpu.ops import depth_model, depth_proc, image_proc, interp, pyramid, robust


def make_camera(width=64, height=48):
  return PinholeCamera(
      width=width,
      height=height,
      fx=0.5 * height,
      fy=0.5 * height,
      cx=0.5 * width - 0.5 + 0.5,  # corner convention: center conv + 0.5
      cy=0.5 * height - 0.5 + 0.5,
  )


def test_matmul_precision_default_is_float32():
  """Importing the package must pin float32 matmul precision: on TPU the
  'default' mode feeds bf16 to the MXU (~2.4e-3 rel err), which silently
  degrades every GN H/b accumulation (see badslam_tpu/geometry/__init__)."""
  import jax
  assert str(jax.config.jax_default_matmul_precision) == "float32"


# --- camera ---


def test_project_unproject_roundtrip():
  cam = make_camera()
  # Unproject pixel centers, project back: corner-convention result must be
  # pixel index + 0.5.
  px = jnp.asarray([0, 10, 63], dtype=jnp.float32)
  py = jnp.asarray([0, 20, 47], dtype=jnp.float32)
  depth = jnp.asarray([1.0, 2.0, 3.0])
  p = cam.unproject_center(px, py, depth)
  pxy = cam.project_corner(p)
  np.testing.assert_allclose(np.asarray(pxy[:, 0]), np.asarray(px) + 0.5, atol=1e-5)
  np.testing.assert_allclose(np.asarray(pxy[:, 1]), np.asarray(py) + 0.5, atol=1e-5)


def test_unproject_grid_matches_pointwise():
  cam = make_camera(8, 6)
  depth = jnp.full((6, 8), 2.0)
  grid = cam.unproject_grid(depth)
  p = cam.unproject_center(jnp.asarray(3.0), jnp.asarray(2.0), jnp.asarray(2.0))
  np.testing.assert_allclose(np.asarray(grid[2, 3]), np.asarray(p), atol=1e-6)


def test_depth_to_color_identity():
  cam = make_camera()
  t = DepthToColorTransform.between(cam, cam)
  pxy = jnp.asarray([[3.5, 4.5]])
  out, ok = t.apply(pxy)
  np.testing.assert_allclose(np.asarray(out), np.asarray(pxy), atol=1e-5)
  assert bool(ok[0])


def test_scaled_camera():
  cam = make_camera()
  half = cam.scaled(0.5)
  assert half.width == 32 and half.height == 24
  np.testing.assert_allclose(float(half.fx), float(cam.fx) * 0.5)


# --- robust losses ---


def test_tukey_weight_matches_derivative():
  r = jnp.linspace(-15, 15, 101)
  w = robust.tukey_weight(r, 10.0)
  assert float(w[0]) == 0.0  # |r|>param -> 0
  np.testing.assert_allclose(float(robust.tukey_weight(jnp.asarray(0.0), 10.0)), 1.0)


def test_huber():
  np.testing.assert_allclose(float(robust.huber_residual(jnp.asarray(1.0), 10.0)), 0.5)
  np.testing.assert_allclose(float(robust.huber_weight(jnp.asarray(20.0), 10.0)), 0.5)


# --- depth model ---


def test_calibrate_depth_zero_cfactor_is_identity():
  d = jnp.asarray([0.5, 1.0, 2.5, 0.0])
  out = depth_model.calibrate_depth(0.0, jnp.zeros(4), d)
  np.testing.assert_allclose(np.asarray(out), np.asarray(d), atol=1e-6)


def test_calibrate_depth_formula():
  d, c, a = 2.0, 0.01, 0.5
  expected = 1.0 / (1.0 / d + c * np.exp(-a / d))
  out = depth_model.calibrate_depth(a, jnp.asarray(c), jnp.asarray(d))
  np.testing.assert_allclose(float(out), expected, rtol=1e-6)


# --- bilinear sampling ---


def test_bilinear_at_pixel_centers():
  img = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
  # corner-convention coordinate of pixel (1,2) center is (2.5, 1.5)
  v = interp.sample_bilinear(img, jnp.asarray(2.5), jnp.asarray(1.5))
  np.testing.assert_allclose(float(v), float(img[1, 2]), atol=1e-6)


def test_bilinear_interpolates():
  img = jnp.asarray([[0.0, 1.0], [0.0, 1.0]])
  v = interp.sample_bilinear(img, jnp.asarray(1.0), jnp.asarray(1.0))
  np.testing.assert_allclose(float(v), 0.5, atol=1e-6)


def test_bilinear_grad():
  img = jnp.asarray([[0.0, 1.0, 2.0], [0.0, 1.0, 2.0], [0.0, 1.0, 2.0]])
  _, dx, dy = interp.sample_bilinear_with_grad(img, jnp.asarray(1.5), jnp.asarray(1.5))
  np.testing.assert_allclose(float(dx), 1.0, atol=1e-6)
  np.testing.assert_allclose(float(dy), 0.0, atol=1e-6)


# --- preprocessing ---


def test_bilateral_passthrough_constant_depth():
  depth = jnp.full((16, 16), 2.0)
  out = depth_proc.bilateral_filter_and_cutoff(depth, max_depth=3.0)
  np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-5)


def test_bilateral_cutoff():
  depth = jnp.full((8, 8), 5.0)
  out = depth_proc.bilateral_filter_and_cutoff(depth, max_depth=3.0)
  np.testing.assert_allclose(np.asarray(out), 0.0)


def test_normals_of_fronto_parallel_plane():
  cam = make_camera(32, 24)
  depth = jnp.full((24, 32), 2.0)
  cfactor = jnp.zeros(depth_model.cfactor_shape(24, 32, 4))
  out_depth, nxy = depth_proc.compute_normals(depth, cam, 0.0, cfactor, 4)
  # Interior pixels: normal = (0, 0, -1) -> stored xy = (0, 0)
  np.testing.assert_allclose(np.asarray(nxy[5:-5, 5:-5]), 0.0, atol=1e-5)
  assert float(out_depth[12, 16]) == 2.0
  assert float(out_depth[0, 0]) == 0.0  # border invalidated
  z = depth_proc.normal_z(nxy[12, 16])
  np.testing.assert_allclose(float(z), -1.0, atol=1e-6)


def test_radii_fronto_parallel():
  cam = make_camera(16, 12)
  depth = jnp.full((12, 16), 2.0)
  r_sq, out_depth = depth_proc.compute_radii_and_remove_isolated(depth, cam)
  # Neighbor spacing = depth / fx = 2/6 -> r^2 = (1/3)^2
  expected = (2.0 / float(cam.fx)) ** 2
  np.testing.assert_allclose(np.asarray(r_sq[5, 8]), expected, rtol=1e-5)
  # Corner pixels have only 2 neighbors -> invalidated.
  assert float(out_depth[0, 0]) == 0.0


def test_min_max_depth():
  depth = jnp.asarray([[0.0, 1.5], [2.5, 0.0]])
  mn, mx = depth_proc.compute_min_max_depth(depth)
  assert float(mn) == 1.5 and float(mx) == 2.5


def test_intensity():
  rgb = jnp.full((4, 4, 3), 255, dtype=jnp.uint8)
  intens = image_proc.rgb_to_intensity(rgb)
  np.testing.assert_allclose(np.asarray(intens), 1.0, atol=1e-3)


def test_sobel_flat_is_zero():
  img = jnp.full((8, 8), 0.5)
  out = image_proc.sobel_gradient_magnitude(img)
  np.testing.assert_allclose(np.asarray(out), 0.0)


def test_pyramid_shapes_and_selection():
  depth = jnp.full((16, 16), 1.0).at[0, 0].set(0.0)
  normals = jnp.zeros((16, 16, 2))
  intensity = jnp.full((16, 16), 0.5)
  levels = pyramid.build_pyramid(depth, normals, intensity, 3)
  assert levels[1].depth.shape == (8, 8)
  assert levels[2].depth.shape == (4, 4)
  # First output pixel: 3 valid sources of depth 1.0 -> closest to avg = 1.0.
  np.testing.assert_allclose(float(levels[1].depth[0, 0]), 1.0)
  # All-invalid quad stays invalid.
  d2 = jnp.zeros((4, 4))
  out, _ = pyramid.downsample_depth_and_normals(d2, jnp.zeros((4, 4, 2)))
  np.testing.assert_allclose(np.asarray(out), 0.0)


def test_median_densify_fills_holes():
  depth = jnp.full((8, 8), 2.0).at[4, 4].set(0.0)
  out = depth_proc.median_filter_and_densify(depth, 1)
  np.testing.assert_allclose(float(out[4, 4]), 2.0)
