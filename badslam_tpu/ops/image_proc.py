"""Color-image preprocessing: brightness (luma) and Sobel gradient magnitude.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
cuda_image_processing.cu (ComputeBrightnessKernel :165, :196;
ComputeSobelGradientMagnitudeKernel :105).

Intensity convention: float32 in [0, 1] (the reference reads normalized
texture values; descriptors multiply by 180, frame-to-frame color residuals by
255).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def rgb_to_intensity(rgb: jax.Array) -> jax.Array:
  """(H, W, 3) uint8/float RGB -> (H, W) float intensity in [0, 1].

  Matches ComputeBrightnessKernel: u8 luma = 0.299R + 0.587G + 0.114B + 0.5,
  then normalized by 255 when read through the texture unit.
  """
  rgb_f = rgb.astype(jnp.float32)
  luma_u8 = jnp.floor(
      0.299 * rgb_f[..., 0] + 0.587 * rgb_f[..., 1] + 0.114 * rgb_f[..., 2] + 0.5
  )
  return jnp.clip(luma_u8, 0.0, 255.0) * (1.0 / 255.0)


def sobel_gradient_magnitude(intensity: jax.Array) -> jax.Array:
  """Normalized Sobel gradient magnitude in [0, 1]
  (ComputeSobelGradientMagnitudeKernel, cuda_image_processing.cu:105-143).

  Input: (H, W) intensity in [0, 1]. The reference computes on 255*intensity
  with clamp-to-edge sampling for out-of-bounds taps, normalizes by
  255.99/(sqrt(2)*4*255) and truncates to u8; we keep the float value /255
  (i.e. in [0,1]) to match its later texture reads.
  """
  h, w = intensity.shape
  img = intensity * 255.0
  padded = jnp.pad(img, 1, mode="edge")

  def shift(dy, dx):
    return jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))

  gx = (
      shift(-1, 1) - shift(-1, -1)
      + 2.0 * (shift(0, 1) - shift(0, -1))
      + shift(1, 1) - shift(1, -1)
  )
  gy = (
      shift(1, -1) - shift(-1, -1)
      + 2.0 * (shift(1, 0) - shift(-1, 0))
      + shift(1, 1) - shift(-1, 1)
  )
  normalizer = 255.99 / (math.sqrt(2.0) * 4.0 * 255.0)
  mag_u8 = jnp.floor(jnp.clip(normalizer * jnp.sqrt(gx * gx + gy * gy), 0.0, 255.0))
  return mag_u8 * (1.0 / 255.0)
