"""Robust loss functions (Tukey biweight, Huber).

Behavioral spec: /root/reference/applications/badslam/src/badslam/
robust_weighting.cuh:39-86. Branchless jnp formulations (identical values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tukey_residual(raw_residual: jax.Array, tukey_parameter: float) -> jax.Array:
  """rho(r) for the Tukey biweight (robust_weighting.cuh:39-49)."""
  quot = raw_residual / tukey_parameter
  term = 1.0 - quot * quot
  inside = (1.0 / 6.0) * tukey_parameter * tukey_parameter * (1.0 - term * term * term)
  outside = (1.0 / 6.0) * tukey_parameter * tukey_parameter
  return jnp.where(jnp.abs(raw_residual) < tukey_parameter, inside, outside)


def tukey_weight(raw_residual: jax.Array, tukey_parameter: float) -> jax.Array:
  """IRLS weight = rho'(r)/r (robust_weighting.cuh:53-63)."""
  quot = raw_residual / tukey_parameter
  term = 1.0 - quot * quot
  return jnp.where(jnp.abs(raw_residual) < tukey_parameter, term * term, 0.0)


def huber_residual(raw_residual: jax.Array, huber_parameter: float) -> jax.Array:
  """rho(r) for Huber (robust_weighting.cuh:68-77)."""
  abs_r = jnp.abs(raw_residual)
  return jnp.where(
      abs_r < huber_parameter,
      0.5 * raw_residual * raw_residual,
      huber_parameter * (abs_r - 0.5 * huber_parameter),
  )


def huber_weight(raw_residual: jax.Array, huber_parameter: float) -> jax.Array:
  """IRLS weight (robust_weighting.cuh:81-86)."""
  abs_r = jnp.abs(raw_residual)
  return jnp.where(abs_r < huber_parameter, 1.0, huber_parameter / jnp.maximum(abs_r, 1e-30))
