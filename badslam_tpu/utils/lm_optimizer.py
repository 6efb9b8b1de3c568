"""Generic Levenberg-Marquardt optimizer.

Equivalent of libvis's templated LMOptimizer (libvis/src/libvis/
lm_optimizer.h — generic LM with optional Schur complement; exercised by
libvis/test/lm_optimizer.cc curve-fitting problems; NOT used by the SLAM hot
path, which has specialized solvers). Provided for calibration-style side
problems and API parity.

Usage:
  result = lm_minimize(residual_fn, x0, max_iterations=50)
  # residual_fn: params (P,) -> residuals (R,); minimizes sum(r^2).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
  params: jax.Array
  cost: jax.Array          # final 0.5 * sum(r^2)
  iterations: jax.Array
  converged: jax.Array


@functools.partial(jax.jit, static_argnames=("residual_fn", "max_iterations"))
def lm_minimize(
    residual_fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    max_iterations: int = 50,
    initial_lambda: float = 1e-4,
    update_tolerance: float = 1e-10,
) -> LMResult:
  """Dense LM with multiplicative damping (lm_optimizer.h semantics:
  lambda *= 0.5 on success, *= 2 on failure, convergence on update norm)."""

  def cost_of(x):
    r = residual_fn(x)
    return 0.5 * jnp.sum(r * r)

  def step(x, lam):
    r = residual_fn(x)
    J = jax.jacfwd(residual_fn)(x)
    H = J.T @ J
    g = J.T @ r
    H_damped = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-12))
    dx = jnp.linalg.solve(H_damped, -g)
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    return dx

  def body(state):
    x, lam, it, _ = state
    dx = step(x, lam)
    improved = cost_of(x + dx) < cost_of(x)
    x_new = jnp.where(improved, x + dx, x)
    lam_new = jnp.where(improved, lam * 0.5, lam * 2.0)
    # Converged when the (accepted or rejected) step is tiny — at an exact
    # optimum no step improves, but the solve still returns ~0 updates.
    converged = jnp.sum(dx * dx) < update_tolerance
    return (x_new, lam_new, it + 1, converged)

  def cond(state):
    _, _, it, converged = state
    return (it < max_iterations) & jnp.logical_not(converged)

  x0 = jnp.asarray(x0, jnp.float32)
  x, lam, it, converged = jax.lax.while_loop(
      cond, body, (x0, jnp.asarray(initial_lambda, jnp.float32),
                   jnp.zeros((), jnp.int32), jnp.zeros((), bool)))
  return LMResult(params=x, cost=cost_of(x), iterations=it,
                  converged=converged)
