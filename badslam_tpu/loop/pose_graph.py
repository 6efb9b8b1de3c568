"""Pose-graph optimization on SE(3).

Replaces the reference's thin g2o wrapper (/root/reference/applications/
badslam/src/badslam/pose_graph_optimizer.{h,cc}): VertexSE3 per keyframe,
EdgeSE3 odometry constraints built from the *current* relative poses, loop
edge(s), identity information matrices, vertex 0 fixed.

TPU-native design: the graph is tiny (K <= pcg_max_keyframe_count), so one
jitted Levenberg-Marquardt over stacked pose parameters does the job. Edge
residual r_e = log(Z_ij^-1 * T_i^-1 * T_j) with T_k = T_k0 * exp(x_k); the
full Jacobian comes from forward-mode autodiff (6E x 6K is small), and the
normal equations solve densely on-device.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry import se3


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def _optimize_jit(T0: jax.Array, edges_i: jax.Array, edges_j: jax.Array,
                  edges_Z: jax.Array, edge_weight: jax.Array,
                  num_iterations: int = 20) -> jax.Array:
  """LM on pose-graph edges. T0 (K,4,4); fixed gauge at vertex 0."""
  k = T0.shape[0]

  def residuals(x):
    T = T0 @ se3.exp(x)
    Ti = T[edges_i]
    Tj = T[edges_j]
    e = se3.log(se3.inverse(edges_Z) @ se3.inverse(Ti) @ Tj)
    return (edge_weight[:, None] * e).reshape(-1)

  def body(state, _):
    x, lm_lambda = state
    r = residuals(x)
    J = jax.jacfwd(residuals)(x).reshape(r.shape[0], k * 6)
    H = J.T @ J
    b = J.T @ r
    # Gauge fix: freeze vertex 0 by zeroing its rows/cols and setting identity.
    H = H.at[:6, :].set(0.0).at[:, :6].set(0.0)
    H = H + jnp.diag(jnp.concatenate(
        [jnp.ones(6), lm_lambda * jnp.ones(6 * (k - 1))]))
    b = b.at[:6].set(0.0)
    dx = jnp.linalg.solve(H, -b).reshape(k, 6)
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    x_new = x + dx
    improved = jnp.sum(residuals(x_new) ** 2) < jnp.sum(r ** 2)
    x = jnp.where(improved, x_new, x)
    lm_lambda = jnp.where(improved, lm_lambda * 0.5, lm_lambda * 4.0)
    return (x, lm_lambda), None

  x0 = jnp.zeros((k, 6), jnp.float32)
  (x, _), _ = jax.lax.scan(body, (x0, jnp.asarray(1e-4, jnp.float32)),
                           None, length=num_iterations)
  return T0 @ se3.exp(x)


class PoseGraphOptimizer:
  """Mirrors the reference's PoseGraphOptimizer public surface
  (pose_graph_optimizer.h:49-72): ctor adds a vertex per keyframe and
  odometry edges between consecutive keyframes from their current relative
  poses; AddEdge adds loop constraints; Optimize solves; GetGlobalTFrame
  reads back."""

  def __init__(self, keyframe_poses: np.ndarray,
               add_current_state_odometry_constraints: bool = True,
               odometry_weights: Optional[np.ndarray] = None):
    """keyframe_poses: (K, 4, 4) global_T_frame for the valid keyframes.

    odometry_weights: optional (K-1,) per-edge confidence for the
    consecutive-keyframe constraints. The reference uses identity
    information everywhere (pose_graph_optimizer.h:49-72), which SPREADS a
    loop-closure correction evenly along the chain; an edge whose tracking
    failed (constant-position fallback — a guess, not a measurement) should
    instead absorb the correction, so the front-end hands those edges
    WEAK_EDGE_WEIGHT (slam/pipelined.py)."""
    self.T0 = np.asarray(keyframe_poses, np.float32)
    k = len(self.T0)
    self.edges_i: List[int] = []
    self.edges_j: List[int] = []
    self.edges_Z: List[np.ndarray] = []
    self.weights: List[float] = []
    if add_current_state_odometry_constraints:
      for i in range(k - 1):
        z = np.asarray(
            se3.inverse(jnp.asarray(self.T0[i])) @ jnp.asarray(self.T0[i + 1]))
        w = 1.0 if odometry_weights is None else float(odometry_weights[i])
        self.add_edge(i, i + 1, z, weight=w)
    self.result: Optional[np.ndarray] = None

  def add_edge(self, i: int, j: int, i_T_j: np.ndarray, weight: float = 1.0):
    """Edge measurement Z = i_T_j (identity information as the reference)."""
    self.edges_i.append(i)
    self.edges_j.append(j)
    self.edges_Z.append(np.asarray(i_T_j, np.float32))
    self.weights.append(weight)

  def optimize(self, num_iterations: int = 20) -> np.ndarray:
    if not self.edges_i:
      self.result = self.T0
      return self.result
    self.result = np.asarray(_optimize_jit(
        jnp.asarray(self.T0),
        jnp.asarray(self.edges_i, jnp.int32),
        jnp.asarray(self.edges_j, jnp.int32),
        jnp.asarray(np.stack(self.edges_Z)),
        jnp.asarray(self.weights, jnp.float32),
        num_iterations))
    return self.result

  def get_global_T_frame(self, index: int) -> np.ndarray:
    assert self.result is not None, "call optimize() first"
    return self.result[index]
