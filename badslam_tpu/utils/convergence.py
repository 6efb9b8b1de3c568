"""Convergence analysis: gather per-iteration GN statistics and derive
convergence thresholds.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
convergence_analysis.{h,cc}: the reference has a hidden data-gathering mode
(gather_convergence_samples_, direct_ba.h:537-538) that runs pose estimation
for a fixed 100 iterations instead of using convergence checks, streams
(update, cost) samples to a file, and RunConvergenceAnalysis derives the
thresholds hard-coded in convergence_analysis.h:45-63.

TPU-native design: instead of file streams from inside kernels, the sampled
GN loop is a ``lax.scan`` that returns the full per-iteration history in one
device round-trip; analysis is plain numpy.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from badslam_tpu.geometry import se3
from badslam_tpu.models import pose_opt


class ConvergenceSamples(NamedTuple):
  update_norm_sq: np.ndarray   # (I,) squared GN update norm of iteration i
  cost: np.ndarray             # (I,) robust cost BEFORE applying update i
  residual_count: np.ndarray   # (I,)


def gather_pose_samples(
    global_T_frame_init, surfels, kf_depth, kf_normals, kf_intensity,
    depth_cam, color_cam, dp, num_iterations: int = 100,
    use_depth_residuals: bool = True, use_descriptor_residuals: bool = True,
) -> ConvergenceSamples:
  """Run frame-to-model pose GN for a FIXED number of iterations (no
  convergence checks) and record per-iteration statistics — the reference's
  sample-gathering mode."""

  def body(T, _):
    H, b, c, n = pose_opt.accumulate_pose_h_b(
        T, surfels, kf_depth, kf_normals, kf_intensity, depth_cam, color_cam,
        dp, use_depth_residuals, use_descriptor_residuals, compute_cost=True)
    x = pose_opt.solve_6x6(H, b)
    x = jnp.where(jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))
    T_new = T @ se3.exp(-x)
    return T_new, (jnp.sum(x * x), c, n)

  _, (upd, cost, count) = jax.lax.scan(
      body, global_T_frame_init, None, length=num_iterations)
  return ConvergenceSamples(
      np.asarray(upd), np.asarray(cost), np.asarray(count))


def analyze_samples(samples: ConvergenceSamples,
                    relative_cost_tolerance: float = 1e-5) -> dict:
  """RunConvergenceAnalysis equivalent: finds the iteration after which the
  remaining relative cost improvement is below the tolerance and reports the
  squared-update threshold observed there — the value to plug into the
  IsScale*PoseEstimationConverged predicates."""
  cost = samples.cost
  final = cost[-1]
  initial = cost[0]
  denom = max(initial - final, 1e-30)
  remaining = (cost - final) / denom
  converged_at = int(np.argmax(remaining < relative_cost_tolerance))
  # cost[i] precedes update[i], so the update that REACHED cost[i] is
  # update[i-1] — take its norm as the threshold.
  thr_idx = max(converged_at - 1, 0)
  return {
      "converged_at_iteration": converged_at,
      "recommended_update_threshold_sq":
          float(samples.update_norm_sq[min(thr_idx, len(cost) - 1)]),
      "initial_cost": float(initial),
      "final_cost": float(final),
      "iterations": len(cost),
  }
