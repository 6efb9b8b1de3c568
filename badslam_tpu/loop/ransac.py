"""3D-3D alignment: Umeyama/Horn absolute orientation + RANSAC.

Replaces opengv's PointCloudSacProblem used for loop-closure verification
(/root/reference/applications/badslam/src/badslam/loop_detector.cc:284-360:
threshold 0.06, max 500 iterations, >= 10 inliers).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = False) -> np.ndarray:
  """Least-squares rigid transform T (4,4) with dst ~= T @ src.

  Horn/Umeyama closed form (the reference's opengv point-cloud model solves
  the same problem inside RANSAC).
  """
  mu_s = src.mean(axis=0)
  mu_d = dst.mean(axis=0)
  xs = src - mu_s
  xd = dst - mu_d
  cov = xd.T @ xs / len(src)
  U, S, Vt = np.linalg.svd(cov)
  d = np.sign(np.linalg.det(U @ Vt))
  D = np.diag([1.0, 1.0, d])
  R = U @ D @ Vt
  if with_scale:
    var_s = (xs ** 2).sum() / len(src)
    c = np.trace(np.diag(S) @ D) / var_s
  else:
    c = 1.0
  T = np.eye(4)
  T[:3, :3] = c * R
  T[:3, 3] = mu_d - c * R @ mu_s
  return T


def ransac_3d3d(
    src: np.ndarray,       # (N, 3) points in frame A
    dst: np.ndarray,       # (N, 3) corresponding points in frame B
    threshold: float = 0.06,
    max_iterations: int = 500,
    min_inliers: int = 10,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[Optional[np.ndarray], np.ndarray]:
  """Returns (B_T_A (4,4) or None, inlier mask). Matches the reference's
  RANSAC parameters (loop_detector.cc:310-320)."""
  n = len(src)
  if n < 3:
    return None, np.zeros(n, bool)
  if rng is None:
    rng = np.random.default_rng(0)

  best_inliers = np.zeros(n, bool)
  best_count = 0
  for _ in range(max_iterations):
    idx = rng.choice(n, size=3, replace=False)
    s, d = src[idx], dst[idx]
    # Degenerate (nearly collinear) samples produce garbage; skip them.
    if np.linalg.norm(np.cross(s[1] - s[0], s[2] - s[0])) < 1e-9:
      continue
    T = umeyama_alignment(s, d)
    err = np.linalg.norm(dst - (src @ T[:3, :3].T + T[:3, 3]), axis=1)
    inliers = err < threshold
    count = int(inliers.sum())
    if count > best_count:
      best_count = count
      best_inliers = inliers
      if count == n:
        break

  if best_count < min_inliers:
    return None, best_inliers
  # Final refit on all inliers.
  T = umeyama_alignment(src[best_inliers], dst[best_inliers])
  err = np.linalg.norm(dst - (src @ T[:3, :3].T + T[:3, 3]), axis=1)
  best_inliers = err < threshold
  if int(best_inliers.sum()) < min_inliers:
    return None, best_inliers
  T = umeyama_alignment(src[best_inliers], dst[best_inliers])
  return T.astype(np.float32), best_inliers
