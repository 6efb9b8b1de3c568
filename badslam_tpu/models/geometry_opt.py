"""Per-surfel geometry optimization: one Gauss-Newton step on (position along
normal, descriptor1, descriptor2) for every active surfel in parallel.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
kernel_opt_geometry.cu — coefficient accumulation :119-231 (3x3 upper-tri H
and 3-vector b per surfel, summed over all active keyframes), in-register
Cholesky solve + update with descriptor clamp to [-180, 180] :273-361, and the
normal re-estimation pass :527-625 (average observed image-space normals).

TPU-native design: the reference launches one kernel per keyframe and keeps
per-surfel accumulators in 9 scratch rows of the surfel buffer; here a
``lax.scan`` over the batched keyframe stack accumulates (N, 3, 3)/(N, 3) in
registers, and the batched 3x3 Cholesky solve is closed-form vectorized math.
One surfel's system is independent of every other's, so this pass is
embarrassingly parallel and shards perfectly over surfel blocks.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import DepthToColorTransform, PinholeCamera
from badslam_tpu.models import association, cost
from badslam_tpu.models.association import DepthParamsArrays
from badslam_tpu.models.keyframes import ACTIVE, COVISIBLE_ACTIVE, KeyframeStore
from badslam_tpu.models.surfels import SurfelStore
from badslam_tpu.ops import interp
from badslam_tpu.ops.depth_proc import normals_3d


class GeometryAccum(NamedTuple):
  """Per-surfel upper-triangular 3x3 H and 3-vector b (the reference's
  kSurfelAccum0..8 rows, kernel_opt_geometry.cu:200-208)."""

  h00: jax.Array
  h01: jax.Array
  h02: jax.Array
  h11: jax.Array
  h12: jax.Array
  h22: jax.Array
  b0: jax.Array
  b1: jax.Array
  b2: jax.Array


def _zero_accum(n: int) -> GeometryAccum:
  z = jnp.zeros((n,), jnp.float32)
  return GeometryAccum(z, z, z, z, z, z, z, z, z)


def accumulate_one_keyframe(
    acc: GeometryAccum,
    surfels: SurfelStore,
    kf_depth: jax.Array,
    kf_normals: jax.Array,
    kf_intensity: jax.Array,
    global_T_frame: jax.Array,
    kf_active: jax.Array,
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    dp: DepthParamsArrays,
    use_depth_residuals: bool = True,
    use_descriptor_residuals: bool = True,
) -> GeometryAccum:
  """Adds one keyframe's contribution to every surfel's 3x3 system
  (AccumulateSurfelPositionAndDescriptorOptimizationCoeffsCUDAKernel)."""
  frame_T_global = se3.inverse(global_T_frame)
  assoc = association.associate_surfels(
      surfels.pos, surfels.normal, surfels.valid & surfels.active,
      frame_T_global, kf_depth, kf_normals, depth_cam, dp,
  )
  mask = assoc.mask & kf_active

  h00 = acc.h00
  b0 = acc.b0
  if use_depth_residuals:
    unproj = depth_cam.unproject_center(
        assoc.px.astype(jnp.float32), assoc.py.astype(jnp.float32),
        assoc.calibrated_depth,
    )
    r = cost.raw_depth_residual(
        unproj, assoc.local_pos, assoc.local_normal, assoc.inv_stddev)
    j = -assoc.inv_stddev  # d r / d (position offset along normal)
    w = cost.depth_weight(r)
    wm = jnp.where(mask, w, 0.0)
    h00 = h00 + wm * j * j
    b0 = b0 + wm * r * j

  if use_descriptor_residuals:
    d2c = DepthToColorTransform.between(depth_cam, color_cam)
    color_pxy, in_color = d2c.apply(assoc.pxy)
    dmask = mask & in_color
    t1_pxy, t2_pxy = cost.tangent_projections(
        surfels.pos, surfels.normal, surfels.radius_sq,
        frame_T_global[0:3, 0:3], frame_T_global[0:3, 3], color_cam,
    )
    r1, r2, gx1, gy1, gx2, gy2 = cost.descriptor_terms_fused(
        kf_intensity, color_pxy, t1_pxy, t2_pxy, surfels.desc)

    # d r_i / d (position offset along normal): chain rule through the
    # projected position (kernel_opt_geometry.cu:188-192).
    rn = assoc.local_normal
    ls = assoc.local_pos
    term1 = -color_cam.fx * (rn[..., 0] * ls[..., 2] - rn[..., 2] * ls[..., 0])
    term2 = -color_cam.fy * (rn[..., 1] * ls[..., 2] - rn[..., 2] * ls[..., 1])
    term3 = 1.0 / jnp.maximum(ls[..., 2] * ls[..., 2], 1e-12)
    jp1 = -(gx1 * term1 + gy1 * term2) * term3
    jp2 = -(gx2 * term1 + gy2 * term2) * term3
    jd = -1.0  # d r_i / d descriptor_i

    w1 = jnp.where(dmask, cost.descriptor_weight(r1), 0.0)
    w2 = jnp.where(dmask, cost.descriptor_weight(r2), 0.0)

    h00 = h00 + w1 * jp1 * jp1 + w2 * jp2 * jp2
    b0 = b0 + w1 * r1 * jp1 + w2 * r2 * jp2
    acc = acc._replace(
        h01=acc.h01 + w1 * jp1 * jd,
        h02=acc.h02 + w2 * jp2 * jd,
        h11=acc.h11 + w1 * jd * jd,
        h22=acc.h22 + w2 * jd * jd,
        b1=acc.b1 + w1 * r1 * jd,
        b2=acc.b2 + w2 * r2 * jd,
    )

  return acc._replace(h00=h00, b0=b0)


def solve_and_update(
    surfels: SurfelStore, acc: GeometryAccum
) -> SurfelStore:
  """Batched 3x3 Cholesky solve + surfel update
  (UpdateSurfelPositionAndDescriptorCUDAKernel, kernel_opt_geometry.cu:273-361)."""
  eps = 1e-6
  h00 = acc.h00 + eps
  h11 = acc.h11 + eps
  h22 = acc.h22 + eps

  # In-place Cholesky of the 3x3 (guard divisions; zero rows yield x = 0).
  l00 = jnp.sqrt(jnp.maximum(h00, 1e-30))
  l01 = acc.h01 / l00
  l11 = jnp.sqrt(jnp.maximum(h11 - l01 * l01, 1e-30))
  l02 = acc.h02 / l00
  l12 = (acc.h12 - l02 * l01) / l11
  l22 = jnp.sqrt(jnp.maximum(h22 - l02 * l02 - l12 * l12, 1e-30))

  y0 = acc.b0 / l00
  y1 = (acc.b1 - l01 * y0) / l11
  y2 = (acc.b2 - l02 * y0 - l12 * y1) / l22

  x2 = y2 / l22
  x1 = (y1 - l12 * x2) / l11
  x0 = (y0 - l02 * x2 - l01 * x1) / l00

  upd = surfels.valid & surfels.active
  finite = jnp.isfinite(x0) & jnp.isfinite(x1) & jnp.isfinite(x2)
  upd = upd & finite

  new_pos = surfels.pos - jnp.where(upd, x0, 0.0)[:, None] * surfels.normal
  d1 = jnp.clip(surfels.desc[:, 0] - jnp.where(upd, x1, 0.0), -180.0, 180.0)
  d2 = jnp.clip(surfels.desc[:, 1] - jnp.where(upd, x2, 0.0), -180.0, 180.0)
  return surfels._replace(pos=new_pos, desc=jnp.stack([d1, d2], axis=-1))


def optimize_geometry_iteration(
    surfels: SurfelStore,
    kf: KeyframeStore,
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    dp: DepthParamsArrays,
    use_depth_residuals: bool = True,
    use_descriptor_residuals: bool = True,
) -> SurfelStore:
  """One geometry GN step over all active surfels, accumulating over all
  active/covisible-active keyframes via lax.scan
  (OptimizeGeometryIterationCUDA driver, kernel_opt_geometry.cc)."""
  n = surfels.capacity

  def scan_body(acc, inputs):
    depth, normals, intensity, T, valid, activation = inputs
    kf_active = valid & (activation >= COVISIBLE_ACTIVE)
    acc = accumulate_one_keyframe(
        acc, surfels, depth, normals, intensity, T, kf_active,
        depth_cam, color_cam, dp,
        use_depth_residuals, use_descriptor_residuals,
    )
    return acc, None

  acc, _ = jax.lax.scan(
      scan_body,
      _zero_accum(n),
      (kf.depth, kf.normals, kf.intensity, kf.global_T_frame, kf.valid,
       kf.activation),
  )
  return solve_and_update(surfels, acc)


def reestimate_normals(
    surfels: SurfelStore,
    kf: KeyframeStore,
    depth_cam: PinholeCamera,
    dp: DepthParamsArrays,
) -> SurfelStore:
  """Set each active surfel's normal to the (rotated-to-global) average of the
  image-space normals it is observed with (kernel_opt_geometry.cu:527-625)."""
  n = surfels.capacity

  def scan_body(carry, inputs):
    acc_n = carry
    depth, normals, T, valid, activation = inputs
    frame_T_global = se3.inverse(T)
    assoc = association.associate_surfels(
        surfels.pos, surfels.normal, surfels.valid & surfels.active,
        frame_T_global, depth, normals, depth_cam, dp,
    )
    kf_active = valid & (activation >= COVISIBLE_ACTIVE)
    mask = assoc.mask & kf_active
    pix_n = normals_3d(interp.gather_image(normals, assoc.py, assoc.px))
    global_n = se3.rotate(T, pix_n)
    acc_n = acc_n + jnp.where(mask[:, None], global_n, 0.0)
    return acc_n, None

  acc_n, _ = jax.lax.scan(
      scan_body,
      jnp.zeros((n, 3), jnp.float32),
      (kf.depth, kf.normals, kf.global_T_frame, kf.valid, kf.activation),
  )
  norm = jnp.linalg.norm(acc_n, axis=-1)
  ok = surfels.valid & surfels.active & (norm > 1e-12)
  new_normal = jnp.where(
      ok[:, None], acc_n / jnp.maximum(norm, 1e-12)[:, None], surfels.normal)
  return surfels._replace(normal=new_normal)
