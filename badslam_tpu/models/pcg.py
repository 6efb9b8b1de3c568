"""Matrix-free preconditioned conjugate gradients for the joint BA system.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
direct_ba_pcg.cc (algorithm derivation comment :62-119, solver loop
:339-471, delta application :552-646) and kernel_pcg.cu (PCGInit r/M
computation :180+, PCGStep1 g = J^T W (J p) + alpha_d :646+, PCGStep2 :1117,
PCGStep3 :1212, kDiagEpsilon = 1e-8 LM-style diagonal :44).

Unknowns (this implementation): 6 per keyframe pose (one keyframe fixed for
gauge — the reference picks a random one per outer iteration,
direct_ba_pcg.cc:318-337; we take an explicit index), 3 per surfel
(position offset along normal, descriptor1, descriptor2). Intrinsics
unknowns (4+1+cfactor, 4) are handled by the separate alternated intrinsics
step (models/intrinsics_opt.py) rather than inside PCG.

TPU-native design: the unknown vector is a pytree {poses (K,6), spos (N,),
sdesc (N,2)}. One Hessian-vector product = one scan over keyframes of dense
per-surfel math: Jp combines the pose block (6-dot) and surfel block
(elementwise); J^T W Jp scatters back into pose rows (masked matmul, MXU)
and surfel rows (elementwise adds). Under the surfel-sharded mesh the pose
reductions are psum'd and the surfel parts stay local — the only
cross-shard traffic is (K,6)-sized, exactly the property that makes PCG the
distributed formulation of choice (SURVEY.md §5 long-context note).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import DepthToColorTransform, PinholeCamera
from badslam_tpu.models import association, cost
from badslam_tpu.models.association import DepthParamsArrays
from badslam_tpu.models.keyframes import KeyframeStore
from badslam_tpu.models.surfels import SurfelStore

DIAG_EPSILON = 1e-8  # kDiagEpsilon (kernel_pcg.cu:44)


class PCGVector(NamedTuple):
  """The unknown/residual vector layout."""
  poses: jax.Array   # (K, 6)
  spos: jax.Array    # (N,)  position offset along the surfel normal
  sdesc: jax.Array   # (N, 2)

  def __add__(self, other):
    return PCGVector(self.poses + other.poses, self.spos + other.spos,
                     self.sdesc + other.sdesc)

  def __sub__(self, other):
    return PCGVector(self.poses - other.poses, self.spos - other.spos,
                     self.sdesc - other.sdesc)

  def scale(self, s):
    return PCGVector(s * self.poses, s * self.spos, s * self.sdesc)

  def mul(self, other):
    return PCGVector(self.poses * other.poses, self.spos * other.spos,
                     self.sdesc * other.sdesc)

  def dot(self, other, axis_name: Optional[str] = None):
    d = (jnp.sum(self.spos * other.spos)
         + jnp.sum(self.sdesc * other.sdesc))
    if axis_name is not None:
      d = jax.lax.psum(d, axis_name)
    return d + jnp.sum(self.poses * other.poses)


def zeros_like_vec(k: int, n: int) -> PCGVector:
  return PCGVector(jnp.zeros((k, 6), jnp.float32),
                   jnp.zeros((n,), jnp.float32),
                   jnp.zeros((n, 2), jnp.float32))


class _Terms(NamedTuple):
  """Per-(keyframe, surfel) residual terms shared by all PCG passes."""
  mask: jax.Array       # (N,)
  dmask: jax.Array      # (N,) descriptor-valid mask
  depth_r: jax.Array    # (N,)
  depth_w: jax.Array
  depth_Jp: jax.Array   # (N, 6) pose jacobian
  depth_Js: jax.Array   # (N,)  surfel-offset jacobian
  r1: jax.Array
  w1: jax.Array
  r2: jax.Array
  w2: jax.Array
  J1p: jax.Array        # (N, 6)
  J2p: jax.Array
  J1s: jax.Array        # (N,)
  J2s: jax.Array
  # descriptor jacobian wrt own descriptor channel is the constant -1.


def _compute_terms(
    surfels: SurfelStore,
    global_T_frame: jax.Array,
    kf_depth, kf_normals, kf_intensity,
    depth_cam: PinholeCamera, color_cam: PinholeCamera,
    dp: DepthParamsArrays,
    use_depth_residuals: bool, use_descriptor_residuals: bool,
) -> _Terms:
  n = surfels.capacity
  frame_T_global = se3.inverse(global_T_frame)
  assoc = association.associate_surfels(
      surfels.pos, surfels.normal, surfels.valid & surfels.active,
      frame_T_global, kf_depth, kf_normals, depth_cam, dp)
  z = jnp.zeros((n,), jnp.float32)
  z6 = jnp.zeros((n, 6), jnp.float32)
  terms = _Terms(assoc.mask, jnp.zeros_like(assoc.mask), z, z, z6, z,
                 z, z, z, z, z6, z6, z, z)

  if use_depth_residuals:
    unproj = depth_cam.unproject_center(
        assoc.px.astype(jnp.float32), assoc.py.astype(jnp.float32),
        assoc.calibrated_depth)
    r = cost.raw_depth_residual(
        unproj, assoc.local_pos, assoc.local_normal, assoc.inv_stddev)
    w = cost.depth_weight(r)
    Jp = cost.depth_residual_pose_jacobian(
        unproj, assoc.local_normal, assoc.inv_stddev)
    Js = -assoc.inv_stddev
    terms = terms._replace(depth_r=r, depth_w=w, depth_Jp=Jp, depth_Js=Js)

  if use_descriptor_residuals:
    d2c = DepthToColorTransform.between(depth_cam, color_cam)
    color_pxy, in_color = d2c.apply(assoc.pxy)
    dmask = assoc.mask & in_color
    t1_pxy, t2_pxy = cost.tangent_projections(
        surfels.pos, surfels.normal, surfels.radius_sq,
        frame_T_global[0:3, 0:3], frame_T_global[0:3, 3], color_cam)
    r1, r2, gx1, gy1, gx2, gy2 = cost.descriptor_terms_fused(
        kf_intensity, color_pxy, t1_pxy, t2_pxy, surfels.desc)
    J1p = cost.projected_position_pose_jacobian(
        gx1 * color_cam.fx, gy1 * color_cam.fy, assoc.local_pos)
    J2p = cost.projected_position_pose_jacobian(
        gx2 * color_cam.fx, gy2 * color_cam.fy, assoc.local_pos)
    rn = assoc.local_normal
    ls = assoc.local_pos
    term1 = -color_cam.fx * (rn[..., 0] * ls[..., 2] - rn[..., 2] * ls[..., 0])
    term2 = -color_cam.fy * (rn[..., 1] * ls[..., 2] - rn[..., 2] * ls[..., 1])
    term3 = 1.0 / jnp.maximum(ls[..., 2] * ls[..., 2], 1e-12)
    J1s = -(gx1 * term1 + gy1 * term2) * term3
    J2s = -(gx2 * term1 + gy2 * term2) * term3
    terms = terms._replace(
        dmask=dmask, r1=r1, w1=cost.descriptor_weight(r1),
        r2=r2, w2=cost.descriptor_weight(r2),
        J1p=J1p, J2p=J2p, J1s=J1s, J2s=J2s)
  return terms


def _scan_keyframes(surfels, kf, depth_cam, color_cam, dp,
                    use_depth, use_desc, body, init):
  """Shared scan over the keyframe stack; body(carry, k_index, terms,
  kf_active)."""

  def scan_body(carry, inputs):
    k_index, depth, normals, intensity, T, valid, activation = inputs
    terms = _compute_terms(surfels, T, depth, normals, intensity,
                           depth_cam, color_cam, dp, use_depth, use_desc)
    kf_ok = valid & (activation >= 1)
    return body(carry, k_index, terms, kf_ok), None

  k = kf.capacity
  idx = jnp.arange(k, dtype=jnp.int32)
  carry, _ = jax.lax.scan(
      scan_body, init,
      (idx, kf.depth, kf.normals, kf.intensity, kf.global_T_frame,
       kf.valid, kf.activation))
  return carry


def _masked(x, m):
  return jnp.where(m, x, 0.0)


def pcg_init(surfels, kf, depth_cam, color_cam, dp, gauge_index,
             use_depth=True, use_desc=True,
             axis_name: Optional[str] = None) -> Tuple[PCGVector, PCGVector]:
  """r = -J^T W F and Jacobi preconditioner M = diag(J^T W J) + eps
  (PCGInitCUDAKernel, kernel_pcg.cu:180+)."""
  k, n = kf.capacity, surfels.capacity

  def body(carry, k_index, t: _Terms, kf_ok):
    r, M = carry
    m = t.mask & kf_ok
    dm = t.dmask & kf_ok

    # depth residual
    wd = _masked(t.depth_w, m)
    rp = -(jnp.where(m[:, None], t.depth_Jp, 0.0).T
           @ (wd * _masked(t.depth_r, m)))
    Mp = (jnp.where(m[:, None], t.depth_Jp, 0.0) ** 2
          * wd[:, None]).sum(axis=0)
    rs = -(wd * _masked(t.depth_Js, m) * _masked(t.depth_r, m))
    Ms = wd * _masked(t.depth_Js, m) ** 2

    # descriptor residuals
    w1 = _masked(t.w1, dm)
    w2 = _masked(t.w2, dm)
    rp = rp - (jnp.where(dm[:, None], t.J1p, 0.0).T @ (w1 * _masked(t.r1, dm)))
    rp = rp - (jnp.where(dm[:, None], t.J2p, 0.0).T @ (w2 * _masked(t.r2, dm)))
    Mp = Mp + (jnp.where(dm[:, None], t.J1p, 0.0) ** 2 * w1[:, None]).sum(0)
    Mp = Mp + (jnp.where(dm[:, None], t.J2p, 0.0) ** 2 * w2[:, None]).sum(0)
    rs = rs - w1 * _masked(t.J1s, dm) * _masked(t.r1, dm)
    rs = rs - w2 * _masked(t.J2s, dm) * _masked(t.r2, dm)
    Ms = Ms + w1 * _masked(t.J1s, dm) ** 2 + w2 * _masked(t.J2s, dm) ** 2
    # descriptor unknown: jacobian -1
    rd1 = -w1 * (-1.0) * _masked(t.r1, dm)
    rd2 = -w2 * (-1.0) * _masked(t.r2, dm)
    Md1 = w1
    Md2 = w2

    r = r._replace(
        poses=r.poses.at[k_index].add(rp),
        spos=r.spos + rs,
        sdesc=r.sdesc + jnp.stack([rd1, rd2], axis=-1))
    M = M._replace(
        poses=M.poses.at[k_index].add(Mp),
        spos=M.spos + Ms,
        sdesc=M.sdesc + jnp.stack([Md1, Md2], axis=-1))
    return (r, M)

  r, M = _scan_keyframes(surfels, kf, depth_cam, color_cam, dp,
                         use_depth, use_desc, body,
                         (zeros_like_vec(k, n), zeros_like_vec(k, n)))
  if axis_name is not None:
    r = r._replace(poses=jax.lax.psum(r.poses, axis_name))
    M = M._replace(poses=jax.lax.psum(M.poses, axis_name))
  # Gauge fixing: zero the fixed keyframe's rows; unit preconditioner there.
  gauge_mask = (jnp.arange(k) == gauge_index)[:, None]
  r = r._replace(poses=jnp.where(gauge_mask, 0.0, r.poses))
  M = M._replace(
      poses=jnp.where(gauge_mask, 1.0, M.poses + DIAG_EPSILON),
      spos=M.spos + DIAG_EPSILON,
      sdesc=M.sdesc + DIAG_EPSILON)
  return r, M


def apply_hessian(p: PCGVector, surfels, kf, depth_cam, color_cam, dp,
                  gauge_index, use_depth=True, use_desc=True,
                  axis_name: Optional[str] = None) -> PCGVector:
  """g = (J^T W J + eps I) p, matrix-free (PCGStep1, kernel_pcg.cu:646+)."""
  k, n = kf.capacity, surfels.capacity
  gauge_mask = (jnp.arange(k) == gauge_index)[:, None]
  p = p._replace(poses=jnp.where(gauge_mask, 0.0, p.poses))

  def body(g, k_index, t: _Terms, kf_ok):
    m = t.mask & kf_ok
    dm = t.dmask & kf_ok
    p_pose = p.poses[k_index]

    def contrib(Jp6, Js, w, mm, p_extra, extra_is_desc):
      Jp6m = jnp.where(mm[:, None], Jp6, 0.0)
      Jsm = _masked(Js, mm)
      Jp = Jp6m @ p_pose + Jsm * p.spos + p_extra
      wJp = _masked(w, mm) * Jp
      d_pose = Jp6m.T @ wJp
      d_spos = Jsm * wJp
      d_extra = -wJp if extra_is_desc else None
      return d_pose, d_spos, d_extra

    dp_, ds_, _ = contrib(t.depth_Jp, t.depth_Js, t.depth_w, m,
                          jnp.zeros((n,)), False)
    d1p, d1s, d1d = contrib(t.J1p, t.J1s, t.w1, dm, -p.sdesc[:, 0], True)
    d2p, d2s, d2d = contrib(t.J2p, t.J2s, t.w2, dm, -p.sdesc[:, 1], True)

    g = g._replace(
        poses=g.poses.at[k_index].add(dp_ + d1p + d2p),
        spos=g.spos + ds_ + d1s + d2s,
        sdesc=g.sdesc + jnp.stack([_masked(d1d, dm), _masked(d2d, dm)],
                                  axis=-1))
    return g

  g = _scan_keyframes(surfels, kf, depth_cam, color_cam, dp,
                      use_depth, use_desc, body, zeros_like_vec(k, n))
  if axis_name is not None:
    g = g._replace(poses=jax.lax.psum(g.poses, axis_name))
  g = g._replace(poses=jnp.where(gauge_mask, p.poses, g.poses))
  return PCGVector(
      poses=g.poses + DIAG_EPSILON * p.poses,
      spos=g.spos + DIAG_EPSILON * p.spos,
      sdesc=g.sdesc + DIAG_EPSILON * p.sdesc)


def pcg_solve(surfels: SurfelStore, kf: KeyframeStore,
              depth_cam: PinholeCamera, color_cam: PinholeCamera,
              dp: DepthParamsArrays, gauge_index,
              max_inner_iterations: int = 30,
              use_depth: bool = True, use_desc: bool = True,
              axis_name: Optional[str] = None) -> PCGVector:
  """Full PCG solve: returns the GN update delta (to be applied negatively
  per our J convention matching the alternating path)."""
  r0, M = pcg_init(surfels, kf, depth_cam, color_cam, dp, gauge_index,
                   use_depth, use_desc, axis_name)
  M_inv = PCGVector(1.0 / M.poses, 1.0 / M.spos, 1.0 / M.sdesc)

  def hvp(p):
    return apply_hessian(p, surfels, kf, depth_cam, color_cam, dp,
                         gauge_index, use_depth, use_desc, axis_name)

  delta0 = zeros_like_vec(kf.capacity, surfels.capacity)
  g0 = M_inv.mul(r0)
  p0 = g0
  # PCGVector.dot psums the (sharded) surfel parts when axis_name is set;
  # pose parts are replicated, so they are summed locally only.
  alpha_n0 = r0.dot(g0, axis_name=axis_name)

  def cond(state):
    it, delta, r, g, pvec, alpha_n, prev_alpha = state
    not_done = it < max_inner_iterations
    not_tiny = alpha_n > (1e-10 * alpha_n0 + 1e-30)
    return not_done & not_tiny

  def body(state):
    it, delta, r, g, pvec, alpha_n, _ = state
    h = hvp(pvec)
    alpha_d = pvec.dot(h, axis_name=axis_name)
    alpha = alpha_n / jnp.maximum(alpha_d, 1e-30)
    delta = delta + pvec.scale(alpha)
    r = r - h.scale(alpha)
    g = M_inv.mul(r)
    beta_n = r.dot(g, axis_name=axis_name)
    beta = beta_n / jnp.maximum(alpha_n, 1e-30)
    pvec = g + pvec.scale(beta)
    return (it + 1, delta, r, g, pvec, beta_n, alpha_n)

  init = (jnp.zeros((), jnp.int32), delta0, r0, g0, p0, alpha_n0, alpha_n0)
  _, delta, _, _, _, _, _ = jax.lax.while_loop(cond, body, init)
  return delta


def apply_pcg_delta(surfels: SurfelStore, kf: KeyframeStore,
                    delta: PCGVector) -> Tuple[SurfelStore, KeyframeStore]:
  """Apply the GN update (direct_ba_pcg.cc:552-646).

  CG solves H delta = r0 with r0 = -J^T W F, so delta = -x relative to the
  alternating path's x = H^-1 J^T W F whose update is T*exp(-x); hence here
  T <- T*exp(+delta), position += delta_s * normal, desc += delta_d.
  """
  x = jnp.where(jnp.isfinite(delta.poses), delta.poses, 0.0)
  T_new = kf.global_T_frame @ se3.exp(x)
  T_new = jnp.where(kf.valid[:, None, None], T_new, kf.global_T_frame)

  upd = surfels.valid & surfels.active
  xs = jnp.where(upd & jnp.isfinite(delta.spos), delta.spos, 0.0)
  xd = jnp.where(upd[:, None] & jnp.isfinite(delta.sdesc), delta.sdesc, 0.0)
  new_pos = surfels.pos + xs[:, None] * surfels.normal
  new_desc = jnp.clip(surfels.desc + xd, -180.0, 180.0)
  return (surfels._replace(pos=new_pos, desc=new_desc),
          kf._replace(global_T_frame=T_new))
