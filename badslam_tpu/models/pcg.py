"""Matrix-free preconditioned conjugate gradients for the joint BA system.

Behavioral spec: /root/reference/applications/badslam/src/badslam/
direct_ba_pcg.cc (algorithm derivation comment :62-119, unknown layout
:240-307, solver loop :339-471, kDebugVerifyResult self-check :476-550,
delta application :552-646) and kernel_pcg.cu (PCGInit r/M computation
:180+, a-prior rows :587-591, PCGStep1 g = J^T W (J p) + alpha_d :646+,
PCGStep2 :1117, PCGStep3 :1212, PCGDebugVerifyResult :1260,
kDiagEpsilon = 1e-8 LM-style diagonal :44, kAPriorWeight = 10 :48).

Unknowns: 6 per keyframe pose (one keyframe fixed for gauge — the
reference picks a random one per outer iteration, direct_ba_pcg.cc:318-337;
we take an explicit index), 3 per surfel (position offset along normal,
descriptor1, descriptor2), and — when the respective static flags are on —
5 depth-intrinsics unknowns (fx_inv, fy_inv, cx_inv, cy_inv, a), one
cfactor unknown per sparsification cell, and 4 color-intrinsics unknowns
(fx, fy, cx, cy), matching the reference's joint vector exactly. A weak
prior with weight kAPriorWeight pulls the updated `a` toward zero
(kernel_pcg.cu:587-591,1040).

TPU-native design: the unknown vector is a pytree {poses (K,6), spos (N,),
sdesc (N,2), dintr (5,), cfac (C,), cintr (4,)}. One Hessian-vector product
= one scan over keyframes of dense per-surfel math: Jp combines the pose
block (6-dot), surfel block (elementwise) and intrinsics blocks (5/4-dot +
one cfactor gather); J^T W Jp scatters back into pose/intrinsics rows
(masked matmuls, MXU), surfel rows (elementwise adds) and cfactor rows
(segment_sum). Under the surfel-sharded mesh the pose and intrinsics
reductions are psum'd and the surfel parts stay local — the only
cross-shard traffic is (K,6)+(5,)+(C,)+(4,)-sized, exactly the property
that makes PCG the distributed formulation of choice (SURVEY.md §5
long-context note).
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

DIAG_EPSILON = 1e-8     # kDiagEpsilon (kernel_pcg.cu:44)
A_PRIOR_WEIGHT = 10.0   # kAPriorWeight (kernel_pcg.cu:48)
N_DINTR = 5             # fx_inv, fy_inv, cx_inv, cy_inv, a
N_CINTR = 4             # fx, fy, cx, cy


class PCGVector(NamedTuple):
  """The unknown/residual vector layout.

  poses/dintr/cfac/cintr are REPLICATED blocks under the surfel-sharded
  mesh; spos/sdesc are sharded along the surfel axis.
  """
  poses: jax.Array   # (K, 6)
  spos: jax.Array    # (N,)  position offset along the surfel normal
  sdesc: jax.Array   # (N, 2)
  dintr: jax.Array   # (5,)  depth fx_inv, fy_inv, cx_inv, cy_inv, a
  cfac: jax.Array    # (C,)  flattened per-cell cfactor deltas
  cintr: jax.Array   # (4,)  color fx, fy, cx, cy

  def __add__(self, other):
    return PCGVector(*(a + b for a, b in zip(self, other)))

  def __sub__(self, other):
    return PCGVector(*(a - b for a, b in zip(self, other)))

  def scale(self, s):
    return PCGVector(*(s * a for a in self))

  def mul(self, other):
    return PCGVector(*(a * b for a, b in zip(self, other)))

  def dot(self, other, axis_name: Optional[str] = None,
          kf_axis: Optional[str] = None):
    # Surfel blocks: sharded along the surfel axis (psum'd over it) and —
    # once pcg_init/apply_hessian have psum'd them over the kf axis —
    # replicated along the kf axis, so no kf psum here. Pose blocks: sharded
    # along the kf axis (psum'd over it), replicated along the surfel axis.
    # Intrinsics blocks: replicated everywhere, summed locally.
    d = (jnp.sum(self.spos * other.spos)
         + jnp.sum(self.sdesc * other.sdesc))
    if axis_name is not None:
      d = jax.lax.psum(d, axis_name)
    dp = jnp.sum(self.poses * other.poses)
    if kf_axis is not None:
      dp = jax.lax.psum(dp, kf_axis)
    return (d + dp
            + jnp.sum(self.dintr * other.dintr)
            + jnp.sum(self.cfac * other.cfac)
            + jnp.sum(self.cintr * other.cintr))


def zeros_like_vec(k: int, n: int, c: int = 1) -> PCGVector:
  return PCGVector(jnp.zeros((k, 6), jnp.float32),
                   jnp.zeros((n,), jnp.float32),
                   jnp.zeros((n, 2), jnp.float32),
                   jnp.zeros((N_DINTR,), jnp.float32),
                   jnp.zeros((c,), jnp.float32),
                   jnp.zeros((N_CINTR,), jnp.float32))


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
  # Intrinsics blocks (zero-size placeholders unless enabled):
  dimask: jax.Array     # (N,) depth-intrinsics-valid mask
  Jdi: jax.Array        # (N, 5) depth residual wrt [fx_inv..cy_inv, a]
  jcf: jax.Array        # (N,)  depth residual wrt this pixel's cfactor cell
  cell_id: jax.Array    # (N,) int32 flattened cfactor cell index
  J1c: jax.Array        # (N, 4) descriptor-1 residual wrt color intrinsics
  J2c: jax.Array        # (N, 4)


def _compute_terms(
    surfels: SurfelStore,
    global_T_frame: jax.Array,
    kf_depth, kf_normals, kf_intensity,
    depth_cam: PinholeCamera, color_cam: PinholeCamera,
    dp: DepthParamsArrays,
    use_depth_residuals: bool, use_descriptor_residuals: bool,
    opt_dintr: bool = False, opt_cintr: bool = False,
) -> _Terms:
  n = surfels.capacity
  frame_T_global = se3.inverse(global_T_frame)
  assoc = association.associate_surfels(
      surfels.pos, surfels.normal, surfels.valid & surfels.active,
      frame_T_global, kf_depth, kf_normals, depth_cam, dp)
  z = jnp.zeros((n,), jnp.float32)
  z4 = jnp.zeros((n, 4), jnp.float32)
  z5 = jnp.zeros((n, 5), jnp.float32)
  z6 = jnp.zeros((n, 6), jnp.float32)
  zi = jnp.zeros((n,), jnp.int32)
  terms = _Terms(assoc.mask, jnp.zeros_like(assoc.mask), z, z, z6, z,
                 z, z, z, z, z6, z6, z, z,
                 jnp.zeros_like(assoc.mask), z5, z, zi, z4, z4)

  px_f = assoc.px.astype(jnp.float32)
  py_f = assoc.py.astype(jnp.float32)

  if use_depth_residuals:
    unproj = depth_cam.unproject_center(px_f, py_f, assoc.calibrated_depth)
    r = cost.raw_depth_residual(
        unproj, assoc.local_pos, assoc.local_normal, assoc.inv_stddev)
    w = cost.depth_weight(r)
    Jp = cost.depth_residual_pose_jacobian(
        unproj, assoc.local_normal, assoc.inv_stddev)
    Js = -assoc.inv_stddev
    terms = terms._replace(depth_r=r, depth_w=w, depth_Jp=Jp, depth_Js=Js)

    if opt_dintr:
      # Depth-intrinsics jacobian rows — same math as the alternated Schur
      # step (models/intrinsics_opt.py:92-125; behavioral spec
      # kernel_opt_intrinsics.cu:47-200 == the PCGInit rows of
      # kernel_pcg.cu:180+).
      from badslam_tpu.ops.interp import gather_image as _gi
      raw_depth = _gi(kf_depth, assoc.py, assoc.px)
      raw_inv = 1.0 / jnp.maximum(raw_depth, 1e-12)
      hc, wc = dp.cfactor.shape
      cell_x = assoc.px // dp.cell_size
      cell_y = assoc.py // dp.cell_size
      cell_id = cell_y * wc + cell_x
      cfac = _gi(dp.cfactor, cell_y, cell_x)
      exp_inv = jnp.exp(-dp.a * raw_inv)
      corrected_inv = cfac * exp_inv + raw_inv
      dimask = assoc.mask & (jnp.abs(corrected_inv) > 1e-4)

      ln = assoc.local_normal
      nx = depth_cam.nx(px_f)
      ny = depth_cam.ny(py_f)
      dot = ln[:, 0] * nx + ln[:, 1] * ny + ln[:, 2]
      jac_base = assoc.inv_stddev * dot * exp_inv / jnp.maximum(
          corrected_inv * corrected_inv, 1e-20)
      R = frame_T_global[0:3, 0:3]
      gn = surfels.normal
      j_cx = assoc.inv_stddev * assoc.calibrated_depth * (gn @ R[0, :])
      j_cy = assoc.inv_stddev * assoc.calibrated_depth * (gn @ R[1, :])
      j_fx = px_f * j_cx
      j_fy = py_f * j_cy
      j_a = cfac * raw_inv * jac_base
      Jdi = jnp.stack([j_fx, j_fy, j_cx, j_cy, j_a], axis=-1)
      terms = terms._replace(dimask=dimask, Jdi=Jdi, jcf=-jac_base,
                             cell_id=cell_id)

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

    if opt_cintr:
      # Color-intrinsics jacobian approximation J = [gx*nx, gy*ny, gx, gy]
      # (intrinsics_opt.py:140-154; kernel_opt_intrinsics.cu descriptor
      # rows), with nx/ny the normalized depth-pixel coordinates.
      nx = depth_cam.nx(px_f)
      ny = depth_cam.ny(py_f)
      J1c = jnp.stack([gx1 * nx, gy1 * ny, gx1, gy1], axis=-1)
      J2c = jnp.stack([gx2 * nx, gy2 * ny, gx2, gy2], axis=-1)
      terms = terms._replace(J1c=J1c, J2c=J2c)

  return terms


def _scan_keyframes(surfels, kf, depth_cam, color_cam, dp,
                    use_depth, use_desc, body, init,
                    opt_dintr=False, opt_cintr=False):
  """Shared scan over the keyframe stack; body(carry, k_index, terms,
  kf_active)."""

  def scan_body(carry, inputs):
    k_index, depth, normals, intensity, T, valid, activation = inputs
    terms = _compute_terms(surfels, T, depth, normals, intensity,
                           depth_cam, color_cam, dp, use_depth, use_desc,
                           opt_dintr, opt_cintr)
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


def _num_cells(dp: DepthParamsArrays) -> int:
  return dp.cfactor.shape[0] * dp.cfactor.shape[1]


def _segsum(vals, seg, num_cells):
  return jax.ops.segment_sum(vals, seg, num_segments=num_cells + 1)[:num_cells]


def _gauge_mask(k: int, gauge_index, kf_axis: Optional[str]):
  """(k, 1) mask of the gauge-fixed pose row. Under kf-sharding the local
  rows map to global rows via the shard offset, and gauge_index is GLOBAL."""
  rows = jnp.arange(k)
  if kf_axis is not None:
    rows = rows + jax.lax.axis_index(kf_axis) * k
  return (rows == gauge_index)[:, None]


def _psum_replicated(vec: PCGVector, axis_name, kf_axis) -> PCGVector:
  """Cross-shard reduction of accumulated r/M/g blocks: pose rows were
  accumulated from the local surfel shard only (psum over the surfel axis);
  surfel rows from the local keyframe shard only (psum over the kf axis);
  intrinsics rows from both (psum over both)."""
  poses, spos, sdesc = vec.poses, vec.spos, vec.sdesc
  dintr, cfac, cintr = vec.dintr, vec.cfac, vec.cintr
  if axis_name is not None:
    poses = jax.lax.psum(poses, axis_name)
    dintr = jax.lax.psum(dintr, axis_name)
    cfac = jax.lax.psum(cfac, axis_name)
    cintr = jax.lax.psum(cintr, axis_name)
  if kf_axis is not None:
    spos = jax.lax.psum(spos, kf_axis)
    sdesc = jax.lax.psum(sdesc, kf_axis)
    dintr = jax.lax.psum(dintr, kf_axis)
    cfac = jax.lax.psum(cfac, kf_axis)
    cintr = jax.lax.psum(cintr, kf_axis)
  return PCGVector(poses, spos, sdesc, dintr, cfac, cintr)


def pcg_init(surfels, kf, depth_cam, color_cam, dp, gauge_index,
             use_depth=True, use_desc=True,
             axis_name: Optional[str] = None,
             opt_dintr: bool = False, opt_cintr: bool = False,
             kf_axis: Optional[str] = None,
             ) -> Tuple[PCGVector, PCGVector]:
  """r = -J^T W F and Jacobi preconditioner M = diag(J^T W J) + eps
  (PCGInitCUDAKernel, kernel_pcg.cu:180+), including the a-prior rows
  (kernel_pcg.cu:587-591)."""
  k, n = kf.capacity, surfels.capacity
  c = _num_cells(dp)
  opt_dintr = opt_dintr and use_depth
  opt_cintr = opt_cintr and use_desc

  def body(carry, k_index, t: _Terms, kf_ok):
    r, M = carry
    m = t.mask & kf_ok
    dm = t.dmask & kf_ok

    # depth residual
    wd = _masked(t.depth_w, m)
    wr = wd * _masked(t.depth_r, m)
    rp = -(jnp.where(m[:, None], t.depth_Jp, 0.0).T @ wr)
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

    if opt_dintr:
      dim = t.dimask & kf_ok
      wdi = _masked(t.depth_w, dim)
      wri = wdi * _masked(t.depth_r, dim)
      Jdim = jnp.where(dim[:, None], t.Jdi, 0.0)
      jcfm = _masked(t.jcf, dim)
      seg = jnp.where(dim, t.cell_id, c)
      r = r._replace(
          dintr=r.dintr - Jdim.T @ wri,
          cfac=r.cfac - _segsum(jcfm * wri, seg, c))
      M = M._replace(
          dintr=M.dintr + (Jdim ** 2 * wdi[:, None]).sum(axis=0),
          cfac=M.cfac + _segsum(wdi * jcfm * jcfm, seg, c))

    if opt_cintr:
      J1cm = jnp.where(dm[:, None], t.J1c, 0.0)
      J2cm = jnp.where(dm[:, None], t.J2c, 0.0)
      r = r._replace(cintr=r.cintr
                     - J1cm.T @ (w1 * _masked(t.r1, dm))
                     - J2cm.T @ (w2 * _masked(t.r2, dm)))
      M = M._replace(cintr=M.cintr
                     + (J1cm ** 2 * w1[:, None]).sum(axis=0)
                     + (J2cm ** 2 * w2[:, None]).sum(axis=0))
    return (r, M)

  r, M = _scan_keyframes(surfels, kf, depth_cam, color_cam, dp,
                         use_depth, use_desc, body,
                         (zeros_like_vec(k, n, c), zeros_like_vec(k, n, c)),
                         opt_dintr, opt_cintr)
  r = _psum_replicated(r, axis_name, kf_axis)
  M = _psum_replicated(M, axis_name, kf_axis)
  # Gauge fixing: zero the fixed keyframe's rows; unit preconditioner there.
  gauge_mask = _gauge_mask(k, gauge_index, kf_axis)
  r = r._replace(poses=jnp.where(gauge_mask, 0.0, r.poses))
  M = M._replace(
      poses=jnp.where(gauge_mask, 1.0, M.poses + DIAG_EPSILON),
      spos=M.spos + DIAG_EPSILON,
      sdesc=M.sdesc + DIAG_EPSILON)
  if opt_dintr:
    # Weak prior on a: residual kAPriorWeight*(a + delta_a) -> adds -w^2*a to
    # r and w^2 to M on the a row (kernel_pcg.cu:587-591).
    w2a = A_PRIOR_WEIGHT * A_PRIOR_WEIGHT
    r = r._replace(dintr=r.dintr.at[4].add(-w2a * dp.a))
    M = M._replace(dintr=M.dintr.at[4].add(w2a) + DIAG_EPSILON,
                   cfac=M.cfac + DIAG_EPSILON)
  else:
    r = r._replace(dintr=jnp.zeros_like(r.dintr),
                   cfac=jnp.zeros_like(r.cfac))
    M = M._replace(dintr=jnp.ones_like(M.dintr), cfac=jnp.ones_like(M.cfac))
  if opt_cintr:
    M = M._replace(cintr=M.cintr + DIAG_EPSILON)
  else:
    r = r._replace(cintr=jnp.zeros_like(r.cintr))
    M = M._replace(cintr=jnp.ones_like(M.cintr))
  return r, M


def apply_hessian(p: PCGVector, surfels, kf, depth_cam, color_cam, dp,
                  gauge_index, use_depth=True, use_desc=True,
                  axis_name: Optional[str] = None,
                  opt_dintr: bool = False, opt_cintr: bool = False,
                  kf_axis: Optional[str] = None,
                  ) -> PCGVector:
  """g = (J^T W J + eps I) p, matrix-free (PCGStep1, kernel_pcg.cu:646+),
  including the a-prior term on the a row (kernel_pcg.cu:1040)."""
  k, n = kf.capacity, surfels.capacity
  c = _num_cells(dp)
  opt_dintr = opt_dintr and use_depth
  opt_cintr = opt_cintr and use_desc
  gauge_mask = _gauge_mask(k, gauge_index, kf_axis)
  p = p._replace(poses=jnp.where(gauge_mask, 0.0, p.poses))
  if not opt_dintr:
    p = p._replace(dintr=jnp.zeros_like(p.dintr),
                   cfac=jnp.zeros_like(p.cfac))
  if not opt_cintr:
    p = p._replace(cintr=jnp.zeros_like(p.cintr))

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
      return d_pose, d_spos, d_extra, wJp

    # Depth residual: its row may also involve the intrinsics columns.
    if opt_dintr:
      dim = t.dimask & kf_ok
      Jdim = jnp.where(dim[:, None], t.Jdi, 0.0)
      jcfm = _masked(t.jcf, dim)
      p_depth_extra = Jdim @ p.dintr + jcfm * p.cfac[t.cell_id]
    else:
      p_depth_extra = jnp.zeros((n,))
    dp_, ds_, _, wJpd = contrib(t.depth_Jp, t.depth_Js, t.depth_w, m,
                                p_depth_extra, False)

    # Descriptor residuals: rows may involve the color-intrinsics columns.
    if opt_cintr:
      p_c1 = jnp.where(dm[:, None], t.J1c, 0.0) @ p.cintr
      p_c2 = jnp.where(dm[:, None], t.J2c, 0.0) @ p.cintr
    else:
      p_c1 = p_c2 = jnp.zeros((n,))
    d1p, d1s, d1d, wJp1 = contrib(t.J1p, t.J1s, t.w1, dm,
                                  -p.sdesc[:, 0] + p_c1, True)
    d2p, d2s, d2d, wJp2 = contrib(t.J2p, t.J2s, t.w2, dm,
                                  -p.sdesc[:, 1] + p_c2, True)

    g = g._replace(
        poses=g.poses.at[k_index].add(dp_ + d1p + d2p),
        spos=g.spos + ds_ + d1s + d2s,
        sdesc=g.sdesc + jnp.stack([_masked(d1d, dm), _masked(d2d, dm)],
                                  axis=-1))
    if opt_dintr:
      seg = jnp.where(dim, t.cell_id, c)
      g = g._replace(dintr=g.dintr + Jdim.T @ wJpd,
                     cfac=g.cfac + _segsum(jcfm * wJpd, seg, c))
    if opt_cintr:
      g = g._replace(cintr=g.cintr
                     + jnp.where(dm[:, None], t.J1c, 0.0).T @ wJp1
                     + jnp.where(dm[:, None], t.J2c, 0.0).T @ wJp2)
    return g

  g = _scan_keyframes(surfels, kf, depth_cam, color_cam, dp,
                      use_depth, use_desc, body, zeros_like_vec(k, n, c),
                      opt_dintr, opt_cintr)
  g = _psum_replicated(g, axis_name, kf_axis)
  g = g._replace(poses=jnp.where(gauge_mask, p.poses, g.poses))
  g = PCGVector(
      poses=g.poses + DIAG_EPSILON * p.poses,
      spos=g.spos + DIAG_EPSILON * p.spos,
      sdesc=g.sdesc + DIAG_EPSILON * p.sdesc,
      dintr=g.dintr + DIAG_EPSILON * p.dintr,
      cfac=g.cfac + DIAG_EPSILON * p.cfac,
      cintr=g.cintr + DIAG_EPSILON * p.cintr)
  if opt_dintr:
    w2a = A_PRIOR_WEIGHT * A_PRIOR_WEIGHT
    g = g._replace(dintr=g.dintr.at[4].add(w2a * p.dintr[4]))
  return g


def pcg_solve(surfels: SurfelStore, kf: KeyframeStore,
              depth_cam: PinholeCamera, color_cam: PinholeCamera,
              dp: DepthParamsArrays, gauge_index,
              max_inner_iterations: int = 30,
              use_depth: bool = True, use_desc: bool = True,
              axis_name: Optional[str] = None,
              opt_dintr: bool = False, opt_cintr: bool = False,
              kf_axis: Optional[str] = None) -> PCGVector:
  """Full PCG solve: returns the GN update delta (to be applied negatively
  per our J convention matching the alternating path)."""
  r0, M = pcg_init(surfels, kf, depth_cam, color_cam, dp, gauge_index,
                   use_depth, use_desc, axis_name, opt_dintr, opt_cintr,
                   kf_axis)
  M_inv = PCGVector(*(1.0 / m for m in M))

  def hvp(p):
    return apply_hessian(p, surfels, kf, depth_cam, color_cam, dp,
                         gauge_index, use_depth, use_desc, axis_name,
                         opt_dintr, opt_cintr, kf_axis)

  delta0 = zeros_like_vec(kf.capacity, surfels.capacity, _num_cells(dp))
  g0 = M_inv.mul(r0)
  p0 = g0
  # PCGVector.dot psums the sharded surfel parts over axis_name and the
  # sharded pose parts over kf_axis; intrinsics parts are replicated.
  alpha_n0 = r0.dot(g0, axis_name=axis_name, kf_axis=kf_axis)

  def cond(state):
    it, delta, r, g, pvec, alpha_n, prev_alpha = state
    not_done = it < max_inner_iterations
    not_tiny = alpha_n > (1e-10 * alpha_n0 + 1e-30)
    return not_done & not_tiny

  def body(state):
    it, delta, r, g, pvec, alpha_n, _ = state
    h = hvp(pvec)
    alpha_d = pvec.dot(h, axis_name=axis_name, kf_axis=kf_axis)
    alpha = alpha_n / jnp.maximum(alpha_d, 1e-30)
    delta = delta + pvec.scale(alpha)
    r = r - h.scale(alpha)
    g = M_inv.mul(r)
    beta_n = r.dot(g, axis_name=axis_name, kf_axis=kf_axis)
    beta = beta_n / jnp.maximum(alpha_n, 1e-30)
    pvec = g + pvec.scale(beta)
    return (it + 1, delta, r, g, pvec, beta_n, alpha_n)

  init = (jnp.zeros((), jnp.int32), delta0, r0, g0, p0, alpha_n0, alpha_n0)
  _, delta, _, _, _, _, _ = jax.lax.while_loop(cond, body, init)
  return delta


def debug_verify_result(delta: PCGVector, surfels, kf, depth_cam, color_cam,
                        dp, gauge_index, use_depth=True, use_desc=True,
                        axis_name: Optional[str] = None,
                        opt_dintr: bool = False, opt_cintr: bool = False,
                        kf_axis: Optional[str] = None):
  """kDebugVerifyResult self-check (direct_ba_pcg.cc:476-550,
  kernel_pcg.cu:1260-1276): recompute r0 and (J^T W J + eps I) delta and
  return the max-abs residual of the normal equations, plus ||r0||_inf for
  scale. An exact solve gives 0; a converged PCG gives a value small
  relative to ||r0||_inf."""
  r0, _ = pcg_init(surfels, kf, depth_cam, color_cam, dp, gauge_index,
                   use_depth, use_desc, axis_name, opt_dintr, opt_cintr,
                   kf_axis)
  hd = apply_hessian(delta, surfels, kf, depth_cam, color_cam, dp,
                     gauge_index, use_depth, use_desc, axis_name,
                     opt_dintr, opt_cintr, kf_axis)
  diff = hd - r0
  err = jnp.maximum(
      jnp.max(jnp.abs(diff.spos)),
      jnp.maximum(jnp.max(jnp.abs(diff.sdesc)),
                  jnp.max(jnp.abs(diff.poses))))
  scale = jnp.maximum(
      jnp.max(jnp.abs(r0.spos)),
      jnp.maximum(jnp.max(jnp.abs(r0.sdesc)), jnp.max(jnp.abs(r0.poses))))
  if opt_dintr:
    err = jnp.maximum(err, jnp.max(jnp.abs(diff.dintr)))
    err = jnp.maximum(err, jnp.max(jnp.abs(diff.cfac)))
    scale = jnp.maximum(scale, jnp.max(jnp.abs(r0.dintr)))
  if opt_cintr:
    err = jnp.maximum(err, jnp.max(jnp.abs(diff.cintr)))
    scale = jnp.maximum(scale, jnp.max(jnp.abs(r0.cintr)))
  if axis_name is not None:
    err = jax.lax.pmax(err, axis_name)
    scale = jax.lax.pmax(scale, axis_name)
  if kf_axis is not None:
    err = jax.lax.pmax(err, kf_axis)
    scale = jax.lax.pmax(scale, kf_axis)
  return err, scale


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


def apply_pcg_delta_intrinsics(
    depth_intr, color_intr, a, cfactor, delta: PCGVector,
    opt_dintr: bool, opt_cintr: bool):
  """Apply the intrinsics part of the joint delta (direct_ba_pcg.cc:588-645):
  depth intrinsics additively on the INVERSE parameters (with the reference's
  +0.5 pixel-corner convention shift), a and cfactor and color intrinsics
  additively."""
  new_depth_intr, new_a, new_cfactor = depth_intr, a, cfactor
  if opt_dintr:
    d = jnp.where(jnp.isfinite(delta.dintr), delta.dintr, 0.0)
    fx_inv = 1.0 / depth_intr[0]
    fy_inv = 1.0 / depth_intr[1]
    cx_inv = -(depth_intr[2] - 0.5) * fx_inv
    cy_inv = -(depth_intr[3] - 0.5) * fy_inv
    new_fx = 1.0 / (fx_inv + d[0])
    new_fy = 1.0 / (fy_inv + d[1])
    new_cx = -(new_fx * (cx_inv + d[2])) + 0.5
    new_cy = -(new_fy * (cy_inv + d[3])) + 0.5
    new_depth_intr = jnp.stack([new_fx, new_fy, new_cx, new_cy])
    new_a = a + d[4]
    dc = jnp.where(jnp.isfinite(delta.cfac), delta.cfac, 0.0)
    new_cfactor = cfactor + dc.reshape(cfactor.shape)
  new_color_intr = color_intr
  if opt_cintr:
    dc = jnp.where(jnp.isfinite(delta.cintr), delta.cintr, 0.0)
    new_color_intr = color_intr + dc
  return new_depth_intr, new_color_intr, new_a, new_cfactor
