"""Distributed bundle adjustment: surfel-sharded BA over a device mesh.

The reference is single-GPU (SURVEY.md §2.4: no distributed backend); its
parallel axes are CUDA blocks over surfels/pixels. The TPU-native scaling
axis is the surfel dimension: the surfel store is sharded over the mesh,
and the only cross-shard communication in one BA iteration is

  * pose step: psum of per-keyframe (6x6 H, 6 b) partial sums — tiny;
  * geometry step: none (each surfel's 3x3 system is local);
  * activation/merge/delete: none (per-surfel, local).

This mirrors the reference's own observation that the BA reductions produce
small dense outputs (gauss_newton.cuh block reductions -> one atomicAdd per
block); here partial H/b ride the ICI as a single psum.

Keyframe images are replicated (they are the "model"; surfels are the
"data"). For multi-host scale-out, keyframes can additionally be sharded over
a second mesh axis with the pose loop distributed round-robin — see
`kf_axis` below.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from badslam_tpu.geometry import se3
from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.models import geometry_opt, pose_opt
from badslam_tpu.models.association import DepthParamsArrays
from badslam_tpu.models.keyframes import INACTIVE, KeyframeStore
from badslam_tpu.models.surfels import SurfelStore

SURFEL_AXIS = "surfels"


def surfel_sharding(mesh: Mesh) -> NamedSharding:
  """Surfel arrays: sharded along the surfel dimension."""
  return NamedSharding(mesh, P(SURFEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_surfels(surfels: SurfelStore, mesh: Mesh) -> SurfelStore:
  """Place the surfel store with the surfel axis sharded over the mesh.
  Capacity must be a multiple of the mesh size (grow() pads to powers of 2,
  so this holds whenever mesh sizes are powers of 2)."""
  sh = surfel_sharding(mesh)
  rep = replicated(mesh)

  def place(x):
    if x.ndim >= 1 and x.shape[0] == surfels.capacity:
      return jax.device_put(x, sh)
    return jax.device_put(x, rep)

  return jax.tree.map(place, surfels)


def _surfel_specs() -> SurfelStore:
  """PartitionSpec pytree matching SurfelStore: leading axis sharded except
  the scalar count."""
  return SurfelStore(
      pos=P(SURFEL_AXIS), normal=P(SURFEL_AXIS), radius_sq=P(SURFEL_AXIS),
      color=P(SURFEL_AXIS), desc=P(SURFEL_AXIS), valid=P(SURFEL_AXIS),
      active=P(SURFEL_AXIS), count=P())


def make_sharded_ba_iteration(
    mesh: Mesh,
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    cell_size: int,
    use_depth_residuals: bool = True,
    use_descriptor_residuals: bool = True,
    max_pose_iterations: int = 30,
):
  """Builds the jitted distributed BA iteration:

    (surfels [sharded], kf [replicated], a, cfactor, baseline_fx)
      -> (surfels', kf' with updated poses/activation, num_converged)

  One iteration = geometry GN step (local) + batched pose GN (psum'd H/b),
  i.e. steps (3) and (5) of the reference's alternation
  (direct_ba_alternating.cc:466-577).
  """
  kf_spec = jax.tree.map(lambda _: P(), KeyframeStore(*KeyframeStore._fields))
  surfel_spec = _surfel_specs()

  def iteration(surfels: SurfelStore, kf: KeyframeStore, a, cfactor,
                baseline_fx):
    dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                           cell_size=cell_size)

    # --- geometry step: fully local to the surfel shard ---
    surfels = geometry_opt.optimize_geometry_iteration(
        surfels, kf, depth_cam, color_cam, dp,
        use_depth_residuals, use_descriptor_residuals)

    # --- pose step: partial H/b per shard, psum, replicated solve ---
    optimize = kf.valid & (kf.activation != INACTIVE)

    def h_b_one(T, depth, normals, intensity):
      H, b, _, _ = pose_opt.accumulate_pose_h_b(
          T, surfels, depth, normals, intensity, depth_cam, color_cam, dp,
          use_depth_residuals, use_descriptor_residuals)
      return H, b

    h_b_all = jax.vmap(h_b_one, in_axes=(0, 0, 0, 0))

    def cond(state):
      _, it, done = state
      return (it < max_pose_iterations) & jnp.logical_not(jnp.all(done))

    def body(state):
      T, it, done = state
      H, b = h_b_all(T, kf.depth, kf.normals, kf.intensity)
      H = jax.lax.psum(H, SURFEL_AXIS)
      b = jax.lax.psum(b, SURFEL_AXIS)
      x = jax.vmap(pose_opt.solve_6x6)(H, b)
      x = jnp.where(jnp.all(jnp.isfinite(x), axis=-1, keepdims=True), x,
                    jnp.zeros_like(x))
      step = jnp.where(done[:, None], 0.0, x)
      T_new = T @ se3.exp(-step)
      converged_now = jax.vmap(pose_opt.is_scale1_converged)(x)
      return (T_new, it + 1, done | converged_now)

    T0 = kf.global_T_frame
    T, _, _ = jax.lax.while_loop(
        cond, body, (T0, jnp.zeros((), jnp.int32), ~optimize))
    diff = se3.inverse(T0) @ T
    moved = optimize & ~jax.vmap(pose_opt.is_scale1_converged)(
        jax.vmap(se3.log)(diff))
    activation = jnp.where(optimize, jnp.where(moved, 2, 0), kf.activation)
    kf = kf._replace(global_T_frame=T, activation=activation)
    num_converged = jnp.sum(
        (kf.valid & (activation == 0)).astype(jnp.int32))
    return surfels, kf, num_converged

  sharded = shard_map(
      iteration, mesh=mesh,
      in_specs=(surfel_spec, kf_spec, P(), P(), P()),
      out_specs=(surfel_spec, kf_spec, P()),
      check_vma=False,
  )
  return jax.jit(sharded)


KF_AXIS = "kf"


def make_sharded_ba_iteration_2d(
    mesh: Mesh,
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    cell_size: int,
    use_depth_residuals: bool = True,
    use_descriptor_residuals: bool = True,
    max_pose_iterations: int = 30,
):
  """Distributed BA iteration over a 2-D ('kf', 'surfels') mesh — the
  multi-host layout (SURVEY.md §7.2 stage 8: keyframes across hosts, surfel
  blocks across chips):

    * keyframe image stacks are SHARDED along the kf axis (each host stores
      only its keyframes — the dominant memory);
    * surfels are sharded along the surfel axis;
    * geometry step: each device scans its local keyframes -> per-surfel
      3x3 accumulators psum'd over the kf axis (small: 9 floats/surfel),
      solve local;
    * pose step: per-local-keyframe H/b from the local surfel shard, psum
      over the surfel axis only; each kf shard solves and updates its own
      poses — poses never need to be gathered.

  Returns jitted (surfels, kf, a, cfactor, baseline_fx)
      -> (surfels', kf', num_converged).
  """
  def kf_shard_spec(name):
    # (K, ...) arrays shard along kf; the scalar count is replicated.
    return P() if name == "count" else P(KF_AXIS)

  kf_spec = KeyframeStore(**{
      name: kf_shard_spec(name) for name in KeyframeStore._fields})
  surfel_spec = _surfel_specs()

  def iteration(surfels: SurfelStore, kf: KeyframeStore, a, cfactor,
                baseline_fx):
    dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                           cell_size=cell_size)

    # --- geometry step: local scan over the kf shard, psum accumulators ---
    n = surfels.capacity  # local shard size inside shard_map

    def geo_scan(acc, inputs):
      depth, normals, intensity, T, valid, activation = inputs
      kf_active = valid & (activation >= 1)
      acc = geometry_opt.accumulate_one_keyframe(
          acc, surfels, depth, normals, intensity, T, kf_active,
          depth_cam, color_cam, dp,
          use_depth_residuals, use_descriptor_residuals)
      return acc, None

    acc, _ = jax.lax.scan(
        geo_scan, geometry_opt._zero_accum(n),
        (kf.depth, kf.normals, kf.intensity, kf.global_T_frame, kf.valid,
         kf.activation))
    acc = jax.tree.map(lambda x: jax.lax.psum(x, KF_AXIS), acc)
    surfels = geometry_opt.solve_and_update(surfels, acc)

    # --- pose step: per-local-keyframe GN, psum over the surfel axis ---
    optimize = kf.valid & (kf.activation != 0)

    def h_b_one(T, depth, normals, intensity):
      H, b, _, _ = pose_opt.accumulate_pose_h_b(
          T, surfels, depth, normals, intensity, depth_cam, color_cam, dp,
          use_depth_residuals, use_descriptor_residuals)
      return H, b

    h_b_all = jax.vmap(h_b_one, in_axes=(0, 0, 0, 0))

    def cond(state):
      _, it, done = state
      any_active = jax.lax.psum(
          jnp.sum(jnp.logical_not(done).astype(jnp.int32)), KF_AXIS)
      return (it < max_pose_iterations) & (any_active > 0)

    def body(state):
      T, it, done = state
      H, b = h_b_all(T, kf.depth, kf.normals, kf.intensity)
      H = jax.lax.psum(H, SURFEL_AXIS)
      b = jax.lax.psum(b, SURFEL_AXIS)
      x = jax.vmap(pose_opt.solve_6x6)(H, b)
      x = jnp.where(jnp.all(jnp.isfinite(x), axis=-1, keepdims=True), x,
                    jnp.zeros_like(x))
      step = jnp.where(done[:, None], 0.0, x)
      T_new = T @ se3.exp(-step)
      return (T_new, it + 1, done | jax.vmap(pose_opt.is_scale1_converged)(x))

    T0 = kf.global_T_frame
    T, _, _ = jax.lax.while_loop(
        cond, body, (T0, jnp.zeros((), jnp.int32), ~optimize))
    diff = se3.inverse(T0) @ T
    moved = optimize & ~jax.vmap(pose_opt.is_scale1_converged)(
        jax.vmap(se3.log)(diff))
    activation = jnp.where(optimize, jnp.where(moved, 2, 0), kf.activation)
    kf = kf._replace(global_T_frame=T, activation=activation)
    num_converged = jax.lax.psum(
        jnp.sum((kf.valid & (activation == 0)).astype(jnp.int32)), KF_AXIS)
    return surfels, kf, num_converged

  sharded = shard_map(
      iteration, mesh=mesh,
      in_specs=(surfel_spec, kf_spec, P(), P(), P()),
      out_specs=(surfel_spec, kf_spec, P()),
      check_vma=False,
  )
  return jax.jit(sharded)


def shard_keyframes_2d(kf: KeyframeStore, mesh: Mesh) -> KeyframeStore:
  """Place the keyframe store with (K, ...) arrays sharded along the kf
  axis and everything else replicated. Keyframe capacity must divide the kf
  mesh size."""
  def place(name, x):
    if name == "count":
      return jax.device_put(x, NamedSharding(mesh, P()))
    spec = [None] * x.ndim
    spec[0] = KF_AXIS
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
  return KeyframeStore(**{
      name: place(name, getattr(kf, name)) for name in KeyframeStore._fields})


def grow_keyframes_2d(kf: KeyframeStore, mesh: Mesh,
                      new_capacity: int) -> KeyframeStore:
  """Keyframe-store growth under kf-sharding: pad every (K, ...) array (and
  both axes of the covisibility matrix) to new_capacity and re-place with
  the kf axis sharded. new_capacity must be a multiple of the kf mesh axis;
  new slots arrive invalid, so they are free to receive future keyframes via
  add_keyframe_2d. This is the scale-out analog of keyframes.grow()."""
  from badslam_tpu.models import keyframes as kf_mod
  assert new_capacity % mesh.shape[KF_AXIS] == 0, (
      f"capacity {new_capacity} must divide over kf axis "
      f"{mesh.shape[KF_AXIS]}")
  return shard_keyframes_2d(kf_mod.grow(kf, new_capacity), mesh)


def make_add_keyframe_2d(mesh: Mesh):
  """Jitted insertion of one keyframe into a slot of the kf-sharded store:
  the images land on the shard owning the slot; everything else is a masked
  row update (no gather/re-place of the full store). Covisibility row/column
  are set from a replicated (K,) bool mask."""
  def add(kf: KeyframeStore, slot, depth, normals, radius_sq, intensity,
          rgb, T, frame_index, min_depth, max_depth, covis_row):
    onehot = jnp.arange(kf.capacity) == slot
    def put(stack, img):
      return jnp.where(
          onehot.reshape((-1,) + (1,) * (stack.ndim - 1)), img[None], stack)
    covis = jnp.where(onehot[:, None], covis_row[None, :], kf.covis)
    covis = jnp.where(onehot[None, :], covis_row[:, None], covis)
    covis = covis.at[slot, slot].set(True)
    return kf._replace(
        depth=put(kf.depth, depth),
        normals=put(kf.normals, normals),
        radius_sq=put(kf.radius_sq, radius_sq),
        intensity=put(kf.intensity, intensity),
        rgb=put(kf.rgb, rgb),
        global_T_frame=put(kf.global_T_frame, T),
        frame_index=jnp.where(onehot, frame_index, kf.frame_index),
        min_depth=jnp.where(onehot, min_depth, kf.min_depth),
        max_depth=jnp.where(onehot, max_depth, kf.max_depth),
        valid=kf.valid | onehot,
        activation=jnp.where(onehot, 2, kf.activation),
        covis=covis,
        count=jnp.maximum(kf.count, slot.astype(jnp.int32) + 1))

  # Donating the store keeps the kf-sharded layout (GSPMD propagates the
  # input shardings), so insertion never reshards the image stacks.
  return jax.jit(add, donate_argnums=(0,))


def shard_surfels_2d(surfels: SurfelStore, mesh: Mesh) -> SurfelStore:
  """Surfel arrays sharded along the surfel mesh axis, replicated over kf."""
  def place(name, x):
    if name == "count" or x.ndim == 0:
      return jax.device_put(x, NamedSharding(mesh, P()))
    spec = [None] * x.ndim
    spec[0] = SURFEL_AXIS
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
  return SurfelStore(**{
      name: place(name, getattr(surfels, name))
      for name in SurfelStore._fields})


def make_sharded_pcg_step(
    mesh: Mesh,
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    cell_size: int,
    use_depth_residuals: bool = True,
    use_descriptor_residuals: bool = True,
    max_inner_iterations: int = 30,
    opt_dintr: bool = False,
    opt_cintr: bool = False,
):
  """Distributed joint-GN step: one matrix-free PCG solve with the surfel
  axis sharded over the mesh. Cross-shard traffic per CG iteration is one
  psum of (K,6) pose blocks (plus (5,)+(C,)+(4,) intrinsics blocks when the
  opt_* flags fold those unknowns into the joint vector,
  direct_ba_pcg.cc:240-307) plus three scalar dot products — the PCG path
  is the natural distributed BA formulation (SURVEY.md §5).

  Returns jitted (surfels [sharded], kf [replicated], a, cfactor,
  baseline_fx, gauge_index)
    -> (surfels', kf', max_pose_update) without intrinsics flags, or
    -> (surfels', kf', depth_intr', color_intr', a', cfactor',
        max_pose_update) with either flag set (depth_intr/color_intr are
        taken from the closed-over cameras).
  """
  from badslam_tpu.models import pcg as pcg_mod

  kf_spec = jax.tree.map(lambda _: P(), KeyframeStore(*KeyframeStore._fields))
  surfel_spec = _surfel_specs()
  with_intrinsics = opt_dintr or opt_cintr

  def step(surfels: SurfelStore, kf: KeyframeStore, a, cfactor, baseline_fx,
           gauge_index):
    dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                           cell_size=cell_size)
    delta = pcg_mod.pcg_solve(
        surfels, kf, depth_cam, color_cam, dp, gauge_index,
        max_inner_iterations, use_depth_residuals, use_descriptor_residuals,
        axis_name=SURFEL_AXIS, opt_dintr=opt_dintr, opt_cintr=opt_cintr)
    surfels, kf = pcg_mod.apply_pcg_delta(surfels, kf, delta)
    pose_update = jnp.max(
        jnp.where(kf.valid[:, None], jnp.abs(delta.poses), 0.0))
    if not with_intrinsics:
      return surfels, kf, pose_update
    depth_intr = jnp.asarray(
        [depth_cam.fx, depth_cam.fy, depth_cam.cx, depth_cam.cy], jnp.float32)
    color_intr = jnp.asarray(
        [color_cam.fx, color_cam.fy, color_cam.cx, color_cam.cy], jnp.float32)
    di, ci, a2, cf2 = pcg_mod.apply_pcg_delta_intrinsics(
        depth_intr, color_intr, a, cfactor, delta, opt_dintr, opt_cintr)
    return surfels, kf, di, ci, a2, cf2, pose_update

  out_specs = ((surfel_spec, kf_spec, P(), P(), P(), P(), P())
               if with_intrinsics else (surfel_spec, kf_spec, P()))
  sharded = shard_map(
      step, mesh=mesh,
      in_specs=(surfel_spec, kf_spec, P(), P(), P(), P()),
      out_specs=out_specs,
      check_vma=False,
  )
  return jax.jit(sharded)


def make_sharded_pcg_step_2d(
    mesh: Mesh,
    depth_cam: PinholeCamera,
    color_cam: PinholeCamera,
    cell_size: int,
    use_depth_residuals: bool = True,
    use_descriptor_residuals: bool = True,
    max_inner_iterations: int = 30,
):
  """Joint-GN PCG over the 2-D ('kf', 'surfels') mesh — the multi-host
  layout: keyframe image stacks AND their pose unknowns sharded along the
  kf axis, surfel unknowns along the surfel axis. Per CG iteration the
  cross-shard traffic is: pose rows psum'd over the surfel axis, surfel
  rows psum'd over the kf axis, and the three scalar dot products psum'd
  over both — no unknown block is ever gathered whole.

  gauge_index is the GLOBAL keyframe slot (the local shard offset is
  resolved via axis_index, models/pcg.py:_gauge_mask).

  Returns jitted (surfels, kf, a, cfactor, baseline_fx, gauge_index)
      -> (surfels', kf', max_pose_update).
  """
  from badslam_tpu.models import pcg as pcg_mod

  def kf_shard_spec(name):
    return P() if name == "count" else P(KF_AXIS)

  kf_spec = KeyframeStore(**{
      name: kf_shard_spec(name) for name in KeyframeStore._fields})
  surfel_spec = _surfel_specs()

  def step(surfels: SurfelStore, kf: KeyframeStore, a, cfactor, baseline_fx,
           gauge_index):
    dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                           cell_size=cell_size)
    delta = pcg_mod.pcg_solve(
        surfels, kf, depth_cam, color_cam, dp, gauge_index,
        max_inner_iterations, use_depth_residuals, use_descriptor_residuals,
        axis_name=SURFEL_AXIS, kf_axis=KF_AXIS)
    surfels, kf = pcg_mod.apply_pcg_delta(surfels, kf, delta)
    pose_update = jax.lax.pmax(
        jnp.max(jnp.where(kf.valid[:, None], jnp.abs(delta.poses), 0.0)),
        KF_AXIS)
    return surfels, kf, pose_update

  sharded = shard_map(
      step, mesh=mesh,
      in_specs=(surfel_spec, kf_spec, P(), P(), P(), P()),
      out_specs=(surfel_spec, kf_spec, P()),
      check_vma=False,
  )
  return jax.jit(sharded)
