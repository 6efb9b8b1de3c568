"""Keyframe-count scaling bench: BA iteration cost vs keyframe count.

The reference bounds BA work with keyframe activation: inactive keyframes are
skipped by host-side loops (direct_ba_alternating.cc:543-577), so device work
scales with the ACTIVE set. The TPU-native design instead runs dense masked
phases over the full keyframe store (static shapes; a vmap/scan over the
leading axis), so device work per iteration scales with the store WATERMARK,
independent of activation. This bench quantifies both claims:

  * all-active rows: time/iteration should grow ~linearly in K with constant
    per-keyframe cost (kf_iter/s flat) — the scaling property that matters
    for the parallel-BA flagship mode, where every keyframe is active each
    iteration (bad_slam.cc:1268-1289; system.py BA thread);
  * window_8_dense rows: only 8 keyframes are active, the rest INACTIVE,
    run dense — this costs O(K) (the masked lanes still execute): the price
    of static shapes;
  * window_8_gathered rows: the same 8-active problem through DirectBA's
    active-window gather (_gather_kf_window_jit): device work returns to
    O(active set) at the cost of one gather+scatter per iteration. This is
    the path bundle_adjustment auto-selects when the participating set
    buckets to <= half the store.

Measurement discipline matches bench.py: transfer-free timed region
(PERF.md "tunnel dispatch modes"), readbacks after all timing.

Usage: python benchmarks/kf_scale.py [--keyframes 8,16,32,64] [--iters 3]
           [--surfel_capacity_log 15] [--out report.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--keyframes", default="8,16,32,64",
                 help="comma-separated keyframe counts (first = base build)")
  p.add_argument("--iters", type=int, default=3)
  p.add_argument("--surfel_capacity_log", type=int, default=15)
  p.add_argument("--out", default=None)
  args = p.parse_args()
  kf_counts = [int(v) for v in args.keyframes.split(",")]
  base_k = kf_counts[0]

  import jax
  import jax.numpy as jnp
  from badslam_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), ".jax_cache"))

  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3
  from badslam_tpu.models import geometry_opt, keyframes as kf_mod, pose_opt
  from badslam_tpu.models.association import DepthParamsArrays
  from badslam_tpu.slam.direct_ba import DirectBA, make_camera
  from badslam_tpu.utils import synthetic

  width, height = 640, 480
  cell = 4

  cam = synthetic.default_test_camera(width, height)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=cell,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=base_k,
      initial_surfel_capacity=1 << args.surfel_capacity_log,
  )
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  inten = synthetic.intensity_function_image(cam)
  kf = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                               cell=cell)
  rng = np.random.default_rng(0)
  for i in range(base_k):
    noise = jnp.asarray(
        np.concatenate([rng.uniform(-2e-3, 2e-3, 3),
                        rng.uniform(-5e-4, 5e-4, 3)]), jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32) if i == 0 else se3.exp(noise)
    ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb,
                    T, i * 10)
  ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
  surfels = ba.surfels._replace(active=ba.surfels.valid)
  base_kf = ba.kf._replace(
      activation=jnp.where(ba.kf.valid, kf_mod.ACTIVE, 0).astype(jnp.int32))
  intr = ba.depth_intr

  @jax.jit
  def ba_iteration(surfels, kf_store, a, cfactor, baseline_fx, intr):
    dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                           cell_size=cell)
    c = make_camera(intr, width, height)
    surfels = geometry_opt.optimize_geometry_iteration(
        surfels, kf_store, c, c, dp, True, True)
    optimize = kf_store.valid & (kf_store.activation != 0)
    T, _ = pose_opt.estimate_frame_poses_batched(
        kf_store.global_T_frame, optimize, surfels,
        kf_store.depth, kf_store.normals, kf_store.intensity,
        c, c, dp, True, True, max_iterations=10)
    return surfels, kf_store._replace(global_T_frame=T)

  @functools.partial(jax.jit, static_argnums=(1,))
  def tile_keyframes(k, reps: int):
    # Replicate the base stacks `reps` times with small pose jitter so every
    # slot carries live data at a distinct pose (all on device).
    def rep(x):
      return jnp.concatenate([x] * reps, axis=0)

    jit_tw = (jnp.arange(reps, dtype=jnp.float32)[:, None]
              * jnp.asarray([1e-3, -1e-3, 5e-4, 2e-4, -1e-4, 1e-4]))
    jitter = jax.vmap(se3.exp)(jit_tw)                      # (reps, 4, 4)
    poses = jnp.einsum("rij,kjl->rkil", jitter,
                       k.global_T_frame).reshape(-1, 4, 4)
    cap = k.capacity * reps
    return k._replace(
        depth=rep(k.depth), normals=rep(k.normals),
        radius_sq=rep(k.radius_sq), intensity=rep(k.intensity),
        rgb=rep(k.rgb), global_T_frame=poses,
        frame_index=jnp.arange(cap, dtype=jnp.int32) * 10,
        min_depth=rep(k.min_depth), max_depth=rep(k.max_depth),
        valid=rep(k.valid), activation=rep(k.activation),
        covis=jnp.zeros((cap, cap), bool), count=k.count * reps)

  from badslam_tpu.slam.direct_ba import (_gather_kf_window_jit,
                                          _scatter_kf_window_jit)
  win_idx = jnp.arange(8, dtype=jnp.int32)

  # Pose perturbation applied before every timed iteration: without it the
  # batched pose GN converges after the warm-up call and its on-device
  # while_loop exits after ~1 iteration, so the bench would time the
  # CONVERGED iteration (flat ~0.2 ms at any K on TPU — measured) instead
  # of a working one. ~2 mm / 0.5 mrad keeps every keyframe unconverged.
  @jax.jit
  def perturb(k_store):
    n = k_store.capacity
    tw = (jnp.asarray([2e-3, -1.5e-3, 1e-3, 5e-4, -4e-4, 3e-4])[None, :]
          * (1.0 + 0.1 * jnp.arange(n, dtype=jnp.float32))[:, None])
    return k_store._replace(
        global_T_frame=k_store.global_T_frame @ jax.vmap(se3.exp)(tw),
        activation=k_store.activation)

  rows = []
  state = None
  for n_kf in kf_counts:
    reps = n_kf // base_k
    k_full = tile_keyframes(base_kf, reps) if reps > 1 else base_kf
    k_win8 = k_full._replace(activation=jnp.where(
        jnp.arange(k_full.capacity) < 8, kf_mod.ACTIVE, 0))
    def dense_step(s, k):
      return ba_iteration(s, k, ba.a, ba.cfactor, ba.baseline_fx, intr)

    def windowed_step(s, k_full_):
      # DirectBA's active-window path: gather the 8 active keyframes, run
      # the phases on the window, scatter poses back (gather/scatter cost
      # included — this is what bundle_adjustment actually pays).
      k_win = _gather_kf_window_jit(k_full_, win_idx)
      s, k_win = ba_iteration(s, k_win, ba.a, ba.cfactor, ba.baseline_fx,
                              intr)
      return s, _scatter_kf_window_jit(k_full_, k_win, win_idx)

    for mode, k0, step in (
        ("all_active", k_full, dense_step),
        ("window_8_dense", k_win8, dense_step),
        ("window_8_gathered", k_win8, windowed_step)):
      s, k = step(surfels, perturb(k0))
      jax.block_until_ready((s, k))  # compile + warmup, no transfer
      start = time.perf_counter()
      for _ in range(args.iters):
        s, k = step(s, perturb(k))
      jax.block_until_ready((s, k))
      elapsed = time.perf_counter() - start
      n_active = n_kf if mode == "all_active" else min(8, n_kf)
      rows.append({
          "keyframes": n_kf,
          "mode": mode,
          "ms_per_ba_iteration": round(1e3 * elapsed / args.iters, 3),
          "active_kf_iter_per_s": round(n_active * args.iters / elapsed, 2),
      })
      state = (s, k)

  # --- transfers allowed below ---
  try:
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
  except Exception:
    peak = None
  live = int(np.asarray(state[0].valid).sum())
  out = {
      "metric": "kf_scale_ba_iteration_cost",
      # Each timed region dispatches `iters` separate programs, so on the
      # axon tunnel any row at or below ~0.5 ms/iteration is measuring
      # DISPATCH latency, not device work — such rows cannot rank dense vs
      # windowed modes. benchmarks/solver_scale.py supersedes this bench
      # for device-time questions (scan-amortized, dispatch-free).
      "dispatch_floor_caveat": "rows <= ~0.5 ms/iter are dispatch-bound on "
                               "the tunnel; see solver_scale.py for "
                               "device-resolved numbers",
      "backend": jax.default_backend(),
      "surfel_capacity": 1 << args.surfel_capacity_log,
      "live_surfels": live,
      "rows": rows,
      "peak_hbm_bytes": peak,
  }
  print(json.dumps(out))
  if args.out:
    with open(args.out, "w") as f:
      json.dump(out, f, indent=1)


if __name__ == "__main__":
  main()
