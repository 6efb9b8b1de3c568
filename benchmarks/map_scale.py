"""Map-scale stress bench: BA throughput vs surfel capacity.

The reference caps the map at 25M surfels (bad_slam_config.h:127-136) but its
BA working set is bounded by keyframe activation; what must scale on TPU is
the dense masked BA iteration over the full surfel CAPACITY (every lane is
processed, validity is a mask). This bench sweeps capacity from the unit-test
scale to millions of surfels at the reference's native 640x480 / 8-keyframe
working set and reports keyframe-iterations/s per capacity, plus HBM usage.

Measurement discipline matches bench.py: the timed region is transfer-free
(PERF.md "tunnel dispatch modes"); all readbacks (including memory stats)
happen after every capacity has been timed.

Usage: python benchmarks/map_scale.py [--keyframes 8]
           [--capacities 15,17,19,21] [--iters 5] [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--keyframes", type=int, default=8)
  p.add_argument("--capacities", default="15,17,19,21",
                 help="comma-separated log2 surfel capacities")
  p.add_argument("--iters", type=int, default=5)
  p.add_argument("--out", default=None)
  args = p.parse_args()
  cap_logs = [int(v) for v in args.capacities.split(",")]

  import jax
  import jax.numpy as jnp
  from badslam_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), ".jax_cache"))

  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3
  from badslam_tpu.models import geometry_opt, pose_opt
  from badslam_tpu.models.association import DepthParamsArrays
  from badslam_tpu.slam.direct_ba import DirectBA, make_camera
  from badslam_tpu.utils import synthetic

  width, height = 640, 480
  n_kf = args.keyframes
  cell = 4
  base_cap = 1 << min(cap_logs)

  cam = synthetic.default_test_camera(width, height)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=cell,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=n_kf,
      initial_surfel_capacity=base_cap,
  )
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  inten = synthetic.intensity_function_image(cam)
  kf = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                               cell=cell)
  rng = np.random.default_rng(0)
  for i in range(n_kf):
    noise = jnp.asarray(
        np.concatenate([rng.uniform(-2e-3, 2e-3, 3),
                        rng.uniform(-5e-4, 5e-4, 3)]), jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32) if i == 0 else se3.exp(noise)
    ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb,
                    T, i * 10)
  ba.create_surfels_for_keyframe(0, filter_new_surfels=False)
  ba.kf = ba.kf._replace(
      activation=jnp.where(ba.kf.valid, 2, 0).astype(jnp.int32))
  base = ba.surfels._replace(active=ba.surfels.valid)
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

  import functools

  @functools.partial(jax.jit, static_argnums=(1,))
  def tile_surfels(s, reps: int):
    # Replicate the base map `reps` times with tiny positional offsets (all
    # on device — no host readback) so every lane carries live-looking data.
    def rep(x):
      return jnp.concatenate([x] * reps, axis=0)

    off = (jnp.arange(reps, dtype=jnp.float32)[:, None]
           * jnp.asarray([1e-4, -1e-4, 0.0]))
    pos = jnp.concatenate(
        [s.pos + off[i] for i in range(reps)], axis=0)
    return s._replace(
        pos=pos, normal=rep(s.normal), radius_sq=rep(s.radius_sq),
        color=rep(s.color), desc=rep(s.desc), valid=rep(s.valid),
        active=rep(s.active), count=s.count * reps)

  # Pose perturbation before every timed iteration: without it the batched
  # pose GN converges after the warm-up call and its on-device while_loop
  # exits after ~1 inner iteration — the bench would time the CONVERGED
  # iteration instead of a working one (measured flat ~0.2 ms at any
  # capacity on TPU before this fix).
  @jax.jit
  def perturb(k_store):
    n = k_store.capacity
    tw = (jnp.asarray([2e-3, -1.5e-3, 1e-3, 5e-4, -4e-4, 3e-4])[None, :]
          * (1.0 + 0.1 * jnp.arange(n, dtype=jnp.float32))[:, None])
    return k_store._replace(
        global_T_frame=k_store.global_T_frame @ jax.vmap(se3.exp)(tw))

  rows = []
  state = None  # only the latest sweep is kept live, so HBM holds one map
  for cap_log in cap_logs:
    cap = 1 << cap_log
    reps = cap // base.capacity
    s = tile_surfels(base, reps) if reps > 1 else base
    k = ba.kf
    s, k = ba_iteration(s, perturb(k), ba.a, ba.cfactor, ba.baseline_fx,
                        intr)
    jax.block_until_ready((s, k))  # compile + warmup, no transfer
    start = time.perf_counter()
    for _ in range(args.iters):
      s, k = ba_iteration(s, perturb(k), ba.a, ba.cfactor, ba.baseline_fx,
                          intr)
    jax.block_until_ready((s, k))
    elapsed = time.perf_counter() - start
    rows.append({
        "surfel_capacity": cap,
        "keyframes": n_kf,
        "kf_iter_per_s": round(n_kf * args.iters / elapsed, 2),
        "ms_per_ba_iteration": round(1e3 * elapsed / args.iters, 3),
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
      "metric": "map_scale_ba_throughput",
      "backend": jax.default_backend(),
      "rows": rows,
      "live_surfels_at_max": live,
      "peak_hbm_bytes": peak,
  }
  print(json.dumps(out))
  if args.out:
    with open(args.out, "w") as f:
      json.dump(out, f, indent=1)


if __name__ == "__main__":
  main()
