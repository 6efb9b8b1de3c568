"""Benchmark: bundle-adjustment throughput in keyframe-iterations per second.

One unit of work = one keyframe's share of a full alternating-BA iteration
(geometry GN step over its observed surfels + its frame-to-model pose GN),
at the reference's native working resolution (640x480, sparsification cell 4,
~19k surfels per keyframe worth of map).

Baseline: the reference runs real-time at 30 FPS with 1 keyframe per 10
frames and 10 planned BA iterations per keyframe on a GTX 1080
(bad_slam_config.h:60-72,176-185) => 3 KF/s * 10 iterations = 30
keyframe-iterations/s sustained. vs_baseline is measured against that.

MEASUREMENT DISCIPLINE (PERF.md "tunnel dispatch modes"): on the axon TPU
tunnel, any device->host transfer permanently drops the process from
speculative pipelined dispatch (~0.02 ms/call) into synchronous round-trip
mode (~1.5 ms/call, and ~100x slower inside large programs). The timed
region below is therefore TRANSFER-FREE — setup uses pre-sized capacities
and host-side count mirrors, and every readback happens after timing. The
fast-mode number is the one representative of direct-attached TPU hardware;
the post-transfer number is also reported as sync_mode_kf_iter_per_s for
transparency.

Prints exactly one JSON line:
  {"metric": "ba_keyframe_iterations_per_s", "value": N, "unit": "kf_iter/s",
   "vs_baseline": N/30, ...}
"""

import json
import time

import numpy as np

REFERENCE_KF_ITERS_PER_S = 30.0


def _ensure_live_backend():
  """Fall back to the CPU backend if the TPU tunnel is unreachable.

  The axon tunnel is sometimes down, and in that state any JAX device call
  HANGS forever instead of failing — even under JAX_PLATFORMS=cpu, because
  the tunnel's PJRT plugin registers from sitecustomize and wraps the
  backend/compile path (see tests/conftest.py). That would leave the
  driver's end-of-round bench run without its one JSON line. So: probe
  device init in a subprocess under a hard timeout (the tunnel is
  single-client, so the probe must fully exit before this process touches
  the backend); on hang or crash, re-exec this process with the plugin's
  trigger env var cleared and JAX_PLATFORMS=cpu so the bench still
  completes and reports.
  """
  import os
  import subprocess
  import sys
  if os.environ.get("JAX_PLATFORMS"):  # explicit choice: respect it
    return
  probe = "import jax; jax.devices()"
  try:
    ok = subprocess.run(
        [sys.executable, "-c", probe], timeout=120,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    ).returncode == 0
  except subprocess.TimeoutExpired:
    ok = False
  if not ok:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # stop the plugin registering
    env["JAX_PLATFORMS"] = "cpu"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def _enable_compile_cache():
  import os
  from badslam_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache(os.path.join(
      os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def main():
  _ensure_live_backend()
  import functools
  import jax
  import jax.numpy as jnp
  _enable_compile_cache()
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3
  from badslam_tpu.models import geometry_opt, pose_opt
  from badslam_tpu.models.association import DepthParamsArrays
  from badslam_tpu.slam.direct_ba import DirectBA, make_camera
  from badslam_tpu.utils import synthetic

  width, height = 640, 480
  n_kf = 8
  cell = 4

  cam = synthetic.default_test_camera(width, height)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=cell,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      initial_keyframe_capacity=n_kf,
      initial_surfel_capacity=1 << 15,  # pre-sized: no growth-path readbacks
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
  ba.surfels = ba.surfels._replace(active=ba.surfels.valid)

  intr = ba.depth_intr

  # All device state passed as ARGS (a closure-captured device array embeds
  # an on-device constant whose execution also breaks pipelined dispatch).
  @jax.jit
  def ba_iteration(surfels, kf_store, a, cfactor, baseline_fx, intr):
    dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                           cell_size=cell)
    c = make_camera(intr, width, height)
    surfels = geometry_opt.optimize_geometry_iteration(
        surfels, kf_store, c, c, dp, True, True)
    optimize = kf_store.valid & (kf_store.activation != 0)
    T, moved = pose_opt.estimate_frame_poses_batched(
        kf_store.global_T_frame, optimize, surfels,
        kf_store.depth, kf_store.normals, kf_store.intensity,
        c, c, dp, True, True, max_iterations=10)
    return surfels, kf_store._replace(global_T_frame=T)

  # Pose perturbation applied before every timed iteration: without it the
  # batched pose GN converges after the warm-up call and its on-device
  # while_loop exits after ~1 inner iteration — the bench would then time
  # the CONVERGED (early-exit) iteration instead of a working one. ~2 mm /
  # 0.5 mrad per keyframe keeps every GN unconverged, matching what a live
  # BA iteration actually does. (Round-3 numbers lacked this; see PERF.md.)
  @jax.jit
  def perturb(k_store):
    tw = (jnp.asarray([2e-3, -1.5e-3, 1e-3, 5e-4, -4e-4, 3e-4])[None, :]
          * (1.0 + 0.1 * jnp.arange(k_store.capacity,
                                    dtype=jnp.float32))[:, None])
    return k_store._replace(
        global_T_frame=k_store.global_T_frame @ jax.vmap(se3.exp)(tw))

  # Warmup / compile (block_until_ready performs no host transfer).
  s, k = ba_iteration(ba.surfels, perturb(ba.kf), ba.a, ba.cfactor,
                      ba.baseline_fx, intr)
  jax.block_until_ready((s, k))

  # VARIANCE PROTOCOL: >= 3 timed repeats; the headline value is the MEDIAN
  # and the spread is reported (tunnel-noise transparency — round-3 quoted
  # best single runs).
  iters = 10
  repeats = []
  s, k = ba.surfels, ba.kf
  for _ in range(3):
    start = time.perf_counter()
    for _ in range(iters):
      s, k = ba_iteration(s, perturb(k), ba.a, ba.cfactor, ba.baseline_fx,
                          intr)
    jax.block_until_ready((s, k))
    repeats.append(n_kf * iters / (time.perf_counter() - start))
  kf_iters_per_s = float(np.median(repeats))

  # --- everything below this line may perform transfers ---

  # Post-transfer (sync-dispatch) mode: the same workload after one D2H.
  _ = np.asarray(k.global_T_frame)  # drops the tunnel out of speculation
  s2, k2 = ba_iteration(s, perturb(k), ba.a, ba.cfactor, ba.baseline_fx,
                        intr)
  jax.block_until_ready((s2, k2))
  start = time.perf_counter()
  sync_iters = 3
  for _ in range(sync_iters):
    s2, k2 = ba_iteration(s2, perturb(k2), ba.a, ba.cfactor, ba.baseline_fx,
                          intr)
  jax.block_until_ready((s2, k2))
  sync_kf_iters_per_s = n_kf * sync_iters / (time.perf_counter() - start)

  # Measured CPU-backend baseline on the SAME workload.
  cpu_kf_iters_per_s = None
  try:
    cpu = jax.devices("cpu")[0]
    args_c = jax.device_put((ba.surfels, ba.kf, ba.a, ba.cfactor,
                             ba.baseline_fx, intr), cpu)
    s1, k1 = ba_iteration(*args_c)  # compile + warmup
    jax.block_until_ready((s1, k1))
    cpu_iters = 2
    start = time.perf_counter()
    for _ in range(cpu_iters):
      s1, k1 = ba_iteration(s1, perturb(k1), args_c[2], args_c[3], args_c[4],
                            args_c[5])
    jax.block_until_ready((s1, k1))
    cpu_kf_iters_per_s = n_kf * cpu_iters / (time.perf_counter() - start)
  except Exception:
    pass

  out = {
      "metric": "ba_keyframe_iterations_per_s",
      "value": round(kf_iters_per_s, 2),
      "unit": "kf_iter/s",
      "vs_baseline": round(kf_iters_per_s / REFERENCE_KF_ITERS_PER_S, 3),
      "repeats_kf_iter_per_s": [round(r, 2) for r in repeats],
      "spread_pct": round(100.0 * (max(repeats) - min(repeats))
                          / max(kf_iters_per_s, 1e-9), 1),
      "sync_mode_kf_iter_per_s": round(sync_kf_iters_per_s, 2),
      "backend": jax.default_backend(),
  }
  if cpu_kf_iters_per_s is not None:
    out["cpu_backend_kf_iter_per_s"] = round(cpu_kf_iters_per_s, 2)
    out["vs_cpu_backend"] = round(kf_iters_per_s / cpu_kf_iters_per_s, 2)
  # End-to-end FPS of the latest pipelined long-sequence run, if recorded
  # (benchmarks/long_sequence.py --pipelined; 500 frames, 640x480, full
  # pipeline incl. disk IO and loop detection).
  try:
    import os
    rep_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "long_sequence_pipelined_report.json")
    with open(rep_path) as f:
      rep = json.load(f)
    out["pipelined_e2e_fps_640x480"] = rep.get("fps")
    # Compile-free steady state (the axon backend recompiles per process —
    # no persistent cache — so the cumulative number mixes in one-time
    # compiles; PERF.md "pipelined front-end").
    out["pipelined_steady_state_fps_640x480"] = rep.get("steady_state_fps")
  except Exception:
    pass
  print(json.dumps(out))


if __name__ == "__main__":
  main()
