"""Device-time-resolved solver benchmark at production scale (round-4
verdict items 4+5): the alternating BA iteration AND the joint PCG step at
hundreds of keyframes x millions of surfels, timed in a way the tunnel's
dispatch floor cannot contaminate, plus an HBM roofline estimate.

Why a new protocol: every earlier per-iteration number was wall time around
ONE dispatched program, so below ~0.5 ms/iteration it measured the axon
tunnel's dispatch latency, not device work (kf_scale_report's flat 0.2-0.5
ms rows). Here each timed program is a lax.scan of ITERS solver iterations
INSIDE one jitted program — one dispatch amortized over ITERS on-device
iterations — and the reported per-iteration device time is the difference
quotient (t_scan(ITERS) - t_scan(1)) / (ITERS - 1), which cancels dispatch
+ sync overhead entirely. A pose perturbation runs inside the scan body so
every iteration does full GN work (no converged early-exit; round-4 honest
protocol).

The map is built by the real system (mapping-only mode over the
wide-excursion heightmap dataset at sparsification cell 1), so surfels,
normals, descriptors, and covisibility are production-realistic — not
tiled copies. Scale targets the reference's default working set
(25M-surfel cap / 2500-KF PCG sizing, bad_slam_config.h:127-136,
bad_slam.h:132-133): 250 keyframes x ~2M live surfels on one chip.

Roofline: the BA phases are gather-bound (surfel->pixel association), so
the analog of MFU is achieved HBM bandwidth. We model bytes/iteration from
the association math — per (live surfel x keyframe) pair the geometry +
pose phases each read ~4 packed bilinear taps (4 B each, fused
value+gradient; models/cost.py) plus surfel attributes, write surfel/pose
updates — and report modeled_bytes / device_time against the v5e's 819
GB/s HBM peak. The model is stated in the report (`bytes_model`) so the
number is auditable; it is an estimate, not a counter measurement.

Usage: python benchmarks/solver_scale.py [--frames 500] [--kf_stride 2]
    [--size 640x480] [--cell 1] [--iters 8] [--out report.json]
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

HBM_PEAK_BYTES_PER_S = 819e9  # TPU v5e (lite): 819 GB/s


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--dataset", default="/tmp/badslam_long_seq_excursion")
  p.add_argument("--frames", type=int, default=500)
  p.add_argument("--kf_stride", type=int, default=2,
                 help="keyframe every Nth frame -> frames/kf_stride KFs")
  p.add_argument("--size", default="640x480")
  p.add_argument("--cell", type=int, default=1,
                 help="sparsification cell (1 = every pixel a candidate; "
                      "the reference default 4 gives ~1/16)")
  p.add_argument("--iters", type=int, default=8)
  p.add_argument("--pcg_inner", type=int, default=10,
                 help="PCG inner iterations per outer step "
                      "(reference default 30, bad_slam.h:132)")
  p.add_argument("--surfel_capacity_log", type=int, default=21)
  p.add_argument("--pose_chunk", type=int, default=16,
                 help="keyframes per pose-phase chunk (lax.map): the full "
                      "vmap materializes (K x surfel_capacity) temporaries "
                      "— ~80 GB at 256 KF x 2M surfels, 5x a v5e's HBM "
                      "(measured round 5); 0 = unchunked")
  p.add_argument("--profile_dir", default=None,
                 help="capture a jax.profiler trace of one warmed scan per "
                      "solver into <dir>/<solver>/")
  p.add_argument("--out", default=None)
  args = p.parse_args()

  from badslam_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), ".jax_cache"))

  # Dataset (cached; rendered in a subprocess like long_sequence.py so this
  # process's dispatch stays pipelined).
  import subprocess
  gen = subprocess.run(
      [sys.executable,
       os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "long_sequence.py"),
       "--generate_only", "--dataset", args.dataset,
       "--frames", str(args.frames), "--size", args.size,
       "--radius", "2.0", "--loops", "1.15"])
  if gen.returncode != 0:
    raise RuntimeError("dataset generation failed")

  import jax
  import jax.numpy as jnp
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3
  from badslam_tpu.io import dataset as dataset_io
  from badslam_tpu.models import geometry_opt, pose_opt
  from badslam_tpu.models import pcg as pcg_mod
  from badslam_tpu.models.association import DepthParamsArrays
  from badslam_tpu.slam.direct_ba import make_camera
  from badslam_tpu.slam.system import BadSlam

  video = dataset_io.load_tum_dataset(args.dataset, None)
  video.enable_native_prefetch()
  n = min(args.frames, video.frame_count())
  n_kf = n // args.kf_stride
  kcap = 1 << int(np.ceil(np.log2(max(2, n_kf))))

  # Build the map with the real system, mapping-only (GT poses): every
  # kf_stride-th frame becomes a keyframe, surfels created through the
  # production creation/filter pipeline at cell `--cell`.
  cfg = BadSlamConfig(
      keyframe_interval=args.kf_stride, max_depth=5.0,
      estimate_poses=False, parallel_ba=False,
      enable_loop_detection=False, do_surfel_updates=False,
      sparse_surfel_cell_size=args.cell,
      initial_keyframe_capacity=kcap,
      initial_surfel_capacity=1 << args.surfel_capacity_log,
      max_surfel_count=1 << args.surfel_capacity_log)
  slam = BadSlam(cfg, video)
  t_build = time.perf_counter()
  for i in range(n):
    slam.process_frame(i)
    video.frames[i].clear_cache()
    if (i + 1) % 100 == 0:
      print(f"map build {i + 1}/{n}", flush=True)
  ba = slam.direct_ba
  jax.block_until_ready(ba.surfels.pos)
  build_s = time.perf_counter() - t_build

  width, height = ba.depth_size
  cell = ba.cell_size
  surfels = ba.surfels._replace(active=ba.surfels.valid)
  kf0 = ba.kf
  import badslam_tpu.models.keyframes as kf_mod
  kf0 = kf0._replace(
      activation=jnp.where(kf0.valid, kf_mod.ACTIVE, 0).astype(jnp.int32))
  intr, cintr = ba.depth_intr, ba.color_intr

  def make_dp():
    return DepthParamsArrays(a=ba.a, cfactor=ba.cfactor,
                             baseline_fx=ba.baseline_fx, cell_size=cell)

  def perturb(k_store, i):
    # ~2 mm / 0.5 mrad, phase-shifted by the scan index so consecutive
    # iterations never see an already-converged pose set.
    nkf = k_store.capacity
    base = jnp.asarray([2e-3, -1.5e-3, 1e-3, 5e-4, -4e-4, 3e-4])
    tw = (base[None, :] * (1.0 + 0.1 * jnp.arange(nkf)[:, None]
                           + 0.01 * i.astype(jnp.float32)))
    return k_store._replace(
        global_T_frame=k_store.global_T_frame @ jax.vmap(se3.exp)(
            tw.astype(jnp.float32)))

  @functools.partial(jax.jit, static_argnames=("length",))
  def alternating_scan(surfels, kf, a, cfactor, baseline_fx, intr,
                       length: int):
    dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                           cell_size=cell)
    c = make_camera(intr, width, height)

    def body(carry, i):
      s, k = carry
      k = perturb(k, i)
      s = geometry_opt.optimize_geometry_iteration(
          s, k, c, c, dp, True, True)
      optimize = k.valid & (k.activation != 0)
      T, _ = pose_opt.estimate_frame_poses_batched(
          k.global_T_frame, optimize, s, k.depth, k.normals, k.intensity,
          c, c, dp, True, True, max_iterations=10,
          kf_chunk=args.pose_chunk or None)
      return (s, k._replace(global_T_frame=T)), 0

    (s, k), _ = jax.lax.scan(body, (surfels, kf),
                             jnp.arange(length), length=length)
    return s, k

  @functools.partial(jax.jit, static_argnames=("length", "inner"))
  def pcg_scan(surfels, kf, a, cfactor, baseline_fx, intr, cintr,
               length: int, inner: int):
    dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                           cell_size=cell)
    dc = make_camera(intr, width, height)
    cc = make_camera(cintr, width, height)

    def body(carry, i):
      s, k = carry
      k = perturb(k, i)
      delta = pcg_mod.pcg_solve(s, k, dc, cc, dp,
                                gauge_index=jnp.asarray(0, jnp.int32),
                                max_inner_iterations=inner,
                                use_depth=True, use_desc=True)
      s, k = pcg_mod.apply_pcg_delta(s, k, delta)
      return (s, k), 0

    (s, k), _ = jax.lax.scan(body, (surfels, kf),
                             jnp.arange(length), length=length)
    return s, k

  def timed(fn, *a, **kw):
    out = fn(*a, **kw)        # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    jax.block_until_ready(out)
    return time.perf_counter() - t0

  rows = []
  profiled = []

  def profile_scan(label, fn, *fargs, **fkw):
    """Capture a jax.profiler trace of one warmed scan (verdict item 4:
    device-time evidence should come from traces where the tunnel supports
    them; the difference-quotient rows stand on their own if it doesn't)."""
    if not args.profile_dir:
      return
    d = os.path.join(args.profile_dir, label.replace("/", "_"))
    try:
      jax.profiler.start_trace(d)
      jax.block_until_ready(fn(*fargs, **fkw))
      jax.profiler.stop_trace()
      profiled.append({"solver": label, "trace_dir": d})
      print(f"  trace captured: {d}", flush=True)
    except Exception as e:  # tunnel backends may not export device traces
      try:
        jax.profiler.stop_trace()
      except Exception:
        pass
      profiled.append({"solver": label, "trace_dir": None,
                       "error": f"{type(e).__name__}: {e}"})
      print(f"  trace FAILED ({label}): {e}", flush=True)

  def device_resolved(label, fn, *fargs, length_kw="length", extra=None):
    kw1 = {length_kw: 1}
    kwN = {length_kw: args.iters}
    if extra:
      kw1.update(extra)
      kwN.update(extra)
    t1 = timed(fn, *fargs, **kw1)
    tN = timed(fn, *fargs, **kwN)
    per_iter = (tN - t1) / (args.iters - 1)
    rows.append({
        "solver": label,
        "ms_per_iteration_device": round(1e3 * per_iter, 3),
        "scan_1_s": round(t1, 4), f"scan_{args.iters}_s": round(tN, 4),
    })
    print(rows[-1], flush=True)
    profile_scan(label, fn, *fargs, **kwN)
    return per_iter

  alt_s = device_resolved(
      "alternating(geometry+pose10)", alternating_scan,
      surfels, kf0, ba.a, ba.cfactor, ba.baseline_fx, intr)
  pcg_s = device_resolved(
      f"pcg(joint, {args.pcg_inner} inner)", pcg_scan,
      surfels, kf0, ba.a, ba.cfactor, ba.baseline_fx, intr, cintr,
      extra={"inner": args.pcg_inner})

  # Active-window re-decision data (verdict item 4): 8 active of K, dense
  # vs gathered, device-resolved. The gathered path pays gather+scatter but
  # shrinks the phase working set to the window.
  from badslam_tpu.slam.direct_ba import (_gather_kf_window_jit,
                                          _scatter_kf_window_jit)
  kf_win8 = kf0._replace(activation=jnp.where(
      jnp.arange(kf0.capacity) < 8, kf_mod.ACTIVE, 0))
  win_idx = jnp.arange(8, dtype=jnp.int32)

  @functools.partial(jax.jit, static_argnames=("length",))
  def windowed_scan(surfels, kf, a, cfactor, baseline_fx, intr,
                    length: int):
    dp = DepthParamsArrays(a=a, cfactor=cfactor, baseline_fx=baseline_fx,
                           cell_size=cell)
    c = make_camera(intr, width, height)

    def body(carry, i):
      s, k = carry
      k = perturb(k, i)
      kw = _gather_kf_window_jit(k, win_idx)
      s = geometry_opt.optimize_geometry_iteration(
          s, kw, c, c, dp, True, True)
      optimize = kw.valid & (kw.activation != 0)
      T, _ = pose_opt.estimate_frame_poses_batched(
          kw.global_T_frame, optimize, s, kw.depth, kw.normals,
          kw.intensity, c, c, dp, True, True, max_iterations=10,
          kf_chunk=args.pose_chunk or None)
      return (s, _scatter_kf_window_jit(k, kw._replace(global_T_frame=T),
                                        win_idx)), 0

    (s, k), _ = jax.lax.scan(body, (surfels, kf),
                             jnp.arange(length), length=length)
    return s, k

  dense8_s = device_resolved(
      "window_8_dense", alternating_scan,
      surfels, kf_win8, ba.a, ba.cfactor, ba.baseline_fx, intr)
  gath8_s = device_resolved(
      "window_8_gathered", windowed_scan,
      surfels, kf_win8, ba.a, ba.cfactor, ba.baseline_fx, intr)

  # --- transfers allowed below ---
  live = int(np.asarray(surfels.valid).sum())
  k_live = int(np.asarray(kf0.valid).sum())
  try:
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
  except Exception:
    peak = None

  # Modeled HBM traffic per alternating iteration (documented estimate):
  # geometry phase: per (live surfel x keyframe): ~4 packed-u32 bilinear
  # taps (depth+normal+intensity fused lookups) = 16 B gathered, plus one
  # surfel SoA read+write (~12 attrs x 4 B x 2) per keyframe pass; pose
  # phase (10 inner GN iterations on-device, batched over K): per inner
  # iteration per (surfel x keyframe) ~16 B of taps + surfel position
  # reads. Association misses still pay their gather (masked lanes
  # execute).
  pair = live * k_live
  geometry_bytes = pair * (16 + 24 * 2)
  pose_bytes = 10 * pair * (16 + 12)
  model_bytes = geometry_bytes + pose_bytes
  achieved = model_bytes / max(alt_s, 1e-9)
  out = {
      "metric": "solver_scale_device_resolved",
      "backend": jax.default_backend(),
      "keyframes": k_live,
      "live_surfels": live,
      "surfel_capacity": 1 << args.surfel_capacity_log,
      "cell_size": cell,
      "image": f"{width}x{height}",
      "map_build_s": round(build_s, 1),
      "rows": rows,
      "kf_iter_per_s_alternating": round(k_live / alt_s, 1),
      "kf_iter_per_s_pcg": round(k_live / pcg_s, 1),
      "window_break_even": {
          "dense_ms": round(1e3 * dense8_s, 3),
          "gathered_ms": round(1e3 * gath8_s, 3),
          "gathered_wins": bool(gath8_s < dense8_s),
      },
      "bytes_model": {
          "geometry_bytes_per_iter": geometry_bytes,
          "pose_bytes_per_iter": pose_bytes,
          "modeled_total_bytes_per_iter": model_bytes,
          "achieved_bytes_per_s": round(achieved / 1e9, 1),
          "hbm_peak_bytes_per_s": HBM_PEAK_BYTES_PER_S / 1e9,
          "modeled_hbm_utilization_pct": round(
              100.0 * achieved / HBM_PEAK_BYTES_PER_S, 1),
      },
      "peak_hbm_bytes": peak,
  }
  if profiled:
    out["profiler_traces"] = profiled
  print(json.dumps(out, indent=2), flush=True)
  if args.out:
    with open(args.out, "w") as f:
      json.dump(out, f, indent=1)


if __name__ == "__main__":
  main()
