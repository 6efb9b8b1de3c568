"""BASELINE.md measurement configs on synthetic data — self-judging.

Runs the five measurement configurations from BASELINE.md / BASELINE.json on
synthetic scenes (no external datasets are reachable from this environment)
and writes one JSON report. Every config carries an explicit `"pass"` flag
judged against the thresholds below, and timed configs separate compile
(cold) from steady-state (warm) so keyframes/s is not compile-dominated.

  (0) odometry-only trajectory, ATE RMSE        pass: ATE <= scale-aware bound
  (1) BA over a keyframe set, single chip       pass: converged + gauge-free
                                                pose err < 1e-4; warm KF/s
  (2) full pipeline with loop closure           pass: loop closed + residual
                                                error < 25%% of injected drift
  (3) self-calibration intrinsics recovery      pass: residual < 0.05 px
  (4) multi-device BA virtual-mesh dryrun       pass: executes
  (5) pipelined transfer-free front-end         pass: ATE within bound
  (6) FULL system distributed over 8 devices    pass: trajectory parity
                                                <= 1e-4 vs single-device

Usage:  python benchmarks/run_configs.py [--out report.json] [--size WxH]
                                         [--frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _world(seed=7, n=3):
  rng = np.random.default_rng(seed)
  out = []
  for _ in range(n):
    v = rng.uniform(-1, 1, 3).astype(np.float32)
    v[2] = -1.0
    out.append(v / np.linalg.norm(v))
  return np.asarray(out)


def config0_odometry(width, height, num_frames=30):
  """Odometry-only ATE on a synthetic constant-twist trajectory.

  Pass bound: the measured interpolation bias of direct photometric
  alignment is ~0.02 px/pair, i.e. ~0.08 mm/frame at 160x120 and ~4x less
  at 640x480 (it halves per resolution doubling; PERF.md). ATE RMSE of a
  linear drift ~ endpoint/sqrt(3). Bound = 2x that prediction.
  """
  import jax.numpy as jnp
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3
  from badslam_tpu.slam.system import BadSlam
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(width, height)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0005 * i, 0.0005 * i, -0.00025 * i,
       0.0004 * i], jnp.float32))) for i in range(num_frames)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      # Odometry-only = keyframes still advance (the tracker needs a nearby
      # base keyframe) but zero BA iterations are planned.
      keyframe_interval=5, max_num_ba_iterations_per_keyframe=0,
      odometry_convergence_threshold=1e-11,  # 160x120 (reference tuned 640x480)
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1, min_observation_count=1,
      enable_loop_detection=False, parallel_ba=False,
      initial_keyframe_capacity=2, initial_surfel_capacity=1 << 14)
  slam = BadSlam(cfg, video)
  slam.process_frame(0, force_keyframe=True)
  slam.process_frame(1)  # includes all tracking compiles
  t0 = time.perf_counter()
  for i in range(2, num_frames):
    slam.process_frame(i)
  elapsed = time.perf_counter() - t0
  est = np.stack([f.global_T_frame[:3, 3] for f in video.frames])
  gt = np.stack([t[:3, 3] for t in traj])
  from badslam_tpu.eval import ate_rmse
  rmse, _ = ate_rmse(est, gt)
  per_frame_bias_m = 8e-5 * (160.0 / width)
  bound = 2.0 * per_frame_bias_m * num_frames / np.sqrt(3.0)
  return {"ate_rmse_m": rmse, "frames": num_frames,
          "warm_frames_per_s": (num_frames - 2) / elapsed,
          "ate_bound_m": round(float(bound), 5),
          "pass": bool(rmse <= bound)}


def config1_ba(width, height):
  """Single-chip BA: perturbed keyframes pulled back; warm keyframes/s."""
  import jax
  import jax.numpy as jnp
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3
  from badslam_tpu.models import keyframes as kf_mod
  from badslam_tpu.slam.direct_ba import DirectBA
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(width, height)
  cfg = BadSlamConfig(
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1, min_observation_count=1,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 14)
  ba = DirectBA(cfg, cam, cam)
  depth, _ = synthetic.make_plane_scene(cam, seed=3)
  inten = synthetic.intensity_function_image(cam)
  kf = synthetic.preprocess_like_test_keyframe(depth, cam, intensity=inten,
                                               cell=2)
  rng = np.random.default_rng(0)
  T_gt = jnp.eye(4, dtype=jnp.float32)
  perturbed = []
  for i in range(6):
    noise = jnp.asarray(np.concatenate(
        [rng.uniform(-3e-3, 3e-3, 3), rng.uniform(-8e-4, 8e-4, 3)]),
        jnp.float32)
    T = T_gt if i == 0 else T_gt @ se3.exp(noise)
    perturbed.append(np.asarray(T))
    ba.add_keyframe(kf.depth, kf.normals, kf.radius_sq, kf.intensity, kf.rgb,
                    T, i * 10)

  def reset_perturbed():
    poses = np.asarray(ba.kf.global_T_frame).copy()
    poses[:6] = np.stack(perturbed)
    act = np.zeros(poses.shape[0], np.int32)
    act[:6] = kf_mod.ACTIVE
    ba.kf = ba.kf._replace(global_T_frame=jnp.asarray(poses),
                           activation=jnp.asarray(act))

  # Cold pass: includes every compile in the BA scheme.
  t0 = time.perf_counter()
  iters_cold, _ = ba.bundle_adjustment(max_iterations=10)
  jax.block_until_ready(ba.kf.global_T_frame)
  cold_s = time.perf_counter() - t0
  # Warm pass: re-perturb and re-run with everything compiled.
  reset_perturbed()
  t0 = time.perf_counter()
  iters, converged = ba.bundle_adjustment(max_iterations=10)
  jax.block_until_ready(ba.kf.global_T_frame)
  elapsed = time.perf_counter() - t0
  errs = [float(np.abs(np.asarray(se3.log(
      se3.inverse(ba.kf.global_T_frame[i]) @ T_gt))).max()) for i in range(6)]
  err = max(errs) - min(errs)  # relative (gauge-free)
  return {"iterations": iters, "converged": bool(converged),
          "max_pose_err": err,
          "cold_s": round(cold_s, 2),
          "keyframes_per_s": 6 * iters / elapsed,
          "pass": bool(converged and err < 1e-4)}


def config2_full_pipeline(width, height):
  """Full pipeline + loop closure on a drifted revisit (see
  tests/test_loop_closure.py for the controlled version)."""
  import jax.numpy as jnp
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3
  from badslam_tpu.loop.detector import LoopDetector
  from badslam_tpu.slam.system import BadSlam
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(width, height)
  normals = _world()
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.003 * i, 0.001 * i, 0, 0.0008 * i, 0, 0], jnp.float32)))
      for i in range(10)]
  traj.append(traj[0].copy())
  video = synthetic.make_synthetic_video(cam, traj, normals,
                                         texture_kind="checker")
  cfg = BadSlamConfig(
      keyframe_interval=2, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1, min_observation_count=1,
      initial_keyframe_capacity=8, initial_surfel_capacity=1 << 14,
      parallel_ba=False)
  det = LoopDetector(cfg, cam, recent_exclude=2)
  slam = BadSlam(cfg, video, loop_detector=det)
  for i in range(10):
    slam.process_frame(i)
  poses = np.asarray(slam.direct_ba.kf.global_T_frame).copy()
  drift = 0.08
  for s_, d in ((3, 0.06), (4, drift)):
    poses[s_][0, 3] += d
  slam.direct_ba.kf = slam.direct_ba.kf._replace(
      global_T_frame=jnp.asarray(poses))
  slam.base_kf_global_T_frame = poses[4]
  slam.process_frame(10, force_keyframe=True)
  ev = det.events[-1] if det.events else None
  err = float(np.linalg.norm(
      video.frames[10].global_T_frame[:3, 3] - traj[10][:3, 3]))
  closed = bool(ev and ev.applied)
  return {"loop_closed": closed,
          "inliers": ev.inlier_count if ev else 0,
          "drift_m": drift, "residual_error_m": err,
          "pass": bool(closed and err < 0.25 * drift)}


def config3_self_calibration(width, height):
  """Intrinsics recovery from a perturbed camera."""
  import jax.numpy as jnp
  from badslam_tpu.models import intrinsics_opt
  sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "tests"))
  from test_intrinsics_opt import build_multi_view_map

  ba, cam = build_multi_view_map()
  true_intr = np.asarray(ba.depth_intr)
  depth_intr = jnp.asarray(true_intr + np.asarray([0.4, -0.3, 0.25, -0.2],
                                                  np.float32))
  a, cfactor = ba.a, ba.cfactor
  for _ in range(60):
    depth_intr, _, a, cfactor = intrinsics_opt.optimize_intrinsics(
        ba.surfels, ba.kf, depth_intr, ba.color_intr, a, cfactor,
        ba.baseline_fx, ba.depth_size, ba.color_size, ba.cell_size,
        True, False)
  err = float(np.abs(np.asarray(depth_intr) - true_intr).max())
  return {"initial_perturbation_px": 0.4,
          "max_residual_err_px": err,
          "a_abs": abs(float(a)),
          "pass": bool(err < 0.05)}


def config5_pipelined(width, height, num_frames=30):
  """Pipelined (transfer-free) front-end: full per-frame pipeline with BA,
  zero device->host transfers inside the frame loop (enforced by the same
  readback guard the unit tests use), finalized trajectory within the
  odometry bound. Also reports warm frames/s of the transfer-free loop."""
  import jax.numpy as jnp
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3
  from badslam_tpu.slam.system import BadSlam
  from badslam_tpu.utils import synthetic
  import importlib
  guard_mod = importlib.import_module("tests.test_pipelined")

  cam = synthetic.default_test_camera(width, height)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0005 * i, 0.0005 * i, -0.00025 * i,
       0.0004 * i], jnp.float32))) for i in range(num_frames)]
  def build():
    video = synthetic.make_heightmap_video(cam, traj)
    cfg = BadSlamConfig(
        keyframe_interval=5, num_scales=4, max_depth=5.0,
        odometry_convergence_threshold=1e-11,
        sparse_surfel_cell_size=2,
        min_observation_count_while_bootstrapping_1=1,
        min_observation_count_while_bootstrapping_2=1,
        min_observation_count=1,
        enable_loop_detection=False, parallel_ba=False,
        pipelined_frontend=True,
        initial_keyframe_capacity=8, initial_surfel_capacity=1 << 16)
    return BadSlam(cfg, video), video

  warm, _ = build()  # compile outside the guard and the timed region
  for i in range(num_frames):
    warm.process_frame(i)

  slam, video = build()
  t0 = time.perf_counter()
  with guard_mod.forbid_device_to_host():
    for i in range(num_frames):
      slam.process_frame(i)
  elapsed = time.perf_counter() - t0
  slam.finalize_pipelined()

  est = np.stack([f.global_T_frame[:3, 3] for f in video.frames])
  gt = np.stack([t[:3, 3] for t in traj])
  from badslam_tpu.eval import ate_rmse
  rmse, _ = ate_rmse(est, gt)
  per_frame_bias_m = 8e-5 * (160.0 / width)
  bound = 2.0 * per_frame_bias_m * num_frames / np.sqrt(3.0)
  import jax
  return {"ate_rmse_m": rmse, "frames": num_frames,
          "transfer_free": True,  # the guard raised otherwise
          "warm_frames_per_s": round(num_frames / elapsed, 2),
          "ate_bound_m": round(float(bound), 5),
          # Throughput asymmetry note: pipelining pays off through the axon
          # TPU tunnel (it keeps speculative dispatch alive); on the CPU
          # backend there is no tunnel to feed and the dense 640x480 math
          # runs on host cores, so CPU warm_frames_per_s is expected to be
          # 1-2 orders of magnitude below TPU (report_cpu vs report_tpu).
          # The pass gate is accuracy-only by design.
          "throughput_note": (
              "CPU-backend pipelined FPS is expected to be far below TPU: "
              "no tunnel to keep pipelined, dense math on host cores"),
          "backend": jax.default_backend(),
          "pass": bool(rmse <= bound)}


def config4_multichip():
  """Multi-device distributed BA (the driver separately dry-runs the
  sharded step on N devices). With a single visible device the dryrun is
  re-run in a subprocess on a virtual 8-device CPU mesh — functional
  validation only, marked `virtual` (virtual devices share host cores, so
  no timing claim attaches)."""
  import jax
  n = len(jax.devices())
  if n >= 2:
    import __graft_entry__ as ge
    ge.dryrun_multichip(min(n, 8))
    return {"devices": min(n, 8), "dryrun": "ok",
            "virtual": jax.default_backend() == "cpu", "pass": True}
  import subprocess
  env = {**os.environ, "JAX_PLATFORMS": "cpu",
         "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                       + " --xla_force_host_platform_device_count=8"
                       + " --xla_cpu_collective_call_warn_stuck_timeout_"
                         "seconds=120"
                       + " --xla_cpu_collective_call_terminate_timeout_"
                         "seconds=900").strip()}
  env.pop("PALLAS_AXON_POOL_IPS", None)  # axon plugin slows CPU compiles ~6x
  root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  r = subprocess.run(
      [sys.executable, "-c", "import __graft_entry__ as ge; "
                             "ge.dryrun_multichip(8)"],
      cwd=root, env=env, capture_output=True, text=True, timeout=1200)
  if r.returncode != 0:
    return {"error": r.stderr[-500:], "pass": False}
  return {"devices": 8, "dryrun": "ok", "virtual": True, "pass": True}


def config6_mesh_system():
  """FULL SLAM system distributed: 32 frames of BadSlam.process_frame
  (odometry + keyframing + loop detection + BA) over the 8-device mesh,
  gated on trajectory parity <= 1e-4 vs the single-device run (round-3
  verdict item 1). Runs on the real devices when >= 8 are visible, else in
  a virtual-8-CPU subprocess (functional validation, like config4)."""
  import jax
  code = (
      "import json, numpy as np\n"
      "from tests.test_mesh_system import _run_system, make_mesh\n"
      "traj_s, slam_s = _run_system(None)\n"
      "traj_m, slam_m = _run_system(make_mesh())\n"
      "print('JSON:' + json.dumps({\n"
      "  'frames': int(traj_s.shape[0]),\n"
      "  'keyframes': slam_m.direct_ba.keyframe_count,\n"
      "  'surfels': slam_m.direct_ba.surfel_count,\n"
      "  'traj_max_abs_diff': float(np.abs(traj_s - traj_m).max())}))\n")
  if len(jax.devices()) >= 8:
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    ns = {}
    with redirect_stdout(buf):
      exec(code, ns)  # noqa: S102 - our own literal above
    line = [l for l in buf.getvalue().splitlines() if l.startswith("JSON:")][-1]
    out = json.loads(line[5:])
    out["virtual"] = jax.default_backend() == "cpu"
  else:
    import subprocess
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                         + " --xla_force_host_platform_device_count=8"
                         + " --xla_cpu_collective_call_warn_stuck_timeout_"
                           "seconds=120"
                         + " --xla_cpu_collective_call_terminate_timeout_"
                           "seconds=900").strip()}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code], cwd=root, env=env,
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
      return {"error": r.stderr[-500:], "pass": False}
    line = [l for l in r.stdout.splitlines() if l.startswith("JSON:")][-1]
    out = json.loads(line[5:])
    out["virtual"] = True
  out["devices"] = 8
  out["pass"] = bool(out["traj_max_abs_diff"] < 1e-4)
  return out


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--out", default=None)
  p.add_argument("--size", default="160x120")
  p.add_argument("--frames", type=int, default=30)
  args = p.parse_args()
  w, h = (int(v) for v in args.size.split("x"))

  report = {}
  for name, fn in [("config0_odometry",
                    lambda: config0_odometry(w, h, args.frames)),
                   ("config1_ba", lambda: config1_ba(w, h)),
                   ("config2_full_pipeline",
                    lambda: config2_full_pipeline(w, h)),
                   ("config3_self_calibration",
                    lambda: config3_self_calibration(w, h)),
                   ("config4_multichip", config4_multichip),
                   ("config5_pipelined",
                    lambda: config5_pipelined(w, h, args.frames)),
                   ("config6_mesh_system", config6_mesh_system)]:
    t0 = time.perf_counter()
    try:
      report[name] = fn()
      report[name]["wall_s"] = round(time.perf_counter() - t0, 2)
    except Exception as e:  # keep the report going
      report[name] = {"error": f"{type(e).__name__}: {e}", "pass": False}
    print(f"{name}: {json.dumps(report[name])}", flush=True)

  passes = [v.get("pass") for v in report.values()]
  report["all_pass"] = all(p is not False for p in passes)
  print(f"all_pass: {report['all_pass']}", flush=True)
  if args.out:
    with open(args.out, "w") as f:
      json.dump(report, f, indent=2)


if __name__ == "__main__":
  main()
