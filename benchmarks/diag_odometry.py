"""Diagnostic: isolate the pairwise-tracking bias (VERDICT round-1 item 1).

Experiments:
  A. single-pair tracking at several resolutions, GT init, measuring the
     recovered relative-pose error; toggles for u8 quantization and
     residual types.
  B. the config0 30-frame odometry loop, logging per-frame drift.

Usage: python benchmarks/diag_odometry.py [A|B] [--size WxH]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def pair_error(width, height, step, use_depth=True, use_desc=True,
               num_scales=4, conv=1e-11, seed=5, init_err=None):
  from badslam_tpu.geometry import se3, se3_np
  from badslam_tpu.ops.pyramid import build_pyramid
  from badslam_tpu.models import odometry
  from badslam_tpu.utils import synthetic
  from badslam_tpu.ops import depth_proc

  cam = synthetic.default_test_camera(width, height)
  T0 = np.eye(4, dtype=np.float32)
  T1 = np.asarray(se3.exp(jnp.asarray(step, jnp.float32)))

  frames = []
  for T in (T0, T1):
    depth, inten = synthetic.render_heightmap(cam, T, seed=seed)
    d = jnp.asarray(depth)
    d_n, nxy = depth_proc.compute_normals(
        d, cam, 0.0, jnp.zeros((1, 1), jnp.float32), max(width, height))
    _, d_out = depth_proc.compute_radii_and_remove_isolated(d_n, cam)
    frames.append((d_out, nxy, jnp.asarray(inten)))

  base_pyr = build_pyramid(frames[0][0], frames[0][1], frames[0][2], num_scales)
  tracked_pyr = build_pyramid(frames[1][0], frames[1][1], frames[1][2],
                              num_scales)
  gt = T1  # base(frame0)_T_frame(frame1): frame0 at identity
  init = gt.copy()
  if init_err is not None:
    init = gt @ np.asarray(se3.exp(jnp.asarray(init_err, jnp.float32)))
  est, n = odometry.track_frame_pairwise(
      base_pyr, tracked_pyr, cam, jnp.float32(0.02 * cam.fx),
      jnp.asarray(init), jnp.asarray(init),
      test_different_initial_estimates=False,
      use_depth_residuals=use_depth, use_descriptor_residuals=use_desc,
      use_pyramid_level_0=True, convergence_threshold=conv)
  est = np.asarray(est)
  err = se3_np.inverse(gt) @ est
  terr = np.linalg.norm(err[:3, 3])
  rerr = np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1))
  return terr, rerr, int(n)


def experiment_a():
  step = [0.002, 0.0008, -0.0005, 0.0005, -0.00025, 0.0004]
  big = [0.02, 0.008, -0.005, 0.005, -0.0025, 0.004]
  for (w, h) in [(160, 120), (320, 240), (640, 480)]:
    for name, kw in [
        ("both ", {}),
        ("depth", dict(use_desc=False)),
        ("desc ", dict(use_depth=False)),
    ]:
      te, re, n = pair_error(w, h, step, **kw)
      print(f"{w}x{h} {name} gt-init   terr={te*1000:8.4f}mm rerr={re:9.2e} n={n}")
    te, re, n = pair_error(w, h, step, init_err=[0.01, -0.01, 0.005, 0.004, -0.003, 0.002])
    print(f"{w}x{h} both  pert-init terr={te*1000:8.4f}mm rerr={re:9.2e} n={n}")
    te, re, n = pair_error(w, h, big)
    print(f"{w}x{h} both  bigstep   terr={te*1000:8.4f}mm rerr={re:9.2e} n={n}")


def experiment_b(width, height, n_frames=30):
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3, se3_np
  from badslam_tpu.slam.system import BadSlam
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(width, height)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0005 * i, 0.0005 * i, -0.00025 * i,
       0.0004 * i], jnp.float32))) for i in range(n_frames)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      keyframe_interval=5, max_num_ba_iterations_per_keyframe=0,
      odometry_convergence_threshold=1e-11,
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      parallel_ba=False, enable_loop_detection=False,
      max_surfel_count=2 ** 15)
  slam = BadSlam(cfg, video)
  for i in range(len(traj)):
    slam.process_frame(i)
    est = video.frames[i].global_T_frame
    err = se3_np.inverse(traj[i]) @ est
    print(f"frame {i:2d} terr={np.linalg.norm(err[:3, 3])*1000:9.4f}mm")


def experiment_c(width, height, variant):
  """Replicate the config0 odometry loop with instrumented tracking.

  variant: 'ref' = as-is; 'nosel' = disable per-scale re-selection and the
  second hypothesis; 'kf1' = keyframe_interval 1; 'pred' = log prediction
  error vs post-track error per frame.
  """
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3, se3_np
  from badslam_tpu.slam import system as system_mod
  from badslam_tpu.slam.system import BadSlam
  from badslam_tpu.utils import synthetic
  from badslam_tpu.ops.pyramid import build_pyramid
  from badslam_tpu.ops import depth_model
  from badslam_tpu.models import odometry as odometry_mod
  from badslam_tpu.slam.system import make_camera
  import functools, jax

  no_sel = variant == "nosel"

  @functools.partial(
      jax.jit,
      static_argnames=("width", "height", "cell_size", "num_scales",
                       "use_depth_residuals", "use_descriptor_residuals",
                       "use_pyramid_level_0", "convergence_threshold"))
  def patched(base_depth, base_normals, base_intensity,
              tracked_raw_depth, tracked_normals, tracked_intensity,
              depth_intr, a, cfactor, baseline_fx,
              base_T_frame_init_1, base_T_frame_init_2,
              width, height, cell_size, num_scales,
              use_depth_residuals, use_descriptor_residuals,
              use_pyramid_level_0, convergence_threshold=1e-8):
    cam = make_camera(depth_intr, width, height)
    base_calib = depth_model.calibrate_depth_image(a, cfactor, base_depth,
                                                   cell_size)
    tracked_calib = depth_model.calibrate_depth_image(a, cfactor,
                                                      tracked_raw_depth,
                                                      cell_size)
    base_pyr = build_pyramid(base_calib, base_normals, base_intensity,
                             num_scales)
    tracked_pyr = build_pyramid(tracked_calib, tracked_normals,
                                tracked_intensity, num_scales)
    return odometry_mod.track_frame_pairwise(
        base_pyr, tracked_pyr, cam, baseline_fx,
        base_T_frame_init_1, base_T_frame_init_2,
        test_different_initial_estimates=not no_sel,
        use_descriptor_residuals=use_descriptor_residuals,
        use_depth_residuals=use_depth_residuals,
        use_pyramid_level_0=use_pyramid_level_0,
        convergence_threshold=convergence_threshold,
        disable_reselection=no_sel)

  if variant in ("nosel",):
    system_mod._odometry_jit = patched

  cam = synthetic.default_test_camera(width, height)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0005 * i, 0.0005 * i, -0.00025 * i,
       0.0004 * i], jnp.float32))) for i in range(30)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      keyframe_interval=1 if variant == "kf1" else 5,
      max_num_ba_iterations_per_keyframe=0,
      odometry_convergence_threshold=1e-11,
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      parallel_ba=False, enable_loop_detection=False,
      max_surfel_count=2 ** 15)
  slam = BadSlam(cfg, video)
  for i in range(len(traj)):
    if i > 0 and variant == "pred":
      est1, est2 = slam.predict_frame_pose()
      pred_global = slam.base_kf_global_T_frame @ est1
      perr = np.linalg.norm((se3_np.inverse(traj[i]) @ pred_global)[:3, 3])
    else:
      perr = 0.0
    slam.process_frame(i)
    est = video.frames[i].global_T_frame
    err = se3_np.inverse(traj[i]) @ est
    print(f"frame {i:2d} pred_err={perr*1000:9.4f}mm "
          f"terr={np.linalg.norm(err[:3, 3])*1000:9.4f}mm")


def experiment_d(width, height):
  """Pair tracking between actual video frames i and i+2 via the system's
  exact preprocess+odometry path, with GT init, along the trajectory."""
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3, se3_np
  from badslam_tpu.slam.system import BadSlam, _odometry_jit
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(width, height)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0005 * i, 0.0005 * i, -0.00025 * i,
       0.0004 * i], jnp.float32))) for i in range(30)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      keyframe_interval=5, max_num_ba_iterations_per_keyframe=0,
      odometry_convergence_threshold=1e-11,
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      parallel_ba=False, enable_loop_detection=False,
      max_surfel_count=2 ** 15)
  slam = BadSlam(cfg, video)
  ba = slam.direct_ba
  w, h = ba.depth_size
  for i in range(0, 28, 2):
    j = i + 2
    base = slam.preprocess_frame(i)
    tracked = slam.preprocess_frame(j)
    gt = se3_np.inverse(traj[i]) @ traj[j]
    est, n = _odometry_jit(
        base.depth, base.normals, base.intensity,
        tracked.raw_depth, tracked.normals, tracked.intensity,
        ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
        jnp.asarray(gt), jnp.asarray(gt),
        w, h, ba.cell_size, cfg.num_scales,
        True, True, True, cfg.odometry_convergence_threshold)
    err = se3_np.inverse(gt) @ np.asarray(est)
    print(f"pair {i:2d}->{j:2d} terr={np.linalg.norm(err[:3, 3])*1000:9.4f}mm"
          f" n={int(n)}")


def experiment_e(width, height):
  """System-path pair tracking (i, i+k) with GT and perturbed inits."""
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3, se3_np
  from badslam_tpu.slam.system import BadSlam, _odometry_jit
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(width, height)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0005 * i, 0.0005 * i, -0.00025 * i,
       0.0004 * i], jnp.float32))) for i in range(30)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      keyframe_interval=5, max_num_ba_iterations_per_keyframe=0,
      odometry_convergence_threshold=1e-11,
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      parallel_ba=False, enable_loop_detection=False,
      max_surfel_count=2 ** 15)
  slam = BadSlam(cfg, video)
  ba = slam.direct_ba
  w, h = ba.depth_size
  pre = {i: slam.preprocess_frame(i) for i in range(22)}
  for i in (5, 15):
    for k in (1, 2, 3, 4, 5):
      for pname, pert in [
          ("gt  ", None),
          ("2mm ", [0.0012, -0.0012, 0.0008, 0.0004, -0.0003, 0.0002]),
          ("5mm ", [0.003, -0.003, 0.002, 0.001, -0.00075, 0.0005]),
          ("10mm", [0.006, -0.006, 0.004, 0.002, -0.0015, 0.001]),
          ("20mm", [0.012, -0.012, 0.008, 0.004, -0.003, 0.002]),
      ]:
        j = i + k
        base, tracked = pre[i], pre[j]
        gt = se3_np.inverse(traj[i]) @ traj[j]
        init = gt if pert is None else gt @ np.asarray(
            se3.exp(jnp.asarray(pert, jnp.float32)))
        est, n = _odometry_jit(
            base.depth, base.normals, base.intensity,
            tracked.raw_depth, tracked.normals, tracked.intensity,
            ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
            jnp.asarray(init), jnp.asarray(init),
            w, h, ba.cell_size, cfg.num_scales,
            True, True, True, cfg.odometry_convergence_threshold)
        err = se3_np.inverse(gt) @ np.asarray(est)
        print(f"pair {i:2d}->{j:2d} init={pname} "
              f"terr={np.linalg.norm(err[:3, 3])*1000:9.4f}mm n={int(n)}")


def experiment_f(width, height):
  """Live-system instrumentation: at each frame compare the system's
  tracking result against a re-run from GT init with the same images."""
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3, se3_np
  from badslam_tpu.slam import system as system_mod
  from badslam_tpu.slam.system import BadSlam, _odometry_jit
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(width, height)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0005 * i, 0.0005 * i, -0.00025 * i,
       0.0004 * i], jnp.float32))) for i in range(30)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      keyframe_interval=5, max_num_ba_iterations_per_keyframe=0,
      odometry_convergence_threshold=1e-11,
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      parallel_ba=False, enable_loop_detection=False,
      max_surfel_count=2 ** 15)
  slam = BadSlam(cfg, video)
  ba = slam.direct_ba
  w, h = ba.depth_size

  orig_run = BadSlam.run_odometry
  kf_frame = {"idx": 0}

  def instrumented(self, frame_index, processed):
    est1, est2 = self.predict_frame_pose()
    base_frame_idx = kf_frame["idx"]
    gt_rel = se3_np.inverse(traj[base_frame_idx]) @ traj[frame_index]
    e1 = np.linalg.norm((se3_np.inverse(gt_rel) @ est1)[:3, 3])
    e2 = np.linalg.norm((se3_np.inverse(gt_rel) @ est2)[:3, 3])
    base = self.base_kf_images
    # System call (both hypotheses as the system would):
    sys_T, n1 = _odometry_jit(
        base.depth, base.normals, base.intensity,
        processed.raw_depth, processed.normals, processed.intensity,
        ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
        jnp.asarray(est1), jnp.asarray(est2),
        w, h, ba.cell_size, cfg.num_scales, True, True, True,
        cfg.odometry_convergence_threshold)
    # GT-init call:
    gt_T, n2 = _odometry_jit(
        base.depth, base.normals, base.intensity,
        processed.raw_depth, processed.normals, processed.intensity,
        ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
        jnp.asarray(gt_rel.astype(np.float32)),
        jnp.asarray(gt_rel.astype(np.float32)),
        w, h, ba.cell_size, cfg.num_scales, True, True, True,
        cfg.odometry_convergence_threshold)
    es = np.linalg.norm((se3_np.inverse(gt_rel) @ np.asarray(sys_T))[:3, 3])
    eg = np.linalg.norm((se3_np.inverse(gt_rel) @ np.asarray(gt_T))[:3, 3])
    print(f"frame {frame_index:2d} base_kf={base_frame_idx:2d} "
          f"e_est1={e1*1000:8.3f} e_est2={e2*1000:8.3f} "
          f"e_sys={es*1000:8.3f} e_gtinit={eg*1000:8.3f} mm")
    return orig_run(self, frame_index, processed)

  BadSlam.run_odometry = instrumented
  orig_create = BadSlam.create_keyframe

  def create_hook(self, frame_index, processed):
    out = orig_create(self, frame_index, processed)
    kf_frame["idx"] = frame_index
    return out

  BadSlam.create_keyframe = create_hook
  for i in range(len(traj)):
    slam.process_frame(i)


def experiment_g(width, height):
  """Capture frame 17's failing inputs, then replay the scale loop
  unjitted with per-scale logging."""
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3, se3_np
  from badslam_tpu.slam.system import BadSlam, _odometry_jit, make_camera
  from badslam_tpu.utils import synthetic
  from badslam_tpu.ops.pyramid import build_pyramid
  from badslam_tpu.ops import depth_model
  from badslam_tpu.models import odometry as odo

  cam = synthetic.default_test_camera(width, height)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0005 * i, 0.0005 * i, -0.00025 * i,
       0.0004 * i], jnp.float32))) for i in range(30)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      keyframe_interval=5, max_num_ba_iterations_per_keyframe=0,
      odometry_convergence_threshold=1e-11,
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      parallel_ba=False, enable_loop_detection=False,
      max_surfel_count=2 ** 15)
  slam = BadSlam(cfg, video)
  ba = slam.direct_ba
  w, h = ba.depth_size

  captured = {}
  orig_run = BadSlam.run_odometry

  def capture(self, frame_index, processed):
    if frame_index == 17:
      est1, est2 = self.predict_frame_pose()
      captured.update(est1=est1, est2=est2, base=self.base_kf_images,
                      tracked=processed)
    return orig_run(self, frame_index, processed)

  BadSlam.run_odometry = capture
  for i in range(18):
    slam.process_frame(i)

  est1, est2 = captured["est1"], captured["est2"]
  base, tracked = captured["base"], captured["tracked"]
  gt_rel = se3_np.inverse(traj[15]) @ traj[17]

  def err_of(T):
    return np.linalg.norm((se3_np.inverse(gt_rel) @ np.asarray(T))[:3, 3])

  print(f"est1 err={err_of(est1)*1000:.3f}mm est2 err={err_of(est2)*1000:.3f}mm")

  cam_full = make_camera(ba.depth_intr, w, h)
  base_calib = depth_model.calibrate_depth_image(ba.a, ba.cfactor, base.depth,
                                                 ba.cell_size)
  tracked_calib = depth_model.calibrate_depth_image(ba.a, ba.cfactor,
                                                    tracked.raw_depth,
                                                    ba.cell_size)
  base_pyr = build_pyramid(base_calib, base.normals, base.intensity, 4)
  tracked_pyr = build_pyramid(tracked_calib, tracked.normals,
                              tracked.intensity, 4)

  # Unjitted replay with per-scale/per-iteration logging.
  num_scales = 4
  estimate = jnp.asarray(est1)
  chosen_initial = jnp.asarray(est1)
  for scale in range(num_scales - 1, -1, -1):
    sf = float(2 ** scale)
    cam_s = cam_full.scaled(1.0 / sf)
    base_l, tracked_l = base_pyr[scale], tracked_pyr[scale]

    def ecost(T):
      return odo.frame_to_frame_cost(
          se3.inverse(jnp.asarray(T)), base_l, tracked_l, cam_s,
          ba.baseline_fx, sf)

    if scale == num_scales - 1:
      c1, n1 = ecost(est1)
      c2, n2 = ecost(est2)
      pick = bool(jnp.where(int(n1) > 2 * int(n2), True,
                  jnp.where(int(n2) > 2 * int(n1), False, c1 < c2)))
      print(f"scale {scale}: HYPSEL c1={float(c1):.6f} n1={int(n1)} "
            f"c2={float(c2):.6f} n2={int(n2)} pick_first={pick}")
      estimate = jnp.asarray(est1 if pick else est2)
      chosen_initial = estimate
    else:
      c1, n1 = ecost(estimate)
      c2, n2 = ecost(chosen_initial)
      pick = bool(jnp.where(int(n1) > 2 * int(n2), True,
                  jnp.where(int(n2) > 2 * int(n1), False, c1 < c2)))
      print(f"scale {scale}: RESEL c_est={float(c1):.6f} n={int(n1)} "
            f"c_init={float(c2):.6f} n={int(n2)} keep_est={pick} "
            f"(err_est={err_of(estimate)*1000:.3f}mm "
            f"err_init={err_of(chosen_initial)*1000:.3f}mm)")
      if not pick:
        estimate = chosen_initial

    damping = 0.25 if scale == num_scales - 1 else (
        0.5 if scale == num_scales - 2 else 1.0)
    for it in range(30):
      H, b, n = odo.frame_to_frame_h_b(
          se3.inverse(estimate), base_l, tracked_l, cam_s, ba.baseline_fx, sf)
      from badslam_tpu.models.pose_opt import solve_6x6
      x = solve_6x6(H, b)
      estimate = estimate @ se3.exp(-damping * x)
      conv = bool(odo.is_scale_n_converged(x, sf, 1e-11))
      if it < 3 or conv or it == 29:
        print(f"  scale {scale} it {it:2d} |x|={float(jnp.linalg.norm(x)):.2e}"
              f" err={err_of(estimate)*1000:.3f}mm conv={conv}")
      if conv:
        break

  # Cost discrimination check: level-0 cost at the corrupted result vs at the
  # good minimum (full track from GT init) vs fine-only GN from est2.
  from badslam_tpu.models.pose_opt import solve_6x6
  cam0 = cam_full
  base0, tracked0 = base_pyr[0], tracked_pyr[0]

  def cost0(T):
    c, n = odo.frame_to_frame_cost(
        se3.inverse(jnp.asarray(T)), base0, tracked0, cam0, ba.baseline_fx, 1.0)
    return float(c), int(n)

  good, _ = odo.track_frame_pairwise(
      base_pyr, tracked_pyr, cam_full, ba.baseline_fx,
      jnp.asarray(gt_rel.astype(np.float32)),
      jnp.asarray(gt_rel.astype(np.float32)),
      test_different_initial_estimates=False,
      use_pyramid_level_0=True, convergence_threshold=1e-11)
  fine = jnp.asarray(est2)
  for it in range(30):
    H, b, n = odo.frame_to_frame_h_b(
        se3.inverse(fine), base0, tracked0, cam0, ba.baseline_fx, 1.0)
    x = solve_6x6(H, b)
    fine = fine @ se3.exp(-x)
    if bool(odo.is_scale_n_converged(x, 1.0, 1e-11)):
      break
  cc, nc = cost0(estimate)
  cg, ng = cost0(good)
  cf, nf = cost0(fine)
  print(f"corrupted: err={err_of(estimate)*1000:.3f}mm cost0={cc:.1f} n={nc}")
  print(f"good     : err={err_of(np.asarray(good))*1000:.3f}mm cost0={cg:.1f} n={ng}")
  print(f"fine-est2: err={err_of(np.asarray(fine))*1000:.3f}mm cost0={cf:.1f} n={nf}")


def experiment_h(width, height):
  """Frame-17 replay comparing the f32 equilibrated 6x6 solve against a
  float64 host solve, with H conditioning logged."""
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3, se3_np
  from badslam_tpu.slam.system import BadSlam, make_camera
  from badslam_tpu.utils import synthetic
  from badslam_tpu.ops.pyramid import build_pyramid
  from badslam_tpu.ops import depth_model
  from badslam_tpu.models import odometry as odo
  from badslam_tpu.models.pose_opt import solve_6x6

  cam = synthetic.default_test_camera(width, height)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0005 * i, 0.0005 * i, -0.00025 * i,
       0.0004 * i], jnp.float32))) for i in range(30)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      keyframe_interval=5, max_num_ba_iterations_per_keyframe=0,
      odometry_convergence_threshold=1e-11,
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      parallel_ba=False, enable_loop_detection=False,
      max_surfel_count=2 ** 15)
  slam = BadSlam(cfg, video)
  ba = slam.direct_ba
  w, h = ba.depth_size

  captured = {}
  orig_run = BadSlam.run_odometry

  def capture(self, frame_index, processed):
    if frame_index == 17:
      est1, est2 = self.predict_frame_pose()
      captured.update(est1=est1, est2=est2, base=self.base_kf_images,
                      tracked=processed)
    return orig_run(self, frame_index, processed)

  BadSlam.run_odometry = capture
  for i in range(18):
    slam.process_frame(i)

  est1 = captured["est1"]
  base, tracked = captured["base"], captured["tracked"]
  gt_rel = se3_np.inverse(traj[15]) @ traj[17]

  def err_of(T):
    e = se3_np.inverse(gt_rel) @ np.asarray(T)
    rot = np.arccos(np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1))
    return np.linalg.norm(e[:3, 3]), rot

  cam_full = make_camera(ba.depth_intr, w, h)
  base_calib = depth_model.calibrate_depth_image(ba.a, ba.cfactor, base.depth,
                                                 ba.cell_size)
  tracked_calib = depth_model.calibrate_depth_image(ba.a, ba.cfactor,
                                                    tracked.raw_depth,
                                                    ba.cell_size)
  base_pyr = build_pyramid(base_calib, base.normals, base.intensity, 4)
  tracked_pyr = build_pyramid(tracked_calib, tracked.normals,
                              tracked.intensity, 4)

  for solver in ("f32", "f64"):
    estimate = jnp.asarray(est1)
    for scale in range(3, -1, -1):
      sf = float(2 ** scale)
      cam_s = cam_full.scaled(1.0 / sf)
      base_l, tracked_l = base_pyr[scale], tracked_pyr[scale]
      damping = 0.25 if scale == 3 else (0.5 if scale == 2 else 1.0)
      n_it = 0
      for it in range(30):
        n_it = it + 1
        H, b, n = odo.frame_to_frame_h_b(
            se3.inverse(estimate), base_l, tracked_l, cam_s, ba.baseline_fx,
            sf)
        if solver == "f32":
          x = np.asarray(solve_6x6(H, b))
        else:
          Hn = np.asarray(H, np.float64)
          bn = np.asarray(b, np.float64)
          x = np.linalg.solve(Hn, bn).astype(np.float32)
        estimate = estimate @ se3.exp(jnp.asarray(-damping * x))
        if float(np.sum(x * x)) < sf * sf * 1e-11:
          break
      Hn = np.asarray(H, np.float64)
      te, re = err_of(estimate)
      print(f"{solver} scale {scale}: iters={n_it} cond(H)={np.linalg.cond(Hn):.2e} "
            f"terr={te*1000:.3f}mm rerr={re:.2e}")


def experiment_i(width, height):
  """Rotation-error correction test: pair (15,17) from inits with pure
  rotation errors and coupled rotation+translation (valley) errors."""
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3, se3_np
  from badslam_tpu.slam.system import BadSlam, _odometry_jit
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(width, height)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0005 * i, 0.0005 * i, -0.00025 * i,
       0.0004 * i], jnp.float32))) for i in range(30)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      keyframe_interval=5, max_num_ba_iterations_per_keyframe=0,
      odometry_convergence_threshold=1e-11,
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      parallel_ba=False, enable_loop_detection=False,
      max_surfel_count=2 ** 15)
  slam = BadSlam(cfg, video)
  ba = slam.direct_ba
  w, h = ba.depth_size
  base = slam.preprocess_frame(15)
  tracked = slam.preprocess_frame(17)
  gt = se3_np.inverse(traj[15]) @ traj[17]

  perts = [
      ("rx 0.02     ", [0, 0, 0, 0.02, 0, 0]),
      ("ry 0.02     ", [0, 0, 0, 0, 0.02, 0]),
      ("rz 0.02     ", [0, 0, 0, 0, 0, 0.02]),
      ("valley ry+tx", [0.02, 0, 0, 0, 0.02, 0]),
      ("valley rx+ty", [0, 0.02, 0, 0.02, 0, 0]),
      ("anti ry-tx  ", [-0.02, 0, 0, 0, 0.02, 0]),
  ]
  for name, p in perts:
    init = gt @ np.asarray(se3.exp(jnp.asarray(p, jnp.float32)))
    est, n = _odometry_jit(
        base.depth, base.normals, base.intensity,
        tracked.raw_depth, tracked.normals, tracked.intensity,
        ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
        jnp.asarray(init), jnp.asarray(init),
        w, h, ba.cell_size, cfg.num_scales, True, True, True,
        cfg.odometry_convergence_threshold)
    e = se3_np.inverse(gt) @ np.asarray(est)
    te = np.linalg.norm(e[:3, 3])
    re = np.arccos(np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1))
    print(f"{name}: terr={te*1000:9.4f}mm rerr={re:9.2e} n={int(n)}")


def experiment_j(width, height):
  """Inspect est1 at frame 17: orthonormality, error split, and convergence
  from (a) raw est1, (b) orthonormalized est1, (c) gt*exp(same log error)."""
  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.geometry import se3, se3_np
  from badslam_tpu.slam.system import BadSlam, _odometry_jit
  from badslam_tpu.utils import synthetic

  cam = synthetic.default_test_camera(width, height)
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.002 * i, 0.0008 * i, -0.0005 * i, 0.0005 * i, -0.00025 * i,
       0.0004 * i], jnp.float32))) for i in range(30)]
  video = synthetic.make_heightmap_video(cam, traj)
  cfg = BadSlamConfig(
      keyframe_interval=5, max_num_ba_iterations_per_keyframe=0,
      odometry_convergence_threshold=1e-11,
      num_scales=4, max_depth=5.0, sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1,
      parallel_ba=False, enable_loop_detection=False,
      max_surfel_count=2 ** 15)
  slam = BadSlam(cfg, video)
  ba = slam.direct_ba
  w, h = ba.depth_size

  captured = {}
  orig_run = BadSlam.run_odometry

  def capture(self, frame_index, processed):
    if frame_index == 17:
      est1, est2 = self.predict_frame_pose()
      captured.update(est1=est1, est2=est2, base=self.base_kf_images,
                      tracked=processed)
    return orig_run(self, frame_index, processed)

  BadSlam.run_odometry = capture
  for i in range(18):
    slam.process_frame(i)

  est1 = captured["est1"]
  base, tracked = captured["base"], captured["tracked"]
  gt = se3_np.inverse(traj[15]) @ traj[17]
  R = est1[:3, :3]
  print("||R^T R - I|| =", np.linalg.norm(R.T @ R - np.eye(3)))
  print("det(R) =", np.linalg.det(R))
  e = se3_np.inverse(gt) @ est1
  te = np.linalg.norm(e[:3, 3])
  re = np.arccos(np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1))
  print(f"est1 error: terr={te*1000:.3f}mm rerr={re:.3e}")

  # orthonormalize est1 via SVD
  U, _, Vt = np.linalg.svd(R.astype(np.float64))
  Ro = (U @ Vt).astype(np.float32)
  est1o = est1.copy()
  est1o[:3, :3] = Ro

  for name, init in [("raw est1 ", est1), ("ortho est1", est1o)]:
    est, n = _odometry_jit(
        base.depth, base.normals, base.intensity,
        tracked.raw_depth, tracked.normals, tracked.intensity,
        ba.depth_intr, ba.a, ba.cfactor, ba.baseline_fx,
        jnp.asarray(init), jnp.asarray(init),
        w, h, ba.cell_size, cfg.num_scales, True, True, True,
        cfg.odometry_convergence_threshold)
    ee = se3_np.inverse(gt) @ np.asarray(est)
    tee = np.linalg.norm(ee[:3, 3])
    ree = np.arccos(np.clip((np.trace(ee[:3, :3]) - 1) / 2, -1, 1))
    print(f"{name}: terr={tee*1000:.3f}mm rerr={ree:.3e} n={int(n)}")


if __name__ == "__main__":
  p = argparse.ArgumentParser()
  p.add_argument("exp", nargs="?", default="A")
  p.add_argument("--size", default="160x120")
  p.add_argument("variant", nargs="?", default="pred")
  args = p.parse_args()
  w, h = (int(v) for v in args.size.split("x"))
  if args.exp.upper() == "J":
    experiment_j(w, h)
  elif args.exp.upper() == "I":
    experiment_i(w, h)
  elif args.exp.upper() == "H":
    experiment_h(w, h)
  elif args.exp.upper() == "G":
    experiment_g(w, h)
  elif args.exp.upper() == "F":
    experiment_f(w, h)
  elif args.exp.upper() == "E":
    experiment_e(w, h)
  elif args.exp.upper() == "D":
    experiment_d(w, h)
  elif args.exp.upper() == "C":
    experiment_c(w, h, args.variant)
  elif args.exp.upper() == "A":
    experiment_a()
  else:
    experiment_b(w, h, n_frames=int(os.environ.get("DIAG_FRAMES", "30")))
