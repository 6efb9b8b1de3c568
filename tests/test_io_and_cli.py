"""Dataset I/O, state snapshot roundtrip, PLY export, and the CLI entry
point on a synthetic on-disk TUM dataset."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.geometry import se3
from badslam_tpu.io import dataset as dataset_io
from badslam_tpu.io import state as state_io
from badslam_tpu.slam.system import BadSlam
from badslam_tpu.utils import synthetic

W, H = 160, 120


def _make_world(seed=7, n_planes=3):
  rng = np.random.default_rng(seed)
  normals = []
  for _ in range(n_planes):
    n = rng.uniform(-1, 1, 3).astype(np.float32)
    n[2] = -1.0
    normals.append(n / np.linalg.norm(n))
  return np.asarray(normals)


def _write_tum_dataset(tmpdir, cam, traj, normals):
  """Write a real TUM-format dataset: PNGs + calibration + associated."""
  from PIL import Image as PILImage
  os.makedirs(os.path.join(tmpdir, "depth"), exist_ok=True)
  os.makedirs(os.path.join(tmpdir, "rgb"), exist_ok=True)
  # calibration.txt is center-convention; our camera stores corner.
  with open(os.path.join(tmpdir, "calibration.txt"), "w") as f:
    f.write(f"{cam.fx} {cam.fy} {cam.cx - 0.5} {cam.cy - 0.5}\n")
  lines = []
  for i, T in enumerate(traj):
    depth = synthetic.render_planes(cam, T, normals,
                                    raw_to_float_depth=1 / 5000.0)
    inten = synthetic.render_intensity(cam, T, depth)
    u16 = np.round(depth * 5000.0).astype(np.uint16)
    u8 = np.clip(np.floor(inten * 255.0 + 0.5), 0, 255).astype(np.uint8)
    rgb = np.stack([u8, u8, u8], axis=-1)
    ts = f"{i / 30.0:.6f}"
    dpath = f"depth/{ts}.png"
    cpath = f"rgb/{ts}.png"
    PILImage.fromarray(u16).save(os.path.join(tmpdir, dpath))
    PILImage.fromarray(rgb).save(os.path.join(tmpdir, cpath))
    lines.append(f"{ts} {cpath} {ts} {dpath}\n")
  with open(os.path.join(tmpdir, "associated.txt"), "w") as f:
    f.writelines(lines)


def test_tum_dataset_roundtrip(tmp_path):
  cam = synthetic.default_test_camera(W, H)
  normals = _make_world()
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.004 * i, 0, 0, 0, 0.0008 * i, 0], jnp.float32))) for i in range(3)]
  _write_tum_dataset(str(tmp_path), cam, traj, normals)

  video = dataset_io.load_tum_dataset(str(tmp_path))
  assert video.frame_count() == 3
  assert video.depth_camera.width == W
  assert float(video.depth_camera.cx) == pytest.approx(float(cam.cx))
  d = video.depth_metric(1)
  ref = synthetic.render_planes(cam, traj[1], normals,
                                raw_to_float_depth=1 / 5000.0)
  np.testing.assert_allclose(d, ref, atol=1 / 5000.0 + 1e-6)


def test_cli_end_to_end(tmp_path):
  cam = synthetic.default_test_camera(W, H)
  normals = _make_world()
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.003 * i, 0.001 * i, 0, 0.0008 * i, 0, 0], jnp.float32)))
      for i in range(6)]
  _write_tum_dataset(str(tmp_path), cam, traj, normals)

  from badslam_tpu.main import main
  poses_path = str(tmp_path / "poses.txt")
  ply_path = str(tmp_path / "cloud.ply")
  timings_path = str(tmp_path / "timings.txt")
  rc = main([
      str(tmp_path), "--keyframe_interval", "2", "--num_scales", "3",
      "--max_depth", "5.0", "--sparsification", "2",
      "--min_observation_count_while_bootstrapping_1", "1",
      "--min_observation_count_while_bootstrapping_2", "1",
      "--min_observation_count", "1",
      "--no_loop_detection", "--sequential_ba", "--quiet",
      "--export_poses", poses_path,
      "--export_point_cloud", ply_path,
      "--export_final_timings", timings_path,
      "--render_preview", str(tmp_path / "previews"),
      "--render_every", "2", "--splat_half_extent_in_pixels", "2.0",
  ])
  assert rc == 0

  # Keyframes at interval 2 over 6 frames -> 3 keyframes; every 2nd rendered.
  previews = sorted(os.listdir(tmp_path / "previews"))
  assert len([f for f in previews if f.endswith("_color.png")]) == 2
  assert len([f for f in previews if f.endswith("_depth.png")]) == 2

  # Exported trajectory: parseable TUM format, poses near ground truth.
  ts, poses = dataset_io.read_tum_trajectory(poses_path)
  assert len(ts) == 6
  for i in range(6):
    err = np.linalg.norm(poses[i][:3, 3] - traj[i][:3, 3])
    assert err < 6e-3, f"frame {i} error {err}"

  # Exported point cloud: valid PLY on the ground-truth planes.
  pos, nrm, col = state_io.load_point_cloud_ply(ply_path)
  assert len(pos) > 300
  d = np.abs(pos @ normals.T + 2.5).min(axis=1)
  assert np.quantile(d, 0.9) < 0.01

  assert os.path.getsize(timings_path) > 100


def test_cli_pipelined_frontend(tmp_path):
  """--pipelined_frontend end-to-end through the CLI: transfer-free run,
  finalize materializes the trajectory before the exports."""
  cam = synthetic.default_test_camera(W, H)
  normals = _make_world()
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.003 * i, 0.001 * i, 0, 0.0008 * i, 0, 0], jnp.float32)))
      for i in range(6)]
  _write_tum_dataset(str(tmp_path), cam, traj, normals)

  from badslam_tpu.main import main
  poses_path = str(tmp_path / "poses.txt")
  ply_path = str(tmp_path / "cloud.ply")
  rc = main([
      str(tmp_path), "--keyframe_interval", "2", "--num_scales", "3",
      "--max_depth", "5.0", "--sparsification", "2",
      "--min_observation_count_while_bootstrapping_1", "1",
      "--min_observation_count_while_bootstrapping_2", "1",
      "--min_observation_count", "1",
      "--no_loop_detection", "--pipelined_frontend", "--quiet",
      "--restrict_fps_to", "0",
      "--export_poses", poses_path,
      "--export_point_cloud", ply_path,
  ])
  assert rc == 0
  ts, poses = dataset_io.read_tum_trajectory(poses_path)
  assert len(ts) == 6
  for i in range(6):
    err = np.linalg.norm(poses[i][:3, 3] - traj[i][:3, 3])
    assert err < 6e-3, f"frame {i} error {err}"
  pos, _, _ = state_io.load_point_cloud_ply(ply_path)
  assert len(pos) > 300


def test_cli_mesh_devices(tmp_path):
  """--mesh_devices N through the CLI: the full frame loop runs with the
  back-end sharded over the (virtual) 8-device mesh and exports a sane
  trajectory (round-3 verdict item 1: the mesh is reachable from main)."""
  import jax
  if len(jax.devices()) < 8:
    pytest.skip("needs 8 (virtual) devices")
  cam = synthetic.default_test_camera(W, H)
  normals = _make_world()
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.003 * i, 0.001 * i, 0, 0.0008 * i, 0, 0], jnp.float32)))
      for i in range(6)]
  _write_tum_dataset(str(tmp_path), cam, traj, normals)

  from badslam_tpu.main import main
  poses_path = str(tmp_path / "poses.txt")
  rc = main([
      str(tmp_path), "--keyframe_interval", "2", "--num_scales", "3",
      "--max_depth", "5.0", "--sparsification", "2",
      "--min_observation_count_while_bootstrapping_1", "1",
      "--min_observation_count_while_bootstrapping_2", "1",
      "--min_observation_count", "1",
      "--no_loop_detection", "--sequential_ba", "--quiet",
      "--mesh_devices", "8",
      "--export_poses", poses_path,
  ])
  assert rc == 0
  ts, poses = dataset_io.read_tum_trajectory(poses_path)
  assert len(ts) == 6
  for i in range(6):
    err = np.linalg.norm(poses[i][:3, 3] - traj[i][:3, 3])
    assert err < 6e-3, f"frame {i} error {err}"


def test_cli_export_reconstruction(tmp_path):
  """--export_reconstruction (main.cc:796-855): dense geometry-only BA at the
  reconstruction sparsification produces a denser cloud on the GT planes."""
  cam = synthetic.default_test_camera(W, H)
  normals = _make_world()
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.003 * i, 0, 0, 0, 0.0008 * i, 0], jnp.float32))) for i in range(4)]
  _write_tum_dataset(str(tmp_path), cam, traj, normals)

  from badslam_tpu.main import main
  ply_path = str(tmp_path / "sparse.ply")
  recon_path = str(tmp_path / "dense.ply")
  rc = main([
      str(tmp_path), "--keyframe_interval", "2", "--num_scales", "3",
      "--max_depth", "5.0", "--sparsification", "4",
      "--min_observation_count_while_bootstrapping_1", "1",
      "--min_observation_count_while_bootstrapping_2", "1",
      "--min_observation_count", "1",
      "--no_loop_detection", "--sequential_ba", "--quiet",
      "--export_point_cloud", ply_path,
      "--export_reconstruction", recon_path,
      "--reconstruction_sparsification", "2",
  ])
  assert rc == 0
  sparse_pos, _, _ = state_io.load_point_cloud_ply(ply_path)
  dense_pos, dense_nrm, dense_col = state_io.load_point_cloud_ply(recon_path)
  # Halving the cell size quadruples the surfel density budget.
  assert len(dense_pos) > 2 * len(sparse_pos)
  assert np.isfinite(dense_pos).all() and np.isfinite(dense_nrm).all()
  d = np.abs(dense_pos @ normals.T + 2.5).min(axis=1)
  assert np.quantile(d, 0.9) < 0.01


def test_state_snapshot_roundtrip(tmp_path):
  cam = synthetic.default_test_camera(W, H)
  normals = _make_world()
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.003 * i, 0, 0, 0, 0, 0], jnp.float32))) for i in range(5)]
  video = synthetic.make_synthetic_video(cam, traj, normals)
  cfg = BadSlamConfig(
      keyframe_interval=2, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1, enable_loop_detection=False,
      initial_keyframe_capacity=4, initial_surfel_capacity=1 << 13)
  slam = BadSlam(cfg, video)
  for i in range(5):
    slam.process_frame(i)

  path = str(tmp_path / "state.npz")
  state_io.save_state(path, slam)

  video2 = synthetic.make_synthetic_video(cam, traj, normals)
  slam2 = BadSlam(cfg, video2)
  state_io.load_state(path, slam2)

  assert slam2.direct_ba.keyframe_count == slam.direct_ba.keyframe_count
  assert slam2.direct_ba.surfel_count == slam.direct_ba.surfel_count
  np.testing.assert_allclose(
      np.asarray(slam2.direct_ba.kf.global_T_frame)[:3],
      np.asarray(slam.direct_ba.kf.global_T_frame)[:3], atol=1e-6)
  # Surfel sets match (snapshot stores only valid surfels, compacted).
  v1 = np.asarray(slam.direct_ba.surfels.valid)
  p1 = np.sort(np.asarray(slam.direct_ba.surfels.pos)[v1], axis=0)
  v2 = np.asarray(slam2.direct_ba.surfels.valid)
  p2 = np.sort(np.asarray(slam2.direct_ba.surfels.pos)[v2], axis=0)
  np.testing.assert_allclose(p1, p2, atol=1e-6)
  # The restored system can continue processing.
  slam2.process_frame(4, force_keyframe=True)
  assert np.isfinite(video2.frames[4].global_T_frame).all()

  # The snapshot inspector summarizes/renders/exports without a dataset
  # (the keyframe-dialog / status-display analog, badslam_tpu/snapshot_inspector.py).
  from badslam_tpu.snapshot_inspector import main as inspect_main
  import contextlib, io
  ply = str(tmp_path / "insp.ply")
  poses = str(tmp_path / "insp_poses.txt")
  rdir = str(tmp_path / "insp_render")
  buf = io.StringIO()
  with contextlib.redirect_stdout(buf):
    rc = inspect_main([path, "--export_point_cloud", ply,
                       "--export_poses", poses, "--render", rdir,
                       "--render_mode", "normals", "--render_every", "2"])
  assert rc == 0
  out = buf.getvalue()
  assert "keyframes: " in out and "surfels: " in out and "BA: " in out
  pos_ply, _, _ = state_io.load_point_cloud_ply(ply)
  assert len(pos_ply) == slam.direct_ba.surfel_count
  ts_out, poses_out = dataset_io.read_tum_trajectory(poses)
  assert len(ts_out) == 5
  rendered = [f for f in os.listdir(rdir) if f.endswith("_color.png")]
  assert len(rendered) == (slam.direct_ba.keyframe_count + 1) // 2


def test_state_load_rebuilds_loop_database(tmp_path):
  """LoadState re-creates the loop detector's image database from the
  dataset (io.cc:521) — after resume, closures against pre-snapshot
  keyframes must remain possible."""
  cam = synthetic.default_test_camera(W, H)
  normals = _make_world()
  traj = [np.asarray(se3.exp(jnp.asarray(
      [0.003 * i, 0, 0, 0, 0, 0], jnp.float32))) for i in range(6)]
  video = synthetic.make_synthetic_video(cam, traj, normals)
  cfg = BadSlamConfig(
      keyframe_interval=2, num_scales=3, max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1, enable_loop_detection=True,
      parallel_loop_detection=False,
      initial_keyframe_capacity=4, initial_surfel_capacity=1 << 13)
  slam = BadSlam(cfg, video)
  for i in range(5):
    slam.process_frame(i)
  path = str(tmp_path / "state.npz")
  state_io.save_state(path, slam)

  slam2 = BadSlam(cfg, synthetic.make_synthetic_video(cam, traj, normals))
  state_io.load_state(path, slam2)
  entries = [e for e in slam2.loop_detector.entries if e is not None]
  n_loaded = slam2.direct_ba.keyframe_count
  assert len(entries) == n_loaded
  assert sorted(e.kf_slot for e in entries) == list(range(n_loaded))
  # A NEW post-resume keyframe queries the rebuilt database: the detector
  # gains exactly one entry, registered under the newly assigned slot.
  slam2.process_frame(5, force_keyframe=True)
  slam2.quiesce()  # parallel BA drains the queued keyframe registration
  entries = [e for e in slam2.loop_detector.entries if e is not None]
  assert len(entries) == n_loaded + 1
  assert slam2.direct_ba.keyframe_count == n_loaded + 1
  assert entries[-1].kf_slot == n_loaded


def test_calibration_roundtrip(tmp_path):
  cam = synthetic.default_test_camera(W, H)
  normals = _make_world()
  video = synthetic.make_synthetic_video(cam, [np.eye(4, dtype=np.float32)],
                                         normals)
  cfg = BadSlamConfig(initial_keyframe_capacity=2,
                      initial_surfel_capacity=1 << 10,
                      enable_loop_detection=False)
  slam = BadSlam(cfg, video)
  slam.direct_ba.depth_intr = jnp.asarray([61.0, 59.5, 80.2, 60.1])
  slam.direct_ba.a = jnp.asarray(0.01, jnp.float32)
  base = str(tmp_path / "calib")
  state_io.save_calibration(base, slam)

  slam2 = BadSlam(cfg, video)
  state_io.load_calibration(base, slam2)
  np.testing.assert_allclose(np.asarray(slam2.direct_ba.depth_intr),
                             [61.0, 59.5, 80.2, 60.1], atol=1e-4)
  assert float(slam2.direct_ba.a) == pytest.approx(0.01, abs=1e-6)


def test_auto_association_from_rgb_depth_txt(tmp_path):
  """Raw TUM layout (rgb.txt + depth.txt, no associated.txt) is associated
  automatically (associate.py equivalent)."""
  cam = synthetic.default_test_camera(W, H)
  normals = _make_world()
  traj = [np.eye(4, dtype=np.float32) for _ in range(3)]
  _write_tum_dataset(str(tmp_path), cam, traj, normals)
  # Convert to raw layout: drop associated.txt, write rgb.txt/depth.txt with
  # slightly offset timestamps (within the 0.02 s window).
  lines = open(tmp_path / "associated.txt").read().splitlines()
  os.remove(tmp_path / "associated.txt")
  with open(tmp_path / "rgb.txt", "w") as fr, \
       open(tmp_path / "depth.txt", "w") as fd:
    fr.write("# color images\n")
    fd.write("# depth maps\n")
    for ln in lines:
      rgb_ts, rgb_f, depth_ts, depth_f = ln.split()
      fr.write(f"{rgb_ts} {rgb_f}\n")
      fd.write(f"{float(depth_ts) + 0.01:.6f} {depth_f}\n")
  video = dataset_io.load_tum_dataset(str(tmp_path))
  assert video.frame_count() == 3
  assert video.depth_metric(0).shape == (H, W)


def test_pyramid_level_input_scaling(tmp_path):
  """--pyramid_level_for_depth/color downscale inputs and cameras by 2^level
  (main.cc:540-552)."""
  from badslam_tpu.slam.system import BadSlam
  cam = synthetic.default_test_camera(W, H)
  normals = _make_world()
  traj = [np.eye(4, dtype=np.float32) for _ in range(2)]
  video = synthetic.make_synthetic_video(cam, traj, normals)
  cfg = BadSlamConfig(
      pyramid_level_for_depth=1, pyramid_level_for_color=1,
      keyframe_interval=2, num_scales=2, max_depth=5.0,
      sparse_surfel_cell_size=2,
      min_observation_count_while_bootstrapping_1=1,
      min_observation_count_while_bootstrapping_2=1,
      min_observation_count=1, enable_loop_detection=False,
      parallel_ba=False,
      initial_keyframe_capacity=2, initial_surfel_capacity=1 << 12)
  slam = BadSlam(cfg, video)
  assert slam.direct_ba.depth_size == (W // 2, H // 2)
  slam.process_frame(0)
  assert slam.direct_ba.keyframe_count == 1
  assert slam.direct_ba.kf.depth.shape[1:] == (H // 2, W // 2)
  assert slam.direct_ba.surfel_count > 50
