"""Sensor-noise robustness gate.

All other accuracy tests run on noiseless synthetic scenes; real RGB-D
sensors add depth noise growing quadratically with range, invalid-pixel
dropouts, u16/u8 quantization, photon noise and exposure wobble. This gate
runs the full pipeline over a Kinect-class noise model
(utils.tum_synth.apply_sensor_noise, Khoshelham & Elberink 2012 axial model)
and requires near-noiseless trajectory accuracy — the robustness the
reference demonstrates on TUM RGB-D/ETH3D data (README.md:161-178), which is
unreachable from this environment.
"""

import numpy as np

from badslam_tpu.config import BadSlamConfig
from badslam_tpu.eval import ate_rmse
from badslam_tpu.io import dataset as dataset_io
from badslam_tpu.slam.system import BadSlam
from badslam_tpu.utils import tum_synth


def test_noise_model_statistics():
  rng = np.random.default_rng(0)
  depth = np.full((64, 64), 2.0, np.float32)
  inten = np.full((64, 64), 0.5, np.float32)
  nz, ni = tum_synth.apply_sensor_noise(depth, inten, rng)
  valid = nz > 0
  # Some dropouts, the rest near 2 m with sigma ~ 0.0012 + 0.0019*1.6^2.
  assert 0 < (~valid).sum() < 64 * 64 * 0.02
  sig = nz[valid].std()
  expected = 0.0012 + 0.0019 * (2.0 - 0.4) ** 2
  assert 0.5 * expected < sig < 1.5 * expected
  assert abs(nz[valid].mean() - 2.0) < 3 * expected
  # Intensity noise is small and clipped to [0, 1].
  assert 0.0 <= ni.min() and ni.max() <= 1.0
  assert 0.002 < ni.std() < 0.03
  # Zero depth stays invalid.
  z2, _ = tum_synth.apply_sensor_noise(np.zeros((8, 8), np.float32),
                                       inten[:8, :8], rng)
  assert (z2 == 0).all()


def test_full_pipeline_under_sensor_noise(tmp_path):
  frames = 60
  traj = tum_synth.loop_trajectory(frames, loops=1.0, radius=0.15)
  d = str(tmp_path / "noisy")
  tum_synth.write_tum_dataset(d, traj, width=320, height=240,
                              sensor_noise=True, quiet=True)
  video = dataset_io.load_tum_dataset(d, None)
  cfg = BadSlamConfig(
      keyframe_interval=5, max_depth=5.0, parallel_ba=False,
      parallel_loop_detection=False, enable_loop_detection=False)
  slam = BadSlam(cfg, video)
  for i in range(frames):
    slam.process_frame(i)
  slam.quiesce()

  _, poses = slam.trajectory()
  gt = np.stack(traj).astype(np.float64)[:, :3, 3]
  est = np.stack(poses)[:, :3, 3]
  rmse, _ = ate_rmse(est, gt)
  # Measured 0.20 mm on CPU (noiseless: 0.02 mm); gate at 7.5x headroom.
  assert rmse < 1.5e-3, f"ATE RMSE {rmse * 1e3:.3f} mm under sensor noise"
  assert np.isfinite(est).all()
  assert slam.direct_ba.surfel_count > 1000
