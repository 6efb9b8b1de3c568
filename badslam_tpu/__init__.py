"""badslam-tpu: TPU-native dense RGB-D SLAM (BAD SLAM rebuilt on JAX/XLA).

Quick start:
    from badslam_tpu import BadSlam, BadSlamConfig, load_tum_dataset
    video = load_tum_dataset("path/to/tum_sequence")
    slam = BadSlam(BadSlamConfig(), video)
    for i in range(video.frame_count()):
        slam.process_frame(i)
"""

__version__ = "0.1.0"


def __getattr__(name):
  # Lazy re-exports keep `import badslam_tpu` light (no jax import cost).
  if name == "BadSlamConfig":
    from badslam_tpu.config import BadSlamConfig
    return BadSlamConfig
  if name == "BadSlam":
    from badslam_tpu.slam.system import BadSlam
    return BadSlam
  if name == "DirectBA":
    from badslam_tpu.slam.direct_ba import DirectBA
    return DirectBA
  if name == "load_tum_dataset":
    from badslam_tpu.io.dataset import load_tum_dataset
    return load_tum_dataset
  raise AttributeError(name)
