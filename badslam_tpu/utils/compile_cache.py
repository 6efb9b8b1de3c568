"""Persistent jit-compilation cache, keyed safely per host for CPU runs.

The remote TPU compile service costs tens of seconds per program, so a
persistent cache is essential there. XLA:CPU, however, persists AOT
executables specialized to the COMPILING host's CPU features, and the cache
key does not include them — an entry produced on one machine loads on
another with "Target machine feature ... not supported on the host machine
... could lead to execution errors such as SIGILL" warnings. Since this
repository's rounds migrate between hosts, CPU-backend runs use a cache
subdirectory keyed by a fingerprint of the host's CPU flags; TPU entries
stay in the shared directory (device code has no host-feature dependence).
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_tag() -> str:
  try:
    with open("/proc/cpuinfo") as f:
      for line in f:
        if line.startswith("flags"):
          flags = " ".join(sorted(line.split(":", 1)[1].split()))
          break
      else:
        flags = ""
  except OSError:
    flags = ""
  digest = hashlib.sha1((platform.machine() + flags).encode()).hexdigest()
  return f"cpu-{digest[:10]}"


def enable_compile_cache(root_dir: str) -> None:
  """Point jax's persistent compilation cache at ``root_dir`` (TPU) or a
  host-fingerprinted subdirectory (CPU backend).

  NOT enabled for virtual multi-device CPU runs
  (xla_force_host_platform_device_count): deserialized multi-device CPU
  executables from earlier processes can disagree on collective op ids
  with freshly-compiled programs sharing the in-process rendezvous space —
  measured as a permanent all-reduce deadlock ("7 of 8 threads arrived")
  in the mesh+pipelined CLI run that disappears with a cold cache. The
  virtual mesh exists for validation, where compile time is secondary; the
  cache's real payoff is the remote TPU compile service (minutes ->
  seconds on warm prewarms), which is unaffected."""
  import jax
  flags = os.environ.get("XLA_FLAGS", "") or ""
  # Virtual-mesh detection must NOT rely on JAX_PLATFORMS: main.build_mesh
  # only sets XLA_FLAGS, so a `--mesh_devices N` CLI run on a CPU-default
  # host would otherwise keep the cache enabled and re-introduce the
  # rendezvous deadlock documented above (ADVICE round 4).
  if "xla_force_host_platform_device_count" in flags:
    return
  # Detect the CPU backend via the resolved backend, not the env var — the
  # default platform is CPU whenever no accelerator is attached even with
  # JAX_PLATFORMS unset.
  try:
    backend = jax.default_backend()
  except Exception:
    backend = ""
  if backend == "cpu":
    root_dir = os.path.join(root_dir, _host_tag())
  try:
    jax.config.update("jax_compilation_cache_dir", root_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
  except Exception:
    pass
