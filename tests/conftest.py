"""Test configuration: run on a virtual 8-device CPU mesh.

Two concerns:
 1. Tests must run without TPU hardware; multi-chip sharding tests use
    xla_force_host_platform_device_count (SURVEY.md §4 "implication for the
    rebuild").
 2. The environment's TPU-tunnel PJRT plugin (axon) registers itself from
    sitecustomize at interpreter start and wraps JAX's backend/compile path,
    which slows *CPU* compiles by ~6x. Since sitecustomize runs before any
    conftest, we re-exec the pytest process once with the plugin's trigger
    env var cleared so the plugin never registers.
"""

import os
import sys


def pytest_configure(config):
  if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
      flags = flags + " --xla_force_host_platform_device_count=8"
    if "collective_call_terminate_timeout" not in flags:
      # Virtual 8-device collectives on a small loaded host can starve past
      # XLA:CPU's default 40 s rendezvous termination (observed under
      # parallel pytest + benchmark load: "only 6 of 8 arrived" aborts).
      flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
                " --xla_cpu_collective_call_terminate_timeout_seconds=900")
    env["XLA_FLAGS"] = flags.strip()
    # Restore the real stdout/stderr fds before replacing the process, else
    # the new pytest writes into the old capture temp files.
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
      capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    args = list(config.invocation_params.args)
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + args, env)


os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  flags = flags + " --xla_force_host_platform_device_count=8"
if "collective_call_terminate_timeout" not in flags:
  flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
