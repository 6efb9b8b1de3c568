"""Device-accurate phase timing (the cudaEvent-bracket analog,
direct_ba_alternating.cc:629-690): with Timing.set_device_accurate(True),
a timed scope's span must cover the device execution of work dispatched
inside it, not just the (async) dispatch."""

import time

import jax
import jax.numpy as jnp

from badslam_tpu.utils.timing import Timing


def _heavy():
  # Big enough that execution takes measurably longer than dispatch.
  x = jnp.ones((1200, 1200), jnp.float32)
  f = jax.jit(lambda a: (a @ a @ a @ a).sum())
  f(x)  # compile outside the timed region
  jax.block_until_ready(f(x))
  return f, x


def _timed_blocked(f, x) -> float:
  t0 = time.perf_counter()
  jax.block_until_ready(f(x))
  return time.perf_counter() - t0


def test_device_accurate_mode_covers_execution():
  f, x = _heavy()

  # Reference: how long the work actually takes, measured blocking. MIN of
  # several repeats — a single sample inflates under machine load (parallel
  # xdist workers) and then over-bounds the in-phase measurement below.
  blocked = min(_timed_blocked(f, x) for _ in range(3))

  Timing.reset()
  Timing.set_device_accurate(True)
  try:
    with Timing.time("accurate-phase"):
      f(x)  # async dispatch; the exit barrier must wait for it
  finally:
    Timing.set_device_accurate(False)
  measured = Timing.stats()["accurate-phase"].last
  # The barrier-bracketed span must cover the execution (allow 2x slack
  # for run-to-run variance; the failure mode without the barrier is a
  # ~1000x underestimate, so this is a robust separation).
  assert measured > 0.5 * blocked, (measured, blocked)


def test_device_accurate_entry_barrier_excludes_prior_work():
  """Work dispatched BEFORE the scope must not bill into it."""
  f, x = _heavy()
  Timing.reset()
  Timing.set_device_accurate(True)
  try:
    pending = f(x)  # dispatched, not complete
    with Timing.time("empty-phase"):
      pass
  finally:
    Timing.set_device_accurate(False)
  jax.block_until_ready(pending)
  # The entry barrier absorbs the pending work; the scope itself is empty.
  t0 = time.perf_counter()
  jax.block_until_ready(f(x))
  blocked = time.perf_counter() - t0
  assert Timing.stats()["empty-phase"].last < 0.5 * blocked


def test_disabled_mode_unchanged():
  Timing.reset()
  Timing.set_device_accurate(False)
  with Timing.time("plain"):
    time.sleep(0.01)
  assert Timing.stats()["plain"].last >= 0.009


def test_logging_levels_and_checks():
  """Leveled logging + CHECK diagnostics (libvis logging.h / loguru parity)."""
  import pytest
  from badslam_tpu.utils import logging as log
  log.set_level("warning")
  log.info("suppressed")
  log.warning("shown %d", 1)
  log.set_level("info")
  log.check(True)
  log.check_eq(3, 3)
  log.check_le(1, 2)
  assert log.check_notnull("x") == "x"
  with pytest.raises(log.CheckFailedError, match="3 vs 4"):
    log.check_eq(3, 4, "counts match")
  with pytest.raises(log.CheckFailedError):
    log.check(False, "invariant broken")
  with pytest.raises(log.CheckFailedError, match="boom"):
    log.fatal("boom %s", "now")
