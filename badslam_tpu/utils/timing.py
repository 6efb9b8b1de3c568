"""Timer / Timing statistics singleton.

Replaces libvis's Timing (libvis/src/libvis/timing.{h,cc}; tag ->
count/total/mean statistics, printed sorted by total) for the per-phase
timing taxonomy that the reference exports with ``--export_final_timings``
(main.cc:788-793).

On TPU, a phase's device work is asynchronous; ``Timing.time(...)`` measures
host wall time of the dispatched block. For device-accurate per-phase
numbers — the analog of the reference's cudaEvent brackets around every
pipeline stage (direct_ba_alternating.cc:629-690, bad_slam.cc:411-447) —
enable ``Timing.set_device_accurate(True)`` (CLI:
``--device_accurate_timings``): every timed scope then opens and closes
with a device barrier, so the recorded span covers exactly that phase's
device execution. The barrier dispatches a trivial jitted program and
blocks on it; PJRT executes a device's programs in submission order, so its
completion bounds all previously dispatched work.

CAUTION (PERF.md "tunnel dispatch modes"): the barrier's block IS a
device->host synchronization — through the axon TPU tunnel the first one
permanently drops the process into synchronous dispatch. Device-accurate
timing is a PROFILING mode: per-phase numbers become attributable while
end-to-end throughput degrades; never enable it in production runs.
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Dict, List, Optional


class _Stat:
  __slots__ = ("count", "total", "min", "max", "last")

  def __init__(self):
    self.count = 0
    self.total = 0.0
    self.min = float("inf")
    self.max = 0.0
    self.last = 0.0

  def add(self, seconds: float):
    self.count += 1
    self.total += seconds
    self.min = min(self.min, seconds)
    self.max = max(self.max, seconds)
    self.last = seconds

  @property
  def mean(self) -> float:
    return self.total / self.count if self.count else 0.0


class Timing:
  """Global tag -> statistics registry (libvis Timing singleton)."""

  _stats: Dict[str, _Stat] = {}
  _lock = threading.Lock()
  enabled: bool = True
  _device_accurate: bool = False
  _barrier = None

  @classmethod
  def set_device_accurate(cls, on: bool):
    """Bracket every timed scope with device barriers (cudaEvent analog).
    See the module docstring for the tunnel-dispatch caveat."""
    cls._device_accurate = on
    if on and cls._barrier is None:
      import jax
      import jax.numpy as jnp
      fn = jax.jit(lambda: jnp.zeros((), jnp.int32))
      cls._barrier = lambda: jax.block_until_ready(fn())

  @classmethod
  def device_barrier(cls):
    if cls._device_accurate and cls._barrier is not None:
      try:
        cls._barrier()
      except Exception:
        pass

  @classmethod
  def add_time(cls, tag: str, seconds: float):
    with cls._lock:
      cls._stats.setdefault(tag, _Stat()).add(seconds)

  @classmethod
  @contextlib.contextmanager
  def time(cls, tag: str, block_on=None):
    if not cls.enabled:
      yield
      return
    cls.device_barrier()  # pending prior work must not bill to this phase
    start = time.perf_counter()
    try:
      yield
    finally:
      if block_on is not None:
        try:
          import jax
          jax.block_until_ready(block_on)
        except Exception:
          pass
      cls.device_barrier()  # this phase's dispatched work completes here
      cls.add_time(tag, time.perf_counter() - start)

  @classmethod
  def reset(cls):
    with cls._lock:
      cls._stats.clear()

  @classmethod
  def stats(cls) -> Dict[str, _Stat]:
    return dict(cls._stats)

  @classmethod
  def print_timings(cls, sort_by_total: bool = True) -> str:
    """Timing::print(kSortByTotal) equivalent; returns the report string."""
    with cls._lock:
      items = sorted(
          cls._stats.items(),
          key=(lambda kv: -kv[1].total) if sort_by_total else (lambda kv: kv[0]),
      )
    lines = ["Timing statistics (seconds):"]
    for tag, s in items:
      lines.append(
          f"  {tag:<42s} count {s.count:>6d}  total {s.total:>9.3f}"
          f"  mean {s.mean * 1e3:>8.2f}ms  min {s.min * 1e3:>8.2f}ms"
          f"  max {s.max * 1e3:>8.2f}ms")
    return "\n".join(lines)

  @classmethod
  def export_file(cls, path: str):
    """--export_final_timings equivalent."""
    with open(path, "w") as f:
      f.write(cls.print_timings() + "\n")


class Timer:
  """Scoped timer that reports into Timing on stop (libvis Timer)."""

  def __init__(self, tag: str):
    self.tag = tag
    self.start = time.perf_counter()
    self._stopped = False

  def stop(self, add_to_statistics: bool = True) -> float:
    elapsed = time.perf_counter() - self.start
    if add_to_statistics and not self._stopped:
      Timing.add_time(self.tag, elapsed)
    self._stopped = True
    return elapsed

  def get_time_since_start(self) -> float:
    return time.perf_counter() - self.start
