"""Timer / Timing statistics singleton.

Replaces libvis's Timing (libvis/src/libvis/timing.{h,cc}; tag ->
count/total/mean statistics, printed sorted by total) for the per-phase
timing taxonomy that the reference exports with ``--export_final_timings``
(main.cc:788-793).

On TPU, a phase's device work is asynchronous; ``Timing.time(...)`` measures
host wall time of the dispatched block. Use ``block=True`` (or call
``Timing.block_until_ready(x)`` on the phase result) for accurate device
timings — the bench harness does this.
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
