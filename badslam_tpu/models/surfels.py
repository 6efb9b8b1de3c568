"""The surfel map: a static-capacity structure-of-arrays pytree.

Reference layout (kernels.cuh:69-93 in /root/reference/applications/badslam/
src/badslam): a 17-row float buffer (x, y, z, packed normal, radius^2, color,
descriptor1, descriptor2 + 9 scratch accumulator rows), compacted with CUB
scans so kernel launches stay dense.

TPU-native redesign:
  * Attributes are separate arrays of shape (N,) / (N, 3) with a static
    capacity N and a boolean validity mask — XLA needs static shapes, and
    masked lanes are cheaper than compaction on TPU.
  * No scratch accumulator rows: Gauss-Newton accumulation happens in
    registers/VMEM inside the fused optimization kernels.
  * No NaN-poisoning for deleted surfels (masks instead).
  * Compaction exists (for snapshot export and shard rebalancing) as an
    argsort-based permutation, but the optimizer only relies on masks.

Capacity grows by doubling from config.initial_surfel_capacity, bounding the
number of recompilations to log2(max/initial).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SurfelStore(NamedTuple):
  """All per-surfel state. Leading dimension = static capacity."""

  pos: jax.Array         # (N, 3) float32, global position
  normal: jax.Array      # (N, 3) float32, global unit normal
  radius_sq: jax.Array   # (N,) float32
  color: jax.Array       # (N, 3) float32 in [0,1] (viz/export only)
  desc: jax.Array        # (N, 2) float32 descriptor (clamped to [-180, 180])
  valid: jax.Array       # (N,) bool
  active: jax.Array      # (N,) bool — geometry optimization working set
  # () int32 — ALLOCATION WATERMARK: slots [0, count) have ever been used and
  # append() writes at count. Deletion/merging clear `valid` bits WITHOUT
  # lowering count (lowering it would let append overwrite live surfels);
  # compact() re-packs live surfels and resets count to the live total.
  count: jax.Array

  @property
  def capacity(self) -> int:
    return self.pos.shape[0]


def create(capacity: int) -> SurfelStore:
  return SurfelStore(
      pos=jnp.zeros((capacity, 3), jnp.float32),
      normal=jnp.zeros((capacity, 3), jnp.float32),
      radius_sq=jnp.zeros((capacity,), jnp.float32),
      color=jnp.zeros((capacity, 3), jnp.float32),
      desc=jnp.zeros((capacity, 2), jnp.float32),
      valid=jnp.zeros((capacity,), bool),
      active=jnp.zeros((capacity,), bool),
      count=jnp.zeros((), jnp.int32),
  )


def grow(s: SurfelStore, new_capacity: int) -> SurfelStore:
  """Re-allocate with a larger static capacity (host-side, outside jit)."""
  pad = new_capacity - s.capacity
  assert pad >= 0

  def _pad(x):
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths)

  return SurfelStore(
      pos=_pad(s.pos),
      normal=_pad(s.normal),
      radius_sq=_pad(s.radius_sq),
      color=_pad(s.color),
      desc=_pad(s.desc),
      valid=_pad(s.valid),
      active=_pad(s.active),
      count=s.count,
  )


def compact(s: SurfelStore) -> SurfelStore:
  """Move live surfels to the front (CompactSurfelsCUDAKernel semantics,
  kernel_compact_surfels.cu:129; here a stable argsort on the invalid flag
  instead of a free-list scatter — deterministic and TPU-friendly)."""
  order = jnp.argsort(~s.valid, stable=True)  # valid first, stable
  return SurfelStore(
      pos=s.pos[order],
      normal=s.normal[order],
      radius_sq=s.radius_sq[order],
      color=s.color[order],
      desc=s.desc[order],
      valid=s.valid[order],
      active=s.active[order],
      count=jnp.sum(s.valid).astype(jnp.int32),
  )


def used_size(s: SurfelStore) -> jax.Array:
  """Number of slots in use (valid count after compaction; in general the
  watermark is tracked by `count` + appended blocks)."""
  return jnp.sum(s.valid).astype(jnp.int32)


def append(s: SurfelStore, new_pos, new_normal, new_radius_sq, new_color,
           new_desc, new_mask) -> SurfelStore:
  """Append a fixed-size block of candidate surfels (masked): candidates with
  new_mask=True are written to slots [count, count+k). The block size is
  static; the scatter uses a prefix-sum over the mask.

  Candidates that would overflow capacity are dropped (the reference logs
  "surfel count reached maximum" at kernel_create_surfels.cc:162-165).
  """
  m = new_mask.shape[0]
  capacity = s.capacity
  # Destination slot per candidate: count + (exclusive prefix sum of mask).
  prefix = jnp.cumsum(new_mask.astype(jnp.int32)) - new_mask.astype(jnp.int32)
  dest = s.count + prefix
  write = new_mask & (dest < capacity)
  dest_safe = jnp.where(write, dest, capacity)  # out-of-range drops the write
  del m
  new_count = jnp.minimum(
      s.count + jnp.sum(new_mask.astype(jnp.int32)), capacity
  ).astype(jnp.int32)
  return SurfelStore(
      pos=s.pos.at[dest_safe].set(new_pos, mode="drop"),
      normal=s.normal.at[dest_safe].set(new_normal, mode="drop"),
      radius_sq=s.radius_sq.at[dest_safe].set(new_radius_sq, mode="drop"),
      color=s.color.at[dest_safe].set(new_color, mode="drop"),
      desc=s.desc.at[dest_safe].set(new_desc, mode="drop"),
      valid=s.valid.at[dest_safe].set(write, mode="drop"),
      active=s.active.at[dest_safe].set(write, mode="drop"),
      count=new_count,
  )
