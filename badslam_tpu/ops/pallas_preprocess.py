"""Fused depth-preprocessing Pallas kernel.

The preprocess chain (bilateral filter + cutoff -> calibration + normals ->
radii + isolated-pixel removal; cuda_depth_processing.cu semantics via
ops/depth_proc.py) is a sequence of shift-window stencils. XLA compiles it
as several fused loops with HBM intermediates; a whole 640x480 f32 frame is
1.2 MB, so the ENTIRE chain fits in VMEM (~16 MB) and can run as one Pallas
program: one HBM read of the raw depth, all stencil math on-chip, one write
per output. This is the round-3 "Pallas optimization pass" artifact
(SURVEY.md §7.2 stage 9); benchmarks/pallas_preprocess_bench.py measures it
against the XLA path, and tests/test_pallas_preprocess.py pins parity.

The kernel deliberately REUSES the jnp implementations from ops/depth_proc —
they are static-shift stencils (pad + static dynamic_slice + elementwise),
exactly the subset Pallas lowers; parity with the XLA path is therefore
structural, not re-derived.

Intensity (rgb -> luma) stays outside: it is elementwise on a (H, W, 3) u8
array whose 3-wide minor dimension tiles terribly in VMEM, and XLA already
fuses it with the upload cast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from badslam_tpu.geometry.camera import PinholeCamera
from badslam_tpu.ops import depth_proc

# ~40 live (H, W) f32 planes fit the raised VMEM budget up to this size.
_MAX_PIXELS = 640 * 480


def should_use(height: int, width: int) -> bool:
  """Auto-selection: the fused kernel ONLY on the TPU backend (pltpu memory
  spaces/compiler params don't lower elsewhere) and only for frames whose
  working set fits VMEM; the XLA chain otherwise (CPU interpret mode is for
  tests only)."""
  if height * width > _MAX_PIXELS:
    return False
  import jax
  return jax.default_backend() == "tpu"


def _kernel(intr_ref, scal_ref, depth_ref, cfactor_ref,
            filtered_ref, normals_ref, radius_ref,
            *, width: int, height: int, cell_size: int,
            sigma_xy: float, sigma_inv_depth: float, radius_factor: float,
            max_depth: float):
  depth = depth_ref[:]
  filtered = depth_proc.bilateral_filter_and_cutoff(
      depth, sigma_xy=sigma_xy, sigma_inv_depth=sigma_inv_depth,
      radius_factor=radius_factor, max_depth=max_depth)
  cam = PinholeCamera(width, height, intr_ref[0], intr_ref[1],
                      intr_ref[2], intr_ref[3])
  filtered_b, nx, ny = depth_proc.compute_normals_planar(
      filtered, cam, scal_ref[0], cfactor_ref[:], cell_size)
  radius_sq, filtered_a = depth_proc.compute_radii_and_remove_isolated(
      filtered_b, cam)
  filtered_ref[:] = filtered_a
  normals_ref[0] = nx
  normals_ref[1] = ny
  radius_ref[:] = radius_sq


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cell_size", "sigma_xy",
                     "sigma_inv_depth", "radius_factor", "max_depth",
                     "interpret"))
def fused_depth_preprocess(
    raw_depth, depth_intr, a, cfactor,
    *, width: int, height: int, cell_size: int,
    sigma_xy: float, sigma_inv_depth: float, radius_factor: float,
    max_depth: float, interpret: bool = False):
  """One-pass VMEM preprocess. Returns (filtered, normals (H,W,2),
  radius_sq) matching the ops/depth_proc chain used by _preprocess_jit.
  interpret=True runs the Pallas interpreter (CPU backend / tests)."""
  h, w = raw_depth.shape
  kernel = functools.partial(
      _kernel, width=width, height=height, cell_size=cell_size,
      sigma_xy=sigma_xy, sigma_inv_depth=sigma_inv_depth,
      radius_factor=radius_factor, max_depth=max_depth)
  filtered, normals, radius_sq = pl.pallas_call(
      kernel,
      out_shape=(
          jax.ShapeDtypeStruct((h, w), jnp.float32),
          jax.ShapeDtypeStruct((2, h, w), jnp.float32),
          jax.ShapeDtypeStruct((h, w), jnp.float32),
      ),
      in_specs=[
          pl.BlockSpec(memory_space=pltpu.SMEM),   # intrinsics (4,)
          pl.BlockSpec(memory_space=pltpu.SMEM),   # a (1,)
          pl.BlockSpec(memory_space=pltpu.VMEM),   # raw depth (H, W)
          pl.BlockSpec(memory_space=pltpu.VMEM),   # cfactor grid
      ],
      out_specs=(
          pl.BlockSpec(memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pltpu.VMEM),
          pl.BlockSpec(memory_space=pltpu.VMEM),
      ),
      compiler_params=pltpu.CompilerParams(
          # The fused chain keeps ~40 live (H, W) f32 planes; the default
          # 16 MB scoped-vmem budget is conservative (v5e VMEM is 128 MB).
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(jnp.asarray(depth_intr, jnp.float32),
    jnp.asarray(a, jnp.float32).reshape(1),
    jnp.asarray(raw_depth, jnp.float32),
    jnp.asarray(cfactor, jnp.float32))
  return filtered, jnp.transpose(normals, (1, 2, 0)), radius_sq
