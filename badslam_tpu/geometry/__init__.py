"""Geometry package. Importing it pins JAX's default matmul precision.

On TPU, JAX's "default" matmul precision feeds bf16 inputs to the MXU
(~2.4e-3 relative error vs 3.3e-7 at float32 — measured on v5e). Every
Gauss-Newton H/b accumulation in this framework is a (6,N)@(N,6)-style
matmul, and the reference's CUDA kernels accumulate in full float32
(gauss_newton.cuh), so bf16 inputs silently degrade pose/intrinsics
convergence by ~1-2 orders of magnitude. These skinny reductions are
HBM-bandwidth-bound, making float32 MXU passes nearly free here.

Set JAX_DEFAULT_MATMUL_PRECISION yourself (env var or jax.config) before
importing badslam_tpu to override this default.
"""

import os

import jax

if (os.environ.get("JAX_DEFAULT_MATMUL_PRECISION") is None
    and jax.config.jax_default_matmul_precision is None):
  jax.config.update("jax_default_matmul_precision", "float32")
