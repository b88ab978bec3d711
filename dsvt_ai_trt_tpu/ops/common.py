"""Shared numeric helpers.

Three precision modes (cfg.precision):
  * "fp32"  — strict parity: Precision.HIGHEST on every matmul/conv (full
    fp32 via the MXU's multi-pass path).
  * "mixed" — fp32 activations/weights, Precision.DEFAULT matmuls (bf16
    multiplies, fp32 accumulation).  The TPU analogue of the reference's
    USE_FP16 builder flag (params.h:332): the compiler picks fast kernels,
    boxes stay within detection tolerance of fp32.
  * "bf16"  — bf16 activations through matmuls/convs, fp32 accumulation and
    fp32 normalizations.  Fastest; mirrors an fp16-everywhere engine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_precision(precision: str):
    assert precision in ("fp32", "mixed", "bf16"), precision
    return jax.lax.Precision.HIGHEST if precision == "fp32" else jax.lax.Precision.DEFAULT


def compute_dtype(precision: str):
    return jnp.bfloat16 if precision == "bf16" else jnp.float32
