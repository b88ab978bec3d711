"""Shared numeric helpers.

TPU MXU matmuls default to bf16 input precision; the fp32 parity path must
request Precision.HIGHEST explicitly (full fp32 via multi-pass), while the
bf16 fast path casts inputs itself and keeps DEFAULT.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_precision(precision: str):
    return jax.lax.Precision.HIGHEST if precision == "fp32" else jax.lax.Precision.DEFAULT


def compute_dtype(precision: str):
    return jnp.bfloat16 if precision == "bf16" else jnp.float32
